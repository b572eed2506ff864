"""CompoundWordFilter / MultiFilter / TeeFilter analog combinators."""

import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.analysis import (
    MultiAnalyzer,
    StandardAnalyzer,
    compound_word_split,
    stemming_analyzer,
    tee_tokens,
)

WORDSET = {"green", "eggs", "ham", "apple", "script", "turbo", "squid"}


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
@pytest.mark.parametrize("keep", [True, False])
def test_compound_differential(keep):
    from whoosh.analysis import RegexTokenizer
    from whoosh.analysis.intraword import CompoundWordFilter

    rt = RegexTokenizer(r"\S+")
    for text in [
        "I do not like greeneggs and ham",
        "turbosquid applescript plain greenappleeggs hamhamham",
    ]:
        cwf = CompoundWordFilter(WORDSET, keep_compound=keep)
        ref = [t.text for t in cwf(rt(text))]
        memo = {}
        mine = [
            x
            for tok in text.split()
            for x in compound_word_split(tok, WORDSET, memo, keep)
        ]
        assert mine == ref, (text, keep)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_tee_differential():
    from whoosh.analysis import RegexTokenizer
    from whoosh.analysis.filters import LowercaseFilter, ReverseTextFilter, TeeFilter

    rt = RegexTokenizer(r"\S+")
    ref = [
        t.text
        for t in (rt | TeeFilter(LowercaseFilter(), ReverseTextFilter()))(
            "ALFA BRAVO CHARLIE"
        )
    ]
    mine = tee_tokens(
        "ALFA BRAVO CHARLIE".split(), lambda t: t.lower(), lambda t: t[::-1]
    )
    assert mine == ref


def test_multi_analyzer_mode_dispatch():
    ma = MultiAnalyzer(StandardAnalyzer(), index=stemming_analyzer())
    assert ma("Jumping runners", mode="index") == ["jump", "runner"]
    assert ma("Jumping runners", mode="query") == ["jumping", "runners"]
    assert ma("Jumping runners") == ["jumping", "runners"]


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
@pytest.mark.parametrize("at", [None, "start", "end"])
def test_ngram_words_differential(at):
    from whoosh.analysis.ngrams import NgramWordAnalyzer

    from whoosh_novo_ray.analysis import ngram_words

    ref = NgramWordAnalyzer(3, 5, at=at)
    for text in ["Hello there World", "ab hi longishword", "Pre-fix under_score"]:
        assert ngram_words(text, 3, 5, at=at) == [t.text for t in ref(text)], (at, text)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_path_tokens_differential():
    from whoosh.analysis.tokenizers import PathTokenizer

    from whoosh_novo_ray.analysis import path_tokens

    pt = PathTokenizer()
    for v in ["/a/b/c", "a/b", "/x", "usr/local/lib/python"]:
        assert path_tokens(v) == [t.text for t in pt(v)], v


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_strip_substitution_reverse_filters():
    import random

    from whoosh.analysis import (
        RegexTokenizer,
        ReverseTextFilter,
        StripFilter,
        SubstitutionFilter,
    )

    from whoosh_novo_ray.analysis import (
        reverse_text_tokens,
        strip_tokens,
        substitution_tokens,
    )

    rng = random.Random(8)
    rt = RegexTokenizer(r"\S+")
    for _ in range(300):
        text = " ".join(
            "".join(rng.choices("abc-xyz_ ", k=rng.randrange(1, 8)).__iter__())
            for _ in range(rng.randrange(1, 8))
        )
        base = [t.text for t in rt(text)]
        ref_rev = [t.text for t in (rt | ReverseTextFilter())(text)]
        assert reverse_text_tokens(base) == ref_rev
        ref_strip = [t.text for t in (rt | StripFilter())(text)]
        assert strip_tokens(base) == ref_strip
        ref_sub = [t.text for t in (rt | SubstitutionFilter("-", "/"))(text)]
        assert substitution_tokens(base, "-", "/") == ref_sub
