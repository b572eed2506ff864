"""Double Metaphone — differential vs the reference port."""

import random

import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.lang_dmetaphone import dmetaphone_tokens, double_metaphone

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")


def test_known_words():
    assert double_metaphone("smith") == double_metaphone("smyth")[:1] + double_metaphone("smith")[1:]
    assert double_metaphone("katherine")[0] == double_metaphone("catherine")[0]


def test_differential_fuzz():
    from whoosh.lang.dmetaphone import double_metaphone as ref

    rng = random.Random(17)
    for _ in range(20000):
        w = "".join(rng.choices("abcdefghijklmnopqrstuvwxyz ç ñ", k=rng.randrange(0, 12)))
        try:
            r = ref(w)
        except Exception:
            continue
        assert double_metaphone(w) == r, repr(w)


def test_curated_differential():
    from whoosh.lang.dmetaphone import double_metaphone as ref

    words = [
        "smith", "schmidt", "jose", "san jacinto", "caesar", "chianti",
        "michael", "czerny", "focaccia", "bellocchio", "bacchus", "accident",
        "succeed", "bertucci", "mac caffrey", "edge", "ghislane", "hugh",
        "laugh", "mclaughlin", "cagney", "tagliaro", "biaggi", "yankelovich",
        "bajador", "cabrillo", "gallegos", "dumb", "campbell", "raspberry",
        "rogier", "hochmeier", "island", "sugar", "school", "schooner",
        "schermerhorn", "resnais", "artois", "thomas", "wasserman", "arnow",
        "filipowicz", "breaux", "zhao", "xavier", "knight", "gnome", "wrack",
        "psalm", "agh", "oghi",
    ]
    for w in words:
        assert double_metaphone(w) == ref(w), w


def test_filter_analog():
    from whoosh.analysis import DoubleMetaphoneFilter, RegexTokenizer

    ana = RegexTokenizer() | DoubleMetaphoneFilter()
    text = "smith katherine filipowicz"
    ref = [(t.text, t.boost) for t in ana(text.upper())]
    got = dmetaphone_tokens(text.upper().split())
    assert got == ref
    # combine mode keeps originals
    ana2 = RegexTokenizer() | DoubleMetaphoneFilter(combine=True)
    ref2 = [(t.text, t.boost) for t in ana2(text.upper())]
    assert dmetaphone_tokens(text.upper().split(), combine=True) == ref2
