"""Differential parity for the standalone Lovins and Paice-Husk stemmers
(reference lang/lovins.py, lang/paicehusk.py).

Both reference modules crash on real inputs (IndexError / ValueError — see
the module docstrings); we assert word-for-word parity wherever the
reference returns, and pin our graceful behavior where it raises."""

import random
import string

import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.lang_lovins import stem as lovins_stem
from whoosh_novo_ray.lang_paicehusk import PaiceHuskStemmer
from whoosh_novo_ray.lang_paicehusk import stem as ph_stem

# suffixes drawn from both rule tables so the fuzz actually exercises them
_SUFFIXES = [
    "ization", "izations", "ational", "ically", "fulness", "ousness",
    "iveness", "ability", "ication", "entation", "alistically",
    "arizability", "ing", "ings", "ness", "ously", "ed", "es", "s", "er",
    "ers", "ies", "ied", "ily", "ity", "ities", "ful", "less", "ment",
    "ments", "ship", "hood", "ally", "ative", "ator", "ators", "ish",
    "ism", "ist", "ists", "ite", "ive", "ize", "ized", "izer", "yl",
    "um", "us", "on", "or", "ar", "al", "en", "ia", "ic", "is", "ly",
    "a", "e", "i", "o", "y", "'s", "s'",
    # shapes that hit the recode / protect rules
    "iev", "uct", "umpt", "rpt", "urs", "istr", "metr", "olv", "ex",
    "uad", "end", "ond", "mit", "ert", "yt", "yz", "een", "ear", "ss",
    "ply", "sist", "bb", "dd", "tt", "ytic", "guish", "ief",
]

_STEMS = [
    "nation", "triplic", "analyt", "believ", "conduc", "consum",
    "decid", "magnes", "sit", "run", "happi", "class", "doubt",
    "index", "matr", "absorb", "permit", "revolv", "rhythm", "s",
    "qu", "str", "x", "zz", "proceed", "screen", "spl", "appear",
]


def _wordlist(n=30000, seed=77):
    rng = random.Random(seed)
    words = set()
    for _ in range(n):
        kind = rng.random()
        if kind < 0.45:
            w = rng.choice(_STEMS) + rng.choice(_SUFFIXES)
        elif kind < 0.75:
            w = (
                "".join(rng.choice("abcdefghilmnoprstuvy") for _ in range(rng.randint(1, 8)))
                + rng.choice(_SUFFIXES)
            )
        else:
            w = "".join(
                rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 14))
            )
        if rng.random() < 0.05:
            w = rng.choice(
                ["kilo", "micro", "milli", "intra", "ultra", "mega", "nano", "pico", "pseudo"]
            ) + w
        words.add(w)
    return sorted(words)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_lovins_differential_fuzz():
    from whoosh.lang.lovins import stem as ref_stem

    raised = matched = 0
    for w in _wordlist():
        try:
            want = ref_stem(w)
        except IndexError:
            raised += 1
            lovins_stem(w)  # ours must not crash
            continue
        assert lovins_stem(w) == want, w
        matched += 1
    assert matched > 10000  # the fuzz really compared things
    assert raised > 0  # and really hit the reference crash shapes


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_paicehusk_differential_fuzz():
    from whoosh.lang.paicehusk import stem as ref_stem

    raised = matched = 0
    for w in _wordlist(seed=78):
        try:
            want = ref_stem(w)
        except ValueError:
            raised += 1
            ph_stem(w)  # ours must not crash
            continue
        assert ph_stem(w) == want, w
        matched += 1
    assert matched > 10000
    assert raised > 0


def test_lovins_known_words():
    assert lovins_stem("nationally") == "nat"
    assert lovins_stem("triplicate") == "triplic"
    assert lovins_stem("analytical") == "analys"  # recode yt -> ys
    assert lovins_stem("receive") == "rece"
    assert lovins_stem("sitting") == "sit"  # undouble tt
    assert lovins_stem("magnesia") == "magnes"
    assert lovins_stem("proceed") == "proceed"
    # graceful where the reference raises IndexError:
    assert lovins_stem("soar") == "soar"  # condition X on 2-char base
    assert lovins_stem("ends") == "ens"  # recode-except underflow
    assert lovins_stem("ets") == "es"


def test_paicehusk_known_words():
    assert ph_stem("classified") == "class"
    assert ph_stem("happily") == "happy"
    assert ph_stem("splitting") == "split"
    assert ph_stem("analysis") == "analys"
    assert ph_stem("kilometre") == "met"  # prefix strip + rules
    assert ph_stem("can't") == "can"  # non-word tail dropped
    # the reference's protect-rule quirk (stem[:0] == ""), replicated:
    assert ph_stem("seen") == ""
    assert ph_stem("doubtless") == ""
    # graceful where the reference raises ValueError (vowel-less stem):
    assert ph_stem("rhythm") == "rhythm"
    # published protect semantics behind fixed=True:
    fixed = PaiceHuskStemmer(fixed=True)
    assert fixed.stem("seen") == "seen"
    assert fixed.stem("doubtless") == "doubtless"
    assert fixed.stem("classified") == "class"


def test_stem_filter_pluggable():
    """Both stemmers plug into the analyzer chain via stem_algo, on both the
    single-doc and the vectorized batch paths."""
    import numpy as np

    from whoosh_novo_ray.analysis import StandardAnalyzer

    text = "nationally splitting believable"
    for algo, fn in (("lovins", lovins_stem), ("paicehusk", ph_stem)):
        ana = StandardAnalyzer(stoplist=None, stem_algo=algo)
        want = [fn("nationally"), fn("splitting"), fn("believable")]
        assert ana(text) == want
        batch = ana.analyze_batch([text, "nationally"])
        assert list(batch.tokens[batch.doc_idx == 0]) == want
        assert list(batch.tokens[batch.doc_idx == 1]) == [fn("nationally")]
    # porter stays the stem=True default
    assert StandardAnalyzer(stoplist=None, stem=True, stem_algo="porter")(
        text
    ) == StandardAnalyzer(stoplist=None, stem=True)(text)
