"""Differential parity for the standalone Porter2 stemmer (reference
lang/porter2.py).

The module replicates the reference's deviations from the official Snowball
description (regions computed before step 0, non-overlapping Y-marking,
first-match-wins suffix scans) — see the lang_porter2 docstring. The fuzz
asserts word-for-word parity; the known-word cases pin the quirks."""

import random
import string

import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.lang_porter2 import stem as p2_stem

# every suffix in the step 0/1/2/3/4 tables, plus region-exception prefixes
_SUFFIXES = [
    "ization", "ational", "fulness", "ousness", "iveness", "tional",
    "biliti", "lessli", "entli", "ation", "alism", "aliti", "ousli",
    "iviti", "fulli", "enci", "anci", "abli", "izer", "ator", "alli",
    "bli", "ogi", "li", "ing", "ingly", "ed", "edly", "eed", "eedly",
    "ies", "ied", "sses", "ss", "us", "s", "'s", "'s'", "'", "alize",
    "icate", "iciti", "ative", "ical", "ness", "ful", "al", "ance",
    "ence", "er", "ic", "able", "ible", "ant", "ement", "ment", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "sion", "tion", "ll",
    "e", "y", "ey", "ay",
]

_STEMS = [
    "nation", "gener", "arsen", "commun", "hop", "hope", "ski", "sky",
    "die", "tie", "run", "happi", "class", "gas", "atlas", "bias",
    "proceed", "exceed", "inn", "out", "can", "herr", "earr", "succ",
    "y", "ay", "ayy", "x", "", "believ", "conduc", "consum", "decid",
    "luxuri", "log", "controll", "rol",
]


def _wordlist(n=60000, seed=123):
    rng = random.Random(seed)
    words = set()
    for _ in range(n):
        k = rng.random()
        if k < 0.45:
            w = rng.choice(_STEMS) + rng.choice(_SUFFIXES)
        elif k < 0.7:
            w = rng.choice(_STEMS) + rng.choice(_SUFFIXES) + rng.choice(_SUFFIXES)
        elif k < 0.9:
            w = (
                "".join(rng.choice("abcdefghilmnoprstuvwy'") for _ in range(rng.randint(1, 10)))
                + rng.choice(_SUFFIXES)
            )
        else:
            w = "".join(
                rng.choice(string.ascii_lowercase + "'") for _ in range(rng.randint(1, 14))
            )
        words.add(w)
    return sorted(words)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_porter2_differential_fuzz():
    from whoosh.lang.porter2 import stem as ref_stem

    matched = 0
    for w in _wordlist():
        assert p2_stem(w) == ref_stem(w), w
        matched += 1
    assert matched > 30000  # the fuzz really compared things


def test_porter2_known_words():
    # exception lists
    assert p2_stem("skies") == "sky"
    assert p2_stem("dying") == "die"
    assert p2_stem("news") == "news"
    assert p2_stem("inning") == "inning"
    # standard algorithm behavior
    assert p2_stem("nationally") == "nation"
    assert p2_stem("generously") == "generous"
    assert p2_stem("hopping") == "hop"
    assert p2_stem("hoping") == "hope"
    assert p2_stem("luxuriously") == "luxuri"
    assert p2_stem("controlling") == "control"
    assert p2_stem("gas") == "gas"
    # consonant-Y marking: initial y never treated as a vowel
    assert p2_stem("ying") == "ying"
    # porter2 differs from porter1 on these shapes
    assert p2_stem("conspiracy") == "conspiraci"
    assert p2_stem("cry") == "cri"


def test_index_config_persists_stem_algo():
    """stem_algo survives the manifest JSON round-trip, so a porter2/lovins
    index reopened from disk analyzes identically."""
    from whoosh_novo_ray.analysis import StandardAnalyzer
    from whoosh_novo_ray.index.build import IndexConfig

    for algo in ("porter2", "lovins", "paicehusk", None):
        cfg = IndexConfig(analyzer=StandardAnalyzer(stoplist=None, stem_algo=algo))
        back = IndexConfig.from_json(cfg.to_json())
        assert back.analyzer.stem_algo == algo
        if algo:
            assert back.analyzer("nationally hopping") == cfg.analyzer(
                "nationally hopping"
            )


def test_stem_algo_porter2_pluggable():
    """porter2 plugs into the analyzer chain via stem_algo, on both the
    single-doc and the vectorized batch paths."""
    from whoosh_novo_ray.analysis import StandardAnalyzer

    text = "nationally hopping generously"
    ana = StandardAnalyzer(stoplist=None, stem_algo="porter2")
    want = [p2_stem("nationally"), p2_stem("hopping"), p2_stem("generously")]
    assert ana(text) == want
    batch = ana.analyze_batch([text, "hopping"])
    assert list(batch.tokens[batch.doc_idx == 0]) == want
    assert list(batch.tokens[batch.doc_idx == 1]) == [p2_stem("hopping")]
