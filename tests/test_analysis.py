"""Analyzer parity: our vectorized chain vs the reference StandardAnalyzer."""

import random

import numpy as np
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.analysis import StandardAnalyzer, simple_analyzer

ANA = StandardAnalyzer()


def test_docstring_examples():
    # reference analyzers.py docstrings
    assert ANA("Testing is testing and testing") == ["testing", "testing", "testing"]
    assert simple_analyzer()("Hello there, this is a TEST") == [
        "hello",
        "there",
        "this",
        "is",
        "a",
        "test",
    ]


def test_tokenizer_special_tokens():
    assert ANA("hi there 3.141 big-time under_score") == [
        "hi",
        "there",
        "3.141",
        "big",
        "time",
        "under_score",
    ]
    assert ANA("*star* a.b.c X") == ["*star*", "a.b.c"]


def test_stop_and_minsize():
    assert ANA("The the a an x yz") == ["yz"]
    assert ANA("") == []


def test_batch_equals_single():
    texts = ["Hello WORLD this is x", "", "the the the", "a.b c.d 1 22"]
    b = ANA.analyze_batch(texts)
    flat = []
    for i, t in enumerate(texts):
        flat.extend((i, tok) for tok in ANA(t))
    assert list(zip(b.doc_idx.tolist(), b.tokens.tolist())) == flat
    assert b.field_lengths.tolist() == [len(ANA(t)) for t in texts]


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not available")
def test_differential_vs_reference():
    from whoosh.analysis import StandardAnalyzer as RefSA

    ref = RefSA()
    random.seed(1234)
    vocab = [
        "the", "a", "apple", "Banana", "x", "YZ", "3.14", "under_score",
        "big-time", "café", "*glob*", "don't", "end.", "of", "to", "in",
        "CamelCase", "...", "--", "a.b.c.d", "42", "naïve",
    ]
    for _ in range(300):
        t = " ".join(random.choices(vocab, k=random.randrange(0, 50)))
        expected = [(tok.text, tok.pos) for tok in ref(t, positions=True)]
        b = ANA.analyze_batch([t])
        got = list(zip(b.tokens.tolist(), b.pos.tolist()))
        assert got == expected, t


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not available")
def test_differential_length_changing_lower():
    """Regression (ADVICE r01): tokenize-then-lowercase order. For 'İ'
    str.lower() grows the string ('i' + combining dot), so lowering the
    whole text first would split the \\w+ match and diverge."""
    from whoosh.analysis import StandardAnalyzer as RefSA

    ref = RefSA()
    cases = [
        "İstanbul is big",
        "the İİ doubled",
        "mixİed İn middle",
        "ẞharp and İ and ǅigraph",
    ]
    for t in cases:
        expected = [(tok.text, tok.pos) for tok in ref(t, positions=True)]
        b = ANA.analyze_batch([t])
        got = list(zip(b.tokens.tolist(), b.pos.tolist()))
        assert got == expected, t
        assert b.field_lengths.tolist() == [len(expected)]


def test_chars_spans_index_original_text():
    """with_chars offsets must index the ORIGINAL text even when lowering
    changes token length."""
    t = "İstanbul CITY"
    di, codes, uniq, pos, fl, sc, ec = ANA.analyze_batch_coded(
        [t], with_chars=True
    )
    toks = uniq[codes].tolist()
    for tok, s, e in zip(toks, sc.tolist(), ec.tolist()):
        assert t[s:e].lower() == tok
