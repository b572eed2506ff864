"""Sphinx charset table parsing + CharsetAnalyzer — differential vs the
reference's charset_table_to_dict / CharsetTokenizer."""

import random

import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.charsets import (
    CharsetAnalyzer,
    default_charmap,
    parse_charset_table,
)


def test_parse_forms():
    d = parse_charset_table("a..z, A..Z->a..z, U+00C0->a, 0..9, _")
    assert d[ord("a")] == "a" and d[ord("z")] == "z"
    assert d[ord("A")] == "a" and d[ord("Z")] == "z"
    assert d[0xC0] == "a"
    assert d[ord("5")] == "5" and d[ord("_")] == "_"
    assert ord(" ") not in d


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_default_table_matches_reference():
    from whoosh.support.charset import charset_table_to_dict, default_charset

    ref = {
        k: v for k, v in charset_table_to_dict(default_charset).items()
        if v is not None
    }
    mine = default_charmap()
    assert mine == ref


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_charset_analyzer_differential():
    """Token-stream parity with the reference CharsetTokenizer.

    REFERENCE BUG: the reference emits its FINAL token as the raw original
    slice (untranslated / not case-folded), contradicting both its documented
    semantics and its own doctest ('Straße ABC' -> ['strase', 'ABC'] instead
    of the documented ['strase', 'abc']). We implement the documented
    behavior; a trailing separator sidesteps the bug for comparison."""
    import collections

    from whoosh.analysis import CharsetTokenizer
    from whoosh.support.charset import charset_table_to_dict, default_charset

    refmap = collections.defaultdict(
        lambda: None, charset_table_to_dict(default_charset)
    )
    ct = CharsetTokenizer(refmap)
    ana = CharsetAnalyzer()
    rng = random.Random(3)
    pool = "aAzZ09 äÄßçÇ北京łŁóÓźŹ.,!-_éÉАБαΑ \t\n"
    for _ in range(1500):
        t = "".join(rng.choices(pool, k=rng.randrange(0, 40))) + " "
        assert ana(t) == [tok.text for tok in ct(t)], repr(t)
    assert ana("Straße ABC") == ["strase", "abc"]
    assert ana("café Über naïve") == ["cafe", "uber", "naive"]


def test_charset_analyzer_in_index(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from whoosh_novo_ray.search import Searcher, Term
    from whoosh_novo_ray.index import Index
    from whoosh_novo_ray.index.build import IndexConfig

    texts = ["Straße und Häuser", "der Fluß läuft", "STRASE exact match"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.uint64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    from whoosh_novo_ray.index import build_index

    cfg = IndexConfig(analyzer=CharsetAnalyzer(), num_buckets=2)
    out = str(tmp_path / "csidx")
    build_index(ray.data.from_arrow(tbl), out, cfg, lineage="cs")
    idx = Index(out)
    assert type(idx.cfg.analyzer).__name__ == "CharsetAnalyzer"  # manifest RT
    s = Searcher(idx)
    ids, _ = s.postings(Term("strase"))
    assert ids.tolist() == [0, 2]  # 'Straße' folds to 'strase' (ß->s in the table)
