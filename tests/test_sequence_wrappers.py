"""Sequence / Ordered subquery adjacency, ConstantScore / WeightingQuery
wrappers, and per-document boost — differential where the reference can
express the same query."""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.analysis import StandardAnalyzer
from whoosh_novo_ray.index import Index, IndexConfig, build_index
from whoosh_novo_ray.search import (
    ConstantScore,
    Or,
    Ordered,
    Phrase,
    Prefix,
    Searcher,
    Sequence,
    Term,
    WeightingQuery,
)
from whoosh_novo_ray.search.scoring import TFIDF


def test_sequence_of_terms_equals_phrase(built_index):
    s = Searcher(built_index)
    a = s.search(Phrase(["search", "data"]), limit=None)
    b = s.search(Sequence(Term("search"), Term("data")), limit=None)
    assert a.to_pydict() == b.to_pydict()
    a2 = s.search(Phrase(["search", "data"], slop=2), limit=None)
    b2 = s.search(Sequence(Term("search"), Term("data"), slop=2), limit=None)
    assert a2.to_pydict() == b2.to_pydict()


def _ref_topk(reference_searcher, rq, limit=1000):
    """replace=0 collector: cadence-free reference scores (see the note in
    tests/test_query_fuzz._ref_search)."""
    from whoosh.collectors import TopCollector

    c = TopCollector(limit=limit, usequality=False, replace=0)
    reference_searcher.search_with_collector(rq, c)
    r = c.results()
    return [(h["doc_id"], r.score(j)) for j, h in enumerate(r)]


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_sequence_with_prefix_rank_parity(built_index, reference_searcher):
    from whoosh import query as wq

    s = Searcher(built_index)
    mine = s.search(Sequence(Term("search"), Prefix("dat")), limit=1000)
    rq = wq.Sequence([wq.Term("text", "search"), wq.Prefix("text", "dat")])
    ref = _ref_topk(reference_searcher, rq)
    assert mine["doc_id"].to_pylist() == [d for d, _ in ref]
    assert mine["score"].to_pylist() == pytest.approx(
        [sc for _, sc in ref], rel=1e-9
    )


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_ordered_rank_parity(built_index, reference_searcher):
    from whoosh import query as wq

    s = Searcher(built_index)
    mine = s.search(Ordered(Term("search"), Term("data")), limit=1000)
    rq = wq.Ordered([wq.Term("text", "search"), wq.Term("text", "data")])
    ref = _ref_topk(reference_searcher, rq)
    assert mine["doc_id"].to_pylist() == [d for d, _ in ref]
    assert mine["score"].to_pylist() == pytest.approx(
        [sc for _, sc in ref], rel=1e-9
    )


def test_constant_score_wrapper(built_index):
    s = Searcher(built_index)
    base = s.search(Or(Term("search"), Term("data")), limit=None)
    cs = s.search(ConstantScore(Or(Term("search"), Term("data")), 2.5), limit=None)
    assert sorted(cs["doc_id"].to_pylist()) == sorted(base["doc_id"].to_pylist())
    assert set(cs["score"].to_pylist()) == {2.5}


def test_weighting_query_wrapper(built_index):
    s = Searcher(built_index)
    via_wrapper = s.search(WeightingQuery(Term("search"), TFIDF()), limit=None)
    direct = Searcher(built_index, weighting=TFIDF()).search(
        Term("search"), limit=None
    )
    assert via_wrapper.to_pydict() == direct.to_pydict()
    # differs from BM25 scoring
    bm25 = s.search(Term("search"), limit=None)
    assert via_wrapper["score"].to_pylist() != bm25["score"].to_pylist()


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_doc_boost_rank_parity(ray_session, tmp_path):
    """IndexConfig.boost_col multiplies every posting weight of a doc —
    the reference's _<field>_boost kwarg."""
    import ray.data

    from whoosh import index as windex
    from whoosh import query as wq
    from whoosh.fields import NUMERIC, TEXT, Schema

    texts = [
        "apple banana cherry",
        "apple apple banana",
        "cherry banana apple",
        "banana date apple",
    ]
    boosts = [1.0, 3.0, 0.5, 2.0]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.uint64()),
            "text": pa.array(texts, pa.string()),
            "b": pa.array(boosts, pa.float64()),
        }
    )
    out = str(tmp_path / "bidx")
    cfg = IndexConfig(
        analyzer=StandardAnalyzer(stoplist=None, minsize=1),
        with_weights=True,
        boost_col="b",
        num_buckets=2,
    )
    build_index(ray.data.from_arrow(tbl), out, cfg, lineage="b")
    s = Searcher(Index(out))

    refdir = str(tmp_path / "ref")
    import os

    os.makedirs(refdir)
    from whoosh.analysis import StandardAnalyzer as WSA

    schema = Schema(
        doc_id=NUMERIC(stored=True, bits=64),
        text=TEXT(analyzer=WSA(stoplist=None, minsize=1), phrase=False),
    )
    ix = windex.create_in(refdir, schema)
    w = ix.writer()
    for did, text, b in zip(
        tbl["doc_id"].to_pylist(), tbl["text"].to_pylist(), boosts
    ):
        w.add_document(doc_id=did, text=text, _text_boost=b)
    w.commit()
    with ix.searcher() as ws:
        for term in ["apple", "banana", "cherry"]:
            r = ws.search(wq.Term("text", term), limit=10, optimize=False)
            ref = [(h["doc_id"], round(r.score(i), 6)) for i, h in enumerate(r)]
            mine = s.search(Term(term), limit=10)
            got = list(
                zip(
                    mine["doc_id"].to_pylist(),
                    [round(x, 6) for x in mine["score"].to_pylist()],
                )
            )
            assert got == ref, (term, got, ref)


def test_constantscore_zero_scores_one(built_index):
    """Reference quirk (matching/mcore.py ListMatcher.weight): a falsy
    all_weights (score=0) falls through to the 1.0 default, so
    ConstantScoreQuery(child, 0) scores every matching doc 1.0."""
    s = Searcher(built_index)
    zero = s.search(ConstantScore(Term("search"), score=0.0), limit=None)
    one = s.search(ConstantScore(Term("search"), score=1.0), limit=None)
    assert zero.to_pydict() == one.to_pydict()
    assert len(zero) > 0
    assert set(zero["score"].to_pylist()) == {1.0}
    # non-zero scores are untouched
    neg = s.search(ConstantScore(Term("search"), score=-0.5), limit=None)
    assert set(neg["score"].to_pylist()) == {-0.5}


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_constantscore_zero_differential(built_index, reference_searcher):
    from whoosh import query as wq

    s = Searcher(built_index)
    mine = s.search(
        Or(ConstantScore(Term("search"), 0.0), Term("data")), limit=1000
    )
    rq = wq.Or(
        [
            wq.ConstantScoreQuery(wq.Term("text", "search"), 0.0),
            wq.Term("text", "data"),
        ]
    )
    ref = _ref_topk(reference_searcher, rq)
    assert mine["doc_id"].to_pylist() == [d for d, _ in ref]
    assert mine["score"].to_pylist() == pytest.approx(
        [sc for _, sc in ref], rel=1e-9
    )
