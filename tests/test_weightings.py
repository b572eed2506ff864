"""All weighting models produce rank-identical results vs the reference
(models the reference's tests/test_weightings.py sweep)."""

import numpy as np
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.search import Or, Searcher, Term
from whoosh_novo_ray.search.scoring import (
    BM25F,
    DFree,
    Frequency,
    FunctionWeighting,
    PL2,
    ReverseWeighting,
    TFIDF,
)

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")

NAMES = ["bm25f", "tfidf", "frequency", "dfree", "pl2", "reverse"]


def _pair(name):
    import whoosh.scoring as ws

    return {
        "bm25f": (BM25F(), ws.BM25F()),
        "tfidf": (TFIDF(), ws.TF_IDF()),
        "frequency": (Frequency(), ws.Frequency()),
        "dfree": (DFree(), ws.DFree()),
        "pl2": (PL2(), ws.PL2()),
        "reverse": (ReverseWeighting(BM25F()), ws.ReverseWeighting(ws.BM25F())),
    }[name]


@pytest.mark.parametrize("name", NAMES)
def test_model_parity(built_index, reference_index, name):
    from whoosh import query as wq

    if name == "dfree":
        # The reference's DFreeScorer calls parent.weight(), a method that
        # does not exist on its Searcher (its intended statistic is the
        # collection frequency, Searcher.frequency) — patch the oracle so the
        # reference model runs with its documented semantics.
        import whoosh.searching as wsearch

        if not hasattr(wsearch.Searcher, "weight"):
            wsearch.Searcher.weight = lambda self, fieldname, text: self.reader().frequency(
                fieldname, text
            )
        # PL2Scorer calls parent.frequency(), also missing on Searcher
        if not hasattr(wsearch.Searcher, "frequency"):
            wsearch.Searcher.frequency = (
                lambda self, fieldname, text: self.reader().frequency(fieldname, text)
            )

    mine_w, ref_w = _pair(name)
    s = Searcher(built_index, weighting=mine_w)
    with reference_index.searcher(weighting=ref_w) as ref_s:
        # single-term: direct rank-identity vs the reference
        r = ref_s.search(wq.Term("text", "search"), limit=10, optimize=False)
        ref = [(hit["doc_id"], r.score(j)) for j, hit in enumerate(r)]
        mine_t = s.search(Term("search"), limit=10)
        got = list(zip(mine_t["doc_id"].to_pylist(), mine_t["score"].to_pylist()))
        assert [d for d, _ in got] == [d for d, _ in ref], name
        assert [x for _, x in got] == pytest.approx([x for _, x in ref], rel=1e-9)

        # OR: oracle = sum of the reference's own single-term scores. (The
        # reference's OR matcher mis-iterates under PL2-style scorers — its
        # top-k collapses to low doc ids only — so its raw OR output can't be
        # trusted for every model; its documented semantics is summation.)
        ra = ref_s.search(wq.Term("text", "search"), limit=None, optimize=False)
        rb = ref_s.search(wq.Term("text", "data"), limit=None, optimize=False)
        sa = {h["doc_id"]: ra.score(j) for j, h in enumerate(ra)}
        sb = {h["doc_id"]: rb.score(j) for j, h in enumerate(rb)}
        expect = {d: sa.get(d, 0.0) + sb.get(d, 0.0) for d in set(sa) | set(sb)}
        ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        mine_t = s.search(Or(Term("search"), Term("data")), limit=10)
        got = list(zip(mine_t["doc_id"].to_pylist(), mine_t["score"].to_pylist()))
        assert [d for d, _ in got] == [d for d, _ in ranked], name
        assert [x for _, x in got] == pytest.approx(
            [x for _, x in ranked], rel=1e-9
        ), name


def test_function_weighting(built_index):
    fw = FunctionWeighting(lambda tfs, lens, stats: np.asarray(tfs, float) * 2.0)
    s = Searcher(built_index, weighting=fw)
    r = s.search(Term("search"), limit=5)
    s2 = Searcher(built_index, weighting=Frequency())
    r2 = s2.search(Term("search"), limit=5)
    assert r["doc_id"].to_pylist() == r2["doc_id"].to_pylist()
    assert [x / 2 for x in r["score"].to_pylist()] == r2["score"].to_pylist()
