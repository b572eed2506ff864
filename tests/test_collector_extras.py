"""Otherwise query, final() scoring hook, search_page, matched_terms."""

import numpy as np
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.search import And, Or, Otherwise, Searcher, Term
from whoosh_novo_ray.search.scoring import BM25F


def test_otherwise_first_matches(built_index):
    s = Searcher(built_index)
    a = s.search(Term("search"), limit=None)
    got = s.search(Otherwise(Term("search"), Term("data")), limit=None)
    assert got.to_pydict() == a.to_pydict()


def test_otherwise_falls_back(built_index):
    s = Searcher(built_index)
    b = s.search(Term("data"), limit=None)
    got = s.search(Otherwise(Term("zzzznope"), Term("data")), limit=None)
    assert got.to_pydict() == b.to_pydict()


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_otherwise_parity(built_index, reference_searcher):
    from whoosh import query as wq

    s = Searcher(built_index)
    for mine, ref in [
        (
            Otherwise(Term("search"), Term("data")),
            wq.Otherwise(wq.Term("text", "search"), wq.Term("text", "data")),
        ),
        (
            Otherwise(Term("zzzznope"), Term("data")),
            wq.Otherwise(wq.Term("text", "zzzznope"), wq.Term("text", "data")),
        ),
    ]:
        r = reference_searcher.search(ref, limit=10, optimize=False)
        exp = [(h["doc_id"], round(r.score(i), 9)) for i, h in enumerate(r)]
        t = s.search(mine, limit=10)
        got = list(
            zip(t["doc_id"].to_pylist(), [round(x, 9) for x in t["score"].to_pylist()])
        )
        assert [d for d, _ in got] == [d for d, _ in exp]
        assert [x for _, x in got] == pytest.approx([x for _, x in exp], rel=1e-9)


def test_final_hook(built_index):
    class EvenDocBoost(BM25F):
        use_final = True

        def final(self, searcher, doc_ids, scores):
            return np.where(doc_ids % 2 == 0, scores * 2.0, scores)

    s_plain = Searcher(built_index)
    s_hook = Searcher(built_index, weighting=EvenDocBoost())
    base = s_plain.search(Term("search"), limit=None)
    hooked = s_hook.search(Term("search"), limit=None)
    exp = {
        d: (sc * 2.0 if d % 2 == 0 else sc)
        for d, sc in zip(base["doc_id"].to_pylist(), base["score"].to_pylist())
    }
    got = dict(zip(hooked["doc_id"].to_pylist(), hooked["score"].to_pylist()))
    assert got == pytest.approx(exp)
    # ranking reflects the adjusted scores
    sc = hooked["score"].to_pylist()
    assert sc == sorted(sc, reverse=True)


def test_search_page(built_index):
    s = Searcher(built_index)
    full = s.search(Or(Term("search"), Term("data")), limit=None)
    total = len(full)
    p1 = s.search_page(Or(Term("search"), Term("data")), 1, pagelen=7)
    p2 = s.search_page(Or(Term("search"), Term("data")), 2, pagelen=7)
    assert p1["total"] == total
    assert p1["pagecount"] == -(-total // 7)
    assert p1["results"]["doc_id"].to_pylist() == full["doc_id"].to_pylist()[:7]
    assert p2["results"]["doc_id"].to_pylist() == full["doc_id"].to_pylist()[7:14]
    # past-the-end clamps to the last page
    last = s.search_page(Or(Term("search"), Term("data")), 10**6, pagelen=7)
    assert last["pagenum"] == last["pagecount"]
    assert last["is_last_page"]
    rem = total - (last["pagecount"] - 1) * 7
    assert len(last["results"]) == rem


def test_matched_terms(built_index, pages_table):
    from whoosh_novo_ray.analysis import StandardAnalyzer

    s = Searcher(built_index)
    q = Or(Term("search"), Term("data"))
    mt = s.matched_terms(q)
    ana = StandardAnalyzer()
    for t in ["search", "data"]:
        expect = sorted(
            int(d)
            for d, txt in zip(
                pages_table["doc_id"].to_pylist(), pages_table["text"].to_pylist()
            )
            if t in ana(txt)
        )
        assert mt[t].tolist() == expect


def test_search_page_matches_reference(built_index, reference_searcher):
    """Page slices equal the reference's ResultsPage hits (ids + scores),
    including the long tail page and an out-of-range page."""
    from tests.conftest import HAVE_REFERENCE

    if not HAVE_REFERENCE:
        pytest.skip("reference not available")
    from whoosh import query as wq

    s = Searcher(built_index)
    mq = Or(Term("search"), Term("data"), Term("index"))
    rq = wq.Or([wq.Term("text", "search"), wq.Term("text", "data"), wq.Term("text", "index")])
    for pagenum, pagelen in ((1, 7), (2, 7), (3, 10), (40, 10)):
        rp = reference_searcher.search_page(rq, pagenum, pagelen=pagelen, optimize=False)
        ref = [(h["doc_id"], rp.results.score(rp.offset + j)) for j, h in enumerate(rp)]
        page = s.search_page(mq, pagenum, pagelen=pagelen)["results"]
        mine = list(zip(page["doc_id"].to_pylist(), page["score"].to_pylist()))
        assert [d for d, _ in mine] == [d for d, _ in ref], (pagenum, pagelen)
        assert [x for _, x in mine] == pytest.approx([x for _, x in ref], rel=1e-9)


def test_matched_terms_matches_reference(built_index, reference_searcher):
    """matched_terms equals the reference TermsCollector's docterms map."""
    from tests.conftest import HAVE_REFERENCE

    if not HAVE_REFERENCE:
        pytest.skip("reference not available")
    from whoosh import query as wq
    from whoosh.collectors import TermsCollector, UnlimitedCollector

    s = Searcher(built_index)
    for mq, rq in [
        (
            Or(Term("search"), Term("data")),
            wq.Or([wq.Term("text", "search"), wq.Term("text", "data")]),
        ),
        (
            And(Term("search"), Term("data")),
            wq.And([wq.Term("text", "search"), wq.Term("text", "data")]),
        ),
    ]:
        tc = TermsCollector(UnlimitedCollector())
        reference_searcher.search_with_collector(rq, tc)
        r = tc.results()
        docnum_to_id = {h.docnum: h["doc_id"] for h in r}
        ref: dict[str, set] = {}
        for docnum, terms in tc.docterms.items():
            for _f, t in terms:
                ref.setdefault(t.decode(), set()).add(docnum_to_id[docnum])
        mine = {t: set(ids.tolist()) for t, ids in s.matched_terms(mq).items()}
        assert mine == ref
