"""FilterCollector parity (reference collectors.py:659-763 +
Searcher.search(filter=, mask=), searching.py:784-800): allow/restrict sets
applied before collection, as queries or set-likes, including the falsy
bypass quirk (an EMPTY set-like disables filtering; a query matching nothing
filters out everything).

Reference docnums equal our doc_ids here because the conftest corpus is
added in doc_id order (0..n-1).
"""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.search import And, Or, Searcher, Term
from whoosh_novo_ray.search.query import NullQuery

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")


@pytest.fixture(scope="module")
def searcher(built_index):
    return Searcher(built_index)


def _ref(ref_searcher, wq_query, limit, **kw):
    r = ref_searcher.search(wq_query, limit=limit, **kw)
    return [(hit["doc_id"], r.score(i)) for i, hit in enumerate(r)]


def _mine(searcher, q, limit, **kw):
    t = searcher.search(q, limit=limit, **kw).to_pydict()
    return list(zip(t["doc_id"], t["score"]))


def _check(mine, ref):
    assert [d for d, _ in mine] == [d for d, _ in ref]
    assert [s for _, s in mine] == pytest.approx([s for _, s in ref], rel=1e-9)


@pytest.mark.parametrize("limit", [5, 10, 50])
def test_filter_query(searcher, reference_searcher, limit):
    from whoosh import query as wq

    _check(
        _mine(searcher, Or(Term("search"), Term("data")), limit, filter=Term("web")),
        _ref(
            reference_searcher,
            wq.Or([wq.Term("text", "search"), wq.Term("text", "data")]),
            limit,
            filter=wq.Term("text", "web"),
        ),
    )


def test_mask_query(searcher, reference_searcher):
    from whoosh import query as wq

    _check(
        _mine(searcher, Or(Term("search"), Term("data")), 10, mask=Term("index")),
        _ref(
            reference_searcher,
            wq.Or([wq.Term("text", "search"), wq.Term("text", "data")]),
            10,
            mask=wq.Term("text", "index"),
        ),
    )


def test_filter_and_mask_together(searcher, reference_searcher):
    from whoosh import query as wq

    _check(
        _mine(
            searcher,
            Or(Term("search"), Term("data"), Term("page")),
            10,
            filter=Term("web"),
            mask=Term("index"),
        ),
        _ref(
            reference_searcher,
            wq.Or(
                [
                    wq.Term("text", "search"),
                    wq.Term("text", "data"),
                    wq.Term("text", "page"),
                ]
            ),
            10,
            filter=wq.Term("text", "web"),
            mask=wq.Term("text", "index"),
        ),
    )


def test_filter_as_set(searcher, reference_searcher):
    from whoosh import query as wq

    allow = set(range(0, 400, 3))
    _check(
        _mine(searcher, Term("search"), 10, filter=allow),
        _ref(reference_searcher, wq.Term("text", "search"), 10, filter=allow),
    )


def test_mask_as_set(searcher, reference_searcher):
    from whoosh import query as wq

    restrict = set(range(0, 400, 2))
    _check(
        _mine(searcher, Term("search"), 10, mask=restrict),
        _ref(reference_searcher, wq.Term("text", "search"), 10, mask=restrict),
    )


def test_empty_set_bypass_quirk(searcher, reference_searcher):
    """Reference FilterCollector.prepare: ``ftc(allow) if allow else None``
    — an empty allow SET is falsy, so filtering is disabled (everything
    matches), unlike a query that matches nothing."""
    from whoosh import query as wq

    mine = _mine(searcher, Term("search"), 10, filter=set())
    ref = _ref(reference_searcher, wq.Term("text", "search"), 10, filter=set())
    _check(mine, ref)
    assert mine == _mine(searcher, Term("search"), 10)  # truly unfiltered


def test_filter_matching_nothing_filters_everything(searcher, reference_searcher):
    from whoosh import query as wq

    mine = _mine(searcher, Term("search"), 10, filter=Term("zzzznope"))
    ref = _ref(
        reference_searcher,
        wq.Term("text", "search"),
        10,
        filter=wq.Term("text", "zzzznope"),
    )
    assert mine == [] and ref == []


def test_nullquery_filter_bypasses(searcher):
    assert _mine(searcher, Term("search"), 10, filter=NullQuery()) == _mine(
        searcher, Term("search"), 10
    )


def test_filter_as_results_table(searcher):
    """A prior search's result table works as an allow set (the reference
    accepts a Results object)."""
    prior = searcher.search(Term("web"), limit=None)
    assert _mine(searcher, Term("search"), 10, filter=prior) == _mine(
        searcher, Term("search"), 10, filter=Term("web")
    )


def test_set_form_equals_query_form(searcher):
    docset = searcher.search(Term("web"), limit=None)["doc_id"].to_numpy(
        zero_copy_only=False
    )
    assert _mine(searcher, And(Term("search"), Term("data")), 20, filter=docset) == _mine(
        searcher, And(Term("search"), Term("data")), 20, filter=Term("web")
    )


# -- pooled path -------------------------------------------------------------


@pytest.fixture(scope="module")
def spool(ray_session, built_index):
    from whoosh_novo_ray.state.score_pool import ScorePool

    pool = ScorePool(built_index.path, num_actors=2, num_shards=4)
    yield pool
    pool.shutdown()


def _tbl_rows(t: pa.Table):
    d = t.to_pydict()
    return list(zip(d["doc_id"], d["score"]))


def test_pool_filter_query_matches_local(spool, searcher):
    q = Or(Term("search"), Term("data"))
    local = searcher.search(q, limit=10, filter=Term("web"), mask=Term("index"))
    pooled = spool.search(q, limit=10, filter=Term("web"), mask=Term("index"))
    assert _tbl_rows(local) == _tbl_rows(pooled)


def test_pool_filter_large_id_array(spool, searcher):
    """Array big enough to take the ray.put shared-object path."""
    allow = np.arange(0, 400, 2, dtype=np.uint64)
    big = np.concatenate([allow, np.arange(1_000_000, 1_020_000, dtype=np.uint64)])
    assert big.nbytes > 65536
    local = searcher.search(Term("search"), limit=10, filter=allow)
    pooled = spool.search(Term("search"), limit=10, filter=big)
    assert _tbl_rows(local) == _tbl_rows(pooled)


def test_pool_filter_deadline_path(spool, searcher):
    from whoosh_novo_ray.search.wand import TimeLimit

    q = Or(Term("search"), Term("data"))
    local = searcher.search(q, limit=10, filter=Term("web"))
    try:
        pooled = spool.search(q, limit=10, filter=Term("web"), timelimit=30.0)
    except TimeLimit as e:  # pragma: no cover - generous budget
        pooled = e.partial
    assert _tbl_rows(local) == _tbl_rows(pooled)


def test_pool_filter_async(spool, searcher):
    import ray

    q = Or(Term("search"), Term("page"))
    ref = spool.search_async(q, limit=10, filter=Term("web"))
    local = searcher.search(q, limit=10, filter=Term("web"))
    assert _tbl_rows(ray.get(ref)) == _tbl_rows(local)


# -- filter through the facet / collapse / sorted collector paths -------------


@pytest.fixture(scope="module")
def attrs_parquet(pages_table, tmp_path_factory):
    import pyarrow.parquet as pq

    p = str(tmp_path_factory.mktemp("fattrs") / "attrs.parquet")
    pq.write_table(
        pa.table({"doc_id": pages_table["doc_id"], "lang": pages_table["lang"]}), p
    )
    return p


def test_facet_counts_with_filter_matches_manual(searcher, attrs_parquet):
    from whoosh_novo_ray.search.sorting import FieldFacet, facet_counts
    from whoosh_novo_ray.search.query import Filtered

    q = Term("search")
    filtered = facet_counts(
        searcher, q, FieldFacet(attrs_parquet, "lang"), filter=Term("web")
    ).to_pydict()
    # manual: facet over the explicit intersection query
    manual = facet_counts(
        searcher, Filtered(q, Term("web"), None), FieldFacet(attrs_parquet, "lang")
    ).to_pydict()
    assert filtered == manual
    unfiltered = facet_counts(searcher, q, FieldFacet(attrs_parquet, "lang")).to_pydict()
    assert sum(filtered["count"]) < sum(unfiltered["count"])


def test_pool_facet_counts_with_filter_matches_local(spool, searcher, attrs_parquet):
    from whoosh_novo_ray.search.sorting import FieldFacet, facet_counts

    q = Term("search")
    local = facet_counts(
        searcher, q, FieldFacet(attrs_parquet, "lang"), filter=Term("web"),
        mask=Term("index"),
    ).to_pydict()
    pooled = spool.facet_counts(
        q, attrs_parquet, "lang", filter=Term("web"), mask=Term("index")
    ).to_pydict()
    assert pooled == local


def test_pool_collapse_with_filter_matches_local(spool, searcher, attrs_parquet):
    from whoosh_novo_ray.search.sorting import FieldFacet, collapse_search

    q = Or(Term("search"), Term("data"))
    local = collapse_search(
        searcher, q, FieldFacet(attrs_parquet, "lang"), per_key=2,
        filter=Term("web"),
    ).to_pydict()
    pooled = spool.collapse_search(
        q, attrs_parquet, "lang", per_key=2, filter=Term("web")
    ).to_pydict()
    assert pooled == local
    assert len(local["doc_id"]) > 0


def test_pool_sorted_with_mask_matches_local(spool, searcher, attrs_parquet):
    from whoosh_novo_ray.search.sorting import FieldFacet, sorted_search

    q = Term("search")
    local = sorted_search(
        searcher, q, FieldFacet(attrs_parquet, "lang"), limit=20, mask=Term("web")
    ).to_pydict()
    pooled = spool.sorted_search(
        q, attrs_parquet, "lang", limit=20, mask=Term("web")
    ).to_pydict()
    assert pooled == local


def test_search_page_with_filter(searcher):
    q = Or(Term("search"), Term("data"))
    page = searcher.search_page(q, 2, pagelen=5, filter=Term("web"))
    full = searcher.search(q, limit=None, filter=Term("web"))
    assert page["results"].to_pydict() == full.slice(5, 5).to_pydict()
    assert page["total"] == len(full)


def test_set_form_mask_in_facet_path(searcher, attrs_parquet):
    from whoosh_novo_ray.search.sorting import FieldFacet, facet_counts

    q = Term("search")
    restrict = np.arange(0, 400, 2, dtype=np.uint64)
    a = facet_counts(searcher, q, FieldFacet(attrs_parquet, "lang"), mask=restrict)
    b = facet_counts(searcher, q, FieldFacet(attrs_parquet, "lang"), mask=set(range(0, 400, 2)))
    assert a.to_pydict() == b.to_pydict()
