"""Faceting / sorted search / collapse semantics (reference sorting.py +
FacetCollector/SortingCollector/CollapseCollector analogs)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from whoosh_novo_ray.analysis import StandardAnalyzer
from whoosh_novo_ray.search import Or, Searcher, Term
from whoosh_novo_ray.search.sorting import (
    DateRangeFacet,
    FieldFacet,
    FunctionFacet,
    MultiFacet,
    QueryFacet,
    RangeFacet,
    ScoreFacet,
    StoredFieldFacet,
    TranslateFacet,
    collapse_search,
    facet_counts,
    facet_groups,
    sorted_search,
)


@pytest.fixture(scope="module")
def env(built_index, pages_table):
    attrs = pa.table(
        {
            "doc_id": pages_table["doc_id"].cast(pa.uint64()),
            "lang": pages_table["lang"],
            "n": pa.array(
                [len(t) for t in pages_table["text"].to_pylist()], pa.int64()
            ),
        }
    )
    return Searcher(built_index), attrs, pages_table


def _matching_docs(pages, term):
    ana = StandardAnalyzer()
    return [
        int(d)
        for d, t in zip(pages["doc_id"].to_pylist(), pages["text"].to_pylist())
        if term in ana(t)
    ]


def test_field_facet_counts(env):
    s, attrs, pages = env
    got = facet_counts(s, Term("search"), FieldFacet(attrs, "lang")).to_pydict()
    match = set(_matching_docs(pages, "search"))
    df = pd.DataFrame(
        {
            "doc_id": pages["doc_id"].to_pylist(),
            "lang": pages["lang"].to_pylist(),
        }
    )
    expect = df[df.doc_id.isin(match)].groupby("lang").size().to_dict()
    assert dict(zip(got["key"], got["count"])) == expect


def test_range_facet(env):
    s, attrs, pages = env
    got = facet_counts(
        s, Term("search"), RangeFacet(attrs, "n", 0, 1000, 250)
    ).to_pydict()
    assert sum(got["count"]) > 0
    assert all(k.startswith("[") for k in got["key"])


def test_query_facet(env):
    s, attrs, pages = env
    qf = QueryFacet({"has_data": Term("data"), "other": Or(Term("search"))})
    got = facet_counts(s, Term("search"), qf).to_pydict()
    match = set(_matching_docs(pages, "search"))
    withdata = set(_matching_docs(pages, "data"))
    expect = {
        "has_data": len(match & withdata),
        "other": len(match - withdata),
    }
    assert dict(zip(got["key"], got["count"])) == {k: v for k, v in expect.items() if v}


def test_sorted_search_orders_by_key(env):
    s, attrs, pages = env
    r = sorted_search(s, Term("search"), FieldFacet(attrs, "lang")).to_pydict()
    assert r["key"] == sorted(r["key"])
    # doc_id ascending within equal keys
    for k in set(r["key"]):
        ids = [d for d, kk in zip(r["doc_id"], r["key"]) if kk == k]
        assert ids == sorted(ids)
    rev = sorted_search(
        s, Term("search"), FieldFacet(attrs, "lang"), reverse=True
    ).to_pydict()
    assert rev["key"] == sorted(rev["key"], reverse=True)


def test_collapse(env):
    s, attrs, pages = env
    r = collapse_search(s, Term("search"), FieldFacet(attrs, "lang"), per_key=2)
    keys = r["key"].to_pylist()
    assert all(keys.count(k) <= 2 for k in set(keys))
    # kept docs are the best-scoring per key
    full = s.search(Term("search"), limit=None)
    best = {}
    for d, sc in zip(full["doc_id"].to_pylist(), full["score"].to_pylist()):
        lang = dict(
            zip(attrs["doc_id"].to_pylist(), attrs["lang"].to_pylist())
        )[d]
        best.setdefault(lang, []).append((d, sc))
    for k in set(keys):
        expect = [d for d, _ in best[k][:2]]
        got = [d for d, kk in zip(r["doc_id"].to_pylist(), keys) if kk == k]
        assert got == expect


def test_function_facet(env):
    s, attrs, pages = env
    f = FunctionFacet(lambda ids: np.where(ids % 2 == 0, "even", "odd"))
    got = facet_counts(s, Term("search"), f).to_pydict()
    match = _matching_docs(pages, "search")
    assert dict(zip(got["key"], got["count"])) == {
        "even": sum(1 for d in match if d % 2 == 0),
        "odd": sum(1 for d in match if d % 2 == 1),
    }


def test_date_range_facet(env, pages_table):
    import datetime

    s, attrs, pages = env
    attrs2 = pa.table(
        {
            "doc_id": pages["doc_id"].cast(pa.uint64()),
            "warc_ts": pages["warc_ts"],
        }
    )
    f = DateRangeFacet(
        attrs2, "warc_ts", "2025-01-01", "2026-01-01", datetime.timedelta(days=90)
    )
    got = facet_counts(s, Term("search"), f).to_pydict()
    # brute force
    match = set(_matching_docs(pages, "search"))
    ts = dict(zip(pages["doc_id"].to_pylist(), pages["warc_ts"].to_pylist()))
    import collections

    expect = collections.Counter()
    s0 = np.datetime64("2025-01-01", "us").astype(np.int64)
    e0 = np.datetime64("2026-01-01", "us").astype(np.int64)
    gap = 90 * 86400 * 10**6
    for d in match:
        v = np.datetime64(ts[d], "us").astype(np.int64)
        if s0 <= v < e0:
            lo = s0 + ((v - s0) // gap) * gap
            hi = min(lo + gap, e0)
            lab = f"[{np.datetime64(int(lo), 'us')}, {np.datetime64(int(hi), 'us')})"
            expect[lab] += 1
    assert dict(zip(got["key"], got["count"])) == dict(expect)


def test_score_facet_orders_best_first(env):
    s, attrs, pages = env
    t = sorted_search(s, Term("search"), ScoreFacet())
    sc = t["score"].to_pylist()
    assert sc == sorted(sc, reverse=True)
    # ties break by doc_id ascending
    ids = t["doc_id"].to_pylist()
    for i in range(1, len(ids)):
        if sc[i] == sc[i - 1]:
            assert ids[i] > ids[i - 1]


def test_translate_and_stored_field_facets(env):
    s, attrs, pages = env
    base = facet_counts(s, Term("search"), FieldFacet(attrs, "lang")).to_pydict()
    up = facet_counts(
        s, Term("search"), TranslateFacet(str.upper, StoredFieldFacet(attrs, "lang"))
    ).to_pydict()
    assert dict(zip(up["key"], up["count"])) == {
        k.upper(): v for k, v in zip(base["key"], base["count"])
    }


def test_multi_facet(env):
    s, attrs, pages = env
    f = MultiFacet([FieldFacet(attrs, "lang"), FieldFacet(attrs, "n")])
    t = sorted_search(s, Term("search"), f)
    keys = t["key"].to_pylist()
    assert keys == sorted(keys)  # str(tuple) order == tuple order here
    n_by_doc = dict(zip(attrs["doc_id"].to_pylist(), attrs["n"].to_pylist()))
    lang_by_doc = dict(
        zip(attrs["doc_id"].to_pylist(), attrs["lang"].to_pylist())
    )
    got_pairs = [
        (lang_by_doc[d], n_by_doc[d]) for d in t["doc_id"].to_pylist()
    ]
    assert got_pairs == sorted(got_pairs)


def test_facet_groups_ordered_and_best(env):
    s, attrs, pages = env
    f = FieldFacet(attrs, "lang")
    grouped = facet_groups(s, Term("search"), f).to_pydict()
    best = facet_groups(s, Term("search"), f, best_only=True).to_pydict()
    # per key: list head == best doc; list ordered by (score desc, id asc)
    ids_all, scores_all = s.postings(Term("search"))
    smap = dict(zip(ids_all.tolist(), scores_all.tolist()))
    for k, dlist in zip(grouped["key"], grouped["doc_ids"]):
        ranked = sorted(dlist, key=lambda d: (-smap[d], d))
        assert dlist == ranked, k
        bi = best["key"].index(k)
        assert best["doc_id"][bi] == dlist[0]


def test_fieldfacet_from_parquet_path(env, ray_session, tmp_path):
    """A parquet-path FieldFacet streams only the matched rows and produces
    identical results to the in-memory-table form."""
    import pyarrow.parquet as pq

    s, attrs, _pages = env
    p = str(tmp_path / "attrs.parquet")
    pq.write_table(attrs, p)
    q = Term("search")
    t_mem = facet_counts(s, q, FieldFacet(attrs, "lang")).to_pydict()
    t_path = facet_counts(s, q, FieldFacet(p, "lang")).to_pydict()
    assert t_path == t_mem
    s_mem = sorted_search(s, q, FieldFacet(attrs, "n")).to_pydict()
    s_path = sorted_search(s, q, FieldFacet(p, "n")).to_pydict()
    assert s_path == s_mem


def test_fieldfacet_from_parquet_no_matches(env, ray_session, tmp_path):
    import pyarrow.parquet as pq

    s, attrs, _pages = env
    p = str(tmp_path / "attrs.parquet")
    pq.write_table(attrs, p)
    t = facet_counts(s, Term("zzzznope"), FieldFacet(p, "lang"))
    assert len(t) == 0
