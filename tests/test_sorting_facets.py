"""Faceting / sorted search / collapse semantics (reference sorting.py +
FacetCollector/SortingCollector/CollapseCollector analogs)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from whoosh_novo_ray.analysis import StandardAnalyzer
from whoosh_novo_ray.search import Or, Searcher, Term
from whoosh_novo_ray.search.sorting import (
    FieldFacet,
    FunctionFacet,
    QueryFacet,
    RangeFacet,
    collapse_search,
    facet_counts,
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
