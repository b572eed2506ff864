"""ColumnQuery / NumericRange / DateRange + Or coordination bonus."""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.search import (
    And,
    ColumnQuery,
    DateRange,
    NumericRange,
    Or,
    Searcher,
    Term,
)


@pytest.fixture(scope="module")
def attrs(pages_table):
    return pa.table(
        {
            "doc_id": pages_table["doc_id"].cast(pa.uint64()),
            "n_chars": pa.array(
                [len(t) for t in pages_table["text"].to_pylist()], pa.int64()
            ),
            "warc_ts": pages_table["warc_ts"],
        }
    )


def test_numeric_range(built_index, attrs, pages_table):
    s = Searcher(built_index)
    q = NumericRange(attrs, "n_chars", 300, 400)
    ids, scores = s.postings(q)
    lens = {d: n for d, n in zip(attrs["doc_id"].to_pylist(), attrs["n_chars"].to_pylist())}
    assert all(300 <= lens[d] <= 400 for d in ids.tolist())
    expect = sorted(d for d, n in lens.items() if 300 <= n <= 400)
    assert ids.tolist() == expect
    assert set(scores.tolist()) == {1.0}


def test_numeric_range_combined_with_term(built_index, attrs):
    s = Searcher(built_index)
    base_ids, base_sc = s.postings(Term("search"))
    q = And(Term("search"), NumericRange(attrs, "n_chars", None, 350))
    ids, _ = s.postings(q)
    lens = dict(zip(attrs["doc_id"].to_pylist(), attrs["n_chars"].to_pylist()))
    assert set(ids.tolist()) == {
        d for d in base_ids.tolist() if lens[d] <= 350
    }


def test_date_range(built_index, attrs):
    s = Searcher(built_index)
    q = DateRange(attrs, "warc_ts", "2025-06-01", "2025-09-01")
    ids, _ = s.postings(q)
    ts = dict(zip(attrs["doc_id"].to_pylist(), attrs["warc_ts"].to_pylist()))
    import datetime

    lo = datetime.datetime(2025, 6, 1)
    hi = datetime.datetime(2025, 9, 1)
    expect = sorted(d for d, t in ts.items() if lo <= t <= hi)
    assert ids.tolist() == expect
    assert len(ids) > 0


def test_column_query_custom_predicate(built_index, attrs):
    s = Searcher(built_index)
    q = ColumnQuery(attrs, "n_chars", lambda v: v % 2 == 0)
    ids, _ = s.postings(q)
    lens = dict(zip(attrs["doc_id"].to_pylist(), attrs["n_chars"].to_pylist()))
    assert all(lens[d] % 2 == 0 for d in ids.tolist())


def test_or_scale_boosts_multi_matches(built_index):
    s = Searcher(built_index)
    plain = s.postings(Or(Term("search"), Term("data")))
    scaled = s.postings(Or(Term("search"), Term("data"), scale=0.5))
    assert plain[0].tolist() == scaled[0].tolist()
    # SQR formula: sqr = (score + (matching-1)/(tc-scale)^2) * ((tc-1)/tc)
    ids, sc, counts = (
        plain[0],
        plain[1],
        None,
    )
    # recompute matching counts
    a = set(s.postings(Term("search"))[0].tolist())
    b = set(s.postings(Term("data"))[0].tolist())
    tc = 2.0
    expect = []
    for d, base in zip(plain[0].tolist(), plain[1].tolist()):
        matching = (d in a) + (d in b)
        expect.append((base + (matching - 1) / (tc - 0.5) ** 2) * ((tc - 1) / tc))
    assert scaled[1].tolist() == pytest.approx(expect)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_or_scale_parity_with_reference(built_index, reference_searcher):
    from whoosh import query as wq

    s = Searcher(built_index)
    mine = s.search(Or(Term("search"), Term("data"), scale=0.5), limit=10)
    r = reference_searcher.search(
        wq.Or([wq.Term("text", "search"), wq.Term("text", "data")], scale=0.5),
        limit=10,
        optimize=False,
    )
    ref = [(h["doc_id"], r.score(i)) for i, h in enumerate(r)]
    got = list(zip(mine["doc_id"].to_pylist(), mine["score"].to_pylist()))
    assert [d for d, _ in got] == [d for d, _ in ref]
    assert [x for _, x in got] == pytest.approx([x for _, x in ref], rel=1e-9)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_or_scale_with_dead_term_parity(built_index, reference_searcher):
    """Regression (ADVICE r01): the SQR termcount counts only LIVE term
    matchers — an unindexed leaf term must not inflate it (reference
    CoordMatcher, matching/wrappers.py:531)."""
    from whoosh import query as wq

    s = Searcher(built_index)
    mine = s.search(
        Or(Term("search"), Term("data"), Term("zzzznope"), scale=0.5), limit=10
    )
    r = reference_searcher.search(
        wq.Or(
            [
                wq.Term("text", "search"),
                wq.Term("text", "data"),
                wq.Term("text", "zzzznope"),
            ],
            scale=0.5,
        ),
        limit=10,
        optimize=False,
    )
    ref = [(h["doc_id"], r.score(i)) for i, h in enumerate(r)]
    got = list(zip(mine["doc_id"].to_pylist(), mine["score"].to_pylist()))
    assert [d for d, _ in got] == [d for d, _ in ref]
    assert [x for _, x in got] == pytest.approx([x for _, x in ref], rel=1e-9)
