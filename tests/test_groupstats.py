"""Grouped corpus statistics: per-group caps, exact quantiles, top terms."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.analysis import simple_analyzer
from whoosh_novo_ray.ops.groupstats import (
    cap_per_group,
    exact_quantiles,
    top_terms_per_group,
)


def _table(n=200, seed=3):
    rng = np.random.RandomState(seed)
    groups = [f"g{int(x)}" for x in rng.randint(0, 7, n)]
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(words[i] for i in rng.randint(0, len(words), rng.randint(1, 12)))
        for _ in range(n)
    ]
    vals = rng.randint(0, 40, n).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(groups, pa.string()),
            "n_chars": pa.array(vals),
        }
    )


def _ds(ray, tbl, blocks=7):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


def _collect(ds):
    import ray

    return pa.concat_tables(
        [t for t in ray.get(ds.materialize().to_arrow_refs()) if len(t)]
    )


def test_cap_per_group_keeps_lowest_ids_all_columns(ray_session):
    tbl = _table()
    out = _collect(cap_per_group(_ds(ray_session, tbl), "source", 5)).sort_by(
        "doc_id"
    )
    # expected: per group, the 5 lowest doc_ids, all columns intact
    by_group = collections.defaultdict(list)
    for i, g in enumerate(tbl["source"].to_pylist()):
        by_group[g].append(i)
    expect_ids = sorted(i for ids in by_group.values() for i in sorted(ids)[:5])
    assert out["doc_id"].to_pylist() == expect_ids
    assert set(out.column_names) == {"doc_id", "text", "source", "n_chars"}
    sub = tbl.take(expect_ids)
    for c in ("text", "source", "n_chars"):
        assert out[c].to_pylist() == sub[c].to_pylist()


def test_cap_per_group_block_layout_invariant(ray_session):
    tbl = _table(seed=11)
    a = _collect(cap_per_group(_ds(ray_session, tbl, 3), "source", 2)).sort_by(
        "doc_id"
    )
    b = _collect(cap_per_group(_ds(ray_session, tbl, 13), "source", 2)).sort_by(
        "doc_id"
    )
    assert a.equals(b)


def test_cap_per_group_hot_group_skew(ray_session):
    # one group holds 90% of rows: the pre-cap combiner must not change
    # the result, and the kept set is still the globally lowest ids
    n = 400
    groups = ["hot"] * 360 + [f"g{i % 4}" for i in range(40)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x"] * n, pa.string()),
            "source": pa.array(groups, pa.string()),
            "n_chars": pa.array(np.ones(n, np.int64)),
        }
    )
    out = _collect(cap_per_group(_ds(ray_session, tbl, 9), "source", 7)).sort_by(
        "doc_id"
    )
    by_group = collections.defaultdict(list)
    for i, g in enumerate(groups):
        by_group[g].append(i)
    expect = sorted(i for ids in by_group.values() for i in sorted(ids)[:7])
    assert out["doc_id"].to_pylist() == expect


def test_exact_quantiles_match_numpy_rank_rule(ray_session):
    tbl = _table(seed=5)
    vals = np.sort(tbl["n_chars"].to_numpy())
    qs = (0.0, 0.1, 0.5, 0.9, 1.0)
    out = exact_quantiles(_ds(ray_session, tbl), "n_chars", qs)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    for q in qs:
        assert got[q] == int(vals[int(np.floor(q * (len(vals) - 1)))])


def test_exact_quantiles_duplicate_heavy(ray_session):
    tbl = pa.table(
        {"n_chars": pa.array([7] * 50 + [9] * 10 + [1] * 3, pa.int64())}
    )
    out = exact_quantiles(_ds(ray_session, tbl, 4), "n_chars", (0.0, 0.5, 1.0))
    assert out["value"].to_pylist() == [1, 7, 9]


def test_exact_quantiles_float_column(ray_session):
    vals = np.array([0.5, 1.5, 2.5, 3.5, 100.0])
    tbl = pa.table({"x": pa.array(vals)})
    out = exact_quantiles(_ds(ray_session, tbl, 3), "x", (0.0, 0.5, 1.0))
    assert out["value"].type == pa.float64()
    assert out["value"].to_pylist() == [0.5, 2.5, 100.0]


def test_top_terms_per_group_counts_and_tiebreak(ray_session):
    tbl = _table(seed=8)
    out = _collect(top_terms_per_group(_ds(ray_session, tbl), "source", 3))
    ana = simple_analyzer()
    cnt: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for g, t in zip(tbl["source"].to_pylist(), tbl["text"].to_pylist()):
        cnt[g].update(ana(t))
    expect = []
    for g in sorted(cnt):
        top = sorted(cnt[g].items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        expect.extend((g, term, c) for term, c in top)
    got = sorted(
        zip(
            out["group"].to_pylist(),
            out["term"].to_pylist(),
            out["cnt"].to_pylist(),
        ),
        key=lambda r: (r[0], -r[2], r[1]),
    )
    assert got == expect


def test_distinctive_terms_match_brute_force(ray_session):
    import math

    from whoosh_novo_ray.ops.groupstats import distinctive_terms_per_group

    tbl = _table(seed=13)
    out = _collect(distinctive_terms_per_group(_ds(ray_session, tbl), "source", 3))
    ana = simple_analyzer()
    cg: dict = collections.defaultdict(collections.Counter)
    ca: collections.Counter = collections.Counter()
    for g, t in zip(tbl["source"].to_pylist(), tbl["text"].to_pylist()):
        toks = ana(t)
        cg[g].update(toks)
        ca.update(toks)
    T = sum(ca.values())
    expect = []
    for g in sorted(cg):
        scored = sorted(
            (
                (term, c, c * math.log(T / ca[term]))
                for term, c in cg[g].items()
            ),
            key=lambda r: (-r[2], r[0]),
        )[:3]
        expect.extend((g, term, c, round(s, 6)) for term, c, s in scored)
    got = sorted(
        zip(
            out["group"].to_pylist(),
            out["term"].to_pylist(),
            out["cnt"].to_pylist(),
            out["score"].to_pylist(),
        ),
        key=lambda r: (r[0], -r[3], r[1]),
    )
    assert [(g, t, c) for g, t, c, _ in got] == [
        (g, t, c) for g, t, c, _ in expect
    ]
    for (_g1, _t1, _c1, s1), (_g2, _t2, _c2, s2) in zip(got, expect):
        assert abs(s1 - s2) < 1e-9


def test_top_terms_block_layout_invariant(ray_session):
    tbl = _table(seed=21)
    a = _collect(top_terms_per_group(_ds(ray_session, tbl, 2), "source", 4))
    b = _collect(top_terms_per_group(_ds(ray_session, tbl, 17), "source", 4))
    key = lambda t: sorted(
        zip(t["group"].to_pylist(), t["term"].to_pylist(), t["cnt"].to_pylist())
    )
    assert key(a) == key(b)


def test_pack_gt_no_separator_collision():
    # regression: np.char.add with a '\x00' separator strips the trailing
    # NUL (numpy 'U' padding), so ('ab','c') and ('a','bc') used to pack to
    # the same key and silently merge counts
    from whoosh_novo_ray.ops.groupstats import _pack_gt

    g = np.asarray(["ab", "a"], object)
    t = np.asarray(["c", "bc"], object)
    keys = _pack_gt(g, t)
    assert keys[0] != keys[1]


def test_top_terms_colliding_pack_keys(ray_session):
    # ('a','aaa') and ('aaa','a') concatenate identically AND land in the
    # same md5-xor shard (22) — the exact shape the old string packing
    # merged. Counts must stay separate per (group, term).
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aaa aaa", "a a a"], pa.string()),
            "source": pa.array(["a", "aaa"], pa.string()),
        }
    )
    out = _collect(top_terms_per_group(_ds(ray_session, tbl, 2), "source", 5))
    got = sorted(
        zip(
            out["group"].to_pylist(),
            out["term"].to_pylist(),
            out["cnt"].to_pylist(),
        )
    )
    assert got == [("a", "aaa", 2), ("aaa", "a", 3)]


def test_distinctive_terms_colliding_pack_keys(ray_session):
    # ('a','abn') and ('aab','n') concatenate identically and share the
    # md5(term) shard (26) used by the distinctive-terms global-count path
    import math

    from whoosh_novo_ray.ops.groupstats import distinctive_terms_per_group

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["abn abn", "n n n", "zz"], pa.string()),
            "source": pa.array(["a", "aab", "zz"], pa.string()),
        }
    )
    out = _collect(
        distinctive_terms_per_group(_ds(ray_session, tbl, 2), "source", 5)
    )
    got = {
        (g, t): (c, s)
        for g, t, c, s in zip(
            out["group"].to_pylist(),
            out["term"].to_pylist(),
            out["cnt"].to_pylist(),
            out["score"].to_pylist(),
        )
    }
    T = 6  # abn x2, n x3, zz x1
    assert got[("a", "abn")][0] == 2
    assert got[("aab", "n")][0] == 3
    assert abs(got[("a", "abn")][1] - round(2 * math.log(T / 2), 6)) < 1e-9
    assert abs(got[("aab", "n")][1] - round(3 * math.log(T / 3), 6)) < 1e-9


def test_exact_quantiles_ignores_nulls_and_nans(ray_session):
    tbl = pa.table(
        {
            "x": pa.array(
                [1.0, None, float("nan"), 2.0, 3.0, None, 4.0, 5.0],
                pa.float64(),
            )
        }
    )
    out = exact_quantiles(_ds(ray_session, tbl, 3), "x", (0.0, 0.5, 1.0))
    assert out["value"].to_pylist() == [1.0, 3.0, 5.0]


def test_quantiles_continuous_matches_rank_rule(ray_session):
    from whoosh_novo_ray.ops.groupstats import quantiles_continuous

    rng = np.random.RandomState(7)
    vals = rng.randn(5000) * 100.0 + rng.rand(5000)  # effectively all-distinct
    tbl = pa.table({"x": pa.array(vals, pa.float64())})
    qs = (0.0, 0.01, 0.25, 0.5, 0.77, 0.99, 1.0)
    # tiny exact_cap + buckets force several narrowing rounds
    out = quantiles_continuous(
        _ds(ray_session, tbl, 6), "x", qs, buckets=16, exact_cap=40
    )
    svals = np.sort(vals)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    for q in qs:
        assert got[q] == svals[int(np.floor(q * (len(svals) - 1)))]


def test_quantiles_continuous_skew_and_nulls(ray_session):
    from whoosh_novo_ray.ops.groupstats import quantiles_continuous

    # half the mass on one exact float (degenerate-interval path) + nulls
    vals = np.concatenate([np.full(3000, 42.5), np.linspace(0, 100, 3000)])
    col = pa.array(vals.tolist() + [None, float("nan")], pa.float64())
    tbl = pa.table({"x": col})
    out = quantiles_continuous(
        _ds(ray_session, tbl, 5), "x", (0.4, 0.5, 0.6), buckets=8, exact_cap=10
    )
    svals = np.sort(vals)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    for q in (0.4, 0.5, 0.6):
        assert got[q] == svals[int(np.floor(q * (len(svals) - 1)))]


def test_exact_quantiles_refuses_high_cardinality(ray_session):
    vals = np.arange(500, dtype=np.float64) + 0.5
    tbl = pa.table({"x": pa.array(vals)})
    with pytest.raises(ValueError, match="quantiles_continuous"):
        exact_quantiles(_ds(ray_session, tbl, 3), "x", (0.5,), max_distinct=100)


def test_quantiles_continuous_agrees_with_exact_on_ints(ray_session):
    from whoosh_novo_ray.ops.groupstats import quantiles_continuous

    tbl = _table(seed=5)
    qs = (0.0, 0.1, 0.5, 0.9, 1.0)
    a = exact_quantiles(_ds(ray_session, tbl), "n_chars", qs)
    b = quantiles_continuous(
        _ds(ray_session, tbl), "n_chars", qs, buckets=8, exact_cap=4
    )
    assert [float(v) for v in a["value"].to_pylist()] == b["value"].to_pylist()
