"""MERGE_SMALL size-tiered policy + MultiIndex union reads.

Reference behavior: whoosh-novo writing.py:74-110 (fibonacci merge point over
doc-count-ascending segments) and reading.py:1012-1120 (MultiReader —
rank-identical union of doc-disjoint segments)."""

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.index.incremental import GenerationalIndex, _fib, merge_small_plan


def _docs_table(lo: int, hi: int) -> pa.Table:
    words = ["alpha", "beta", "gamma", "delta", "search", "data"]
    texts = [
        " ".join(words[(i + j) % len(words)] for j in range(8))
        for i in range(lo, hi)
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(lo, hi), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_fib_matches_reference_shift():
    # reference util fib: fib(n<=2)=n, so the sequence runs 1,2,3,5,8,13...
    assert [_fib(n) for n in range(1, 8)] == [1, 2, 3, 5, 8, 13, 21]


def test_merge_small_plan_merges_small_tail():
    # 6 tiny segments: cumulative 6 docs at i=4 < fib(9)=55 -> merge point
    counts = [1, 1, 1, 1, 1, 1]
    to_merge, unchanged = merge_small_plan(counts)
    assert len(to_merge) == 5 and len(unchanged) == 1


def test_merge_small_plan_keeps_large_segments():
    # two big segments: i never exceeds 3, no merge point
    to_merge, unchanged = merge_small_plan([10_000, 20_000])
    assert to_merge == [] and len(unchanged) == 2


def test_merge_small_bounds_segment_count_and_matches_full_build(
    ray_session, tmp_path
):
    import ray.data

    from whoosh_novo_ray.index import IndexConfig, build_index, Index
    from whoosh_novo_ray.search import Searcher, Term

    cfg = IndexConfig(num_buckets=4)
    gi = GenerationalIndex(str(tmp_path / "gi"), cfg, policy="merge_small")
    # with 25-doc segments the fibonacci cutoff (cum < fib(i+5)) first
    # triggers at the 9th add (8 members, 200 docs < fib(12)=233) — the
    # same dynamics as the reference heuristic
    n_batches, per = 10, 25
    for b in range(n_batches):
        t = _docs_table(b * per, (b + 1) * per)
        gi.add_documents(ray.data.from_arrow(t), lineage=f"add{b}")
    idx = gi.open()
    members = gi._members(gi.current_path())
    assert len(members) < n_batches, "size tiering must compact the tail"
    assert idx.doc_count == n_batches * per

    # rank parity vs a one-shot build of the same corpus
    full = str(tmp_path / "full")
    all_docs = _docs_table(0, n_batches * per)
    build_index(ray.data.from_arrow(all_docs), full, cfg, lineage="full")
    q = Term("search")
    a = Searcher(idx).search(q, limit=20).to_pydict()
    b = Searcher(Index(full)).search(q, limit=20).to_pydict()
    assert a == b


def test_merge_small_repeated_upserts_bounded(ray_session, tmp_path):
    import ray.data

    from whoosh_novo_ray.index import IndexConfig
    from whoosh_novo_ray.search import Searcher, Term

    cfg = IndexConfig(num_buckets=4)
    gi = GenerationalIndex(str(tmp_path / "gi2"), cfg, policy="merge_small")
    gi.create(ray.data.from_arrow(_docs_table(0, 60)), lineage="init")
    for i in range(10):
        # each update rewrites docs 0..9 with fresh text
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(10), pa.int64()),
                "text": pa.array([f"update round{i} token{d}" for d in range(10)]),
            }
        )
        gi.update_documents(ray.data.from_arrow(t), lineage=f"up{i}")
    members = gi._members(gi.current_path())
    assert len(members) <= 6, f"unbounded growth: {len(members)} members"
    idx = gi.open()
    assert idx.doc_count == 60  # replaced, not duplicated
    ids, _ = Searcher(idx).postings(Term("round9"))
    assert len(ids) == 10  # latest copies win
    ids_old, _ = Searcher(idx).postings(Term("round8"))
    assert len(ids_old) == 0
    gi.cleanup(keep=1)
    # survivors must still open after the segset GC
    assert gi.open().doc_count == 60
