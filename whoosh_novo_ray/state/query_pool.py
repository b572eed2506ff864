"""DEPRECATED — use :class:`whoosh_novo_ray.state.score_pool.ScorePool`.

QueryPool is the first-generation serving tier: term-bucket actors serve
POSTING ROWS and the driver evaluates the query tree. It ships whole posting
blobs to the driver per query, which does not survive stopword-grade terms at
fleet scale. ScorePool (doc-shard actors that evaluate WHOLE queries and
return only per-shard top-k) supersedes it; QueryPool remains solely as an
A/B baseline and emits a DeprecationWarning on construction.

Original design notes: a pool of bucket-holding actors.

The cluster-level equivalent of the reference's long-lived SegmentReader with
its open mmap'd term dict and posting files (de-odex/whoosh-novo
``src/whoosh/reading.py:601-626``): each actor pins a subset of the index's
term-space buckets in memory (Arrow tables of the segment files) and answers
term-row lookups; the driver-side Searcher evaluates the query tree over the
fetched posting lists exactly as in the local path, so results are identical.

This is the shared-mutable-state case where raw Ray actors are the right tool
(SURVEY.md §2.10): the per-bucket caches must outlive individual queries.
At cluster scale, actors are spread across nodes and each term lookup touches
exactly the actor(s) owning its hash bucket — a 1-2 RPC scatter per term,
then a driver-side (or coordinator-side) k-way merge.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from whoosh_novo_ray.index.build import buckets_for_query_term
from whoosh_novo_ray.index.segment import _SCORING_COLUMNS, Index, _row_to_termrow


@ray.remote
class BucketServer:
    """Holds a set of bucket segment tables in memory; serves term rows."""

    def __init__(self, index_path: str, buckets: list[int]):
        idx = Index(index_path)
        self._tables: dict[int, pa.Table] = {}
        for bk in buckets:
            p = idx._bucket_paths.get(bk)
            if p and os.path.exists(p):
                self._tables[bk] = pq.read_table(p)

    def term_rows(
        self, wanted: dict[int, list[str]], with_positions: bool
    ) -> dict[str, list[dict]]:
        """For each (bucket -> terms) request, return the matching term rows
        as plain dicts (arrow-serializable through the object store)."""
        out: dict[str, list[dict]] = {}
        cols = list(_SCORING_COLUMNS)
        if with_positions:
            cols += ["block_pos_off", "pos_blob"]
        for bk, terms in wanted.items():
            tbl = self._tables.get(bk)
            if tbl is None:
                continue
            avail = [c for c in cols if c in tbl.column_names]
            sub = tbl.filter(pc.is_in(tbl["term"], value_set=pa.array(terms)))
            sub = sub.select(avail)
            for i in range(len(sub)):
                row = {c: sub[c][i].as_py() for c in avail}
                out.setdefault(row["term"], []).append(row)
        return out

    def ping(self) -> bool:
        return True


class QueryPool:
    """Scatter-gather searcher over a pool of BucketServer actors.

    Produces results identical to a local ``Searcher`` (same evaluation code);
    only the posting fetch is remote + cached.
    """

    def __init__(self, index_path: str, num_actors: int = 4):
        import warnings

        warnings.warn(
            "QueryPool is deprecated: it fetches posting blobs to the driver."
            " Use whoosh_novo_ray.state.score_pool.ScorePool (doc-shard"
            " actors, per-shard top-k only).",
            DeprecationWarning,
            stacklevel=2,
        )
        self.index = Index(index_path)
        # pool-level term-row cache shared across queries/searchers
        self._cache: dict[tuple[str, bool], list] = {}
        all_buckets = sorted(self.index._bucket_paths)
        self._owner: dict[int, int] = {}
        assignments: list[list[int]] = [[] for _ in range(num_actors)]
        for i, bk in enumerate(all_buckets):
            assignments[i % num_actors].append(bk)
            self._owner[bk] = i % num_actors
        self._actors = [
            BucketServer.remote(index_path, bks) for bks in assignments
        ]
        ray.get([a.ping.remote() for a in self._actors])

    def searcher(self, weighting=None):
        from whoosh_novo_ray.search.searcher import Searcher

        s = Searcher(self.index, weighting=weighting)
        pool = self

        def prefetch(terms, with_positions=False):
            # serve from the pool cache first
            for t in set(terms):
                key = (t, with_positions)
                if key not in s._term_cache and key in pool._cache:
                    s._term_cache[key] = pool._cache[key]
            missing = [
                t for t in set(terms) if (t, with_positions) not in s._term_cache
            ]
            if not missing:
                return
            # scatter by owning actor
            per_actor: dict[int, dict[int, list[str]]] = {}
            for t in missing:
                for bk in buckets_for_query_term(pool.index.cfg, t):
                    a = pool._owner.get(bk)
                    if a is not None:
                        per_actor.setdefault(a, {}).setdefault(bk, []).append(t)
            futs = [
                pool._actors[a].term_rows.remote(wanted, with_positions)
                for a, wanted in per_actor.items()
            ]
            merged: dict[str, list] = {t: [] for t in missing}
            for res in ray.get(futs):
                for term, rows in res.items():
                    for row in rows:
                        merged[term].append(_dict_to_termrow(row, with_positions))
            for t in missing:
                rows = merged.get(t, [])
                s._term_cache[(t, with_positions)] = rows
                pool._cache[(t, with_positions)] = rows

        s.prefetch_terms = prefetch  # type: ignore[method-assign]
        return s

    def search(self, q, limit=10, weighting=None):
        return self.searcher(weighting).search(q, limit=limit)

    def shutdown(self):
        for a in self._actors:
            ray.kill(a)
        self._actors = []


def _dict_to_termrow(row: dict, with_positions: bool):
    tbl = pa.table(
        {
            k: pa.array([v])
            for k, v in row.items()
        }
    )
    return _row_to_termrow(tbl, 0, with_positions)
