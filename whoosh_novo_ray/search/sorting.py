"""Faceting, sorted search and collapse — the reference's sorting.py /
FacetCollector / SortingCollector / CollapseCollector semantics
(de-odex/whoosh-novo ``src/whoosh/sorting.py:158-1071``,
``collectors.py:536-583,764-1006``) over Arrow tables.

Facets categorize matched documents by a per-document key:
  * FieldFacet      — a column of a doc-attribute table (doc_id -> value)
  * RangeFacet      — numeric column bucketed into [start, end) gaps
  * QueryFacet      — named sub-queries; a doc lands in each one it matches
  * FunctionFacet   — arbitrary vectorized fn(doc_ids) -> keys
  * StoredFieldFacet/TranslateFacet behavior is covered by FunctionFacet

The driver-side operators below act on a search result (already top-k or
full match set); the Dataset-level equivalent for full-corpus grouping is
``ray.data.Dataset.groupby`` (used by ops/ and pipelines/).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class Facet:
    def keys_for(self, searcher, doc_ids: np.ndarray) -> np.ndarray:
        raise NotImplementedError


@dataclass
class FieldFacet(Facet):
    """Key = attrs[column] looked up by doc_id. ``attrs`` must have a doc_id
    column (e.g. Index.doc_meta() or a projection of the source table)."""

    attrs: pa.Table
    column: str

    def keys_for(self, searcher, doc_ids):
        ids = self.attrs["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        pos = order[np.searchsorted(ids[order], doc_ids)]
        vals = self.attrs[self.column].take(pa.array(pos)).to_numpy(
            zero_copy_only=False
        )
        return vals


@dataclass
class RangeFacet(Facet):
    """Numeric column bucketed into [start, start+gap, ...) ranges
    (reference sorting.py RangeFacet)."""

    attrs: pa.Table
    column: str
    start: float
    end: float
    gap: float

    def keys_for(self, searcher, doc_ids):
        vals = FieldFacet(self.attrs, self.column).keys_for(searcher, doc_ids)
        vals = vals.astype(np.float64)
        edges = np.arange(self.start, self.end, self.gap)
        idx = np.clip(np.searchsorted(edges, vals, side="right") - 1, 0, len(edges) - 1)
        lo = edges[idx]
        labels = np.array(
            [f"[{l:g}, {min(l + self.gap, self.end):g})" for l in lo], dtype=object
        )
        labels[(vals < self.start) | (vals >= self.end)] = None
        return labels


@dataclass
class QueryFacet(Facet):
    """Named sub-queries; key = the name of the (first) matching query."""

    queries: dict

    def keys_for(self, searcher, doc_ids):
        out = np.full(len(doc_ids), None, dtype=object)
        for name, q in self.queries.items():
            ids, _ = searcher.postings(q)
            hit = np.isin(doc_ids, ids) & (out == None)  # noqa: E711
            out[hit] = name
        return out


@dataclass
class FunctionFacet(Facet):
    fn: object  # callable(np.ndarray doc_ids) -> np.ndarray keys

    def keys_for(self, searcher, doc_ids):
        return np.asarray(self.fn(doc_ids), dtype=object)


def facet_counts(searcher, q, facet: Facet) -> pa.Table:
    """Count matched docs per facet key (reference FacetCollector + Count)."""
    ids, _ = searcher.postings(q)
    keys = facet.keys_for(searcher, ids)
    mask = np.array([k is not None for k in keys])
    uniq, counts = np.unique(keys[mask].astype(str), return_counts=True)
    return pa.table(
        {
            "key": pa.array(uniq, pa.string()),
            "count": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def sorted_search(searcher, q, facet: Facet, reverse: bool = False, limit=None) -> pa.Table:
    """Matches sorted by facet key (reference SortingCollector); ties break by
    doc_id ascending."""
    ids, scores = searcher.postings(q)
    keys = facet.keys_for(searcher, ids)
    order = np.lexsort((ids, keys))
    if reverse:
        # reverse key order but keep doc_id ascending within equal keys
        order = np.lexsort((ids, _invert_rank(keys)))
    if limit is not None:
        order = order[:limit]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.uint64()),
            "key": pa.array(keys[order].astype(str), pa.string()),
            "score": pa.array(scores[order], pa.float64()),
        }
    )


def _invert_rank(keys: np.ndarray) -> np.ndarray:
    uniq, inv = np.unique(keys, return_inverse=True)
    return (len(uniq) - 1) - inv


def collapse_search(
    searcher, q, key_facet: Facet, per_key: int = 1, limit=None
) -> pa.Table:
    """Keep at most ``per_key`` best (score desc, doc_id asc) hits per
    collapse key (reference CollapseCollector, collectors.py:854-1006)."""
    ids, scores = searcher.postings(q)
    keys = key_facet.keys_for(searcher, ids)
    order = np.lexsort((ids, -scores))
    ids, scores, keys = ids[order], scores[order], keys[order]
    seen: dict = {}
    keep = np.zeros(len(ids), bool)
    for i, k in enumerate(keys):
        c = seen.get(k, 0)
        if c < per_key:
            keep[i] = True
            seen[k] = c + 1
    ids, scores, keys = ids[keep], scores[keep], keys[keep]
    if limit is not None:
        ids, scores, keys = ids[:limit], scores[:limit], keys[:limit]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.uint64()),
            "key": pa.array(keys.astype(str), pa.string()),
            "score": pa.array(scores, pa.float64()),
        }
    )
