"""Ranked-results container with the reference's merge algebra.

The reference ``Results`` object (``/root/reference/src/whoosh/searching.py:974-1411``)
is a list of ``(score, docnum)`` pairs plus a docset of EVERY matching doc
(``Results.docs()`` = ``collector.all_ids()``, not just the top N).  Its
merge methods — ``extend`` / ``filter`` / ``upgrade`` /
``upgrade_and_extend`` — are order-preserving list edits keyed on docset
membership.  Here the same semantics run as numpy stable-mask partitions
over the ranked arrays instead of Python list comprehensions, so merging
two broad result sets costs two ``searchsorted`` passes rather than a
per-hit ``in set`` loop.

Replicated quirks (differentially tested in ``tests/test_results_api.py``):

* ``extend`` has NO empty-other early return — it always unions docsets —
  while ``filter`` / ``upgrade`` / ``upgrade_and_extend`` return self
  unchanged when the other results object is empty
  (``searching.py:1325-1410``).  In particular ``filter`` against an empty
  results object does NOT empty the receiver.
* ``len(results)`` is the total number of matching documents, not the
  scored length (``searching.py:1021-1033``).
* ``upgrade`` does not add the other object's documents; it only re-sorts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Membership of ``values`` in an ascending-sorted id array."""
    if not len(sorted_arr) or not len(values):
        return np.zeros(len(values), bool)
    pos = np.searchsorted(sorted_arr, values)
    pos = np.minimum(pos, len(sorted_arr) - 1)
    return sorted_arr[pos] == values


class Results:
    """Top-N ranked hits (``ids`` / ``scores``, ranked order) plus the
    sorted id array of every matching document (``docset``).  All merge
    methods mutate in place, like the reference."""

    __slots__ = ("ids", "scores", "docset")

    def __init__(self, ids, scores, docset):
        self.ids = np.asarray(ids, np.uint64)
        self.scores = np.asarray(scores, np.float64)
        self.docset = np.asarray(docset, np.uint64)

    @classmethod
    def from_table(cls, table: pa.Table, docset=None) -> "Results":
        """Wrap a ranked ``(doc_id, score)`` Arrow table (the shape every
        search path in this engine returns).  When ``docset`` is omitted the
        top rows themselves are the known universe (an unlimited search)."""
        ids = table["doc_id"].to_numpy(zero_copy_only=False)
        if docset is None:
            docset = np.sort(ids)
        return cls(ids, table["score"].to_numpy(zero_copy_only=False), docset)

    # -- inspection (searching.py:1021,1177-1224) ---------------------------

    def __len__(self) -> int:
        return len(self.docset)

    def scored_length(self) -> int:
        return len(self.ids)

    def is_empty(self) -> bool:
        return self.scored_length() == 0

    def docs(self) -> np.ndarray:
        """Sorted ids of every matching doc (the reference returns a set;
        a sorted array is the vectorizable equivalent)."""
        return self.docset

    def score(self, n: int) -> float:
        return float(self.scores[n])

    def docnum(self, n: int) -> int:
        return int(self.ids[n])

    def copy(self) -> "Results":
        return Results(self.ids.copy(), self.scores.copy(), self.docset.copy())

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(self.ids, pa.uint64()),
                "score": pa.array(self.scores, pa.float64()),
            }
        )

    def __iter__(self):
        return iter(zip(self.ids.tolist(), self.scores.tolist()))

    # -- merge algebra (searching.py:1325-1410) -----------------------------

    def extend(self, other: "Results") -> None:
        """Append the other object's hits not already matched here.  No
        empty guard, mirroring the reference: the docset union always
        happens."""
        new = ~_in_sorted(other.ids, self.docset)
        self.ids = np.concatenate([self.ids, other.ids[new]])
        self.scores = np.concatenate([self.scores, other.scores[new]])
        self.docset = np.union1d(self.docset, other.docset)

    def filter(self, other: "Results") -> None:
        """Drop hits not also in the other results.  Empty other = no-op
        (the reference early-return, NOT an empty receiver)."""
        if not len(other):
            return
        keep = _in_sorted(self.ids, other.docset)
        self.ids, self.scores = self.ids[keep], self.scores[keep]
        self.docset = np.intersect1d(self.docset, other.docset)

    def upgrade(self, other: "Results", reverse: bool = False) -> None:
        """Stable-partition the ranked list: hits also in ``other`` first
        (last when ``reverse``), relative order preserved; docset
        unchanged — upgrade never adds documents."""
        if not len(other):
            return
        arein = _in_sorted(self.ids, other.docset)
        order = (
            np.concatenate([np.flatnonzero(~arein), np.flatnonzero(arein)])
            if reverse
            else np.concatenate([np.flatnonzero(arein), np.flatnonzero(~arein)])
        )
        self.ids, self.scores = self.ids[order], self.scores[order]

    def upgrade_and_extend(self, other: "Results") -> None:
        """upgrade() then extend() in one pass: shared hits first, then the
        rest of this list, then the other's novel hits."""
        if not len(other):
            return
        arein = _in_sorted(self.ids, other.docset)
        order = np.concatenate([np.flatnonzero(arein), np.flatnonzero(~arein)])
        new = ~_in_sorted(other.ids, self.docset)
        self.ids = np.concatenate([self.ids[order], other.ids[new]])
        self.scores = np.concatenate([self.scores[order], other.scores[new]])
        self.docset = np.union1d(self.docset, other.docset)
