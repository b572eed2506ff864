"""Block-max WAND: exact top-k disjunctive retrieval with block skipping.

Doc-at-a-time port of the reference's quality-pruning machinery:
* per-term max quality = score(max_weight, min_length) (scoring.py:195-212),
* per-block quality = score(block_max_weight, block_min_length)
  (W3LeafMatcher.block_quality / skip_to_quality, whoosh3.py:1085-1098),
* the collector's minscore threshold loop (collectors.py:376-508).

Cursors advance by whole blocks using the skip table (block_max_ids) without
decoding; a block is decoded only when the WAND pivot test says documents in
it could enter the current top-k. Results are EXACTLY the same ranking as the
exhaustive evaluator (skipping uses strict inequality so boundary ties are
never dropped); `blocks_skipped` reports the pruning win.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

from whoosh_novo_ray.index.segment import TermRow
from whoosh_novo_ray.search.scoring import TermScorer

_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


class TimeLimit(Exception):
    """Raised when a deadline expires mid-search (reference
    TimeLimitCollector, collectors.py:1012-1107). Carries the partial
    results accumulated so far in ``partial`` (arrow table) and stats."""

    def __init__(self, partial, stats):
        super().__init__("search time limit exceeded")
        self.partial = partial
        self.stats = stats


class LeafCursor:
    """Cursor over one TermRow's posting blocks (lazy block decode)."""

    __slots__ = (
        "row",
        "scorer",
        "max_quality",
        "block_qualities",
        "block_i",
        "ids",
        "scores",
        "pos",
        "decoded_blocks",
        "skipped_blocks",
    )

    def __init__(self, row: TermRow, scorer: TermScorer):
        self.row = row
        self.scorer = scorer
        self.max_quality = scorer.max_quality(row.max_weight, row.min_len_byte)
        # all block quality bounds in one vectorized pass
        self.block_qualities = scorer.score_arrays(
            row.block_max_weights, row.block_min_lens
        )
        self.block_i = 0
        self.ids = None  # type: np.ndarray | None
        self.scores = None
        self.pos = 0
        self.decoded_blocks = 0
        self.skipped_blocks = 0
        self._ensure_block()

    # -- block machinery -------------------------------------------------------

    def _ensure_block(self) -> None:
        if self.block_i < self.row.n_blocks and self.ids is None:
            ids, tfs, lens = self.row.decode_block(self.block_i)
            self.ids = ids
            self.scores = self.scorer.score_arrays(tfs, lens)
            self.pos = 0
            self.decoded_blocks += 1

    def is_active(self) -> bool:
        return self.block_i < self.row.n_blocks

    def doc(self) -> np.uint64:
        if not self.is_active():
            return _SENTINEL
        if self.ids is None:
            # block not decoded: its first doc is unknown, but it is
            # > previous block's max id; decode lazily on demand
            self._ensure_block()
        return self.ids[self.pos]

    def score(self) -> float:
        return float(self.scores[self.pos])

    def block_quality(self) -> float:
        return float(self.block_qualities[self.block_i])

    def block_max_id(self) -> np.uint64:
        return np.uint64(self.row.block_max_ids[self.block_i])

    def next(self) -> None:
        self._ensure_block()
        self.pos += 1
        if self.pos >= len(self.ids):
            self.block_i += 1
            self.ids = None

    def skip_to(self, target: np.uint64) -> None:
        """Advance to the first doc >= target, skipping whole blocks via the
        skip table (no decode for skipped blocks)."""
        if not self.is_active():
            return
        # find first block whose max_id >= target
        bmax = self.row.block_max_ids
        j = int(np.searchsorted(bmax[self.block_i :], target) + self.block_i)
        if j >= self.row.n_blocks:
            self.skipped_blocks += self.row.n_blocks - self.block_i - (
                1 if self.ids is not None else 0
            )
            self.block_i = self.row.n_blocks
            self.ids = None
            return
        if j != self.block_i:
            self.skipped_blocks += j - self.block_i - (0 if self.ids is None else 0)
            self.block_i = j
            self.ids = None
        self._ensure_block()
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):  # can't happen if skip table is right
            self.block_i += 1
            self.ids = None
            self._ensure_block()
            self.pos = 0

    def skip_past_block(self) -> None:
        """Jump past the current block without decoding it (block-max skip)."""
        self.block_i += 1
        self.skipped_blocks += 1
        self.ids = None


def wand_topk(
    rows_and_scorers: list[tuple[TermRow, TermScorer]],
    k: int,
    timelimit: float | None = None,
) -> tuple[pa.Table, dict]:
    """Exact top-k for the disjunction (summed scores) of the given terms.

    Returns (arrow table (doc_id, score) ranked by (score desc, doc_id asc),
    stats dict with decoded/skipped block counts). With ``timelimit``
    (seconds), raises :class:`TimeLimit` carrying the partial top-k if the
    deadline passes mid-iteration (the reference TimeLimitCollector
    semantics: partial results remain available).
    """
    import time as _time

    deadline = (_time.perf_counter() + timelimit) if timelimit is not None else None
    cursors = [LeafCursor(r, s) for r, s in rows_and_scorers]
    cursors = [c for c in cursors if c.is_active()]
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of size k

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    while True:
        if deadline is not None and _time.perf_counter() > deadline:
            ranked = sorted(heap, key=lambda e: (-e[0], -e[1]))
            partial = pa.table(
                {
                    "doc_id": pa.array([-e[1] for e in ranked], pa.uint64()),
                    "score": pa.array([e[0] for e in ranked], pa.float64()),
                }
            )
            raise TimeLimit(
                partial,
                {
                    "decoded_blocks": sum(c.decoded_blocks for c in cursors),
                    "skipped_blocks": sum(c.skipped_blocks for c in cursors),
                    "total_blocks": sum(c.row.n_blocks for c in cursors),
                },
            )
        active = [c for c in cursors if c.is_active()]
        if not active:
            break
        active.sort(key=lambda c: int(c.doc()))
        # WAND pivot: smallest prefix whose max-quality sum can beat threshold
        t = threshold()
        acc = 0.0
        pivot_idx = None
        for i, c in enumerate(active):
            acc += c.max_quality
            if acc > t:
                pivot_idx = i
                break
        if pivot_idx is None:
            break  # even all terms together cannot beat the threshold
        pivot_doc = active[pivot_idx].doc()

        if active[0].doc() == pivot_doc:
            # The doc range [pivot, boundary] is covered only by the
            # contributors' CURRENT blocks (bounded by the next cursor's
            # position and their block ends).
            contributors = [c for c in active if int(c.doc()) <= int(pivot_doc)]
            others = active[len(contributors) :]
            boundary = min(int(c.block_max_id()) for c in contributors)
            if others:
                boundary = min(boundary, min(int(c.doc()) for c in others) - 1)
            if boundary >= int(pivot_doc):
                bq = sum(c.block_quality() for c in contributors)
                if len(heap) >= k and bq < t:
                    # block-max skip: nothing in the range can reach top-k
                    for c in contributors:
                        c.skip_to(np.uint64(boundary + 1))
                    continue
                # bulk-score the whole run vectorized (one merge per block
                # range instead of a Python loop per doc)
                parts_ids = []
                parts_sc = []
                for c in contributors:
                    lo = c.pos
                    hi = int(
                        np.searchsorted(c.ids, np.uint64(boundary), side="right")
                    )
                    parts_ids.append(c.ids[lo:hi])
                    parts_sc.append(c.scores[lo:hi])
                    c.pos = hi
                    if c.pos >= len(c.ids):
                        c.block_i += 1
                        c.ids = None
                ids_cat = np.concatenate(parts_ids)
                sc_cat = np.concatenate(parts_sc)
                order = np.argsort(ids_cat, kind="stable")
                ids_s = ids_cat[order]
                sc_s = sc_cat[order]
                change = np.empty(len(ids_s), bool)
                change[0] = True
                change[1:] = ids_s[1:] != ids_s[:-1]
                starts = np.flatnonzero(change)
                run_ids = ids_s[starts]
                run_scores = np.add.reduceat(sc_s, starts)
                if len(heap) >= k:
                    # vectorized pre-filter: only candidates that can enter
                    # the heap reach the Python loop
                    cand = np.flatnonzero(run_scores >= heap[0][0])
                else:
                    cand = np.arange(len(run_ids))
                for i in cand.tolist():
                    entry = (float(run_scores[i]), -int(run_ids[i]))
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry > heap[0]:
                        heapq.heapreplace(heap, entry)
                continue
            # degenerate range: score just the pivot doc
            s = 0.0
            for c in contributors:
                if c.doc() == pivot_doc:
                    s += c.score()
                    c.next()
            entry = (s, -int(pivot_doc))
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
        else:
            # advance all cursors before the pivot up to it
            for c in active[:pivot_idx]:
                c.skip_to(pivot_doc)

    ranked = sorted(heap, key=lambda e: (-e[0], -e[1]))
    stats = {
        "decoded_blocks": sum(c.decoded_blocks for c in cursors),
        "skipped_blocks": sum(c.skipped_blocks for c in cursors),
        "total_blocks": sum(c.row.n_blocks for c in cursors),
    }
    return (
        pa.table(
            {
                "doc_id": pa.array([-e[1] for e in ranked], pa.uint64()),
                "score": pa.array([e[0] for e in ranked], pa.float64()),
            }
        ),
        stats,
    )


def searcher_wand_topk(
    searcher,
    terms: list[str],
    k: int = 10,
    timelimit: float | None = None,
    strategy: str = "auto",
):
    """Exact top-k for a bag-of-terms OR through a Searcher (same results as
    ``searcher.search(Or(*terms), limit=k)``).

    ``strategy``: ``"wand"`` forces block-max WAND, ``"exhaustive"`` the
    vectorized full merge, ``"auto"`` (default) picks by df shape. WAND's
    doc-at-a-time loop costs ~100x more per SCORED posting than the
    vectorized merge, so it only wins when the skip table can prune the
    overwhelming share of blocks — i.e. a selective (rare / high-idf) term
    sets a threshold that the common terms' blocks cannot reach. When every
    term is common (dfs within ~8x of each other and a non-trivial corpus
    fraction), pruning cannot recoup the constant factor and auto routes to
    the exhaustive path. A ``timelimit`` always forces WAND (the deadline /
    partial-results machinery lives in its incremental loop)."""
    searcher.prefetch_terms(terms)
    if strategy == "auto" and timelimit is None:
        dfs = [searcher.term_stats(t)[0] for t in terms]
        live = [d for d in dfs if d > 0]
        n_docs = max(1, searcher.index.doc_count)
        if live:
            small = sum(live) <= 8 * k * len(live)
            uniform_common = (
                max(live) <= 8 * min(live) and min(live) >= 0.01 * n_docs
            )
            if small or uniform_common:
                strategy = "exhaustive"
    if strategy == "exhaustive":
        from whoosh_novo_ray.search import query as Q

        t = searcher.search(Q.Or(*[Q.Term(x) for x in terms]), limit=k)
        total_blocks = sum(
            r.n_blocks for term in terms for r in searcher._rows(term)
        )
        return t, {
            "strategy": "exhaustive",
            "decoded_blocks": total_blocks,
            "skipped_blocks": 0,
            "total_blocks": total_blocks,
        }
    pairs = []
    for t in terms:
        scorer = searcher.scorer_for(t)
        for row in searcher._rows(t):
            pairs.append((row, scorer))
    tbl, stats = wand_topk(pairs, k, timelimit=timelimit)
    stats["strategy"] = "wand"
    return tbl, stats
