"""Span queries: positional algebra over term occurrences.

Port of the reference's span semantics (de-odex/whoosh-novo
``src/whoosh/query/spans.py:268-930``): a *span* is a [start, end] position
range within a document; span queries combine sub-queries' spans.

Implemented (vectorized over flat (doc, start, end) arrays, same machinery
as Phrase):
  * SpanFirst(q, limit)      — spans ending at position <= limit
  * SpanNear2([qs], slop, ordered) — sub-spans within `slop` of each other,
    optionally in order (Phrase == SpanNear2(ordered=True, slop=1))
  * SpanOr([qs])             — union of spans
  * SpanNot(a, b)            — a's spans that don't overlap any b span
  * SpanContains(a, b)       — a's spans that contain a b span
  * SpanBefore(a, b)         — a's spans that end before some b span starts
  * SpanCondition(a, b)      — a's spans, only in docs that also match b
    (span-level Require: b gates the doc set but contributes no spans;
    reference spans.py:855-930 wraps IntersectionMatcher(a, b) and returns
    a.spans())

Matching documents score like the And/Or of the underlying terms (the
reference wraps the same matchers). Span queries evaluate through
``evaluate_spans(searcher, q)`` -> (doc_ids, scores); ``Searcher.postings``
dispatches automatically.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from whoosh_novo_ray.search import query as Q

# flat span representation: (doc uint64, start uint32, end uint32) packed as
# one uint64 key per span: (cand_idx << 32) | pos for starts/ends separately
# would lose the pairing, so spans stay as parallel arrays.


@dataclass(frozen=True)
class _SpanQuery(Q.Query):
    def leaves(self):
        yield self
        for c in self._children():
            yield from c.leaves()

    def _children(self):
        return []


@dataclass(frozen=True)
class SpanTerm(_SpanQuery):
    text: str

    def _children(self):
        return []


@dataclass(frozen=True)
class SpanFirst(_SpanQuery):
    q: Q.Query
    limit: int = 0

    def _children(self):
        return [self.q]


@dataclass(frozen=True)
class SpanNear2(_SpanQuery):
    qs: tuple
    slop: int = 1
    ordered: bool = True

    def __init__(self, qs, slop: int = 1, ordered: bool = True):
        object.__setattr__(self, "qs", tuple(qs))
        object.__setattr__(self, "slop", slop)
        object.__setattr__(self, "ordered", ordered)

    def _children(self):
        return list(self.qs)


@dataclass(frozen=True)
class SpanOr(_SpanQuery):
    qs: tuple

    def __init__(self, qs):
        object.__setattr__(self, "qs", tuple(qs))

    def _children(self):
        return list(self.qs)


@dataclass(frozen=True)
class SpanNot(_SpanQuery):
    a: Q.Query
    b: Q.Query

    def _children(self):
        return [self.a, self.b]


@dataclass(frozen=True)
class SpanContains(_SpanQuery):
    a: Q.Query
    b: Q.Query

    def _children(self):
        return [self.a, self.b]


@dataclass(frozen=True)
class SpanBefore(_SpanQuery):
    a: Q.Query
    b: Q.Query

    def _children(self):
        return [self.a, self.b]


@dataclass(frozen=True)
class SpanCondition(_SpanQuery):
    a: Q.Query
    b: Q.Query

    def _children(self):
        return [self.a, self.b]


class _Spans:
    """Parallel arrays of spans: docs (uint64), starts, ends (int64)."""

    __slots__ = ("docs", "starts", "ends")

    def __init__(self, docs, starts, ends):
        self.docs = docs
        self.starts = starts
        self.ends = ends

    @staticmethod
    def empty():
        e = np.empty(0, np.uint64)
        return _Spans(e, np.empty(0, np.int64), np.empty(0, np.int64))

    def __len__(self):
        return len(self.docs)

    def sorted(self):
        order = np.lexsort((self.starts, self.docs))
        return _Spans(self.docs[order], self.starts[order], self.ends[order])


def _term_spans(searcher, text: str) -> _Spans:
    ids, tfs, _lens, pos = searcher.term_postings(text, with_positions=True)
    if not len(ids):
        return _Spans.empty()
    flat, counts = pos
    docs = np.repeat(ids, counts)
    p = flat.astype(np.int64)
    return _Spans(docs, p, p.copy())


def _spans_of(searcher, q) -> _Spans:
    if isinstance(q, SpanTerm) or isinstance(q, Q.Term):
        return _term_spans(searcher, q.text)
    if isinstance(q, SpanFirst):
        s = _spans_of(searcher, q.q)
        keep = s.ends <= q.limit
        return _Spans(s.docs[keep], s.starts[keep], s.ends[keep])
    if isinstance(q, SpanOr):
        parts = [_spans_of(searcher, c) for c in q.qs]
        return _Spans(
            np.concatenate([p.docs for p in parts]) if parts else np.empty(0, np.uint64),
            np.concatenate([p.starts for p in parts]) if parts else np.empty(0, np.int64),
            np.concatenate([p.ends for p in parts]) if parts else np.empty(0, np.int64),
        ).sorted()
    if isinstance(q, SpanNear2):
        cur = _spans_of(searcher, q.qs[0])
        for nxt_q in q.qs[1:]:
            nxt = _spans_of(searcher, nxt_q)
            cur = _near_join(cur, nxt, q.slop, q.ordered)
            if not len(cur):
                return cur
        return cur
    if isinstance(q, SpanNot):
        a = _spans_of(searcher, q.a)
        b = _spans_of(searcher, q.b)
        keep = ~_overlaps_any(a, b)
        return _Spans(a.docs[keep], a.starts[keep], a.ends[keep])
    if isinstance(q, SpanContains):
        a = _spans_of(searcher, q.a)
        b = _spans_of(searcher, q.b)
        keep = _contains_any(a, b)
        return _Spans(a.docs[keep], a.starts[keep], a.ends[keep])
    if isinstance(q, SpanCondition):
        a = _spans_of(searcher, q.a)
        b = _spans_of(searcher, q.b)
        keep = np.isin(a.docs, np.unique(b.docs))
        return _Spans(a.docs[keep], a.starts[keep], a.ends[keep])
    if isinstance(q, SpanBefore):
        a = _spans_of(searcher, q.a)
        b = _spans_of(searcher, q.b)
        keep = _before_any(a, b)
        return _Spans(a.docs[keep], a.starts[keep], a.ends[keep])
    raise TypeError(f"not a span query: {type(q).__name__}")


def _near_join(a: _Spans, b: _Spans, slop: int, ordered: bool) -> _Spans:
    """Combine each a-span with b-spans within slop -> merged spans.

    ordered: b must start after a ends, gap in [1, slop];
    unordered: either order, gap between the two spans <= slop.
    O(|a| * slop) via packed-key membership tests (b's (doc,pos) keys).
    """
    if not len(a) or not len(b):
        return _Spans.empty()
    # restrict to shared docs first
    shared = np.intersect1d(np.unique(a.docs), np.unique(b.docs))
    if not len(shared):
        return _Spans.empty()
    am = np.isin(a.docs, shared)
    bm = np.isin(b.docs, shared)
    a = _Spans(a.docs[am], a.starts[am], a.ends[am])
    b = _Spans(b.docs[bm], b.starts[bm], b.ends[bm])
    didx_a = np.searchsorted(shared, a.docs).astype(np.uint64)
    didx_b = np.searchsorted(shared, b.docs).astype(np.uint64)
    bkey_by_start = np.sort((didx_b << np.uint64(32)) | b.starts.astype(np.uint64))
    # map b start-key -> its end (for span extension)
    order_b = np.argsort((didx_b << np.uint64(32)) | b.starts.astype(np.uint64))
    b_end_sorted = b.ends[order_b]

    out_docs, out_starts, out_ends = [], [], []
    akey_end = (didx_a << np.uint64(32)) | a.ends.astype(np.uint64)
    for gap in range(1, slop + 1):
        cand = akey_end + np.uint64(gap)
        pos = np.searchsorted(bkey_by_start, cand)
        pos_c = np.minimum(pos, len(bkey_by_start) - 1)
        hit = bkey_by_start[pos_c] == cand
        if hit.any():
            out_docs.append(a.docs[hit])
            out_starts.append(a.starts[hit])
            out_ends.append(b_end_sorted[pos_c[hit]])
        if not ordered:
            # b before a: b.end + gap == a.start
            bkey_end = np.sort((didx_b << np.uint64(32)) | b.ends.astype(np.uint64))
            order_b2 = np.argsort((didx_b << np.uint64(32)) | b.ends.astype(np.uint64))
            b_start_sorted = b.starts[order_b2]
            akey_start = (didx_a << np.uint64(32)) | a.starts.astype(np.uint64)
            cand2 = akey_start - np.uint64(gap)
            pos2 = np.searchsorted(bkey_end, cand2)
            pos2_c = np.minimum(pos2, len(bkey_end) - 1)
            hit2 = bkey_end[pos2_c] == cand2
            if hit2.any():
                out_docs.append(a.docs[hit2])
                out_starts.append(b_start_sorted[pos2_c[hit2]])
                out_ends.append(a.ends[hit2])
    if not out_docs:
        return _Spans.empty()
    return _Spans(
        np.concatenate(out_docs),
        np.concatenate(out_starts),
        np.concatenate(out_ends),
    ).sorted()


def _pairwise_doc_test(a: _Spans, b: _Spans, test) -> np.ndarray:
    """For each a-span, does ANY b-span in the same doc satisfy `test`?
    (per-shared-doc vectorized loop; doc counts are small after intersection)"""
    keep = np.zeros(len(a), bool)
    if not len(a) or not len(b):
        return keep
    shared = np.intersect1d(np.unique(a.docs), np.unique(b.docs))
    for d in shared:
        ai = np.flatnonzero(a.docs == d)
        bi = np.flatnonzero(b.docs == d)
        bs, be = b.starts[bi], b.ends[bi]
        for i in ai:
            if test(a.starts[i], a.ends[i], bs, be).any():
                keep[i] = True
    return keep


def _overlaps_any(a, b):
    return _pairwise_doc_test(
        a, b, lambda s, e, bs, be: (bs <= e) & (be >= s)
    )


def _contains_any(a, b):
    return _pairwise_doc_test(
        a, b, lambda s, e, bs, be: (bs >= s) & (be <= e)
    )


def _before_any(a, b):
    return _pairwise_doc_test(a, b, lambda s, e, bs, be: bs > e)


def evaluate_spans(searcher, q) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate a span query -> (doc_ids sorted asc, scores).

    Matching docs score as the sum of the involved terms' scores on those
    docs (the reference scores span matchers through the wrapped term/And
    matchers)."""
    from whoosh_novo_ray.search.searcher import _merge_sum

    spans = _spans_of(searcher, q)
    if not len(spans):
        e = np.empty(0, np.uint64)
        return e, np.empty(0, np.float64)
    good = np.unique(spans.docs)
    terms = sorted({leaf.text for leaf in q.leaves() if isinstance(leaf, (SpanTerm, Q.Term))})
    ids, scores, _ = _merge_sum([searcher.postings(Q.Term(t)) for t in terms])
    keep = np.isin(ids, good)
    return ids[keep], scores[keep]
