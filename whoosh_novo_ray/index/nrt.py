"""Near-real-time writers over a GenerationalIndex.

Analogs of the reference's quasi-real-time writer conveniences
(de-odex/whoosh-novo ``src/whoosh/writing.py:998-1330``):

  * ``BufferedWriter`` — buffers added / updated docs driver-side; a
    searcher sees them IMMEDIATELY (before any commit) by unioning a tiny
    buffer segment with the committed generation through MultiIndex — the
    reference's MemoryCodec-RAM-index + MultiReader combination
    (``writing.py:1250-1268``). Buffered deletes/updates mask the committed
    copy from results right away while leaving it in the collection stats
    until the flush — exactly the reference's pending-delete visibility.
    The buffer flushes into a real generation (riding the configured merge
    policy, e.g. MERGE_SMALL) when it reaches ``limit`` docs or on
    ``commit()`` / ``close()``.
  * ``AsyncWriter`` — records add/update/delete calls and replays them on a
    background thread at ``commit()`` (``writing.py:998-1096``; the
    reference's lock-retry loop is unnecessary here — generations commit via
    an atomic CURRENT pointer — so only the deferred-replay behavior
    remains).

Scale shape: the buffer is bounded by ``limit`` (a few hundred docs), so
building its segment is a small local Ray job; the committed side stays
parquet on shared storage. At cluster scale each ingest front-end owns one
BufferedWriter; flushes are ordinary generational deltas, so concurrent
readers keep MVCC snapshot semantics.
"""

from __future__ import annotations

import os
import shutil
import threading

import numpy as np
import pyarrow as pa

import ray.data

from whoosh_novo_ray.index.build import build_index
from whoosh_novo_ray.index.incremental import GenerationalIndex
from whoosh_novo_ray.index.multi import MultiIndex
from whoosh_novo_ray.index.segment import Index


def _in_sorted(values, sorted_arr):
    # lazy: search.searcher imports index/__init__, so a module-level import
    # here would be circular (search -> searcher -> index -> nrt -> searcher)
    from whoosh_novo_ray.search.searcher import _in_sorted as f

    return f(values, sorted_arr)


class _MaskedRow:
    """TermRow facade whose decoded postings drop the masked doc ids.

    The STATS fields (df / weight / max_weight) intentionally keep the
    unmasked values: the reference leaves deleted docs in the term/collection
    statistics until the next commit (deletes are applied at the matcher,
    ``reading.py`` deleted-docnum skips), so NRT scores match the reference's
    NRT scores, not a post-flush rebuild's. Anything beyond the decode
    surface (block-max metadata etc.) delegates unmasked — the NRT search
    path never uses it."""

    __slots__ = ("_row", "_mask")

    def __init__(self, row, mask: np.ndarray):
        self._row = row
        self._mask = mask

    def __getattr__(self, name):
        return getattr(self._row, name)

    def decode_all(self):
        ids, tfs, lens = self._row.decode_all()
        keep = ~_in_sorted(ids, self._mask)
        if keep.all():
            return ids, tfs, lens
        return ids[keep], tfs[keep], lens[keep]

    def decode_all_positions_flat(self):
        flat, counts = self._row.decode_all_positions_flat()
        ids = self._row.decode_all()[0]
        keep = ~_in_sorted(ids, self._mask)
        if keep.all():
            return flat, counts
        sel_cnt = counts[keep]
        offs = np.cumsum(counts) - counts
        base = np.repeat(offs[keep], sel_cnt)
        run_start = np.cumsum(sel_cnt) - sel_cnt
        within = np.arange(int(sel_cnt.sum())) - np.repeat(run_start, sel_cnt)
        return flat[base + within], sel_cnt


class _NrtView(MultiIndex):
    """Committed members + the buffer segment as one logical index, with the
    writer's pending-delete ids masked out of the COMMITTED members'
    postings only. The buffer member stays unmasked, so a buffered update
    of a committed doc matches with its NEW content and the stale committed
    copy never surfaces (the reference MultiReader-over-[disk, ram] with
    disk deletes pending, writing.py:1250-1320)."""

    def __init__(self, paths: list[str], n_committed: int, mask: np.ndarray):
        super().__init__(paths)
        self._n_committed = n_committed
        self._mask = mask

    def term_rows(self, terms, with_positions=False, with_chars=False):
        out = {t: [] for t in terms}
        for i, m in enumerate(self.members):
            rows = m.term_rows(
                terms, with_positions=with_positions, with_chars=with_chars
            )
            for t, rs in rows.items():
                if i < self._n_committed and len(self._mask):
                    rs = [_MaskedRow(r, self._mask) for r in rs]
                out[t].extend(rs)
        return out


class BufferedWriter:
    """Buffered NRT writer: searchable before commit, auto-flush at
    ``limit`` buffered docs (reference BufferedWriter, writing.py:1149+)."""

    def __init__(self, gidx: GenerationalIndex, limit: int = 100):
        self.gidx = gidx
        self.limit = limit
        self._buf: dict[int, str] = {}  # doc_id -> text (insertion-ordered)
        self._pending_delete: set[int] = set()
        self._bufseg_version = -1
        self._version = 0
        self._bufseg_path = os.path.join(gidx.root, "nrt-buffer")

    # -- write side ---------------------------------------------------------

    def add_document(self, doc_id: int, text: str) -> None:
        """Add a NEW doc to the buffer. Re-adding a buffered id replaces the
        buffered copy (the reference's in-buffer update capability)."""
        self._buf[int(doc_id)] = text
        self._version += 1
        if len(self._buf) >= self.limit:
            self.commit()

    def add_documents(self, table: pa.Table) -> None:
        for d, t in zip(
            table["doc_id"].to_pylist(), table["text"].to_pylist()
        ):
            self.add_document(d, t)

    def update_document(self, doc_id: int, text: str) -> None:
        """Upsert by id: the committed copy (if any) is masked from searches
        immediately and deleted at the next flush; the new copy is buffered
        (reference IndexWriter.update_document via BufferedWriter)."""
        self._pending_delete.add(int(doc_id))
        self.add_document(doc_id, text)

    def delete_document(self, doc_id: int) -> None:
        doc_id = int(doc_id)
        if doc_id in self._buf:
            del self._buf[doc_id]
        self._pending_delete.add(doc_id)
        self._version += 1

    # -- read side ----------------------------------------------------------

    def _buffer_segment(self) -> str | None:
        if not self._buf:
            return None
        if self._bufseg_version != self._version:
            tbl = pa.table(
                {
                    "doc_id": pa.array(list(self._buf), pa.int64()),
                    "text": pa.array(list(self._buf.values()), pa.string()),
                }
            )
            shutil.rmtree(self._bufseg_path, ignore_errors=True)
            cfg = self.gidx.cfg
            build_index(
                ray.data.from_arrow(tbl), self._bufseg_path, cfg, lineage="nrt-buffer"
            )
            self._bufseg_version = self._version
        return self._bufseg_path

    def searcher(self, **kw):
        """Quasi-real-time searcher: committed generation + buffer segment
        unioned, every pending-deleted/updated id masked out of the
        COMMITTED members (the buffer's fresh copies still match)."""
        from whoosh_novo_ray.search.searcher import Searcher
        members: list[str] = []
        cur = self.gidx.current_path()
        if cur is not None:
            members.extend(self.gidx._members(cur))
        n_committed = len(members)
        seg = self._buffer_segment()
        if seg is not None:
            members.append(seg)
        if not members:
            raise FileNotFoundError("nothing committed and nothing buffered")
        mask = np.sort(np.fromiter(self._pending_delete, np.uint64))
        if n_committed == 0 or not len(mask):
            idx = Index(members[0]) if len(members) == 1 else MultiIndex(members)
        else:
            idx = _NrtView(members, n_committed, mask)
        return Searcher(idx, **kw)

    # -- flush ---------------------------------------------------------------

    def commit(self) -> None:
        """Flush the buffer as a generational delta (upsert semantics) and
        apply pure deletes; the merge policy decides compaction."""
        pure_deletes = np.array(
            sorted(d for d in self._pending_delete if d not in self._buf),
            np.uint64,
        )
        if len(pure_deletes) and self.gidx.current_path() is not None:
            self.gidx.delete_documents(pure_deletes, lineage="nrt-delete")
        if self._buf:
            tbl = pa.table(
                {
                    "doc_id": pa.array(list(self._buf), pa.int64()),
                    "text": pa.array(list(self._buf.values()), pa.string()),
                }
            )
            self.gidx.update_documents(
                ray.data.from_arrow(tbl), lineage="nrt-flush"
            )
        self._buf.clear()
        self._pending_delete.clear()
        self._version += 1
        shutil.rmtree(self._bufseg_path, ignore_errors=True)
        self._bufseg_version = -1

    def close(self) -> None:
        self.commit()

    def __enter__(self) -> "BufferedWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class AsyncWriter:
    """Deferred-replay writer (reference AsyncWriter, writing.py:998-1096):
    add/update/delete calls are recorded immediately and applied to the
    GenerationalIndex on a background thread when ``commit()`` is called.
    ``join()`` waits for the flush to land."""

    def __init__(self, gidx: GenerationalIndex):
        self.gidx = gidx
        self._events: list[tuple[str, tuple]] = []
        self._thread: threading.Thread | None = None
        # Serializes replays: overlapping commit() calls must not both read
        # the same current generation and race CURRENT (the reference
        # AsyncWriter serializes via the index write lock).
        self._replay_lock = threading.Lock()

    def add_document(self, doc_id: int, text: str) -> None:
        self._events.append(("add", (int(doc_id), text)))

    def update_document(self, doc_id: int, text: str) -> None:
        self._events.append(("update", (int(doc_id), text)))

    def delete_document(self, doc_id: int) -> None:
        self._events.append(("delete", (int(doc_id),)))

    def _replay(self, events: list[tuple[str, tuple]]) -> None:
        with self._replay_lock:
            self._replay_locked(events)

    def _replay_locked(self, events: list[tuple[str, tuple]]) -> None:
        # collapse the event log into one delta: latest op per id wins
        docs: dict[int, str | None] = {}
        for op, args in events:
            if op == "delete":
                docs[args[0]] = None
            else:
                docs[args[0]] = args[1]
        deletes = np.array(
            sorted(d for d, t in docs.items() if t is None), np.uint64
        )
        adds = {d: t for d, t in docs.items() if t is not None}
        if len(deletes) and self.gidx.current_path() is not None:
            self.gidx.delete_documents(deletes, lineage="async-delete")
        if adds:
            tbl = pa.table(
                {
                    "doc_id": pa.array(list(adds), pa.int64()),
                    "text": pa.array(list(adds.values()), pa.string()),
                }
            )
            self.gidx.update_documents(
                ray.data.from_arrow(tbl), lineage="async-flush"
            )

    def commit(self) -> None:
        events, self._events = self._events, []
        if not events:
            return
        # Join the previous replay before spawning the next so generation
        # numbering is strictly ordered even when callers never join().
        prev = self._thread
        if prev is not None and prev.is_alive():
            prev.join()
        self._thread = threading.Thread(target=self._replay, args=(events,))
        self._thread.start()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
