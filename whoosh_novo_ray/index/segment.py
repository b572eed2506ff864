"""Index reader: manifest + term-dictionary lookups + posting-block decode.

Read-side counterpart of build.py. Replaces the reference's SegmentReader /
MultiReader / W3LeafMatcher machinery (de-odex/whoosh-novo
``src/whoosh/reading.py:601-1256``, ``codec/whoosh3.py:905-1173``): terms are
hash-partitioned across bucket Parquet files sorted by term, so a term lookup
is a predicate-pushdown read of one bucket (or ``salt_k`` buckets for salted
heavy terms); posting blocks decode lazily per block for WAND-style skipping,
or all at once (vectorized segmented cumsum) for term-at-a-time scoring.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from whoosh_novo_ray.codec import decode_positions, varint_decode
from whoosh_novo_ray.index.build import (
    MANIFEST_NAME,
    IndexConfig,
    buckets_for_query_term,
)

_SCORING_COLUMNS = [
    "term",
    "df",
    "weight",
    "max_weight",
    "min_len_byte",
    "max_len_byte",
    "min_id",
    "max_id",
    "block_counts",
    "block_max_ids",
    "block_max_weights",
    "block_min_lens",
    "block_ids_off",
    "block_tfs_off",
    "block_lens_off",
    "ids_blob",
    "tfs_blob",
    "lens_blob",
]


@dataclass
class TermRow:
    """One term's posting list within one bucket (decoded lazily)."""

    term: str
    df: int
    weight: float
    max_weight: float
    min_len_byte: int
    max_len_byte: int
    block_counts: np.ndarray
    block_max_ids: np.ndarray
    block_max_weights: np.ndarray
    block_min_lens: np.ndarray
    block_ids_off: np.ndarray
    block_tfs_off: np.ndarray
    block_lens_off: np.ndarray
    ids_blob: bytes
    tfs_blob: bytes
    lens_blob: bytes
    block_pos_off: np.ndarray | None = None
    pos_blob: bytes | None = None
    block_chars_off: np.ndarray | None = None
    chars_blob: bytes | None = None
    # float32 per-posting weights (token-boost sums); when present, decode
    # returns these (as float64) in the tf slot so scoring uses weight — the
    # reference's Frequency-format weight semantics. True integer tfs remain
    # available from tfs_blob (decode_tfs / positions decode use it).
    wts_blob: bytes | None = None
    # float32 PER-OCCURRENCE boosts parallel to the positions stream
    # (the PositionBoosts / CharacterBoosts payload, formats.py:345-430)
    pboosts_blob: bytes | None = None
    # memoized full decodes: TermRows live in cross-query caches (Searcher /
    # ScoreServer term caches), and varint_decode's fixed cost (~35 us/call)
    # dominates hot repeated-term queries. Callers never mutate the returned
    # arrays (they concatenate/fancy-index into fresh arrays).
    _decoded: tuple | None = None
    _decoded_pos: tuple | None = None

    @property
    def n_blocks(self) -> int:
        return len(self.block_counts)

    def decode_block(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode block i -> (doc_ids, weights-or-tfs, len_bytes)."""
        cnt = int(self.block_counts[i])
        a = int(self.block_ids_off[i])
        b = int(self.block_ids_off[i + 1]) if i + 1 < self.n_blocks else len(self.ids_blob)
        deltas = varint_decode(self.ids_blob[a:b], cnt)
        ids = np.cumsum(deltas, dtype=np.uint64)
        if self.wts_blob is not None:
            a = int(self.block_lens_off[i])  # posting ordinal within term
            tfs = np.frombuffer(
                self.wts_blob, np.float32, count=cnt, offset=4 * a
            ).astype(np.float64)
        else:
            a = int(self.block_tfs_off[i])
            b = (
                int(self.block_tfs_off[i + 1])
                if i + 1 < self.n_blocks
                else len(self.tfs_blob)
            )
            tfs = varint_decode(self.tfs_blob[a:b], cnt)
        a = int(self.block_lens_off[i])
        lens = np.frombuffer(self.lens_blob, np.uint8, count=cnt, offset=a)
        return ids, tfs, lens

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode the whole posting list -> (doc_ids, tfs, len_bytes).

        Vectorized: one varint pass, then a segmented cumsum that honors the
        per-block absolute resets.
        """
        if self._decoded is not None:
            return self._decoded
        n = self.df
        deltas = varint_decode(self.ids_blob, n)
        c = np.cumsum(deltas, dtype=np.uint64)
        starts = np.zeros(self.n_blocks, np.int64)
        np.cumsum(self.block_counts[:-1], out=starts[1:])
        # value before each block's absolute reset must be subtracted
        corr = c[starts] - deltas[starts]
        ids = c - np.repeat(corr, self.block_counts.astype(np.int64))
        if self.wts_blob is not None:
            tfs = np.frombuffer(self.wts_blob, np.float32, count=n).astype(
                np.float64
            )
        else:
            tfs = varint_decode(self.tfs_blob, n)
        lens = np.frombuffer(self.lens_blob, np.uint8, count=n)
        self._decoded = (ids, tfs, lens)
        return self._decoded

    def decode_block_positions(self, i: int) -> list[np.ndarray]:
        if self.pos_blob is None:
            raise ValueError("index built without positions")
        cnt = int(self.block_counts[i])
        a = int(self.block_pos_off[i])
        b = (
            int(self.block_pos_off[i + 1])
            if i + 1 < self.n_blocks
            else len(self.pos_blob)
        )
        return decode_positions(self.pos_blob[a:b], cnt)

    def decode_all_positions(self) -> list[np.ndarray]:
        if self.pos_blob is None:
            raise ValueError("index built without positions")
        flat, counts = self.decode_all_positions_flat()
        return np.split(flat, np.cumsum(counts)[:-1])

    def decode_all_positions_flat(self) -> tuple[np.ndarray, np.ndarray]:
        """(flat positions, per-posting counts) — counts equal the tfs."""
        if self.pos_blob is None:
            raise ValueError("index built without positions")
        if self._decoded_pos is not None:
            return self._decoded_pos
        from whoosh_novo_ray.codec import decode_positions_flat, varint_decode

        tfs = varint_decode(self.tfs_blob, self.df)
        self._decoded_pos = decode_positions_flat(self.pos_blob, tfs)
        return self._decoded_pos

    def decode_tfs(self) -> np.ndarray:
        """True integer term frequencies (even on weighted indexes, where
        ``decode_all`` returns float weights in the tf slot)."""
        return varint_decode(self.tfs_blob, self.df)

    def decode_all_position_boosts(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-occurrence boosts: (flat float64 boosts, counts per posting)
        — parallel to ``decode_all_positions_flat``."""
        if self.pboosts_blob is None:
            raise ValueError("index built without per-occurrence boosts")
        from whoosh_novo_ray.codec import varint_decode as _vd

        tfs = _vd(self.tfs_blob, self.df)
        flat = np.frombuffer(
            self.pboosts_blob, np.float32, count=int(tfs.sum())
        ).astype(np.float64)
        return flat, tfs.astype(np.int64)

    def decode_all_chars(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-occurrence character offsets (the Characters format):
        returns (spans (total_occurrences, 2) int64 [start, end), counts
        per posting)."""
        if self.chars_blob is None:
            raise ValueError("index built without char offsets (with_chars)")
        from whoosh_novo_ray.codec import decode_positions_flat, varint_decode

        tfs = varint_decode(self.tfs_blob, self.df)
        flat, counts2 = decode_positions_flat(self.chars_blob, tfs * np.uint64(2))
        return flat.astype(np.int64).reshape(-1, 2), (counts2 // 2)


def _row_to_termrow(
    tbl: pa.Table, i: int, with_positions: bool, with_chars: bool = False
) -> TermRow:
    def get(name):
        # binary blobs: wrap the Arrow buffer instead of copying via as_py
        s = tbl[name][i]
        if isinstance(s, pa.LargeBinaryScalar):  # the posting blobs
            return s.as_buffer()
        return s.as_py()

    def nplist(name, dtype):
        # list scalar -> numpy via the Arrow values array (no Python list)
        return tbl[name][i].values.to_numpy(zero_copy_only=False).astype(dtype)

    tr = TermRow(
        term=get("term"),
        df=int(get("df")),
        weight=float(get("weight")),
        max_weight=float(get("max_weight")),
        min_len_byte=int(get("min_len_byte")),
        max_len_byte=int(get("max_len_byte")),
        block_counts=nplist("block_counts", np.int64),
        block_max_ids=nplist("block_max_ids", np.uint64),
        block_max_weights=nplist("block_max_weights", np.float64),
        block_min_lens=nplist("block_min_lens", np.uint8),
        block_ids_off=nplist("block_ids_off", np.int64),
        block_tfs_off=nplist("block_tfs_off", np.int64),
        block_lens_off=nplist("block_lens_off", np.int64),
        ids_blob=get("ids_blob"),
        tfs_blob=get("tfs_blob"),
        lens_blob=get("lens_blob"),
    )
    if with_positions and "pos_blob" in tbl.column_names:
        tr.block_pos_off = nplist("block_pos_off", np.int64)
        tr.pos_blob = get("pos_blob")
    if with_chars and "chars_blob" in tbl.column_names:
        tr.block_chars_off = nplist("block_chars_off", np.int64)
        tr.chars_blob = get("chars_blob")
    if "wts_blob" in tbl.column_names:
        tr.wts_blob = get("wts_blob")
    if "pboosts_blob" in tbl.column_names:
        tr.pboosts_blob = get("pboosts_blob")
    return tr


def _read_stats_file(path: str, columns: list[str]) -> pa.Table:
    return pq.read_table(path, columns=columns)


def _scan_terms_file(
    path: str,
    lo: str | None,
    hi: str | None,
    lo_excl: bool,
    hi_excl: bool,
    predicate,
) -> tuple[list[str], int, int, int]:
    """One bucket's term-dictionary scan (also the Ray-task body).

    Row-group pruning is explicit: segments are term-sorted with 4k row
    groups, so a [lo, hi] range reads ONLY the row groups whose term-column
    min/max stats intersect it — the counters (groups_total, groups_read,
    rows_read) make the pruning observable/testable. The exact range +
    predicate then filter the surviving rows.
    Returns (matching terms, rg_total, rg_read, rows_read)."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    n_rg = md.num_row_groups
    if n_rg == 0:
        return [], 0, 0, 0
    # physical index of the `term` column (list columns flatten, so the
    # top-level field index does not equal the column-chunk index)
    term_ci = None
    rg0 = md.row_group(0)
    for j in range(rg0.num_columns):
        if rg0.column(j).path_in_schema == "term":
            term_ci = j
            break
    keep_groups = []
    for rg in range(n_rg):
        st = md.row_group(rg).column(term_ci).statistics if term_ci is not None else None
        if st is not None and st.has_min_max and st.min is not None:
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn, mx = mn.decode("utf-8", "replace"), mx.decode("utf-8", "replace")
            if lo is not None and (mx < lo or (lo_excl and mx <= lo)):
                continue
            if hi is not None and (mn > hi or (hi_excl and mn >= hi)):
                continue
        keep_groups.append(rg)
    if not keep_groups:
        return [], n_rg, 0, 0
    tbl = pf.read_row_groups(keep_groups, columns=["term"])
    rows_read = len(tbl)
    col = tbl["term"]
    mask = None
    if lo is not None:
        mask = pc.greater(col, lo) if lo_excl else pc.greater_equal(col, lo)
    if hi is not None:
        m = pc.less(col, hi) if hi_excl else pc.less_equal(col, hi)
        mask = m if mask is None else pc.and_(mask, m)
    if mask is not None:
        col = pc.filter(col, mask)
    if not len(col):
        return [], n_rg, len(keep_groups), rows_read
    out = pc.filter(col, predicate(col)).to_pylist()
    return out, n_rg, len(keep_groups), rows_read


class Index:
    """Handle on a built index directory (manifest + bucket segment files)."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        self.cfg = IndexConfig.from_json(dict(self.manifest["config"]))
        self.doc_count: int = self.manifest["doc_count"]
        self.total_field_length: float = self.manifest["total_field_length"]
        self._bucket_paths = {
            b["bucket"]: os.path.join(path, b["path"])
            for b in self.manifest["buckets"]
            if b["path"]  # docmeta-only buckets carry path="" (no segment)
        }

    @property
    def avg_field_length(self) -> float:
        # reference: Searcher.avg_field_length (searching.py:275-278)
        return self.total_field_length / (self.doc_count or 1)

    # -- term dictionary lookups ---------------------------------------------

    def term_rows(
        self,
        terms: list[str],
        with_positions: bool = False,
        with_chars: bool = False,
    ) -> dict[str, list[TermRow]]:
        """Fetch posting-list rows for the given terms (predicate-pushdown
        reads of only the buckets that can contain them). A term maps to >1
        row when it was salted at build time."""
        by_bucket: dict[int, set[str]] = {}
        for t in terms:
            for bk in buckets_for_query_term(self.cfg, t):
                by_bucket.setdefault(bk, set()).add(t)
        out: dict[str, list[TermRow]] = {t: [] for t in terms}
        cols = list(_SCORING_COLUMNS)
        has_weights = getattr(self.cfg, "with_weights", False)
        if has_weights:
            cols += ["wts_blob"]
        if with_positions and self.cfg.with_positions:
            cols += ["block_pos_off", "pos_blob"]
            if has_weights and getattr(self.cfg.analyzer, "boost_delim", None):
                cols += ["pboosts_blob"]
        if with_chars and getattr(self.cfg, "with_chars", False):
            cols += ["block_chars_off", "chars_blob"]
        for bk, tset in sorted(by_bucket.items()):
            p = self._bucket_paths.get(bk)
            if p is None:
                continue
            tbl = pq.read_table(
                p,
                columns=cols,
                filters=pc.field("term").isin(sorted(tset)),
            )
            for i in range(len(tbl)):
                tr = _row_to_termrow(tbl, i, with_positions, with_chars)
                out[tr.term].append(tr)
        return out

    def term_stats_many(
        self, terms: list[str]
    ) -> dict[str, tuple[int, float, float]]:
        """Global ``(df, total_weight, max_weight)`` per term, summed across
        salted rows — a STATS-ONLY predicate-pushdown read (no posting
        blobs leave storage). Used by the distributed score pool to ship
        collection-level stats with a query."""
        by_bucket: dict[int, set[str]] = {}
        for t in terms:
            for bk in buckets_for_query_term(self.cfg, t):
                by_bucket.setdefault(bk, set()).add(t)
        out: dict[str, tuple[int, float, float]] = {
            t: (0, 0.0, 0.0) for t in terms
        }
        for bk, tset in sorted(by_bucket.items()):
            p = self._bucket_paths.get(bk)
            if p is None:
                continue
            tbl = pq.read_table(
                p,
                columns=["term", "df", "weight", "max_weight"],
                filters=pc.field("term").isin(sorted(tset)),
            )
            for i in range(len(tbl)):
                t = tbl["term"][i].as_py()
                df, w, mx = out[t]
                out[t] = (
                    df + int(tbl["df"][i].as_py()),
                    w + float(tbl["weight"][i].as_py()),
                    max(mx, float(tbl["max_weight"][i].as_py())),
                )
        return out

    def iter_term_stats(self, columns=("term", "df", "weight")) -> pa.Table:
        """Full term dictionary (stats columns only) across all buckets,
        merging salted duplicates by summation. Bucket reads fan out as Ray
        tasks when there are enough of them and a session is live."""
        import ray as _ray

        paths = [self._bucket_paths[bk] for bk in sorted(self._bucket_paths)]
        cols = list(columns)
        if len(paths) >= 4 and _ray.is_initialized():
            fn = _ray.remote(num_cpus=1)(_read_stats_file)
            tables = _ray.get([fn.remote(p, cols) for p in paths])
        else:
            tables = [_read_stats_file(p, cols) for p in paths]
        tbl = pa.concat_tables(tables)
        if self.cfg.heavy_terms:
            tbl = pa.TableGroupBy(tbl, "term").aggregate(
                [(c, "sum") for c in columns if c != "term"]
            )
            tbl = tbl.rename_columns(
                ["term"] + [c for c in columns if c != "term"]
            )
        return tbl

    def _docmeta_files(self) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(os.path.join(self.path, "docmeta", "*.parquet")))

    def docmeta_ds(self):
        """The per-document metadata as a STREAMING ray Dataset — the form
        pipelines should consume the doc universe in (anti-joins, facet
        sources, exports). Driver-side ``doc_meta()`` / ``all_doc_ids()``
        below exist for the local vectorized Searcher, whose Every/Not
        evaluation needs the id array in memory; at cluster scale those
        queries route through the ScorePool, where each shard actor holds
        only ITS doc subset (state/score_pool.py)."""
        import ray.data as _rd

        files = self._docmeta_files()
        if not files:
            return _rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([], pa.uint64()),
                        "length": pa.array([], pa.uint32()),
                        "len_byte": pa.array([], pa.uint8()),
                    }
                )
            )
        return _rd.read_parquet(files)

    def doc_meta(self) -> pa.Table:
        """The per-document metadata table (doc_id, length, len_byte),
        concatenated across buckets and sorted. Bucket reads fan out as Ray
        tasks when a session is live. Driver-sized by design — prefer
        ``docmeta_ds()`` in pipelines."""
        import ray as _ray

        files = self._docmeta_files()
        if not files:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.uint64()),
                    "length": pa.array([], pa.uint32()),
                    "len_byte": pa.array([], pa.uint8()),
                }
            )
        if len(files) >= 4 and _ray.is_initialized():
            fn = _ray.remote(num_cpus=1)(pq.read_table)
            tables = _ray.get([fn.remote(f) for f in files])
        else:
            tables = [pq.read_table(f) for f in files]
        return pa.concat_tables(tables).sort_by("doc_id")

    def all_doc_ids(self) -> np.ndarray:
        """Sorted array of every indexed document id (the Every universe for
        the LOCAL Searcher; ScorePool shards never call this — each actor
        pins its own shard's docmeta)."""
        import ray as _ray

        files = self._docmeta_files()
        if not files:
            return np.empty(0, np.uint64)
        if len(files) >= 4 and _ray.is_initialized():
            fn = _ray.remote(num_cpus=1)(_read_stats_file)
            tables = _ray.get([fn.remote(f, ["doc_id"]) for f in files])
        else:
            tables = [pq.read_table(f, columns=["doc_id"]) for f in files]
        parts = [t["doc_id"].to_numpy(zero_copy_only=False) for t in tables]
        return np.sort(np.concatenate(parts).astype(np.uint64))

    def expand_terms(
        self,
        predicate,
        lo: str | None = None,
        hi: str | None = None,
        lo_excl: bool = False,
        hi_excl: bool = False,
    ) -> list[str]:
        """Scan the term dictionary with an Arrow compute predicate on the
        `term` column; returns matching terms sorted lexicographically.
        Used by Prefix/Wildcard/Regex/TermRange expansion.

        ``lo``/``hi`` is an optional lexicographic pre-filter range pushed
        into the parquet read: segments are term-sorted with 4k row groups,
        so the range prunes to only the row groups whose [min, max] term
        stats intersect it. Buckets whose manifest min/max term fall outside
        the range are skipped without a read. With several buckets and a
        live Ray session the per-bucket scans fan out as Ray tasks.

        ``self.last_expand_stats`` records the pruning of the most recent
        call: buckets skipped via manifest stats, row groups read vs total,
        and dictionary rows actually read."""
        n_buckets = 0
        paths = []
        for b in self.manifest["buckets"]:
            if not b["path"]:
                continue
            n_buckets += 1
            if lo is not None and (
                b["max_term"] < lo or (lo_excl and b["max_term"] <= lo)
            ):
                continue
            if hi is not None and (
                b["min_term"] > hi or (hi_excl and b["min_term"] >= hi)
            ):
                continue
            paths.append(os.path.join(self.path, b["path"]))
        found: set[str] = set()
        import ray as _ray

        if len(paths) >= 4 and _ray.is_initialized():
            fn = _ray.remote(num_cpus=1)(_scan_terms_file)
            results = _ray.get(
                [
                    fn.remote(p, lo, hi, lo_excl, hi_excl, predicate)
                    for p in paths
                ]
            )
        else:
            results = [
                _scan_terms_file(p, lo, hi, lo_excl, hi_excl, predicate)
                for p in paths
            ]
        rg_total = rg_read = rows_read = 0
        for lst, nt, nr, rows in results:
            found.update(lst)
            rg_total += nt
            rg_read += nr
            rows_read += rows
        self.last_expand_stats = {
            "buckets_total": n_buckets,
            "buckets_scanned": len(paths),
            "row_groups_total": rg_total,
            "row_groups_read": rg_read,
            "rows_read": rows_read,
        }
        return sorted(found)
