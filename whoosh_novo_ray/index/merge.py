"""Segment merge / compaction as a Ray Data job.

Batch equivalent of the reference's ``add_reader`` re-streaming merge and the
OPTIMIZE merge policy (de-odex/whoosh-novo ``src/whoosh/writing.py:62-130,
672-740``): every input index's segment rows are decoded back into posting
rows (vectorized, inside map_batches over the segment Parquet files), the
per-doc metadata rows are re-emitted, optional deletes are filtered out, and
the combined stream goes through the SAME bucket shuffle + block encoder as a
fresh build — producing one merged generation with its own manifest.

Doc-id spaces of the inputs must be disjoint (the caller offsets them, as the
reference does with per-segment doc offsets, reading.py:1012-1016). For
replace-by-id upserts use GenerationalIndex.update_documents
(index/incremental.py), which trims the replaced ids from the old generation
before merging — the reference's update_document semantics
(writing.py:439-502).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from whoosh_novo_ray.index.build import (
    DOCMETA_TERM,
    IndexConfig,
    build_index_from_postings,
)
from whoosh_novo_ray.index.segment import Index, _row_to_termrow


class DecodeSegmentRows:
    """map_batches callable: segment term rows -> flat posting rows
    (term, doc_id, tf, len_byte[, positions])."""

    def __init__(self, with_positions: bool, delete_ids: np.ndarray | None = None):
        self.with_positions = with_positions
        self.delete_ids = (
            np.sort(delete_ids.astype(np.uint64)) if delete_ids is not None else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        wp = self.with_positions and "pos_blob" in batch.column_names
        wc = "chars_blob" in batch.column_names
        ww = "wts_blob" in batch.column_names
        wpb = "pboosts_blob" in batch.column_names
        terms, ids, tfs, lens = [], [], [], []
        weights = []
        pos_flats, pos_counts = [], []
        tb_flats = []
        ch_flats, ch_counts = [], []
        for i in range(len(batch)):
            tr = _row_to_termrow(batch, i, with_positions=wp, with_chars=wc)
            t_ids, t_tfs, t_lens = tr.decode_all()
            if ww:
                # weighted index: decode_all returned float weights in the
                # tf slot — keep them as the weight column and recover the
                # true integer tfs separately
                t_w = t_tfs
                t_tfs = tr.decode_tfs()
            keep = None
            if self.delete_ids is not None and len(self.delete_ids):
                keep = ~np.isin(t_ids, self.delete_ids)
            if wp:
                flat, counts = tr.decode_all_positions_flat()
                if wpb:
                    tb_flat, _tb_counts = tr.decode_all_position_boosts()
                if keep is not None:
                    occ_keep = np.repeat(keep, counts)
                    flat = flat[occ_keep]
                    if wpb:
                        tb_flat = tb_flat[occ_keep]
                    counts = counts[keep]
                pos_flats.append(flat)
                pos_counts.append(counts)
                if wpb:
                    tb_flats.append(tb_flat)
            if wc:
                ch, ccounts = tr.decode_all_chars()
                flat2 = ch.reshape(-1).astype(np.uint64)
                c2 = (ccounts * 2).astype(np.int64)
                if keep is not None:
                    occ_keep2 = np.repeat(keep, c2)
                    flat2, c2 = flat2[occ_keep2], c2[keep]
                ch_flats.append(flat2)
                ch_counts.append(c2)
            if keep is not None:
                t_ids, t_tfs, t_lens = t_ids[keep], t_tfs[keep], t_lens[keep]
                if ww:
                    t_w = t_w[keep]
            terms.append(np.full(len(t_ids), tr.term, dtype=object))
            ids.append(t_ids)
            tfs.append(t_tfs)
            lens.append(t_lens)
            if ww:
                weights.append(t_w)
        if not ids:
            cols = {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.uint64()),
                "tf": pa.array([], pa.uint32()),
                "len_byte": pa.array([], pa.uint8()),
            }
            if ww:
                cols["weight"] = pa.array([], pa.float64())
            if wp:
                cols["positions"] = pa.array([], pa.list_(pa.int32()))
                if wpb:
                    cols["tboosts"] = pa.array([], pa.list_(pa.float32()))
            if wc:
                cols["chars"] = pa.array([], pa.list_(pa.int32()))
            return pa.table(cols)
        cols = {
            "term": pa.array(np.concatenate(terms), pa.string()),
            "doc_id": pa.array(np.concatenate(ids), pa.uint64()),
            "tf": pa.array(np.concatenate(tfs).astype(np.uint32), pa.uint32()),
            "len_byte": pa.array(np.concatenate(lens), pa.uint8()),
        }
        if ww:
            cols["weight"] = pa.array(
                np.concatenate(weights).astype(np.float64), pa.float64()
            )
        if wp:
            counts = np.concatenate(pos_counts).astype(np.int64)
            offsets = np.zeros(len(counts) + 1, np.int32)
            np.cumsum(counts, out=offsets[1:])
            cols["positions"] = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(np.concatenate(pos_flats).astype(np.int32), pa.int32()),
            )
            if wpb:
                cols["tboosts"] = pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(
                        np.concatenate(tb_flats).astype(np.float32), pa.float32()
                    ),
                )
        if wc:
            c2 = np.concatenate(ch_counts).astype(np.int64)
            off2 = np.zeros(len(c2) + 1, np.int32)
            np.cumsum(c2, out=off2[1:])
            cols["chars"] = pa.ListArray.from_arrays(
                pa.array(off2, pa.int32()),
                pa.array(np.concatenate(ch_flats).astype(np.int32), pa.int32()),
            )
        return pa.table(cols)


def docmeta_rows_fn(
    ww: bool, wp: bool, wpb: bool, wc: bool, del_set: np.ndarray | None = None
):
    """map_batches fn: docmeta table rows -> DOCMETA_TERM posting rows with
    the payload columns (weight/positions/tboosts/chars) the target stream
    carries. Shared by the merge job and the doc-shard serving build."""

    def dm_to_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = (
            ~np.isin(ids, del_set) if del_set is not None and len(del_set) else None
        )
        if keep is not None:
            batch = batch.filter(pa.array(keep))
            ids = ids[keep]
        n = len(batch)
        cols = {
            "term": pa.array(np.full(n, DOCMETA_TERM, dtype=object), pa.string()),
            "doc_id": pa.array(ids, pa.uint64()),
            "tf": batch["length"].cast(pa.uint32()),
            "len_byte": batch["len_byte"].cast(pa.uint8()),
        }
        if ww:
            cols["weight"] = pa.array(np.zeros(n, np.float64), pa.float64())
        if wp:
            cols["positions"] = pa.ListArray.from_arrays(
                pa.array(np.zeros(n + 1, np.int32)), pa.array([], pa.int32())
            )
            if wpb:
                cols["tboosts"] = pa.ListArray.from_arrays(
                    pa.array(np.zeros(n + 1, np.int32)),
                    pa.array([], pa.float32()),
                )
        if wc:
            cols["chars"] = pa.ListArray.from_arrays(
                pa.array(np.zeros(n + 1, np.int32)), pa.array([], pa.int32())
            )
        return pa.table(cols)

    return dm_to_rows


def merge_indexes(
    index_dirs: list[str],
    out_dir: str,
    cfg: IndexConfig | None = None,
    delete_doc_ids: np.ndarray | None = None,
    lineage: str = "",
) -> dict:
    """Merge (compact) several indexes into one at ``out_dir``.

    ``delete_doc_ids`` are dropped during the merge (the reference's
    merged-out deletions). Inputs must share the analyzer config.
    """
    idxs = [Index(d) for d in index_dirs]
    cfg = cfg or idxs[0].cfg
    wp = cfg.with_positions and all(i.cfg.with_positions for i in idxs)
    wc = getattr(cfg, "with_chars", False) and all(
        getattr(i.cfg, "with_chars", False) for i in idxs
    )
    ww = getattr(cfg, "with_weights", False) and all(
        getattr(i.cfg, "with_weights", False) for i in idxs
    )
    wpb = (
        ww
        and wp
        and getattr(cfg.analyzer, "boost_delim", None) is not None
    )

    seg_files = [
        os.path.join(d, b["path"])
        for d, i in zip(index_dirs, idxs)
        for b in i.manifest["buckets"]
        if b["path"]  # skip docmeta-only (segment-less) bucket rows
    ]
    postings = ray.data.read_parquet(seg_files).map_batches(
        DecodeSegmentRows(wp, delete_doc_ids),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # per-doc metadata rows from the inputs' docmeta tables
    import glob as _glob

    dm_files = [
        f for d in index_dirs for f in sorted(_glob.glob(os.path.join(d, "docmeta", "*.parquet")))
    ]
    del_set = (
        np.sort(delete_doc_ids.astype(np.uint64))
        if delete_doc_ids is not None
        else None
    )

    dm_to_rows = docmeta_rows_fn(ww=ww, wp=wp, wpb=wpb, wc=wc, del_set=del_set)

    if dm_files:
        dm_rows = ray.data.read_parquet(dm_files).map_batches(
            dm_to_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        postings = postings.union(dm_rows)

    return build_index_from_postings(postings, out_dir, cfg, lineage=lineage)
