"""Distributed inverted-index build as a Ray Data pipeline.

Pipeline (cf. SURVEY.md §3.4; replaces the reference's PostingPool external
sort + single-process segment writer, de-odex/whoosh-novo
``src/whoosh/writing.py:136-190,748-822`` and ``codec/whoosh3.py:675-902``):

    docs (doc_id, text)
      -> map_batches(TokenizePostings)        # stateless, zero-copy Arrow out
           rows: (bucket, term, doc_id, tf, len_byte[, positions])
      -> groupby("bucket").map_groups(BucketEncoder)   # THE all-to-all shuffle
           one hash-bucket of the term space per group; vectorized sort by
           (term, doc_id) + block encode; writes segments/bucket=%05d.parquet
           atomically and returns one manifest row
      -> driver collects the (tiny) manifest rows -> manifest.json (the "TOC")

Scale notes:
  * The term-space is hash-partitioned into ``num_buckets`` buckets; at 100 TB
    raise ``num_buckets`` so each bucket (sum of its posting rows) fits a
    worker's heap — the shuffle itself streams through the object store.
  * Heavy (stopword-like) terms are salted: their shuffle key mixes in a
    doc-id *range* slice so one term's postings split across ``salt_k``
    buckets as disjoint, sorted doc-id ranges; the reader concatenates the
    per-bucket block lists (see segment.py). This is the explicit skew
    handling the reference lacks (its only mitigation is the stop filter).
  * Resume: each bucket file carries lineage (input fingerprint) and is
    written via tmp+rename; ``build_index(..., resume=True)`` skips buckets
    already present with matching lineage by filtering the shuffle key.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field, asdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from whoosh_novo_ray.analysis import StandardAnalyzer
from whoosh_novo_ray.codec import (
    delta_encode_with_resets,
    encode_positions,
    varint_encode,
)
from whoosh_novo_ray.lengths import lengths_to_bytes

MANIFEST_NAME = "manifest.json"
_SALT_PRIME = np.uint64(2654435761)
# no analyzer token can contain NUL, so this term marks per-doc metadata rows
# that ride the same shuffle as postings (doc length + length byte)
DOCMETA_TERM = "\x00doc"


def stable_term_hash(terms) -> np.ndarray:
    """Deterministic (process-independent) uint64 hash of term strings."""
    arr = np.asarray(terms, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


@dataclass
class IndexConfig:
    text_col: str = "text"
    id_col: str = "doc_id"
    num_buckets: int = 32
    block_size: int = 128
    with_positions: bool = True
    with_chars: bool = False  # store per-occurrence char offsets (Characters format)
    # per-posting float weights = sum of token boosts (reference
    # Frequency/PositionBoosts formats, formats.py:190-214,345-430); weights
    # are float32-quantized like the reference's pack_float payloads
    with_weights: bool = False
    # optional per-document boost column (the reference's _<field>_boost /
    # _boost kwargs, writing.py): multiplies every posting weight of the doc.
    # Requires with_weights.
    boost_col: str | None = None
    # terms whose postings are split over `salt_k` shuffle keys by doc-id range
    heavy_terms: tuple = ()
    salt_k: int = 8
    salt_shift: int = 12  # heavy-term salt slice = doc_id >> salt_shift
    analyzer: StandardAnalyzer = field(default_factory=StandardAnalyzer)

    def to_json(self) -> dict:
        d = asdict(self)
        d["heavy_terms"] = sorted(self.heavy_terms)
        from whoosh_novo_ray.analysis import NgramAnalyzer, NgramWordsAnalyzer
        from whoosh_novo_ray.charsets import CharsetAnalyzer

        if isinstance(self.analyzer, CharsetAnalyzer):
            # the default Sphinx table round-trips by name; custom charmaps
            # are serialized as {codepoint: replacement}
            from whoosh_novo_ray.charsets import default_charmap

            if self.analyzer.charmap == default_charmap():
                d["analyzer"] = {"type": "charset"}
            else:
                d["analyzer"] = {
                    "type": "charset",
                    "charmap": {str(k): v for k, v in self.analyzer.charmap.items()},
                }
        elif isinstance(self.analyzer, NgramAnalyzer):
            d["analyzer"] = {
                "type": "ngram",
                "minsize": self.analyzer.minsize,
                "maxsize": self.analyzer.maxsize,
            }
        elif isinstance(self.analyzer, NgramWordsAnalyzer):
            d["analyzer"] = {
                "type": "ngram_words",
                "minsize": self.analyzer.minsize,
                "maxsize": self.analyzer.maxsize,
                "at": self.analyzer.at,
            }
        else:
            d["analyzer"] = {
                "type": "standard",
                "pattern": self.analyzer.pattern,
                "stoplist": sorted(self.analyzer.stoplist) if self.analyzer.stoplist else None,
                "minsize": self.analyzer.minsize,
                "maxsize": self.analyzer.maxsize,
                "stem": self.analyzer.stem,
                "stem_lang": self.analyzer.stem_lang,
                "stem_algo": self.analyzer.stem_algo,
                "boost_delim": self.analyzer.boost_delim,
                "reverse_text": self.analyzer.reverse_text,
                "shingle": self.analyzer.shingle,
                "shingle_sep": self.analyzer.shingle_sep,
            }
        return d

    @staticmethod
    def from_json(d: dict) -> "IndexConfig":
        a = d.pop("analyzer")
        if a.get("type") == "charset":
            from whoosh_novo_ray.charsets import CharsetAnalyzer

            cm = a.get("charmap")
            ana = CharsetAnalyzer(
                {int(k): v for k, v in cm.items()} if cm is not None else None
            )
        elif a.get("type") == "ngram":
            from whoosh_novo_ray.analysis import NgramAnalyzer

            ana = NgramAnalyzer(minsize=a["minsize"], maxsize=a["maxsize"])
        elif a.get("type") == "ngram_words":
            from whoosh_novo_ray.analysis import NgramWordsAnalyzer

            ana = NgramWordsAnalyzer(
                minsize=a["minsize"], maxsize=a["maxsize"], at=a.get("at")
            )
        else:
            ana = StandardAnalyzer(
                pattern=a["pattern"],
                stoplist=frozenset(a["stoplist"]) if a["stoplist"] is not None else None,
                minsize=a["minsize"],
                maxsize=a["maxsize"],
                stem=a.get("stem", False),
                stem_lang=a.get("stem_lang"),
                stem_algo=a.get("stem_algo"),
                boost_delim=a.get("boost_delim"),
                reverse_text=a.get("reverse_text", False),
                shingle=a.get("shingle"),
                shingle_sep=a.get("shingle_sep", "-"),
            )
        d["heavy_terms"] = tuple(d.get("heavy_terms", ()))
        return IndexConfig(analyzer=ana, **d)


def bucket_for_terms(cfg: IndexConfig, terms, doc_ids: np.ndarray | None = None) -> np.ndarray:
    """Shuffle key per posting row. Heavy terms mix a doc-id range salt."""
    h = stable_term_hash(terms)
    if cfg.heavy_terms and doc_ids is not None:
        heavy = pd.Series(np.asarray(terms, dtype=object)).isin(cfg.heavy_terms).to_numpy()
        if heavy.any():
            salt = (doc_ids.astype(np.uint64) >> np.uint64(cfg.salt_shift)) % np.uint64(
                cfg.salt_k
            )
            h = h.copy()
            h[heavy] = h[heavy] + salt[heavy] * _SALT_PRIME
    return (h % np.uint64(cfg.num_buckets)).astype(np.uint32)


def buckets_for_query_term(cfg: IndexConfig, term: str) -> list[int]:
    """All buckets a term's postings may live in (1 normally, salt_k if heavy)."""
    h = int(stable_term_hash([term])[0])
    if term in cfg.heavy_terms:
        return sorted(
            {int((h + s * int(_SALT_PRIME)) % (1 << 64)) % cfg.num_buckets for s in range(cfg.salt_k)}
        )
    return [h % cfg.num_buckets]


class TokenizePostings:
    """map_batches callable: (doc_id, text) batch -> posting rows.

    Stateless per row but kept as a class so the compiled regex / stop set are
    built once per actor (``__init__``), not per batch.
    """

    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch[cfg.text_col].to_pylist()
        doc_ids = batch[cfg.id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        if cfg.with_chars:
            res = cfg.analyzer.analyze_batch_coded(texts, with_chars=True)
        else:
            res = cfg.analyzer.analyze_batch_coded(texts)
        has_boosts = getattr(cfg.analyzer, "boost_delim", None) is not None
        doc_idx, codes, uniques, pos, field_lengths = res[:5]
        rest = list(res[5:])
        if cfg.with_chars:
            s_char, e_char = rest[0], rest[1]
            rest = rest[2:]
        else:
            s_char = e_char = None
        tok_boosts = rest[0] if has_boosts else None
        if len(doc_idx) == 0:
            # no tokens in this batch — still emit the per-doc metadata rows
            return _docmeta_only_table(cfg, doc_ids, field_lengths)

        # group the flat token stream into per-(doc, term) postings
        order = np.lexsort((codes, doc_idx))
        s_doc = doc_idx[order]
        s_code = codes[order]
        s_pos = pos[order]
        if s_char is not None:
            s_sc = s_char[order]
            s_ec = e_char[order]
        s_boost = tok_boosts[order] if tok_boosts is not None else None

        key_change = np.empty(len(s_doc), dtype=bool)
        key_change[0] = True
        np.logical_or(
            s_doc[1:] != s_doc[:-1], s_code[1:] != s_code[:-1], out=key_change[1:]
        )
        starts = np.flatnonzero(key_change)
        tf = np.diff(np.append(starts, len(s_doc))).astype(np.uint32)

        g_doc_idx = s_doc[starts]
        g_codes = s_code[starts]
        g_doc_ids = doc_ids[g_doc_idx]
        g_len_bytes = lengths_to_bytes(field_lengths)[g_doc_idx]

        # shuffle key: hash once per UNIQUE term, broadcast via codes
        hash_u = stable_term_hash(uniques)
        h = hash_u[g_codes]
        if cfg.heavy_terms:
            heavy_u = pd.Series(uniques).isin(cfg.heavy_terms).to_numpy()
            heavy = heavy_u[g_codes]
            if heavy.any():
                salt = (
                    g_doc_ids >> np.uint64(cfg.salt_shift)
                ) % np.uint64(cfg.salt_k)
                h = h.copy()
                h[heavy] = h[heavy] + salt[heavy] * _SALT_PRIME
        g_bucket = (h % np.uint64(cfg.num_buckets)).astype(np.uint32)

        # per-document metadata rows (one per input doc, including token-less
        # docs): term=DOCMETA_TERM, tf=true field length; spread by doc hash
        n_docs = len(texts)
        dm_bucket = (
            pd.util.hash_array(doc_ids.astype(np.uint64))
            % np.uint64(cfg.num_buckets)
        ).astype(np.uint32)
        dm_terms = np.full(n_docs, DOCMETA_TERM, dtype=object)

        all_bucket = np.concatenate([g_bucket, dm_bucket])
        all_terms = np.concatenate([uniques[g_codes], dm_terms])
        all_ids = np.concatenate([g_doc_ids, doc_ids.astype(np.uint64)])
        all_tf = np.concatenate(
            [tf, np.minimum(field_lengths, 2**32 - 1).astype(np.uint32)]
        )
        all_lb = np.concatenate([g_len_bytes, lengths_to_bytes(field_lengths)])

        cols = {
            "bucket": pa.array(all_bucket, pa.uint32()),
            "term": pa.array(all_terms, pa.string()),
            "doc_id": pa.array(all_ids, pa.uint64()),
            "tf": pa.array(all_tf, pa.uint32()),
            "len_byte": pa.array(all_lb, pa.uint8()),
        }
        if cfg.with_weights:
            if s_boost is not None:
                g_weight = np.add.reduceat(s_boost, starts)
            else:
                g_weight = tf.astype(np.float64)
            if cfg.boost_col is not None:
                doc_boost = batch[cfg.boost_col].to_numpy(
                    zero_copy_only=False
                ).astype(np.float64)
                g_weight = g_weight * doc_boost[g_doc_idx]
            cols["weight"] = pa.array(
                np.concatenate([g_weight, np.zeros(n_docs, np.float64)]),
                pa.float64(),
            )
        if cfg.with_positions:
            offsets = np.append(starts, len(s_doc)).astype(np.int32)
            pos_list = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(s_pos, pa.int32())
            )
            empty = pa.ListArray.from_arrays(
                pa.array(np.zeros(n_docs + 1, np.int32)),
                pa.array([], pa.int32()),
            )
            cols["positions"] = pa.concat_arrays([pos_list, empty])
            if cfg.with_weights and s_boost is not None:
                # per-occurrence boosts, parallel to positions (the
                # PositionBoosts format payload, formats.py:345-409)
                tb_list = pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(s_boost.astype(np.float32), pa.float32()),
                )
                tb_empty = pa.ListArray.from_arrays(
                    pa.array(np.zeros(n_docs + 1, np.int32)),
                    pa.array([], pa.float32()),
                )
                cols["tboosts"] = pa.concat_arrays([tb_list, tb_empty])
        if cfg.with_chars and s_char is not None:
            # interleave (start, end) pairs per occurrence, grouped like
            # positions: per posting 2*tf values, non-decreasing
            inter = np.empty(2 * len(s_doc), np.int32)
            inter[0::2] = s_sc
            inter[1::2] = s_ec
            offsets2 = (2 * np.append(starts, len(s_doc))).astype(np.int32)
            ch_list = pa.ListArray.from_arrays(
                pa.array(offsets2, pa.int32()), pa.array(inter, pa.int32())
            )
            empty2 = pa.ListArray.from_arrays(
                pa.array(np.zeros(n_docs + 1, np.int32)), pa.array([], pa.int32())
            )
            cols["chars"] = pa.concat_arrays([ch_list, empty2])
        return pa.table(cols)


def _docmeta_only_table(cfg: IndexConfig, doc_ids: np.ndarray, field_lengths: np.ndarray) -> pa.Table:
    n_docs = len(doc_ids)
    dm_bucket = (
        pd.util.hash_array(doc_ids.astype(np.uint64)) % np.uint64(cfg.num_buckets)
    ).astype(np.uint32)
    cols = {
        "bucket": pa.array(dm_bucket, pa.uint32()),
        "term": pa.array(np.full(n_docs, DOCMETA_TERM, dtype=object), pa.string()),
        "doc_id": pa.array(doc_ids.astype(np.uint64), pa.uint64()),
        "tf": pa.array(
            np.minimum(field_lengths, 2**32 - 1).astype(np.uint32), pa.uint32()
        ),
        "len_byte": pa.array(lengths_to_bytes(field_lengths), pa.uint8()),
    }
    if cfg.with_weights:
        cols["weight"] = pa.array(np.zeros(n_docs, np.float64), pa.float64())
    if cfg.with_positions:
        cols["positions"] = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_docs + 1, np.int32)), pa.array([], pa.int32())
        )
        if cfg.with_weights and getattr(cfg.analyzer, "boost_delim", None):
            cols["tboosts"] = pa.ListArray.from_arrays(
                pa.array(np.zeros(n_docs + 1, np.int32)),
                pa.array([], pa.float32()),
            )
    if cfg.with_chars:
        cols["chars"] = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_docs + 1, np.int32)), pa.array([], pa.int32())
        )
    return pa.table(cols)


def _empty_postings_table(with_positions: bool) -> pa.Table:
    cols = {
        "bucket": pa.array([], pa.uint32()),
        "term": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.uint64()),
        "tf": pa.array([], pa.uint32()),
        "len_byte": pa.array([], pa.uint8()),
    }
    if with_positions:
        cols["positions"] = pa.array([], pa.list_(pa.int32()))
    return pa.table(cols)


def _large_binary_from_slices(big: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Zero-copy large_binary array: value i = big[offsets[i]:offsets[i+1]]."""
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int64).tobytes()), pa.py_buffer(big.tobytes())],
    )


def _list_array(values: pa.Array, counts: np.ndarray) -> pa.ListArray:
    offsets = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)


def encode_bucket_table(tbl: pa.Table, block_size: int, with_positions: bool) -> pa.Table:
    """Vectorized posting-block encoding of one term-space bucket.

    Sorts by (term, doc_id), finds term runs, delta+varint encodes doc ids
    (absolute value at every block start so blocks decode independently),
    varints tfs, keeps length bytes raw, and computes the per-block skip
    table (count / max id / max weight / min & max len byte) with
    ``np.*.reduceat`` — no per-term Python loop.
    """
    n = len(tbl)
    # dictionary-encode terms (C pass), then sort postings by
    # (lexicographic term rank, doc_id) entirely in numpy — much cheaper
    # than an Arrow sort over the raw string column.
    dict_arr = pc.dictionary_encode(tbl["term"].combine_chunks())
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    raw_codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
    dict_order = np.argsort(dictionary, kind="stable")
    rank = np.empty(len(dictionary), np.int64)
    rank[dict_order] = np.arange(len(dictionary))
    sort_key = rank[raw_codes]

    doc_ids_u = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((doc_ids_u, sort_key))

    codes = sort_key[order]
    doc_ids = doc_ids_u[order]
    tfs = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
    len_bytes = tbl["len_byte"].to_numpy(zero_copy_only=False).astype(np.uint8)[order]
    # per-posting weights: float32-quantized token-boost sums when present
    # (the reference packs summed boosts as 4-byte floats), else weight == tf
    if "weight" in tbl.column_names:
        w32 = tbl["weight"].to_numpy(zero_copy_only=False).astype(np.float32)[order]
    else:
        w32 = None
    sorted_terms = dictionary[dict_order]

    term_change = np.empty(n, dtype=bool)
    term_change[0] = True
    term_change[1:] = codes[1:] != codes[:-1]
    term_starts = np.flatnonzero(term_change)
    uniq_terms = pa.array(sorted_terms[codes[term_starts]], pa.string())
    n_terms = len(term_starts)
    df = np.diff(np.append(term_starts, n)).astype(np.int64)

    # block starts: every `block_size` postings within a term
    within = np.arange(n) - np.repeat(term_starts, df)
    block_start_mask = (within % block_size) == 0
    block_starts = np.flatnonzero(block_start_mask)
    nblocks_per_term = ((df + block_size - 1) // block_size).astype(np.int64)
    block_term = np.repeat(np.arange(n_terms), nblocks_per_term)
    # end (exclusive) of each block
    term_end = np.repeat(np.append(term_starts[1:], n), nblocks_per_term)
    block_ends = np.minimum(block_starts + block_size, term_end)
    block_counts = (block_ends - block_starts).astype(np.uint32)

    # encode doc ids
    deltas = delta_encode_with_resets(doc_ids, block_start_mask)
    ids_buf, ids_nb = varint_encode(deltas)
    ids_byte_end = np.cumsum(ids_nb)
    ids_byte_start = ids_byte_end - ids_nb

    tfs_buf, tfs_nb = varint_encode(tfs)
    tfs_byte_end = np.cumsum(tfs_nb)
    tfs_byte_start = tfs_byte_end - tfs_nb

    # per-block stats (weight == tf unless boost weights were supplied)
    w = w32.astype(np.float64) if w32 is not None else tfs.astype(np.float64)
    block_max_w = np.maximum.reduceat(w, block_starts)
    block_min_lb = np.minimum.reduceat(len_bytes, block_starts)
    block_max_id = doc_ids[block_ends - 1]

    # per-term aggregates
    term_weight = np.add.reduceat(w, term_starts)
    term_max_w = np.maximum.reduceat(w, term_starts)
    term_min_lb = np.minimum.reduceat(len_bytes, term_starts)
    term_max_lb = np.maximum.reduceat(len_bytes, term_starts)
    term_min_id = doc_ids[term_starts]
    term_max_id = doc_ids[np.append(term_starts[1:], n) - 1]

    # per-term byte ranges in the big buffers
    t_ids_off = ids_byte_start[term_starts]
    t_ids_end = np.append(t_ids_off[1:], ids_byte_end[-1] if n else 0)
    t_tfs_off = tfs_byte_start[term_starts]
    t_tfs_end = np.append(t_tfs_off[1:], tfs_byte_end[-1] if n else 0)

    # per-block offsets *relative to the term's blob start*
    blk_ids_off = (ids_byte_start[block_starts] - np.repeat(t_ids_off, nblocks_per_term)).astype(
        np.uint64
    )
    blk_tfs_off = (tfs_byte_start[block_starts] - np.repeat(t_tfs_off, nblocks_per_term)).astype(
        np.uint64
    )
    # lens blob offset per block = posting ordinal within term
    blk_lens_off = (block_starts - np.repeat(term_starts, nblocks_per_term)).astype(np.uint64)

    cols: dict[str, pa.Array] = {
        "term": uniq_terms,
        "df": pa.array(df.astype(np.uint64), pa.uint64()),
        "weight": pa.array(term_weight, pa.float64()),
        "max_weight": pa.array(term_max_w, pa.float64()),
        "min_len_byte": pa.array(term_min_lb, pa.uint8()),
        "max_len_byte": pa.array(term_max_lb, pa.uint8()),
        "min_id": pa.array(term_min_id, pa.uint64()),
        "max_id": pa.array(term_max_id, pa.uint64()),
        "block_counts": _list_array(pa.array(block_counts, pa.uint32()), nblocks_per_term),
        "block_max_ids": _list_array(pa.array(block_max_id, pa.uint64()), nblocks_per_term),
        "block_max_weights": _list_array(pa.array(block_max_w, pa.float64()), nblocks_per_term),
        "block_min_lens": _list_array(
            pa.array(block_min_lb, pa.uint8()), nblocks_per_term
        ),
        "block_ids_off": _list_array(pa.array(blk_ids_off, pa.uint64()), nblocks_per_term),
        "block_tfs_off": _list_array(pa.array(blk_tfs_off, pa.uint64()), nblocks_per_term),
        "block_lens_off": _list_array(pa.array(blk_lens_off, pa.uint64()), nblocks_per_term),
        "ids_blob": _large_binary_from_slices(ids_buf, np.append(t_ids_off, t_ids_end[-1:])),
        "tfs_blob": _large_binary_from_slices(tfs_buf, np.append(t_tfs_off, t_tfs_end[-1:])),
        "lens_blob": _large_binary_from_slices(
            len_bytes, np.append(term_starts, n).astype(np.int64)
        ),
    }
    if w32 is not None:
        # fixed 4 bytes/posting: byte offsets derive from posting ordinals
        cols["wts_blob"] = _large_binary_from_slices(
            w32.view(np.uint8), np.append(term_starts, n).astype(np.int64) * 4
        )

    if "chars" in tbl.column_names:
        ch_col = pc.take(tbl["chars"].combine_chunks(), pa.array(order))
        if isinstance(ch_col, pa.ChunkedArray):
            ch_col = ch_col.combine_chunks()
        ch_counts = np.diff(ch_col.offsets.to_numpy()).astype(np.int64)
        ch_flat = ch_col.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        ch_buf, per_posting_ch = encode_positions(ch_flat, ch_counts)
        ch_byte_end = np.cumsum(per_posting_ch)
        ch_byte_start = ch_byte_end - per_posting_ch
        t_ch_off = ch_byte_start[term_starts]
        t_ch_end = np.append(t_ch_off[1:], ch_byte_end[-1] if n else 0)
        blk_ch_off = (
            ch_byte_start[block_starts] - np.repeat(t_ch_off, nblocks_per_term)
        ).astype(np.uint64)
        cols["block_chars_off"] = _list_array(
            pa.array(blk_ch_off, pa.uint64()), nblocks_per_term
        )
        cols["chars_blob"] = _large_binary_from_slices(
            ch_buf, np.append(t_ch_off, t_ch_end[-1:])
        )

    if "tboosts" in tbl.column_names:
        # per-occurrence boost payload: fixed 4B floats parallel to the
        # positions stream; per-term byte offsets = 4 * occurrence ordinal
        tb_col = pc.take(tbl["tboosts"].combine_chunks(), pa.array(order))
        if isinstance(tb_col, pa.ChunkedArray):
            tb_col = tb_col.combine_chunks()
        tb_flat = tb_col.values.to_numpy(zero_copy_only=False).astype(np.float32)
        occ = np.zeros(n + 1, np.int64)
        np.cumsum(tfs.astype(np.int64), out=occ[1:])
        t_occ = occ[np.append(term_starts, n)]
        cols["pboosts_blob"] = _large_binary_from_slices(
            tb_flat.view(np.uint8), t_occ * 4
        )

    if with_positions and "positions" in tbl.column_names:
        pos_col = pc.take(tbl["positions"].combine_chunks(), pa.array(order))
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        pos_counts = np.diff(pos_col.offsets.to_numpy()).astype(np.int64)
        pos_flat = pos_col.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        pos_buf, per_posting_nb = encode_positions(pos_flat, pos_counts)
        pos_byte_end = np.cumsum(per_posting_nb)
        pos_byte_start = pos_byte_end - per_posting_nb
        t_pos_off = pos_byte_start[term_starts]
        t_pos_end = np.append(t_pos_off[1:], pos_byte_end[-1] if n else 0)
        blk_pos_off = (
            pos_byte_start[block_starts] - np.repeat(t_pos_off, nblocks_per_term)
        ).astype(np.uint64)
        cols["block_pos_off"] = _list_array(pa.array(blk_pos_off, pa.uint64()), nblocks_per_term)
        cols["pos_blob"] = _large_binary_from_slices(
            pos_buf, np.append(t_pos_off, t_pos_end[-1:])
        )

    return pa.table(cols)


class BucketEncoder:
    """groupby("bucket").map_groups callable: encode + atomically write one
    bucket's segment file; emits a one-row manifest record."""

    def __init__(self, out_dir: str, cfg: IndexConfig, lineage: str):
        self.out_dir = out_dir
        self.cfg = cfg
        self.lineage = lineage

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _empty_manifest_table()
        bucket = int(group["bucket"][0].as_py())
        is_meta = pc.equal(group["term"], DOCMETA_TERM)
        meta_rows = group.filter(is_meta)
        group = group.filter(pc.invert(is_meta))
        n_meta = len(meta_rows)
        if n_meta:
            dm = pa.table(
                {
                    "doc_id": meta_rows["doc_id"],
                    "length": meta_rows["tf"],
                    "len_byte": meta_rows["len_byte"],
                }
            ).sort_by("doc_id")
            dm_dir = os.path.join(self.out_dir, "docmeta")
            os.makedirs(dm_dir, exist_ok=True)
            dm_final = os.path.join(dm_dir, f"bucket={bucket:05d}.parquet")
            dm_tmp = dm_final + f".tmp.{os.getpid()}"
            pq.write_table(dm, dm_tmp, compression="zstd")
            os.replace(dm_tmp, dm_final)
        if len(group) == 0:
            if n_meta == 0:
                return _empty_manifest_table()
            # docmeta-only bucket: no segment file, but the n_docs_meta count
            # MUST survive into the manifest — the merge path derives
            # doc_count from sum(n_docs_meta), and dropping these rows
            # undercounts doc_count (corrupting idf / avg_field_length on
            # merged generations). path="" marks "no segment" for readers.
            return pa.table(
                {
                    "bucket": pa.array([bucket], pa.uint32()),
                    "path": pa.array([""]),
                    "n_terms": pa.array([0], pa.uint64()),
                    "n_postings": pa.array([0], pa.uint64()),
                    "sum_tf": pa.array([0.0], pa.float64()),
                    "n_docs_meta": pa.array([n_meta], pa.uint64()),
                    "min_term": pa.array([""]),
                    "max_term": pa.array([""]),
                    "lineage": pa.array([self.lineage]),
                }
            )
        seg = encode_bucket_table(
            group.drop_columns(["bucket"]), self.cfg.block_size, self.cfg.with_positions
        )
        seg_dir = os.path.join(self.out_dir, "segments")
        os.makedirs(seg_dir, exist_ok=True)
        final = os.path.join(seg_dir, f"bucket={bucket:05d}.parquet")
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(
            seg,
            tmp,
            compression="zstd",
            row_group_size=4096,
        )
        os.replace(tmp, final)  # atomic; reruns are idempotent
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.uint32()),
                "path": pa.array([f"segments/bucket={bucket:05d}.parquet"]),
                "n_terms": pa.array([len(seg)], pa.uint64()),
                "n_postings": pa.array([len(group)], pa.uint64()),
                "sum_tf": pa.array([float(pc.sum(group["tf"]).as_py() or 0)], pa.float64()),
                "n_docs_meta": pa.array([n_meta], pa.uint64()),
                "min_term": pa.array([seg["term"][0].as_py()]),
                "max_term": pa.array([seg["term"][-1].as_py()]),
                "lineage": pa.array([self.lineage]),
            }
        )


def _empty_manifest_table() -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array([], pa.uint32()),
            "path": pa.array([], pa.string()),
            "n_terms": pa.array([], pa.uint64()),
            "n_postings": pa.array([], pa.uint64()),
            "sum_tf": pa.array([], pa.float64()),
            "n_docs_meta": pa.array([], pa.uint64()),
            "min_term": pa.array([], pa.string()),
            "max_term": pa.array([], pa.string()),
            "lineage": pa.array([], pa.string()),
        }
    )


def _bucketize_postings(cfg: IndexConfig):
    """map_batches fn adding the shuffle key to bare posting rows (used by the
    merge job, which re-creates posting rows from existing segments)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch["term"].to_pylist(), dtype=object)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        is_meta = terms == DOCMETA_TERM
        h = stable_term_hash(terms)
        if cfg.heavy_terms:
            heavy = pd.Series(terms).isin(cfg.heavy_terms).to_numpy()
            if heavy.any():
                salt = (doc_ids >> np.uint64(cfg.salt_shift)) % np.uint64(cfg.salt_k)
                h = h.copy()
                h[heavy] = h[heavy] + salt[heavy] * _SALT_PRIME
        if is_meta.any():
            h[is_meta] = pd.util.hash_array(doc_ids[is_meta])
        bucket = (h % np.uint64(cfg.num_buckets)).astype(np.uint32)
        return batch.add_column(0, "bucket", pa.array(bucket, pa.uint32()))

    return add_bucket


def _run_bucket_shuffle(
    postings: "ray.data.Dataset",
    out_dir: str,
    cfg: IndexConfig,
    lineage: str,
    resume: bool,
    doc_count: int | None,
) -> dict:
    """The shared tail of every build: bucket shuffle -> encode -> manifest."""
    os.makedirs(out_dir, exist_ok=True)

    done_buckets: dict[int, dict] = {}
    man_path = os.path.join(out_dir, MANIFEST_NAME)
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            old = json.load(f)
        if old.get("config") == cfg.to_json():
            for b in old.get("buckets", []):
                # docmeta-only buckets have path="" (no segment file); their
                # durable artifact is the docmeta parquet
                artifact = b["path"] or os.path.join(
                    "docmeta", f"bucket={b['bucket']:05d}.parquet"
                )
                if b.get("lineage") == lineage and os.path.exists(
                    os.path.join(out_dir, artifact)
                ):
                    done_buckets[b["bucket"]] = b

    t0 = time.perf_counter()
    if done_buckets:
        missing = sorted(set(range(cfg.num_buckets)) - set(done_buckets))
        if not missing:
            postings = None
        else:
            missing_set = pa.array(np.array(missing, np.uint32))
            postings = postings.map_batches(
                lambda b: b.filter(pc.is_in(b["bucket"], value_set=missing_set)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )

    rows = []
    if postings is not None:
        encoder = BucketEncoder(out_dir, cfg, lineage)

        def encode_group(group: pa.Table) -> pa.Table:
            return encoder(group)

        manifest_ds = postings.groupby("bucket").map_groups(
            encode_group, batch_format="pyarrow"
        )
        rows = manifest_ds.take_all()  # tiny: one row per bucket

    build_secs = time.perf_counter() - t0
    buckets = list(done_buckets.values()) + [
        {
            "bucket": int(r["bucket"]),
            "path": r["path"],
            "n_terms": int(r["n_terms"]),
            "n_postings": int(r["n_postings"]),
            "sum_tf": float(r["sum_tf"]),
            "n_docs_meta": int(r.get("n_docs_meta", 0)),
            "min_term": r["min_term"],
            "max_term": r["max_term"],
            "lineage": r["lineage"],
        }
        for r in rows
    ]
    buckets.sort(key=lambda b: b["bucket"])
    n_meta = int(sum(b.get("n_docs_meta", 0) for b in buckets))
    manifest = {
        "format_version": 1,
        "generation": int(time.time()),
        "doc_count": int(doc_count) if doc_count is not None else n_meta,
        # sum_tf is computed AFTER the encoder splits out docmeta rows, so it
        # is exactly the total field length (sum of posting tfs)
        "total_field_length": float(sum(b["sum_tf"] for b in buckets)),
        "n_postings": int(sum(b["n_postings"] for b in buckets)),
        "build_secs": build_secs,
        "config": cfg.to_json(),
        "lineage": lineage,
        "buckets": buckets,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, man_path)
    return manifest


class _BatchDf:
    """map_batches callable for the heavy-term df sketch: per batch, the
    number of DISTINCT docs containing each term, pre-filtered to terms seen
    in >= ``min_batch_df`` docs (a globally heavy term cannot miss that bar
    in a reasonably-sized batch, and it keeps hapax terms out of the
    shuffle)."""

    def __init__(self, cfg: IndexConfig, min_batch_df: int):
        self.cfg = cfg
        self.min_batch_df = min_batch_df

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.cfg.text_col].to_pylist()
        doc_idx, codes, uniques, _pos, _fl = self.cfg.analyzer.analyze_batch_coded(
            texts
        )
        empty = pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
        if len(doc_idx) == 0:
            return empty
        key = doc_idx.astype(np.int64) * len(uniques) + codes
        uk = np.unique(key)
        cnt = np.bincount((uk % len(uniques)).astype(np.int64), minlength=len(uniques))
        keep = cnt >= self.min_batch_df
        if not keep.any():
            return empty
        return pa.table(
            {
                "term": pa.array(uniques[keep], pa.string()),
                "df": pa.array(cnt[keep].astype(np.int64), pa.int64()),
            }
        )


def detect_heavy_terms(
    docs: "ray.data.Dataset",
    cfg: IndexConfig,
    doc_count: int | None = None,
    sample_frac: float | None = None,
    heavy_df_frac: float = 0.05,
    max_terms: int = 64,
    min_batch_df: int = 2,
    seed: int = 7,
) -> tuple[str, ...]:
    """Cheap df-sketch pre-pass: terms whose (sampled) document frequency is
    >= ``heavy_df_frac`` of sampled docs — the candidates for bucket-shuffle
    salting (SURVEY §7.2 milestone 6). One light shuffle of per-batch
    (term, df) partials; the result list is tiny by construction.

    ``sample_frac=None`` auto-sizes the sample to ~50k docs (full scan below
    that); the detection threshold applies within the sample."""
    if doc_count is None:
        doc_count = docs.count()
    if doc_count == 0:
        return ()
    if sample_frac is None:
        sample_frac = min(1.0, 50_000 / doc_count)
    sampled = docs if sample_frac >= 1.0 else docs.random_sample(sample_frac, seed=seed)
    n_sample = doc_count if sample_frac >= 1.0 else max(1, sampled.count())
    threshold = max(float(min_batch_df), heavy_df_frac * n_sample)

    # shard by term hash: a per-term groupby would pay one Python group
    # call per VOCABULARY entry; each shard sums its term runs in one
    # vectorized pass and applies the threshold locally
    n_shards = 64

    def add_shard(batch: pa.Table) -> pa.Table:
        h = stable_term_hash(batch["term"].to_pylist())
        return batch.append_column(
            "shard", pa.array((h % np.uint64(n_shards)).astype(np.int32))
        )

    def reduce_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
        if not len(group):
            return empty
        g = group.sort_by("term")
        terms = g["term"].combine_chunks()
        codes = pc.dictionary_encode(terms).indices.to_numpy(zero_copy_only=False)
        dfs = g["df"].to_numpy(zero_copy_only=False)
        change = np.empty(len(codes), bool)
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(dfs, starts)
        keep = sums >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {
                "term": terms.take(pa.array(starts[keep])),
                "df": pa.array(sums[keep].astype(np.int64), pa.int64()),
            }
        )

    out = (
        sampled.map_batches(
            _BatchDf(cfg, min_batch_df), batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(reduce_shard, batch_format="pyarrow")
    )
    tables = [t for t in ray.get(out.materialize().to_arrow_refs()) if len(t)]
    if not tables:
        return ()
    heavy = pa.concat_tables(tables).sort_by([("df", "descending")])
    return tuple(heavy["term"].to_pylist()[:max_terms])


def build_index(
    docs: "ray.data.Dataset",
    out_dir: str,
    cfg: IndexConfig | None = None,
    lineage: str = "",
    resume: bool = False,
    auto_heavy: bool | dict = False,
    doc_count: int | None = None,
) -> dict:
    """Build an inverted index at ``out_dir`` from a docs Dataset.

    Returns the manifest dict (also written to ``out_dir/manifest.json``).
    ``lineage`` should fingerprint the input (paths + row counts + config);
    with ``resume=True``, buckets already on disk whose manifest lineage
    matches are skipped (the shuffle is filtered down to missing buckets).

    ``auto_heavy=True`` (or a dict of ``detect_heavy_terms`` kwargs) runs
    the df-sketch pre-pass and salts the detected heavy terms, so skewed
    (stopword-like) postings split across buckets without the caller having
    to declare them. Skipped when ``cfg.heavy_terms`` is already set.
    """
    postings, cfg, doc_count = prepare_postings(docs, cfg, doc_count, auto_heavy)
    return _run_bucket_shuffle(postings, out_dir, cfg, lineage, resume, doc_count)


def prepare_postings(
    docs: "ray.data.Dataset",
    cfg: IndexConfig | None,
    doc_count: int | None = None,
    auto_heavy: bool | dict = False,
) -> tuple["ray.data.Dataset", IndexConfig, int]:
    """The shared head of every build: partitioning defense + optional heavy-
    term detection + the tokenize stage. Returns (posting rows Dataset,
    resolved cfg, doc_count); callers route the rows to one or more shuffles
    (term buckets, doc shards) without re-tokenizing."""
    cfg = cfg or IndexConfig()
    if doc_count is None:
        # count() on a plain read is metadata-only; on a lazy transformed
        # Dataset it EXECUTES the pipeline — callers that know the row count
        # (or prepend 1:1 stages like extraction) should pass it in.
        doc_count = docs.count()
    # Defend against under-partitioned inputs: a single-block Dataset (e.g.
    # ray.data.from_arrow, or read_parquet of one small file) would run the
    # ENTIRE tokenize stage as one serial task. When the input's block count
    # is visible (materialized) and too small for the cluster, repartition —
    # the extra pass over raw text is far cheaper than serial tokenization.
    try:
        nb = docs.num_blocks()
    except Exception:
        nb = None  # lazy dataset: block count is the reader's choice
    if nb is not None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        target = min(max(ncpu, 8), max(1, doc_count // 200))
        if nb < max(2, target // 2):
            docs = docs.repartition(target)
    if auto_heavy and not cfg.heavy_terms:
        kwargs = auto_heavy if isinstance(auto_heavy, dict) else {}
        detected = detect_heavy_terms(docs, cfg, doc_count=doc_count, **kwargs)
        if detected:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, heavy_terms=detected)
    postings = docs.map_batches(
        TokenizePostings(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return postings, cfg, doc_count


def build_index_from_postings(
    postings: "ray.data.Dataset",
    out_dir: str,
    cfg: IndexConfig,
    lineage: str = "",
    resume: bool = False,
) -> dict:
    """Build an index from bare posting rows (term, doc_id, tf, len_byte
    [, positions]) that include DOCMETA_TERM rows — the merge-job entry."""
    bucketed = postings.map_batches(
        _bucketize_postings(cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    return _run_bucket_shuffle(bucketed, out_dir, cfg, lineage, resume, None)
