"""Posting-block codec: delta + varint doc ids, varint tfs, raw length bytes.

Re-expresses the semantics of the reference's W3 posting blocks
(de-odex/whoosh-novo ``src/whoosh/codec/whoosh3.py:675-902``: blocks of <=128
postings, delta-encoded ids, per-block header carrying count / max id / max
weight / min length for WAND-style block skipping) as numpy-vectorized
encoders over flat posting arrays, so a whole hash-bucket of terms is encoded
in one pass with no per-posting Python loop.

Layout per term (columns of the segment Parquet, see index/build.py):
  * three blobs — ``ids_blob`` (varint deltas, absolute at block starts),
    ``tfs_blob`` (varint), ``lens_blob`` (raw uint8 length bytes) — kept
    separate so a block decode is three slices, no interleave parsing;
  * per-block metadata lists (count, max_id, max_weight, min_len_byte) +
    byte offsets into the blobs = the skip table.
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_U7F = np.uint64(0x7F)


def varint_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128 encode. Returns (byte buffer uint8, nbytes per value).

    Fast path: posting deltas/tfs are overwhelmingly < 128, so the common
    case is a single cast; multi-byte values are filled by iterating only
    over the (few) remaining actives.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    big_mask = v >= np.uint64(128)
    if not big_mask.any():
        return v.astype(np.uint8), np.ones(n, np.int64)
    nb = np.ones(n, np.int64)
    x = v[big_mask] >> _U7
    nb_big = np.ones(len(x), np.int64)
    while True:
        more = x > 0
        if not more.any():
            break
        nb_big += more
        x >>= _U7
    nb[big_mask] = nb_big
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), np.uint8)
    # layer 0 for everyone
    out[starts] = (v & _U7F).astype(np.uint8) | (big_mask.astype(np.uint8) << 7)
    # higher layers only for multi-byte values
    idx = np.flatnonzero(big_mask)
    val = v[idx] >> _U7
    k = 1
    while len(idx):
        more = (k + 1) < nb[idx]
        out[starts[idx] + k] = (val & _U7F).astype(np.uint8) | (
            more.astype(np.uint8) << 7
        )
        keep = more
        idx = idx[keep]
        val = val[keep] >> _U7
        k += 1
    return out, nb


def varint_decode(buf, n: int) -> np.ndarray:
    """Vectorized LEB128 decode of exactly ``n`` values from ``buf``."""
    if n == 0:
        return np.empty(0, np.uint64)
    data = np.frombuffer(buf, np.uint8)
    if len(data) == n:
        # every value fits one byte (all < 128) — common for tfs and dense
        # doc-id deltas; skips the continuation machinery entirely
        return data.astype(np.uint64)
    is_end = (data & 0x80) == 0
    ends = np.flatnonzero(is_end)[:n]
    starts = np.empty(n, np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(n, np.uint64)
    cur = starts.copy()
    shift = np.zeros(n, np.uint64)
    active_idx = np.arange(n)
    while len(active_idx):
        b = data[cur[active_idx]].astype(np.uint64)
        vals[active_idx] |= (b & _U7F) << shift[active_idx]
        cont = active_idx[(b & np.uint64(0x80)) != 0]
        cur[cont] += 1
        shift[cont] += _U7
        active_idx = cont
    return vals


def delta_encode_with_resets(ids: np.ndarray, reset_mask: np.ndarray) -> np.ndarray:
    """ids -> deltas, storing the absolute id wherever reset_mask is True
    (term starts and block starts, so each block decodes independently)."""
    ids = np.ascontiguousarray(ids, dtype=np.uint64)
    d = np.empty_like(ids)
    d[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=d[1:])
    d[reset_mask] = ids[reset_mask]
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    """Inverse of per-block delta encoding (first value absolute)."""
    return np.cumsum(deltas, dtype=np.uint64)


def encode_positions(pos_flat: np.ndarray, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode ragged per-posting position lists.

    ``pos_flat`` is the concatenation of each posting's sorted positions;
    ``counts`` is positions-per-posting. Wire format per posting:
    varint(count) then varint deltas (first absolute). Returns
    (byte buffer, bytes-per-posting).
    """
    n = len(counts)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    total = int(counts.sum())
    # interleave: for each posting, [count, d0, d1, ...]
    out_vals = np.empty(n + total, np.uint64)
    ends = np.cumsum(counts)
    starts = ends - counts
    cnt_pos = starts + np.arange(n)  # index of the count entry per posting
    out_vals[cnt_pos] = counts.astype(np.uint64)
    if total:
        pos_flat = np.ascontiguousarray(pos_flat, dtype=np.uint64)
        deltas = np.empty(total, np.uint64)
        deltas[0] = pos_flat[0]
        np.subtract(pos_flat[1:], pos_flat[:-1], out=deltas[1:])
        deltas[starts[counts > 0]] = pos_flat[starts[counts > 0]]
        val_mask = np.ones(n + total, bool)
        val_mask[cnt_pos] = False
        out_vals[val_mask] = deltas
    buf, nb = varint_encode(out_vals)
    # bytes per posting = bytes(count varint) + bytes(its deltas)
    grp = np.repeat(np.arange(n), counts + 1)
    per_posting = np.bincount(grp, weights=nb, minlength=n).astype(np.int64)
    return buf, per_posting


def decode_positions_flat(buf, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of a positions blob given the per-posting position
    counts (== tf). Returns (flat positions uint64, counts int64): posting i's
    positions are ``flat[counts[:i].sum() : counts[:i+1].sum()]``.
    """
    counts = np.ascontiguousarray(tfs, dtype=np.int64)
    n = len(counts)
    total = int(counts.sum())
    if n == 0 or total == 0:
        return np.empty(0, np.uint64), counts
    vals = varint_decode(buf, n + total)
    # entry layout per posting: [count, d0..d_{c-1}]; counts sit at
    # offset cumsum(c+1) boundaries
    ends = np.cumsum(counts + 1)
    cnt_pos = ends - (counts + 1)
    mask = np.ones(n + total, bool)
    mask[cnt_pos] = False
    deltas = vals[mask]
    # segmented cumsum per posting
    c = np.cumsum(deltas, dtype=np.uint64)
    seg_start = np.cumsum(counts) - counts
    nz = counts > 0
    first = seg_start[nz]
    corr_vals = c[first] - deltas[first]
    flat = c - np.repeat(corr_vals, counts[nz])
    return flat, counts


def decode_positions(buf, n_postings: int) -> list[np.ndarray]:
    """Decode ``n_postings`` position lists from a positions-blob slice."""
    out: list[np.ndarray] = []
    data = memoryview(buf)
    off = 0
    for _ in range(n_postings):
        cnt, off = _read_varint(data, off)
        if cnt == 0:
            out.append(np.empty(0, np.uint64))
            continue
        vals = np.empty(cnt, np.uint64)
        for i in range(cnt):
            vals[i], off = _read_varint(data, off)
        out.append(np.cumsum(vals, dtype=np.uint64))
    return out


def _read_varint(data, off: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[off]
        off += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, off
        shift += 7
