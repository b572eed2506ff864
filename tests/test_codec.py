"""Posting-block codec round-trips."""

import numpy as np
import pyarrow as pa

from whoosh_novo_ray.codec import (
    decode_positions,
    delta_encode_with_resets,
    encode_positions,
    varint_decode,
    varint_encode,
)
from whoosh_novo_ray.index.build import encode_bucket_table
from whoosh_novo_ray.index.segment import _row_to_termrow


def test_varint_roundtrip():
    rng = np.random.default_rng(0)
    for scale in (2**7, 2**14, 2**32, 2**63):
        v = rng.integers(0, scale, 5000).astype(np.uint64)
        buf, nb = varint_encode(v)
        assert nb.sum() == len(buf)
        out = varint_decode(buf.tobytes(), len(v))
        assert (out == v).all()


def test_varint_edge_values():
    v = np.array([0, 1, 127, 128, 2**63, 2**64 - 1], np.uint64)
    buf, _ = varint_encode(v)
    assert (varint_decode(buf.tobytes(), len(v)) == v).all()


def test_positions_roundtrip():
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 6, 300)
    pos = (
        np.concatenate(
            [np.sort(rng.choice(500, c, replace=False)) for c in counts]
        ).astype(np.uint64)
        if counts.sum()
        else np.empty(0, np.uint64)
    )
    buf, per = encode_positions(pos, counts)
    lists = decode_positions(buf.tobytes(), len(counts))
    assert [len(x) for x in lists] == counts.tolist()
    if counts.sum():
        assert (np.concatenate(lists) == pos).all()


def _random_bucket_table(rng, n_terms=40, with_positions=True):
    rows = {"term": [], "doc_id": [], "tf": [], "len_byte": [], "positions": []}
    for t in range(n_terms):
        term = f"term{t:03d}"
        df = int(rng.integers(1, 400))
        ids = np.sort(rng.choice(10**6, df, replace=False)).astype(np.uint64)
        for d in ids:
            tf = int(rng.integers(1, 9))
            rows["term"].append(term)
            rows["doc_id"].append(int(d))
            rows["tf"].append(tf)
            rows["len_byte"].append(int(rng.integers(0, 256)))
            rows["positions"].append(
                np.sort(rng.choice(1000, tf, replace=False)).astype(np.int32).tolist()
            )
    tbl = pa.table(
        {
            "term": pa.array(rows["term"]),
            "doc_id": pa.array(rows["doc_id"], pa.uint64()),
            "tf": pa.array(rows["tf"], pa.uint32()),
            "len_byte": pa.array(rows["len_byte"], pa.uint8()),
            "positions": pa.array(rows["positions"], pa.list_(pa.int32())),
        }
    )
    if not with_positions:
        tbl = tbl.drop_columns(["positions"])
    return tbl


def test_bucket_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    tbl = _random_bucket_table(rng)
    seg = encode_bucket_table(tbl, block_size=128, with_positions=True)

    # reconstruct a reference dict from the input
    import collections

    expect = collections.defaultdict(list)
    for r in tbl.to_pylist():
        expect[r["term"]].append((r["doc_id"], r["tf"], r["len_byte"], r["positions"]))

    assert len(seg) == len(expect)
    for i in range(len(seg)):
        tr = _row_to_termrow(seg, i, with_positions=True)
        exp = sorted(expect[tr.term])
        ids, tfs, lens = tr.decode_all()
        assert tr.df == len(exp)
        assert ids.tolist() == [e[0] for e in exp]
        assert tfs.tolist() == [e[1] for e in exp]
        assert lens.tolist() == [e[2] for e in exp]
        pos = tr.decode_all_positions()
        assert [p.tolist() for p in pos] == [e[3] for e in exp]
        # per-block decode agrees with full decode
        off = 0
        for b in range(tr.n_blocks):
            bids, btfs, blens = tr.decode_block(b)
            cnt = len(bids)
            assert bids.tolist() == ids[off : off + cnt].tolist()
            assert btfs.tolist() == tfs[off : off + cnt].tolist()
            assert blens.tolist() == lens[off : off + cnt].tolist()
            assert int(tr.block_max_ids[b]) == int(bids[-1])
            assert float(tr.block_max_weights[b]) == float(btfs.max())
            assert int(tr.block_min_lens[b]) == int(blens.min())
            off += cnt
        # term aggregates
        assert float(tr.weight) == float(tfs.sum())
        assert float(tr.max_weight) == float(tfs.max())
