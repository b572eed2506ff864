"""Sampler ops: CCNet perplexity buckets, target-mixture resampling, and
SemDeDup cluster-blocked embedding dedup — brute-force replicas + the
determinism/passthrough contracts."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows, blocks=3):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(tbl).repartition(blocks)


def _u32(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def test_perplexity_buckets_brute(ray_session):
    from whoosh_novo_ray.ops import perplexity_buckets_table

    # 24 docs: 8 made of very common words, 8 mid, 8 of singletons
    rows = []
    for i in range(24):
        if i < 8:
            text = "common words common words common"
        elif i < 16:
            text = f"common mid{i % 4} words"
        else:
            text = f"rare{i} unique{i} single{i}"
        rows.append((i, text, "src0"))
    out = {
        r["doc_id"]: r
        for r in perplexity_buckets_table(_docs_ds(rows), sample_mod=2).take_all()
    }
    assert len(out) == 24

    # brute replica: unigram LM -> rounded mean logp -> sample cutoffs
    from collections import Counter

    toks = {i: t.lower().split() for i, t, _ in rows}
    cnt = Counter(w for ws in toks.values() for w in ws)
    tot = sum(cnt.values())
    score = {
        i: round(float(np.mean([np.log(cnt[w] / tot) for w in ws])), 6)
        if ws
        else 0.0
        for i, ws in toks.items()
    }
    samp = sorted(
        (i for i in toks if _md5_u64(str(i)) % 2 == 0),
        key=lambda i: (-score[i], i),
    )
    c1, c2 = samp[len(samp) // 3], samp[2 * len(samp) // 3]

    def before(i, c):
        return score[i] > score[c] or (score[i] == score[c] and i < c)

    for i in toks:
        want = "head" if before(i, c1) else ("middle" if before(i, c2) else "tail")
        assert out[i]["bucket"] == want, i
        assert out[i]["mean_logprob"] == pytest.approx(score[i], abs=1e-6)
    assert {out[i]["bucket"] for i in toks} == {"head", "middle", "tail"}


def _md5_u64(s):
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def test_mixture_sample_rates_and_passthrough(ray_session):
    from whoosh_novo_ray.ops import mixture_sample_table

    rows = [(i, f"text {i}", f"src{i % 4}") for i in range(400)]
    weights = {"src0": 0.5, "src1": 0.5}  # src2/src3 dropped entirely
    out = mixture_sample_table(_docs_ds(rows, blocks=5), weights).take_all()
    assert all(set(r) == {"doc_id", "text", "source"} for r in out)  # passthrough
    srcs = {r["source"] for r in out}
    assert srcs <= {"src0", "src1"}
    # n_g = 100 each, T = min(100/.5) = 200 -> rate 1.0 for both
    assert len(out) == 200

    # brute replica of the rate filter on a skewed mixture
    weights2 = {"src0": 0.8, "src1": 0.2}
    out2 = {r["doc_id"] for r in mixture_sample_table(_docs_ds(rows, blocks=5), weights2).take_all()}
    t = min(100 / 0.8, 100 / 0.2)  # 125
    for i, _, s in rows:
        if s == "src0":
            want = _u32(i) < int(min(1.0, 0.8 * t / 100) * 2**32)
        elif s == "src1":
            want = _u32(i) < int(min(1.0, 0.2 * t / 100) * 2**32)
        else:
            want = False
        assert (i in out2) == want, i
    # determinism across runs
    out3 = {r["doc_id"] for r in mixture_sample_table(_docs_ds(rows, blocks=2), weights2).take_all()}
    assert out2 == out3


def _emb_ds(vecs, blocks=2):
    import ray.data

    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_semdedup_drops_higher_id_within_cell(ray_session):
    from whoosh_novo_ray.ops.knn import semdedup_table

    # two orthogonal centroids; vecs 2/3 duplicate each other in cell 0,
    # vec 4 is near-parallel but lands in cell 1 -> cross-cell, kept
    c = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    vecs = [
        [1.0, 0.0, 0.0],      # 0: cell 0
        [0.0, 1.0, 0.0],      # 1: cell 1
        [0.8, 0.6, 0.0],      # 2: cell 0 (cos vs 0 = 0.8 < tau)
        [0.8, 0.6, 0.0],      # 3: dup of 2, higher id -> dropped
        [0.6, 0.8, 0.0],      # 4: cell 1; cos vs 2 = 0.96 < tau and other cell
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup_table(_emb_ds(vecs), c, threshold=0.99).take_all()
    }
    assert out[2]["cell"] == 0 and out[3]["cell"] == 0 and out[4]["cell"] == 1
    assert out[3]["keep"] is False
    assert all(out[i]["keep"] for i in (0, 1, 2, 4))


def test_semdedup_blocked_matmul_matches_full(ray_session):
    """The row-blocked within-cell matmul equals the full-matrix rule on a
    cell larger than the 1024 block (forces >1 block)."""
    from whoosh_novo_ray.ops.knn import semdedup_table

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8))
    vecs = np.concatenate([base, base[:15] + rng.normal(scale=1e-3, size=(15, 8))])
    c = np.eye(8)[:2]
    out = semdedup_table(_emb_ds(vecs.tolist(), blocks=3), c, threshold=0.999)
    rows = {r["vec_id"]: r for r in out.take_all()}

    nm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)
    cell = (nm @ cn.T).argmax(1)
    for k in set(cell):
        idx = np.sort(np.flatnonzero(cell == k))
        s = nm[idx] @ nm[idx].T
        for pos, i in enumerate(idx):
            want = not (s[pos, :pos] >= 0.999).any()
            assert rows[i]["keep"] == want, i
