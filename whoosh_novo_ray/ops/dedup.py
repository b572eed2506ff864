"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Shuffle discipline at scale:
  * exact dedup = one hash-keyed groupby (combiner aggregation — Min — so the
    shuffle moves one row per (hash, block), not per doc);
  * n-gram Jaccard = explode shingles -> groupby(shingle) pair emit ->
    groupby(pair) count (pair emission is capped per shingle group: a shingle
    shared by s docs emits s*(s-1)/2 pairs — ``max_group`` bounds the
    quadratic blowup from boilerplate shingles, the web-scale skew analog of
    stopword posting lists);
  * MinHash/LSH = per-doc signature (map_batches, no shuffle) -> band-bucket
    groupby -> candidate pairs -> optional exact-Jaccard verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min

from whoosh_novo_ray.analysis import simple_analyzer

_RAW = simple_analyzer()

_MERSENNE = (1 << 61) - 1


def _stable_hash_strings(arr: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)


# -- exact dedup --------------------------------------------------------------


class _TextMd5:
    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "text_md5": pa.array(h, pa.string()),
            }
        )


def exact_dedup_keep(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact dedup by content hash: keep the lowest doc_id per md5(text).

    Returns (text_md5, doc_id) of survivors. The Min aggregation pre-combines
    per block before the shuffle, so the exchange is one row per distinct
    hash per block — safe at 100 TB.
    """
    hashed = docs.map_batches(_TextMd5(), batch_format="pyarrow", zero_copy_batch=True)
    kept = hashed.groupby("text_md5").aggregate(Min("doc_id"))
    return kept.map_batches(
        lambda b: pa.table(
            {
                "text_md5": b["text_md5"],
                "doc_id": pc.cast(b["min(doc_id)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# -- word n-gram shingles ------------------------------------------------------


class _Shingles:
    """Explode docs into distinct word n-gram shingles (doc_id, shingle)."""

    def __init__(self, n: int = 3):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        out_doc: list[int] = []
        out_sh: list[str] = []
        ids = batch["doc_id"].to_pylist()
        for did, text in zip(ids, batch["text"].to_pylist()):
            toks = _RAW(text)
            if len(toks) < n:
                continue
            sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            out_doc.extend([did] * len(sh))
            out_sh.extend(sh)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "shingle": pa.array(out_sh, pa.string()),
            }
        )


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    n: int = 3,
    threshold: float = 0.2,
    max_group: int | None = None,
) -> pa.Table:
    """All-pairs word-``n``-gram Jaccard similarity >= threshold.

    Returns Arrow table (doc_a, doc_b, jaccard) with doc_a < doc_b,
    jaccard rounded to 6 decimals. ``max_group`` skips shingles shared by
    more than that many docs (cap the quadratic pair blowup at scale; None =
    exact, matches the SQL oracle).
    """
    sh = docs.map_batches(_Shingles(n), batch_format="pyarrow", zero_copy_batch=True)

    # per-doc shingle-set size (for the union term)
    sizes_t = sh.groupby("doc_id").count().to_pandas()
    sizes = dict(zip(sizes_t["doc_id"], sizes_t["count()"]))

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) < 2 or (max_group is not None and len(ids) > max_group):
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[a], pa.int64()),
                "doc_b": pa.array(ids[b], pa.int64()),
            }
        )

    pairs = sh.groupby("shingle").map_groups(emit_pairs, batch_format="pyarrow")
    shared = pairs.groupby(["doc_a", "doc_b"]).count().to_pandas()
    if not len(shared):
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    inter = shared["count()"].to_numpy().astype(np.float64)
    sa = shared["doc_a"].map(sizes).to_numpy().astype(np.float64)
    sb = shared["doc_b"].map(sizes).to_numpy().astype(np.float64)
    jac = inter / (sa + sb - inter)
    keep = jac >= threshold
    out = shared[keep]
    return pa.table(
        {
            "doc_a": pa.array(out["doc_a"].to_numpy(), pa.int64()),
            "doc_b": pa.array(out["doc_b"].to_numpy(), pa.int64()),
            "jaccard": pa.array(np.round(jac[keep], 6), pa.float64()),
        }
    )


# -- MinHash + LSH -------------------------------------------------------------


class _MinHashSig:
    """Per-doc MinHash signature over word n-gram shingles.

    k seeded xorshift-multiply "permutations" over a stable 64-bit base hash
    of each shingle (uint64 wraparound arithmetic — fully vectorized, no
    bignum math); deterministic across workers. Pure map_batches: no shuffle,
    no state beyond __init__.
    """

    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, n: int = 3, num_perm: int = 64, seed: int = 7):
        self.n = n
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(1, 2**63, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray | None:
        toks = _RAW(text)
        if len(toks) < self.n:
            return None
        sh = list(
            {" ".join(toks[i : i + self.n]) for i in range(len(toks) - self.n + 1)}
        )
        base = _stable_hash_strings(np.array(sh, object))  # uint64
        # (n_shingles, num_perm) permuted hashes; min over shingles
        m = (base[:, None] ^ self.seeds[None, :]) * self._MIX
        m ^= m >> np.uint64(29)
        return m.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            s = self.signature(text)
            if s is not None:
                ids.append(did)
                sigs.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def minhash_lsh_candidates(
    docs: "ray.data.Dataset",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 7,
) -> pa.Table:
    """Near-duplicate candidate pairs via MinHash banding.

    Signature stage is a pure map_batches; banding explodes each doc into
    ``bands`` (band_key, doc_id) rows; one groupby(band_key) emits candidate
    pairs; a final groupby dedups pairs. Returns (doc_a, doc_b, est_jaccard)
    where est_jaccard is the signature-agreement fraction.
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs_ds = docs.map_batches(
        _MinHashSig(n, num_perm, seed), batch_format="pyarrow", zero_copy_batch=True
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        out_key, out_doc = [], []
        for did, sig in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
            for bi in range(bands):
                chunk = tuple(sig[bi * r : (bi + 1) * r])
                key = hashlib.md5(repr((bi, chunk)).encode()).hexdigest()[:16]
                out_key.append(key)
                out_doc.append(did)
        return pa.table(
            {
                "band_key": pa.array(out_key, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )

    banded = sigs_ds.map_batches(band_rows, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[a], pa.int64()),
                "doc_b": pa.array(ids[b], pa.int64()),
            }
        )

    pairs = (
        banded.groupby("band_key")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
        .to_pandas()
    )
    if not len(pairs):
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )
    # estimate jaccard from full signatures of the candidates
    sig_map = {
        r["doc_id"]: np.asarray(r["sig"], np.uint64)
        for r in sigs_ds.take_all()
        if r["doc_id"] in set(pairs["doc_a"]) | set(pairs["doc_b"])
    }
    est = [
        float((sig_map[a] == sig_map[b]).mean())
        for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    ]
    return pa.table(
        {
            "doc_a": pa.array(pairs["doc_a"].to_numpy(), pa.int64()),
            "doc_b": pa.array(pairs["doc_b"].to_numpy(), pa.int64()),
            "est_jaccard": pa.array(np.round(est, 6), pa.float64()),
        }
    )


# -- SimHash -------------------------------------------------------------------


class _SimHash:
    """64-bit SimHash over the token stream (tf-weighted bit voting)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.zeros(len(texts), np.uint64)
        for i, text in enumerate(texts):
            toks = _RAW(text)
            if not toks:
                continue
            uniq, counts = np.unique(np.array(toks, object), return_counts=True)
            hs = _stable_hash_strings(uniq)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            out[i] = np.uint64(
                sum(1 << b for b in range(64) if votes[b] > 0)
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "simhash": pa.array(out, pa.uint64()),
            }
        )


def simhash_table(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(_SimHash(), batch_format="pyarrow", zero_copy_batch=True)
