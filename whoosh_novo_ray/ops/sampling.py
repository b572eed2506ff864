"""Corpus-shaping samplers: CCNet-style perplexity buckets and
target-mixture resampling.

Both follow the repo's two-phase broadcast pattern: a tiny per-batch
pre-reduce (bounded rows per batch regardless of corpus size) feeds a
driver-side model of at most a few numbers, which then drives a stateless
streaming filter/labeler — no shuffle at any scale, and every decision is
md5-deterministic so reruns, shard layouts and the DuckDB oracles pick the
exact same rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from whoosh_novo_ray.ops.curation import unigram_lm_table
from whoosh_novo_ray.ops.hashing import md5_u64_arr
from whoosh_novo_ray.ops.packing import stratified_sample


def _md5_mod(ids: np.ndarray, mod: int) -> np.ndarray:
    """md5(str(doc_id)) % mod — DuckDB ``md5_number_lower(doc_id::VARCHAR)``."""
    return md5_u64_arr([str(int(i)) for i in ids]) % np.uint64(mod)


class _BucketAssign:
    """Label each doc head/middle/tail against the broadcast cutoff keys.

    The ordering key is ``(mean_logprob DESC, doc_id ASC)`` — higher mean
    log-prob = lower perplexity = better (CCNet keeps 'head'). Cutoffs are
    (score, doc_id) TUPLES, so equal scores split deterministically."""

    def __init__(self, cut1, cut2):
        self.c1s, self.c1d = cut1
        self.c2s, self.c2d = cut2

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch["mean_logprob"].to_numpy()
        d = batch["doc_id"].to_numpy()

        def before(cs, cd):
            return (s > cs) | ((s == cs) & (d < cd))

        bucket = np.where(
            before(self.c1s, self.c1d),
            "head",
            np.where(before(self.c2s, self.c2d), "middle", "tail"),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "mean_logprob": batch["mean_logprob"],
                "bucket": pa.array(bucket.tolist(), pa.string()),
            }
        )


def perplexity_buckets_table(
    docs: "ray.data.Dataset", sample_mod: int = 8
) -> "ray.data.Dataset":
    """CCNet-style quality bucketing (Wenzek et al. 2020): score every doc
    under the corpus-trained unigram LM, learn tercile cutoffs from a
    deterministic 1/``sample_mod`` doc sample, and label each doc
    head / middle / tail.

    The cutoffs come from a SAMPLE — exactly how CCNet trains its
    perplexity thresholds — so the driver never holds more than n/mod
    (score, id) pairs; at real scale ``sample_mod`` grows with the corpus.
    Returns ``(doc_id, mean_logprob, bucket)``.
    """
    scored = unigram_lm_table(docs).materialize()

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64()).to_numpy()
        keep = _md5_mod(ids, sample_mod) == 0
        return batch.filter(pa.array(keep)).select(["doc_id", "mean_logprob"])

    sample = pa.concat_tables(
        [
            t
            for t in ray.get(
                scored.map_batches(
                    pick, batch_format="pyarrow", zero_copy_batch=True
                )
                .materialize()
                .to_arrow_refs()
            )
            if len(t)
        ]
        or [pa.table({"doc_id": pa.array([], pa.int64()),
                      "mean_logprob": pa.array([], pa.float64())})]
    )
    sid = sample["doc_id"].to_numpy(zero_copy_only=False)
    ss = sample["mean_logprob"].to_numpy(zero_copy_only=False)
    order = np.lexsort((sid, -ss))  # score desc, doc_id asc
    ns = len(order)
    if ns < 3:
        cut1 = cut2 = (np.inf, -1)  # everything 'tail' of an unknowable split
    else:
        i1, i2 = order[ns // 3], order[2 * ns // 3]
        cut1 = (float(ss[i1]), int(sid[i1]))
        cut2 = (float(ss[i2]), int(sid[i2]))
    return scored.map_batches(
        _BucketAssign,
        fn_constructor_args=(cut1, cut2),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )


def mixture_sample_table(
    docs: "ray.data.Dataset",
    weights: dict[str, float],
    group_col: str = "source",
) -> "ray.data.Dataset":
    """Resample ``docs`` to a target domain mixture: ``weights`` maps group
    values to target proportions (DoReMi-style static mixture).  The
    largest total T satisfying every proportion is ``min_g n_g / w_g``;
    each group then keeps ``w_g * T / n_g`` of its rows via the md5-rate
    filter (engine- and SQL-reproducible), so the output approximates the
    target mixture while never oversampling.

    Group counts come from a per-batch ``np.unique`` pre-reduce (at most
    |groups| rows per batch) summed on the driver — the group-count table
    is domain-cardinality-sized, never corpus-sized.  Rows not named in
    ``weights`` are dropped.  All columns pass through.
    """

    def count_batch(batch: pa.Table) -> pa.Table:
        vals, cnt = np.unique(np.asarray(batch[group_col].to_pylist(), object),
                              return_counts=True)
        return pa.table(
            {
                "g": pa.array(vals.tolist(), pa.string()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    # distributed sum of the per-batch group counts (native vectorized
    # aggregate): the driver reads one row per DOMAIN, never per batch
    agg = (
        docs.map_batches(count_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .sum("c")
        .take_all()
    )
    counts: dict[str, int] = {row["g"]: int(row["sum(c)"]) for row in agg}
    active = [
        (g, w) for g, w in weights.items() if w > 0 and counts.get(g, 0) > 0
    ]
    if not active:
        return stratified_sample(docs, {}, group_col=group_col, default_rate=0.0)
    t_max = min(counts[g] / w for g, w in active)
    rates = {g: min(1.0, (w * t_max) / counts[g]) for g, w in active}
    return stratified_sample(docs, rates, group_col=group_col, default_rate=0.0)
