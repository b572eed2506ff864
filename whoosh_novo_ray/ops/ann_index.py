"""Persisted ANN indexes: partition-pruned parquet, built once per corpus.

The streaming ANN paths (``ops/knn.py`` lsh_knn / ivf_knn) re-bucket the
whole corpus per query — fine for a one-off, wrong for a serving workload.
This module writes the bucket/cell assignment ONCE as partitioned parquet
(``vectors/ivf_cell=K/`` or ``vectors/lsh_bucket=K/``); a query then reads
ONLY its probe partitions via path-pruned ``read_parquet`` and exact-reranks
inside them. At 100 TB that is the difference between scanning the corpus
per query and scanning ``nprobe/num_cells`` of it.

Assignments are deterministic (md5-seeded planes / supplied or sampled
centroids stored in the manifest), so a rebuilt index is bit-identical and
the partition files double as resumable output (atomic per-partition
writes; a matching-lineage manifest short-circuits the rebuild).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray
import ray.data

from whoosh_novo_ray.ops.knn import (
    _IvfAssign,
    _LshBucket,
    brute_force_knn,
    train_ivf_centroids,
)

ANN_MANIFEST = "ann_manifest.json"


def _load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, ANN_MANIFEST)) as f:
        return json.load(f)


def _pool_size() -> int:
    # fixed map_batches actor pools reserve their CPUs for the pipeline's
    # lifetime: leave headroom for the read/write tasks on small clusters
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(1, min(4, ncpu - 2))


def _write_assigned(
    assigned: "ray.data.Dataset", out_dir: str, part_col: str
) -> None:
    vec_dir = os.path.join(out_dir, "vectors")
    shutil.rmtree(vec_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    assigned.write_parquet(vec_dir, partition_cols=[part_col])


def build_ivf_index(
    embeddings: "ray.data.Dataset",
    out_dir: str,
    centroids: np.ndarray | None = None,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 5,
    lineage: str = "",
    resume: bool = True,
) -> dict:
    """Assign every vector to its nearest centroid cell and persist the
    corpus as ``vectors/ivf_cell=K/`` parquet partitions + a manifest
    holding the (normalized) centroids. ``centroids=None`` trains them with
    the deterministic sampled k-means (ops/knn.py)."""
    man_path = os.path.join(out_dir, ANN_MANIFEST)
    if resume and lineage and os.path.exists(man_path):
        old = _load_manifest(out_dir)
        if old.get("lineage") == lineage and old.get("kind") == "ivf":
            return old
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, vec_col, seed=seed
        )
    c = np.asarray(centroids, np.float64)
    norms = np.linalg.norm(c, axis=1)
    norms[norms == 0] = 1.0
    c = c / norms[:, None]

    assigned = embeddings.map_batches(
        _IvfAssign,
        fn_constructor_args=(c, vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=_pool_size(),
    )
    _write_assigned(assigned, out_dir, "ivf_cell")
    man = {
        "kind": "ivf",
        "centroids": c.tolist(),
        "dim": int(c.shape[1]),
        "vec_col": vec_col,
        "id_col": id_col,
        "lineage": lineage,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, man_path)
    return man


def build_lsh_index(
    embeddings: "ray.data.Dataset",
    out_dir: str,
    nbits: int = 8,
    seed: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lineage: str = "",
    resume: bool = True,
) -> dict:
    """Persist the random-hyperplane LSH bucket assignment as
    ``vectors/lsh_bucket=K/`` partitions (planes are md5-derived from
    (nbits, seed, dim) — nothing to store beyond the parameters)."""
    man_path = os.path.join(out_dir, ANN_MANIFEST)
    if resume and lineage and os.path.exists(man_path):
        old = _load_manifest(out_dir)
        if old.get("lineage") == lineage and old.get("kind") == "lsh":
            return old
    # probe one batch for the dimension
    dim = len(embeddings.take(1)[0][vec_col])
    assigned = embeddings.map_batches(
        _LshBucket,
        fn_constructor_args=(dim, nbits, seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=_pool_size(),
    )
    _write_assigned(assigned, out_dir, "lsh_bucket")
    man = {
        "kind": "lsh",
        "nbits": nbits,
        "seed": seed,
        "dim": dim,
        "vec_col": vec_col,
        "id_col": id_col,
        "lineage": lineage,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, man_path)
    return man


def _partition_paths(index_dir: str, part_col: str, keys: list[int]) -> list[str]:
    """Parquet FILES under the requested partition dirs only (read_parquet
    expands a single directory but not a list of them)."""
    out = []
    for key in sorted(set(int(k) for k in keys)):
        p = os.path.join(index_dir, "vectors", f"{part_col}={key}")
        out.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
    return out


def _empty_result() -> pa.Table:
    return pa.table(
        {
            "query_i": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )


def ivf_probe_cells(index_dir: str, query: np.ndarray, nprobe: int) -> list[int]:
    """The ``nprobe`` cells nearest the query (cosine desc, cell asc)."""
    man = _load_manifest(index_dir)
    c = np.asarray(man["centroids"], np.float64)
    q = np.asarray(query, np.float64).reshape(-1)
    qn = q / (np.linalg.norm(q) or 1.0)
    sims = c @ qn
    # stable argsort on -sims ties toward the lower cell id, matching the
    # assignment argmax (first max wins) and the oracle's (sim desc, cell asc)
    order = np.argsort(-sims, kind="stable")
    return [int(x) for x in order[:nprobe]]


def ivf_index_search(
    index_dir: str, query: np.ndarray, k: int = 10, nprobe: int = 4
) -> pa.Table:
    """Partition-pruned IVF query: read ONLY the probe cells' parquet
    partitions, exact cosine re-rank inside them. Same output schema as
    brute_force_knn."""
    man = _load_manifest(index_dir)
    paths = _partition_paths(index_dir, "ivf_cell", ivf_probe_cells(index_dir, query, nprobe))
    if not paths:
        return _empty_result()
    ds = ray.data.read_parquet(paths, columns=[man["id_col"], man["vec_col"]])
    # task-based scorer: probe partitions are small, actor-pool startup
    # would dominate the partition-pruned query
    return brute_force_knn(
        ds,
        np.asarray(query, np.float64),
        k,
        id_col=man["id_col"],
        vec_col=man["vec_col"],
        use_actors=False,
    )


def lsh_probe_buckets(index_dir: str, query: np.ndarray, nprobe: int) -> list[int]:
    """The query's bucket plus every bucket within Hamming distance
    < nprobe (multi-probe)."""
    man = _load_manifest(index_dir)
    h = _LshBucket(man["dim"], man["nbits"], man["seed"])
    q = np.asarray(query, np.float64).reshape(1, -1)
    qb = int(h.bucket_of(q)[0])
    probes = {qb}
    frontier = {qb}
    for _ in range(1, nprobe):
        frontier = {
            b ^ (1 << i) for b in frontier for i in range(man["nbits"])
        } - probes
        probes |= frontier
    return sorted(probes)


def lsh_index_search(
    index_dir: str, query: np.ndarray, k: int = 10, nprobe: int = 1
) -> pa.Table:
    """Partition-pruned LSH query: read only the probe buckets' partitions,
    exact cosine re-rank inside them."""
    man = _load_manifest(index_dir)
    paths = _partition_paths(
        index_dir, "lsh_bucket", lsh_probe_buckets(index_dir, query, nprobe)
    )
    if not paths:
        return _empty_result()
    ds = ray.data.read_parquet(paths, columns=[man["id_col"], man["vec_col"]])
    # task-based scorer: probe partitions are small, actor-pool startup
    # would dominate the partition-pruned query
    return brute_force_knn(
        ds,
        np.asarray(query, np.float64),
        k,
        id_col=man["id_col"],
        vec_col=man["vec_col"],
        use_actors=False,
    )
