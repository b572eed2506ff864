"""Persisted ANN indexes: partition-pruned queries, streaming-path parity."""

import glob
import os

import numpy as np
import pytest
import pyarrow as pa


@pytest.fixture(scope="module")
def emb_setup(ray_session, tmp_path_factory):
    """Deterministic embeddings + built LSH and IVF indexes."""
    import ray.data

    rng = np.random.default_rng(7)
    n, dim = 300, 16
    vecs = rng.normal(size=(n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    root = str(tmp_path_factory.mktemp("ann"))
    from whoosh_novo_ray.ops.ann_index import build_ivf_index, build_lsh_index

    build_lsh_index(ds, root + "/lsh", nbits=6, seed=5, lineage="t")
    build_ivf_index(ds, root + "/ivf", n_centroids=8, seed=5, lineage="t")
    return root, ds, vecs


def test_lsh_index_matches_streaming(emb_setup):
    from whoosh_novo_ray.ops import lsh_knn
    from whoosh_novo_ray.ops.ann_index import lsh_index_search

    root, ds, vecs = emb_setup
    q = vecs[3]
    persisted = lsh_index_search(root + "/lsh", q, k=10, nprobe=2)
    streaming = lsh_knn(ds, q, k=10, nbits=6, seed=5, nprobe=2)
    assert persisted.to_pydict() == streaming.to_pydict()


def test_lsh_query_reads_only_probe_partitions(emb_setup):
    from whoosh_novo_ray.ops.ann_index import _partition_paths, lsh_probe_buckets

    root, _ds, vecs = emb_setup
    all_files = set(glob.glob(root + "/lsh/vectors/**/*.parquet", recursive=True))
    probes = lsh_probe_buckets(root + "/lsh", vecs[3], nprobe=1)
    probe_files = set(_partition_paths(root + "/lsh", "lsh_bucket", probes))
    assert probe_files  # the query's own bucket exists
    assert probe_files < all_files  # STRICT subset: pruning is real
    # probe files all live under the probed buckets' dirs
    for f in probe_files:
        assert any(f"lsh_bucket={b}" in f for b in probes)


def test_ivf_index_prunes_and_reranks_exactly(emb_setup):
    """Within the probed cells the re-rank is exact: equals brute force
    restricted to vectors assigned to those cells."""
    import pyarrow.parquet as pq

    from whoosh_novo_ray.ops.ann_index import (
        _partition_paths,
        ivf_index_search,
        ivf_probe_cells,
    )

    root, _ds, vecs = emb_setup
    q = vecs[5]
    cells = ivf_probe_cells(root + "/ivf", q, nprobe=2)
    files = _partition_paths(root + "/ivf", "ivf_cell", cells)
    all_files = glob.glob(root + "/ivf/vectors/**/*.parquet", recursive=True)
    assert set(files) < set(all_files)

    got = ivf_index_search(root + "/ivf", q, k=10, nprobe=2)
    # oracle: exact cosine over exactly the probed partitions' rows
    sub = pa.concat_tables([pq.read_table(f) for f in files])
    ids = sub["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v) for v in sub["embedding"].to_pylist()])
    qn = q / np.linalg.norm(q)
    sims = (mat / np.linalg.norm(mat, axis=1)[:, None]) @ qn
    order = np.lexsort((ids, -sims))[:10]
    assert got["vec_id"].to_pylist() == ids[order].tolist()
    np.testing.assert_allclose(
        got["cosine"].to_numpy(), np.round(sims[order], 6), atol=1e-9
    )


def test_ann_build_resume(emb_setup):
    """Matching lineage short-circuits the rebuild (manifest returned as-is)."""
    from whoosh_novo_ray.ops.ann_index import build_lsh_index

    root, ds, _vecs = emb_setup
    before = sorted(glob.glob(root + "/lsh/vectors/**/*.parquet", recursive=True))
    man = build_lsh_index(ds, root + "/lsh", nbits=6, seed=5, lineage="t")
    after = sorted(glob.glob(root + "/lsh/vectors/**/*.parquet", recursive=True))
    assert man["kind"] == "lsh" and before == after


def test_ivf_centroid_init_small_samples():
    """k > sample rows clamps; empty sample raises (no infinite loop)."""
    from whoosh_novo_ray.ops.knn import _seeded_centroid_init

    sample = np.eye(3)
    c = _seeded_centroid_init(sample, k=8, seed=1)
    assert c.shape == (3, 3)
    with pytest.raises(ValueError):
        _seeded_centroid_init(np.empty((0, 3)), k=2, seed=1)
