"""MinHash+LSH candidate verification: the est-jaccard join is distributed —
pairs meet signatures inside sharded map_groups, never in a driver dict —
and must survive a duplicate-heavy corpus (where "candidates" are a large
fraction of the corpus) while matching a brute-force in-memory check."""

import numpy as np
import pyarrow as pa
import pytest


def _dup_heavy_corpus(n=120, dup_frac=0.5, seed=3):
    """~dup_frac of docs are near-copies of earlier docs (one word changed)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(n):
        if i > 0 and rng.random() < dup_frac:
            src = texts[rng.integers(0, len(texts))].split()
            j = int(rng.integers(0, len(src)))
            src[j] = vocab[int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(src))
        else:
            texts.append(" ".join(rng.choice(vocab, size=25)))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def dup_env(ray_session):
    import ray.data

    tbl = _dup_heavy_corpus()
    return tbl, ray.data.from_arrow(tbl).repartition(4)


def _brute_force_estimates(tbl, pairs, n=3, num_perm=64, seed=7):
    from whoosh_novo_ray.ops.dedup import _MinHashSig

    sig = _MinHashSig(n, num_perm, seed)
    sigs = {
        int(d): sig.signature(t)
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
    return {
        (a, b): float(np.mean(sigs[a] == sigs[b]))
        for a, b in pairs
    }


def test_minhash_verify_matches_brute_force(dup_env):
    from whoosh_novo_ray.ops.dedup import minhash_lsh_candidates

    tbl, ds = dup_env
    got = minhash_lsh_candidates(ds, n=3, num_perm=64, bands=16, seed=7)
    assert len(got) > 10, "dup-heavy corpus must yield many candidates"
    pairs = list(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))
    assert len(set(pairs)) == len(pairs), "pair dedup"
    want = _brute_force_estimates(tbl, pairs)
    for (a, b), est in zip(pairs, got["est_jaccard"].to_pylist()):
        assert est == pytest.approx(round(want[(a, b)], 6), abs=1e-9)


def test_minhash_threshold_filters_inside_join(dup_env):
    from whoosh_novo_ray.ops.dedup import minhash_lsh_candidates

    _tbl, ds = dup_env
    full = minhash_lsh_candidates(ds, n=3, num_perm=64, bands=16, seed=7)
    thr = minhash_lsh_candidates(
        ds, n=3, num_perm=64, bands=16, seed=7, threshold=0.8
    )
    ests = dict(
        zip(
            zip(full["doc_a"].to_pylist(), full["doc_b"].to_pylist()),
            full["est_jaccard"].to_pylist(),
        )
    )
    want = sorted(k for k, v in ests.items() if v >= 0.8)
    gotk = sorted(zip(thr["doc_a"].to_pylist(), thr["doc_b"].to_pylist()))
    assert gotk == want
    assert 0 < len(thr) < len(full)


def test_curated_corpus_removes_near_dups(dup_env):
    """The composed curation pipeline drops the higher id of every
    near-dup pair and exact-dup copy while keeping the rest."""
    from whoosh_novo_ray.ops.dedup import exact_dedup_keep, minhash_lsh_candidates
    from whoosh_novo_ray.pipelines.curation import curated_corpus

    tbl, ds = dup_env
    out = curated_corpus(ds, min_tokens=5, stop_ratio=0.0, dup_threshold=0.8)
    got = set(out["doc_id"].to_pylist())

    pairs = minhash_lsh_candidates(ds, threshold=0.8)
    losers = set(pairs["doc_b"].to_pylist())
    keepers = set(
        r["doc_id"] for r in exact_dedup_keep(ds).take_all()
    )
    want = keepers - losers
    assert got == want
    assert losers, "dup-heavy corpus must produce losers"
    # the bpe budget column rides along
    assert all(n > 0 for n in out["n_bpe_tokens"].to_pylist())


def test_connected_components_chain():
    """Chains must merge into one cluster (pairwise doc_b drops would not):
    pairs (5,10),(1,10) => all three share cluster 1."""
    import pyarrow as pa

    from whoosh_novo_ray.ops.dedup import connected_components

    pairs = pa.table(
        {
            "doc_a": pa.array([5, 1, 20], pa.int64()),
            "doc_b": pa.array([10, 10, 21], pa.int64()),
        }
    )
    t = connected_components(pairs)
    got = dict(zip(t["doc_id"].to_pylist(), t["cluster_id"].to_pylist()))
    assert got == {1: 1, 5: 1, 10: 1, 20: 20, 21: 20}


def test_distributed_label_propagation_matches_union_find(ray_session, dup_env):
    import ray.data

    from whoosh_novo_ray.ops.dedup import (
        connected_components,
        minhash_lsh_candidates,
        near_dup_clusters_ds,
    )

    _tbl, ds = dup_env
    pairs = minhash_lsh_candidates(ds, threshold=0.5)
    assert len(pairs) > 5
    want = connected_components(pairs).sort_by("doc_id").to_pydict()
    got = near_dup_clusters_ds(
        ray.data.from_arrow(pairs.select(["doc_a", "doc_b"])).repartition(2)
    ).to_pydict()
    assert got == want


def test_pair_ops_return_datasets(dup_env):
    # scale contract: the _ds variants return lazy Datasets whose collected
    # rows equal the table wrappers — the driver-free consumption path
    import ray
    import ray.data
    from whoosh_novo_ray.ops.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_candidates_ds,
    )

    tbl, ds = dup_env
    out_ds = minhash_lsh_candidates_ds(ds, threshold=0.5)
    assert isinstance(out_ds, ray.data.Dataset)
    got = (
        pa.concat_tables(
            [t for t in ray.get(out_ds.materialize().to_arrow_refs()) if len(t)]
        )
        .sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
    )
    want = minhash_lsh_candidates(ds, threshold=0.5)
    assert got.equals(want)


def test_collapse_equal_preserves_loser_set(dup_env):
    # chain pairs replace cliques inside equal-signature groups; the
    # near-dup LOSER set (distinct doc_b above threshold) must be identical
    from whoosh_novo_ray.ops.dedup import minhash_lsh_candidates

    tbl, ds = dup_env
    for thr in (0.5, 0.9):
        full = minhash_lsh_candidates(ds, threshold=thr)
        coll = minhash_lsh_candidates(ds, threshold=thr, collapse_equal=True)
        lose_full = set(full["doc_b"].to_pylist())
        lose_coll = set(coll["doc_b"].to_pylist())
        assert lose_full == lose_coll


def test_collapse_equal_linear_on_identical_docs(ray_session):
    # m identical docs: clique banding emits O(m^2) pairs; the collapsed
    # path must emit exactly m-1 chain pairs (rep = lowest doc id)
    import ray.data
    from whoosh_novo_ray.ops.dedup import minhash_lsh_candidates

    m = 2000
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(m), pa.int64()),
            "text": pa.array(
                ["the same boilerplate page body every time here"] * m,
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = minhash_lsh_candidates(ds, threshold=0.9, collapse_equal=True)
    assert len(out) == m - 1
    assert out["doc_a"].to_pylist() == [0] * (m - 1)
    assert sorted(out["doc_b"].to_pylist()) == list(range(1, m))
    assert set(out["est_jaccard"].to_pylist()) == {1.0}


def test_curated_corpus_ds_matches_table_form(dup_env):
    import ray
    from whoosh_novo_ray.pipelines.curation import (
        curated_corpus,
        curated_corpus_ds,
    )

    tbl, ds = dup_env
    want = curated_corpus(ds, min_tokens=5, stop_ratio=0.0, dup_threshold=0.8)
    out = curated_corpus_ds(ds, min_tokens=5, stop_ratio=0.0, dup_threshold=0.8)
    got = pa.concat_tables(
        [t for t in ray.get(out.materialize().to_arrow_refs()) if len(t)]
    ).sort_by("doc_id")
    assert got.equals(want)


def test_fast_band_hash_identical_pairs(dup_env):
    # the numeric band fold must group identically to md5 banding (up to
    # negligible 64-bit collisions): same pair set on the dup-heavy corpus
    from whoosh_novo_ray.ops.dedup import minhash_lsh_candidates

    tbl, ds = dup_env
    md5p = minhash_lsh_candidates(ds, threshold=0.5)
    fast = minhash_lsh_candidates(ds, threshold=0.5, band_hash="fast")
    assert md5p.equals(fast)
    with pytest.raises(ValueError):
        minhash_lsh_candidates(ds, band_hash="nope")
