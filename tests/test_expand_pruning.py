"""Term-dictionary scan pruning: a prefix-bounded expansion (fuzzy / prefix /
range) must read only the row groups whose term stats intersect the range —
observable via Index.last_expand_stats."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def wide_vocab_index(ray_session, tmp_path_factory):
    """Single-bucket index whose term dictionary spans many 4k row groups,
    so the range pruning is visible (hash-bucketed multi-bucket indexes
    prune INSIDE each bucket the same way)."""
    import ray.data

    from whoosh_novo_ray.index import Index, IndexConfig, build_index

    n_docs, terms_per_doc = 1000, 20
    texts = [
        " ".join(f"t{(d * terms_per_doc + j):06d}" for j in range(terms_per_doc))
        for d in range(n_docs)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = str(tmp_path_factory.mktemp("widevocab") / "idx")
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        IndexConfig(num_buckets=1, with_positions=False),
        lineage="wide",
    )
    return Index(out)


def test_fuzzy_prefix_prunes_row_groups(wide_vocab_index):
    from whoosh_novo_ray.search.fuzzy import terms_within

    idx = wide_vocab_index
    got = terms_within(idx, "t012345", maxdist=1, prefix=3)
    stats = idx.last_expand_stats
    assert stats["row_groups_total"] >= 4, "vocab must span several row groups"
    assert 0 < stats["row_groups_read"] < stats["row_groups_total"]
    assert stats["rows_read"] < 20_000  # far below the full dictionary
    # correctness: matches brute force over the full lexicon
    import re

    all_terms = idx.expand_terms(lambda c: c.is_valid())
    from whoosh_novo_ray.search.fuzzy import edit_distance

    want = sorted(
        t for t in all_terms
        if t.startswith("t01") and edit_distance("t012345", t, 1) is not None
    )
    assert sorted(t for t, _d in got) == want
    assert want, "sanity: the fuzzy ball is non-empty"


def test_prefix_expand_prunes(wide_vocab_index):
    import pyarrow.compute as pc

    idx = wide_vocab_index
    got = idx.expand_terms(
        lambda col: pc.starts_with(col, pattern="t00001"),
        lo="t00001",
        hi="t00001\U0010ffff",
    )
    assert len(got) == 10
    stats = idx.last_expand_stats
    assert stats["row_groups_read"] < stats["row_groups_total"]


def test_unbounded_expand_reads_everything(wide_vocab_index):
    idx = wide_vocab_index
    all_terms = idx.expand_terms(lambda c: c.is_valid())
    assert len(all_terms) == 20_000
    stats = idx.last_expand_stats
    assert stats["row_groups_read"] == stats["row_groups_total"]
