"""Per-doc term vectors: stored (term, weight) lists equal the analyzer's
counts, key_terms off vectors equals key_terms off re-analyzed text, and
lookups touch only the owning shard partition."""

import glob
import os
from collections import Counter

import pytest


@pytest.fixture(scope="module")
def vec_env(ray_session, built_index, pages_table):
    import ray.data

    from whoosh_novo_ray.index.vectors import build_doc_vectors

    docs = ray.data.from_arrow(
        pages_table.select(["doc_id", "text"])
    ).repartition(4)
    man = build_doc_vectors(
        docs, built_index.path, built_index.cfg, n_shards=8, lineage="t"
    )
    return built_index, pages_table, man


def test_vector_equals_analyzer_counts(vec_env):
    from whoosh_novo_ray.index.vectors import doc_vectors

    idx, pages, _man = vec_env
    vecs = doc_vectors(idx.path, [0, 3, 7])
    ana = idx.cfg.analyzer
    for d in (0, 3, 7):
        text = pages["text"][d].as_py()
        want = {t: float(c) for t, c in Counter(ana(text)).items()}
        assert vecs[d] == want


def test_vector_terms_sorted(vec_env):
    import pyarrow.parquet as pq

    idx, _pages, _man = vec_env
    f = sorted(
        glob.glob(os.path.join(idx.path, "vectors", "vshard=*", "*.parquet"))
    )[0]
    t = pq.read_table(f, columns=["terms"])
    for row in t["terms"].to_pylist()[:20]:
        assert row == sorted(row)


def test_key_terms_from_vectors_matches_text(vec_env):
    from whoosh_novo_ray.index.vectors import key_terms_from_vectors
    from whoosh_novo_ray.search import Searcher
    from whoosh_novo_ray.search.classify import key_terms_from_text

    idx, pages, _man = vec_env
    s = Searcher(idx)
    for model in ("bo1", "bo2", "kl"):
        a = key_terms_from_text(
            s, [pages["text"][2].as_py()], numterms=5, model=model
        )
        b = key_terms_from_vectors(s, idx.path, [2], numterms=5, model=model)
        assert a == b, model


def test_vector_build_resume(vec_env, ray_session):
    import ray.data

    from whoosh_novo_ray.index.vectors import build_doc_vectors

    idx, pages, man = vec_env
    before = sorted(
        glob.glob(os.path.join(idx.path, "vectors", "**", "*.parquet"), recursive=True)
    )
    docs = ray.data.from_arrow(pages.select(["doc_id", "text"]))
    man2 = build_doc_vectors(docs, idx.path, idx.cfg, n_shards=8, lineage="t")
    after = sorted(
        glob.glob(os.path.join(idx.path, "vectors", "**", "*.parquet"), recursive=True)
    )
    assert man2 == man and before == after
