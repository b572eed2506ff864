"""Index build pipeline: stats, manifest, resume, salting."""

import json
import os

import numpy as np
import pytest

from whoosh_novo_ray.analysis import StandardAnalyzer
from whoosh_novo_ray.index import Index, IndexConfig, build_index
from whoosh_novo_ray.search import Searcher, Term


def test_manifest_stats(built_index, pages_table):
    ana = StandardAnalyzer()
    texts = pages_table["text"].to_pylist()
    total = sum(len(ana(t)) for t in texts)
    assert built_index.doc_count == len(pages_table)
    assert built_index.total_field_length == total
    assert built_index.avg_field_length == total / len(pages_table)


def test_term_lookup_matches_brute_force(built_index, pages_table):
    ana = StandardAnalyzer()
    texts = pages_table["text"].to_pylist()
    ids = pages_table["doc_id"].to_numpy()
    term = "search"
    expect = [
        (int(d), toks.count(term))
        for d, toks in zip(ids, (ana(t) for t in texts))
        if term in toks
    ]
    s = Searcher(built_index)
    got_ids, got_tfs, _, _ = s.term_postings(term)
    assert got_ids.tolist() == [d for d, _ in expect]
    assert got_tfs.tolist() == [c for _, c in expect]


def test_resume_skips_completed_buckets(ray_session, pages_table, tmp_path):
    import ray.data

    out = str(tmp_path / "idx")
    docs = ray.data.from_arrow(pages_table.select(["doc_id", "text"]))
    cfg = IndexConfig(num_buckets=4)
    m1 = build_index(docs, out, cfg, lineage="L1")
    # delete one bucket file; resume should rebuild only that bucket
    victim = m1["buckets"][1]
    os.remove(os.path.join(out, victim["path"]))
    m2 = build_index(docs, out, cfg, lineage="L1", resume=True)
    assert m2["doc_count"] == m1["doc_count"]
    assert {b["bucket"] for b in m2["buckets"]} == {b["bucket"] for b in m1["buckets"]}
    assert m2["n_postings"] == m1["n_postings"]
    # full resume with nothing missing: no buckets rebuilt
    m3 = build_index(docs, out, cfg, lineage="L1", resume=True)
    assert m3["n_postings"] == m1["n_postings"]


def test_salted_heavy_terms_equivalent(ray_session, pages_table, tmp_path):
    """An index built with heavy-term salting returns identical postings."""
    import ray.data

    docs = ray.data.from_arrow(pages_table.select(["doc_id", "text"]))
    plain_dir = str(tmp_path / "plain")
    salted_dir = str(tmp_path / "salted")
    build_index(docs, plain_dir, IndexConfig(num_buckets=4), lineage="L")
    build_index(
        docs,
        salted_dir,
        IndexConfig(
            num_buckets=4, heavy_terms=("search", "the", "index"), salt_k=4, salt_shift=3
        ),
        lineage="L",
    )
    sp = Searcher(Index(plain_dir))
    ss = Searcher(Index(salted_dir))
    for t in ["search", "the", "index", "data"]:
        a = sp.term_postings(t)
        b = ss.term_postings(t)
        assert a[0].tolist() == b[0].tolist(), t
        assert a[1].tolist() == b[1].tolist(), t
        assert a[2].tolist() == b[2].tolist(), t
        ra = sp.search(Term(t), limit=10).to_pydict()
        rb = ss.search(Term(t), limit=10).to_pydict()
        assert ra == rb


def test_auto_heavy_detection_and_balance(ray_session, pages_table, tmp_path):
    """detect_heavy_terms finds stopword-like skew without declarations, the
    auto-salted build bounds bucket size, and results stay bit-identical."""
    import pyarrow as pa
    import ray.data

    from whoosh_novo_ray.index.build import detect_heavy_terms

    # corpus where 'qqfiller' hits every doc (stoplist off so it indexes)
    from whoosh_novo_ray.analysis import StandardAnalyzer

    texts = [
        f"qqfiller unique{i} qqfiller common{'ab'[i % 2]} qqfiller"
        for i in range(400)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(400), pa.uint64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    docs = ray.data.from_arrow(tbl)
    cfg = IndexConfig(
        num_buckets=4, salt_k=4, salt_shift=3, analyzer=StandardAnalyzer(stoplist=None)
    )
    heavy = detect_heavy_terms(docs, cfg, sample_frac=1.0, heavy_df_frac=0.5)
    assert "qqfiller" in heavy
    assert all(h in {"qqfiller", "commona", "commonb"} for h in heavy)

    plain_dir = str(tmp_path / "plain")
    auto_dir = str(tmp_path / "auto")
    m_plain = build_index(docs, plain_dir, cfg, lineage="L")
    import dataclasses

    m_auto = build_index(
        docs,
        auto_dir,
        dataclasses.replace(cfg),
        lineage="L",
        auto_heavy={"sample_frac": 1.0, "heavy_df_frac": 0.5},
    )
    assert m_auto["config"]["heavy_terms"]  # detection populated the config

    # salting bounds the max bucket: the heavy term's 400 postings split
    max_plain = max(b["n_postings"] for b in m_plain["buckets"])
    max_auto = max(b["n_postings"] for b in m_auto["buckets"])
    assert max_plain >= 400  # one bucket held every 'qqfiller' posting
    assert max_auto < max_plain

    sp = Searcher(Index(plain_dir))
    sa = Searcher(Index(auto_dir))
    for t in ["qqfiller", "commona", "unique7", "absentzz"]:
        a = sp.term_postings(t)
        b = sa.term_postings(t)
        assert a[0].tolist() == b[0].tolist(), t
        assert a[1].tolist() == b[1].tolist(), t
        ra = sp.search(Term(t), limit=10).to_pydict()
        rb = sa.search(Term(t), limit=10).to_pydict()
        assert ra == rb, t


def test_spill_build_equivalent(ray_session, pages_table, tmp_path):
    """The raw-Ray spill-shuffle build produces identical segments to the
    Dataset-shuffle build."""
    import pyarrow.parquet as pq
    import ray.data

    from whoosh_novo_ray.index.spill_build import build_index_spill

    src = str(tmp_path / "src.parquet")
    pq.write_table(pages_table.select(["doc_id", "text"]), src, row_group_size=128)
    cfg = IndexConfig(num_buckets=4)
    a_dir = str(tmp_path / "dataset_path")
    b_dir = str(tmp_path / "spill_path")
    import ray.data as rd

    m1 = build_index(rd.read_parquet(src), a_dir, cfg, lineage="L")
    m2 = build_index_spill([src], b_dir, cfg, lineage="L", num_tokenize_tasks=3)
    assert m2["doc_count"] == m1["doc_count"]
    assert m2["n_postings"] == m1["n_postings"]
    assert m2["total_field_length"] == m1["total_field_length"]
    sa, sb = Searcher(Index(a_dir)), Searcher(Index(b_dir))
    for t in ("search", "data", "the", "index"):
        pa_, pb = sa.term_postings(t), sb.term_postings(t)
        assert pa_[0].tolist() == pb[0].tolist(), t
        assert pa_[1].tolist() == pb[1].tolist(), t
        assert pa_[2].tolist() == pb[2].tolist(), t
