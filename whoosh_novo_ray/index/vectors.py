"""Per-document term vectors: (term, weight) lists stored by doc shard.

The reference's vector postings (de-odex/whoosh-novo
``src/whoosh/codec/whoosh3.py:176-298`` W3PerDocWriter.add_vector_items +
``reading.py`` vector()): a per-doc sorted list of (term, weight) consumed by
key_terms(docnums) / more-like-this WITHOUT re-analyzing stored text at query
time.

Ray-native shape: each input batch holds whole documents, so the vector of a
doc is computable statelessly inside one ``map_batches`` call — NO shuffle.
Rows (doc_id, terms list<string> sorted, weights list<float32>) write as
``vectors/vshard=K/`` parquet partitions keyed by the same doc hash as the
serving shards, so a lookup reads one partition dir (row-group pruned by the
doc_id sort inside each file) and a distributed consumer joins by vshard.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from whoosh_novo_ray.index.build import IndexConfig
from whoosh_novo_ray.index.docshard import doc_shard_of

VEC_MANIFEST = "vectors_manifest.json"


class _DocVectors:
    """map_batches callable: (doc_id, text) -> (doc_id, vshard, terms,
    weights). Analyzer state builds once per actor; per-batch work is the
    same vectorized token grouping the index build uses."""

    def __init__(self, cfg: IndexConfig, n_shards: int):
        self.cfg = cfg
        self.n_shards = n_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch[cfg.text_col].to_pylist()
        doc_ids = batch[cfg.id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        res = cfg.analyzer.analyze_batch_coded(texts)
        doc_idx, codes, uniques = res[0], res[1], res[2]
        has_boosts = getattr(cfg.analyzer, "boost_delim", None) is not None
        tok_boosts = res[5] if has_boosts and len(res) > 5 else None
        n_docs = len(texts)
        empty_lists = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_docs + 1, np.int32)), pa.array([], pa.string())
        )
        empty_w = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_docs + 1, np.int32)), pa.array([], pa.float32())
        )
        if len(doc_idx) == 0:
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids, pa.uint64()),
                    "vshard": pa.array(
                        doc_shard_of(doc_ids, self.n_shards), pa.uint32()
                    ),
                    "terms": empty_lists,
                    "weights": empty_w,
                }
            )
        # rank codes lexicographically so each doc's terms come out sorted
        # (the reference's vector postings are term-sorted)
        dict_order = np.argsort(uniques, kind="stable")
        rank = np.empty(len(uniques), np.int64)
        rank[dict_order] = np.arange(len(uniques))
        key = doc_idx.astype(np.int64) * len(uniques) + rank[codes]
        order = np.argsort(key, kind="stable")
        s_key = key[order]
        change = np.empty(len(s_key), bool)
        change[0] = True
        change[1:] = s_key[1:] != s_key[:-1]
        starts = np.flatnonzero(change)
        tf = np.diff(np.append(starts, len(s_key))).astype(np.float32)
        if tok_boosts is not None:
            tf = np.add.reduceat(
                tok_boosts[order].astype(np.float64), starts
            ).astype(np.float32)
        g_doc_idx = (s_key[starts] // len(uniques)).astype(np.int64)
        g_rank = (s_key[starts] % len(uniques)).astype(np.int64)
        g_terms = np.asarray(uniques, object)[dict_order][g_rank]

        # per-doc run lengths over ALL docs (token-less docs get empty lists)
        per_doc = np.zeros(n_docs + 1, np.int64)
        np.add.at(per_doc, g_doc_idx + 1, 1)
        offsets = np.cumsum(per_doc).astype(np.int32)
        terms_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(g_terms, pa.string())
        )
        w_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(tf, pa.float32())
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.uint64()),
                "vshard": pa.array(
                    doc_shard_of(doc_ids, self.n_shards), pa.uint32()
                ),
                "terms": terms_arr,
                "weights": w_arr,
            }
        )


def build_doc_vectors(
    docs: "ray.data.Dataset",
    index_path: str,
    cfg: IndexConfig | None = None,
    n_shards: int = 16,
    lineage: str = "",
    resume: bool = True,
) -> dict:
    """Write per-doc term vectors under ``<index>/vectors/vshard=K/``.

    A pure map_batches + partitioned write — the one index artifact that
    needs no shuffle at all (each batch holds whole documents)."""
    cfg = cfg or IndexConfig()
    out_dir = os.path.join(index_path, "vectors")
    man_path = os.path.join(index_path, VEC_MANIFEST)
    if resume and lineage and os.path.exists(man_path):
        with open(man_path) as f:
            old = json.load(f)
        if old.get("lineage") == lineage and old.get("n_shards") == n_shards:
            return old
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    vec = docs.map_batches(
        _DocVectors,
        fn_constructor_args=(cfg, n_shards),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=max(1, min(4, ncpu - 2)),
    )
    vec.write_parquet(out_dir, partition_cols=["vshard"])
    man = {"n_shards": n_shards, "lineage": lineage}
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, man_path)
    return man


def _vshard_files(index_path: str, shard: int) -> list[str]:
    return sorted(
        glob.glob(
            os.path.join(index_path, "vectors", f"vshard={shard}", "*.parquet")
        )
    )


def doc_vectors(
    index_path: str, doc_ids: list[int]
) -> dict[int, dict[str, float]]:
    """Fetch the stored (term -> weight) vectors for the given docs: one
    partition-pruned read per touched shard, doc_id pushdown inside it."""
    with open(os.path.join(index_path, VEC_MANIFEST)) as f:
        man = json.load(f)
    ids = np.asarray(sorted(set(int(d) for d in doc_ids)), np.uint64)
    shards = doc_shard_of(ids, man["n_shards"])
    out: dict[int, dict[str, float]] = {}
    for sh in np.unique(shards):
        want = ids[shards == sh]
        files = _vshard_files(index_path, int(sh))
        if not files:
            continue
        tbl = pq.read_table(
            files,
            columns=["doc_id", "terms", "weights"],
            filters=pc.field("doc_id").isin([int(x) for x in want]),
        )
        for i in range(len(tbl)):
            d = int(tbl["doc_id"][i].as_py())
            out[d] = dict(
                zip(tbl["terms"][i].as_py(), tbl["weights"][i].as_py())
            )
    return out


def key_terms_from_vectors(
    searcher,
    index_path: str,
    doc_ids: list[int],
    numterms: int = 5,
    model: str = "bo1",
    normalize: bool = True,
) -> list[tuple[str, float]]:
    """key_terms(docnums) off the STORED vectors — no re-analysis at query
    time (the reference's vector-backed Expander path,
    ``searching.py:509-613``). Scores match key_terms_from_text exactly
    (same per-doc term weights, same expansion model)."""
    from collections import Counter

    from whoosh_novo_ray.search.classify import _MODELS

    vecs = doc_vectors(index_path, doc_ids)
    topwords: Counter = Counter()
    for d in doc_ids:
        for t, w in vecs.get(int(d), {}).items():
            topwords[t] += w
    if not topwords:
        return []
    mcls = _MODELS[model]
    m = mcls(searcher.index.doc_count, searcher.index.total_field_length)
    top_total = sum(topwords.values())
    searcher.prefetch_terms(list(topwords))
    scored = []
    for term, wit in topwords.items():
        _df, cf, _mx = searcher.term_stats(term)
        if cf <= 0:
            continue
        scored.append((term, m.score(wit, cf, top_total)))
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    scored = scored[:numterms]
    if normalize and scored:
        norm = m.normalizer(scored[0][1], top_total)
        scored = [(t, s / norm if norm else s) for t, s in scored]
    return scored
