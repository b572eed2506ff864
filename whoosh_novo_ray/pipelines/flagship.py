"""Flagship pipeline: parquet pages -> Ray Data index build -> BM25 query set.

This is the end-to-end demonstration the driver smoke-checks via
``__ray_entry__.entry()``: read the docs table, build the distributed
inverted index (tokenize map_batches -> bucket groupby shuffle -> posting
block encode -> segment parquet + manifest), then run a small query set and
return the ranked results as one Arrow table (query, rank, doc_id, score).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from whoosh_novo_ray.pipelines.registry import _index_for, _searcher_for


def run_flagship(sf_dir: str = "/root/testdata/sf0.001") -> pa.Table:
    from whoosh_novo_ray.search import And, Or, Phrase, Term
    from whoosh_novo_ray.search.fuzzy import FuzzyTerm
    from whoosh_novo_ray.search.qparser import QueryParser

    _index_for(sf_dir)  # build (or resume) the index
    s = _searcher_for(sf_dir)
    qp = QueryParser()
    qset = {
        "term:query": Term("query"),
        "term:table": Term("table"),
        "or:query|window": Or(Term("query"), Term("window")),
        "and:query&window": And(Term("query"), Term("window")),
        "phrase:'query window'": Phrase(["query", "window"]),
        "fuzzy:quer~1": FuzzyTerm("quer", maxdist=1),
        "parsed:'scan AND (merge OR sort)'": qp.parse("scan AND (merge OR sort)"),
    }
    out = []
    # the WAND path produces identical results to the evaluator for ORs —
    # include one so the smoke covers the pruned path too
    from whoosh_novo_ray.search.wand import searcher_wand_topk

    wt, _stats = searcher_wand_topk(s, ["query", "window", "scan"], 10)
    out.append(
        pa.table(
            {
                "query": pa.array(["wand:query|window|scan"] * len(wt), pa.string()),
                "rank": pa.array(np.arange(len(wt), dtype=np.int64)),
                "doc_id": wt["doc_id"].cast(pa.int64()),
                "score": pa.array(np.round(wt["score"].to_numpy(), 6), pa.float64()),
            }
        )
    )
    for name, q in qset.items():
        t = s.search(q, limit=10)
        n = len(t)
        out.append(
            pa.table(
                {
                    "query": pa.array([name] * n, pa.string()),
                    "rank": pa.array(np.arange(n, dtype=np.int64)),
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "score": pa.array(
                        np.round(t["score"].to_numpy(), 6), pa.float64()
                    ),
                }
            )
        )
    # the distributed serving path (doc-shard actors score, driver merges)
    # runs one query in the smoke too — results identical to the local rows
    from whoosh_novo_ray.pipelines.registry import _pool_for

    pt = _pool_for(sf_dir).search(Or(Term("query"), Term("window")), limit=10)
    out.append(
        pa.table(
            {
                "query": pa.array(["pool:query|window"] * len(pt), pa.string()),
                "rank": pa.array(np.arange(len(pt), dtype=np.int64)),
                "doc_id": pt["doc_id"].cast(pa.int64()),
                "score": pa.array(
                    np.round(pt["score"].to_numpy(), 6), pa.float64()
                ),
            }
        )
    )
    return pa.concat_tables(out)
