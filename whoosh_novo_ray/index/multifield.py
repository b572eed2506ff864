"""Multi-field (fielded-document) indexing — the reference Schema concept.

The reference indexes documents with several named text fields, each with its
own analyzer, per-field statistics and per-field BM25F B parameter
(de-odex/whoosh-novo ``src/whoosh/fields.py:1375``, ``scoring.py:273-328``).
Here each field is its own complete single-field index (same shared doc-id
space) built by the standard pipeline — per-field builds are independent Ray
jobs, and per-field stats (doc_count, avg field length, df) fall out for
free. A routing searcher evaluates Term/Phrase nodes against their field's
index; compound nodes (And/Or/...) combine across fields exactly like the
reference's matcher tree over fielded terms.
"""

from __future__ import annotations

import json
import os

import numpy as np

import ray.data

from whoosh_novo_ray.index.build import IndexConfig, build_index
from whoosh_novo_ray.index.segment import Index

MF_MANIFEST = "multifield.json"


def build_multifield_index(
    docs: "ray.data.Dataset",
    out_dir: str,
    fields: dict[str, IndexConfig],
    lineage: str = "",
    resume: bool = False,
) -> dict:
    """Build one sub-index per field. ``fields`` maps field name -> its
    IndexConfig (whose ``text_col`` selects the document column)."""
    os.makedirs(out_dir, exist_ok=True)
    manifests = {}
    for fname, cfg in fields.items():
        sub = os.path.join(out_dir, f"field={fname}")
        manifests[fname] = build_index(
            docs, sub, cfg, lineage=f"{lineage}:{fname}", resume=resume
        )
    mf = {
        "fields": sorted(fields),
        "lineage": lineage,
        "doc_count": max((m["doc_count"] for m in manifests.values()), default=0),
    }
    tmp = os.path.join(out_dir, MF_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(mf, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, MF_MANIFEST))
    return mf


class MultiFieldIndex:
    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, MF_MANIFEST)) as f:
            self.manifest = json.load(f)
        self.fields: dict[str, Index] = {
            f: Index(os.path.join(path, f"field={f}"))
            for f in self.manifest["fields"]
        }

    def field(self, name: str) -> Index:
        return self.fields[name]


class MultiFieldSearcher:
    """Evaluates a query AST whose Term/Phrase nodes may name fields.

    Per-field BM25F B values are given like the reference's ``BM25F(B=0.75,
    title_B=2.0)`` keyword convention.
    """

    def __init__(
        self,
        index: MultiFieldIndex,
        default_field: str | None = None,
        weighting_factory=None,
        **field_params,
    ):
        from whoosh_novo_ray.search.scoring import BM25F
        from whoosh_novo_ray.search.searcher import Searcher

        self.index = index
        self.default_field = default_field or sorted(index.fields)[0]
        self._searchers: dict[str, Searcher] = {}
        for fname, idx in index.fields.items():
            if weighting_factory is not None:
                w = weighting_factory(fname)
            else:
                B = field_params.get(f"{fname}_B", field_params.get("B", 0.75))
                K1 = field_params.get("K1", 1.2)
                w = BM25F(B=B, K1=K1)
            self._searchers[fname] = Searcher(idx, weighting=w)

    def _searcher_for_field(self, field: str | None):
        return self._searchers[field or self.default_field]

    def postings(self, q):
        from whoosh_novo_ray.search import query as Q

        if isinstance(q, (Q.Term, Q.Phrase)):
            field = q.field
            sub = self._searcher_for_field(field)
            if isinstance(q, Q.Term):
                return sub.postings(Q.Term(q.text, boost=q.boost))
            return sub.postings(Q.Phrase(list(q.words), slop=q.slop))
        if isinstance(q, Q.Or):
            from whoosh_novo_ray.search.searcher import _merge_sum

            ids, scores, _ = _merge_sum([self.postings(c) for c in q.children])
            return ids, scores
        if isinstance(q, Q.And):
            from whoosh_novo_ray.search.searcher import _merge_sum, _EMPTY

            parts = [self.postings(c) for c in q.children]
            if any(len(p[0]) == 0 for p in parts):
                return _EMPTY
            ids, scores, counts = _merge_sum(parts)
            keep = counts == len(parts)
            return ids[keep], scores[keep]
        if isinstance(q, Q.AndNot):
            a_ids, a_sc = self.postings(q.a)
            b_ids, _ = self.postings(q.b)
            if not len(a_ids) or not len(b_ids):
                return a_ids, a_sc
            keep = ~np.isin(a_ids, b_ids)
            return a_ids[keep], a_sc[keep]
        # everything else evaluates within the default field's searcher
        return self._searcher_for_field(None).postings(q)

    def search(self, q, limit: int | None = 10):
        import pyarrow as pa

        ids, scores = self.postings(q)
        order = np.lexsort((ids, -scores))
        if limit is not None:
            order = order[:limit]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.uint64()),
                "score": pa.array(scores[order], pa.float64()),
            }
        )
