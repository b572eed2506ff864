"""Incremental indexing: generational adds / upserts / deletes.

Batch equivalent of the reference's writer lifecycle (SegmentWriter commit +
merge policies + update_document, de-odex/whoosh-novo
``src/whoosh/writing.py:62-130,439-502,944-987``): each ``add_documents``
builds a DELTA index (a new "segment set") and compacts it with the current
generation via the merge job; ``update_documents`` deletes the replaced doc
ids first (latest-wins by unique key); generations are directories with an
atomically-updated ``CURRENT`` pointer, so readers always see a consistent
snapshot (the reference's TOC-generation MVCC, ``index.py:575-728``).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

import ray.data

from whoosh_novo_ray.index.build import IndexConfig, build_index
from whoosh_novo_ray.index.merge import merge_indexes
from whoosh_novo_ray.index.segment import Index

CURRENT = "CURRENT"


class GenerationalIndex:
    """A directory of index generations with an atomic CURRENT pointer."""

    def __init__(self, root: str, cfg: IndexConfig | None = None):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.cfg = cfg or IndexConfig()

    # -- read side -------------------------------------------------------------

    def current_generation(self) -> int | None:
        p = os.path.join(self.root, CURRENT)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def current_path(self) -> str | None:
        g = self.current_generation()
        return None if g is None else os.path.join(self.root, f"gen-{g:06d}")

    def open(self) -> Index:
        p = self.current_path()
        if p is None:
            raise FileNotFoundError("index has no generations yet")
        return Index(p)

    # -- write side ------------------------------------------------------------

    def _commit(self, gen: int) -> None:
        tmp = os.path.join(self.root, CURRENT + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(gen))
        os.replace(tmp, os.path.join(self.root, CURRENT))

    def create(self, docs: "ray.data.Dataset", lineage: str = "init") -> Index:
        gen = (self.current_generation() or 0) + 1
        path = os.path.join(self.root, f"gen-{gen:06d}")
        build_index(docs, path, self.cfg, lineage=lineage)
        self._commit(gen)
        return Index(path)

    def add_documents(
        self, docs: "ray.data.Dataset", lineage: str = "add"
    ) -> Index:
        """Append new documents (ids must be new) as a new generation:
        delta build + compaction merge with the current generation."""
        cur = self.current_path()
        if cur is None:
            return self.create(docs, lineage)
        gen = self.current_generation() + 1
        delta = os.path.join(self.root, f"delta-{gen:06d}")
        build_index(docs, delta, self.cfg, lineage=f"{lineage}:delta")
        out = os.path.join(self.root, f"gen-{gen:06d}")
        merge_indexes([cur, delta], out, cfg=self.cfg, lineage=lineage)
        shutil.rmtree(delta, ignore_errors=True)
        self._commit(gen)
        return Index(out)

    def delete_documents(
        self, doc_ids: np.ndarray, lineage: str = "delete"
    ) -> Index:
        """Drop the given doc ids in a new generation (merge-with-deletes)."""
        cur = self.current_path()
        gen = self.current_generation() + 1
        out = os.path.join(self.root, f"gen-{gen:06d}")
        merge_indexes(
            [cur], out, cfg=self.cfg, delete_doc_ids=np.asarray(doc_ids, np.uint64),
            lineage=lineage,
        )
        self._commit(gen)
        return Index(out)

    def update_documents(
        self, docs: "ray.data.Dataset", lineage: str = "update"
    ) -> Index:
        """Upsert: replace existing doc ids with the new contents, add the
        rest (the reference's update_document by unique key)."""
        cur = self.current_path()
        if cur is None:
            return self.create(docs, lineage)
        # ids of the UPDATE DELTA only (8 bytes per updated doc, not the
        # corpus) — they become the selective-delete list for the merge
        new_ids = np.array(
            [r["doc_id"] for r in docs.select_columns(["doc_id"]).take_all()],
            np.uint64,
        )
        gen = self.current_generation() + 1
        delta = os.path.join(self.root, f"delta-{gen:06d}")
        build_index(docs, delta, self.cfg, lineage=f"{lineage}:delta")
        out = os.path.join(self.root, f"gen-{gen:06d}")
        # deletes apply to the OLD generation's copies of the updated ids;
        # the delta provides the new copies
        self._merge_with_selective_deletes(cur, delta, out, new_ids, lineage)
        shutil.rmtree(delta, ignore_errors=True)
        self._commit(gen)
        return Index(out)

    def _merge_with_selective_deletes(self, cur, delta, out, new_ids, lineage):
        # remove updated ids from the old generation only, then merge
        tmp_old = out + ".oldtrim"
        merge_indexes([cur], tmp_old, cfg=self.cfg, delete_doc_ids=new_ids,
                      lineage=f"{lineage}:trim")
        merge_indexes([tmp_old, delta], out, cfg=self.cfg, lineage=lineage)
        shutil.rmtree(tmp_old, ignore_errors=True)

    def cleanup(self, keep: int = 2) -> None:
        """Garbage-collect old generations (reference clean_files)."""
        g = self.current_generation()
        if g is None:
            return
        for name in os.listdir(self.root):
            if name.startswith("gen-"):
                n = int(name.split("-")[1])
                if n <= g - keep:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
