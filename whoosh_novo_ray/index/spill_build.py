"""Alternative build path: explicit two-stage spill-file shuffle.

The Dataset-API build (build.py) routes the posting exchange through Ray
Data's sort-based shuffle; its coordination overhead dominates wall time on
small-to-medium corpora and caps single-box scaling (see BASELINE.md). This
path is the classic map-side-partition shuffle expressed with raw Ray tasks —
the case SURVEY.md reserves for "what the Dataset API can't express
efficiently":

  stage 1 (one task per input slice): read -> TokenizePostings -> partition
      rows by bucket -> append one spill parquet per (task, bucket);
  stage 2 (one task per bucket): read the bucket's spill files -> the same
      BucketEncoder encode/write as the Dataset path -> manifest row.

Spills land under ``out_dir/_spill`` (a shared filesystem or object store at
cluster scale — exactly how external-shuffle services arrange it). Results
are bit-identical to the Dataset path (same tokenizer, same encoder); the
equivalence test builds both and compares segments.

Measured on the sandbox box the object-store (Dataset) path is equal or
slightly faster — the single-box ceiling is memory bandwidth, not shuffle
coordination — so this path is for deployments with fast local NVMe / a
disaggregated shuffle store, and as the fallback when a bucket exceeds
object-store comfort.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from whoosh_novo_ray.index.build import (
    MANIFEST_NAME,
    BucketEncoder,
    IndexConfig,
    TokenizePostings,
)


@ray.remote
def _tokenize_and_spill(
    files: list[str],
    row_slices: list[tuple[int, int]] | None,
    cfg: IndexConfig,
    spill_dir: str,
    task_id: int,
    columns: list[str],
) -> dict:
    tok = TokenizePostings(cfg)
    n_docs = 0
    spilled: dict[int, list[pa.Table]] = {}
    for fi, f in enumerate(files):
        tbl = pq.read_table(f, columns=columns)
        if row_slices is not None:
            lo, hi = row_slices[fi]
            tbl = tbl.slice(lo, hi - lo)
        n_docs += len(tbl)
        rows = tok(tbl)
        # partition by bucket: sort + run boundaries
        order = np.argsort(rows["bucket"].to_numpy(zero_copy_only=False), kind="stable")
        rows = rows.take(pa.array(order))
        b = rows["bucket"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.diff(b, prepend=-1))
        bounds = np.append(starts, len(b))
        for i, st in enumerate(starts):
            bucket = int(b[st])
            spilled.setdefault(bucket, []).append(rows.slice(st, bounds[i + 1] - st))
    for bucket, parts in spilled.items():
        d = os.path.join(spill_dir, f"bucket={bucket:05d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.concat_tables(parts),
            os.path.join(d, f"part-{task_id:05d}.parquet"),
            compression="lz4",
        )
    return {"task": task_id, "docs": n_docs}


@ray.remote
def _encode_bucket(bucket: int, spill_dir: str, out_dir: str, cfg: IndexConfig, lineage: str) -> dict | None:
    d = os.path.join(spill_dir, f"bucket={bucket:05d}")
    if not os.path.isdir(d):
        return None
    files = sorted(os.listdir(d))
    tbl = pa.concat_tables(
        [pq.read_table(os.path.join(d, f)) for f in files]
    )
    enc = BucketEncoder(out_dir, cfg, lineage)
    res = enc(tbl)
    if len(res) == 0:
        return None
    return {c: res[c][0].as_py() for c in res.column_names}


def build_index_spill(
    input_files: list[str],
    out_dir: str,
    cfg: IndexConfig | None = None,
    lineage: str = "",
    num_tokenize_tasks: int | None = None,
    columns: tuple[str, str] = ("doc_id", "text"),
) -> dict:
    """Build an index from parquet files via the spill-file shuffle.

    Functionally identical output to ``build_index`` (same manifest layout),
    listed input files are split into ``num_tokenize_tasks`` row slices.
    """
    cfg = cfg or IndexConfig()
    os.makedirs(out_dir, exist_ok=True)
    spill_dir = os.path.join(out_dir, "_spill")
    shutil.rmtree(spill_dir, ignore_errors=True)
    os.makedirs(spill_dir)

    # slice inputs by row count so tasks are balanced
    metas = [(f, pq.ParquetFile(f).metadata.num_rows) for f in input_files]
    total_rows = sum(n for _f, n in metas)
    n_tasks = num_tokenize_tasks or max(8, int(ray.cluster_resources().get("CPU", 8)))
    per = (total_rows + n_tasks - 1) // n_tasks

    assignments: list[tuple[list[str], list[tuple[int, int]]]] = []
    cur_files: list[str] = []
    cur_slices: list[tuple[int, int]] = []
    budget = per
    for f, n in metas:
        off = 0
        while off < n:
            take = min(budget, n - off)
            cur_files.append(f)
            cur_slices.append((off, off + take))
            off += take
            budget -= take
            if budget == 0:
                assignments.append((cur_files, cur_slices))
                cur_files, cur_slices = [], []
                budget = per
    if cur_files:
        assignments.append((cur_files, cur_slices))

    t0 = time.perf_counter()
    tok_refs = [
        _tokenize_and_spill.remote(fs, sl, cfg, spill_dir, i, list(columns))
        for i, (fs, sl) in enumerate(assignments)
    ]
    tok_results = ray.get(tok_refs)
    doc_count = sum(r["docs"] for r in tok_results)

    enc_refs = [
        _encode_bucket.remote(b, spill_dir, out_dir, cfg, lineage)
        for b in range(cfg.num_buckets)
    ]
    rows = [r for r in ray.get(enc_refs) if r is not None]
    build_secs = time.perf_counter() - t0
    shutil.rmtree(spill_dir, ignore_errors=True)

    buckets = sorted(
        (
            {
                "bucket": int(r["bucket"]),
                "path": r["path"],
                "n_terms": int(r["n_terms"]),
                "n_postings": int(r["n_postings"]),
                "sum_tf": float(r["sum_tf"]),
                "n_docs_meta": int(r.get("n_docs_meta", 0)),
                "min_term": r["min_term"],
                "max_term": r["max_term"],
                "lineage": r["lineage"],
            }
            for r in rows
        ),
        key=lambda b: b["bucket"],
    )
    manifest = {
        "format_version": 1,
        "generation": int(time.time()),
        "doc_count": int(doc_count),
        "total_field_length": float(sum(b["sum_tf"] for b in buckets)),
        "n_postings": int(sum(b["n_postings"] for b in buckets)),
        "build_secs": build_secs,
        "config": cfg.to_json(),
        "lineage": lineage,
        "buckets": buckets,
    }
    man_path = os.path.join(out_dir, MANIFEST_NAME)
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, man_path)
    return manifest
