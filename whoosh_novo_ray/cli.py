"""Command-line / ``ray job submit`` entry points.

The north-star deployment runs the build on a multi-node cluster via

    ray job submit --working-dir . -- python -m whoosh_novo_ray.cli \\
        build --input s3://corpus/pages/*.parquet --out /mnt/index

Under ``ray job submit`` the job runtime exports ``RAY_ADDRESS``, so
``ray.init`` attaches to the running cluster; standalone invocations fall
back to a local session. Every subcommand prints exactly ONE JSON line on
success (machine-parseable, like bench.py).

Subcommands
    build   parquet docs -> inverted index directory (resumable)
    search  parse a query string and run it against an index
    stats   print an index manifest summary

The reference's CLI surface is implicit (users call whoosh from Python);
this module is the operational wrapper the north_rule asks for, not a
reference-parity feature.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    return ray


def _cmd_build(args) -> dict:
    ray = _ensure_ray()
    import ray.data

    from whoosh_novo_ray.index import IndexConfig, build_index

    n_blocks = args.num_blocks or int(ray.cluster_resources().get("CPU", 8))
    columns = [args.id_col, args.text_col]
    if args.boost_col:
        columns.append(args.boost_col)
    docs = ray.data.read_parquet(
        args.input, columns=columns, override_num_blocks=n_blocks
    )
    cfg = IndexConfig(
        text_col=args.text_col,
        id_col=args.id_col,
        num_buckets=args.buckets,
        with_positions=not args.no_positions,
        with_weights=bool(args.boost_col),
        boost_col=args.boost_col,
    )
    lineage = args.lineage or f"cli:{args.input}"
    man = build_index(
        docs,
        args.out,
        cfg,
        lineage=lineage,
        resume=args.resume,
        auto_heavy=args.auto_heavy,
    )
    return {
        "cmd": "build",
        "out": args.out,
        "doc_count": man["doc_count"],
        "n_postings": man["n_postings"],
        "n_terms": man.get("n_terms"),
        "num_buckets": man.get("num_buckets", args.buckets),
        "resumed": bool(args.resume),
    }


def _cmd_search(args) -> dict:
    _ensure_ray()
    from whoosh_novo_ray.index import Index
    from whoosh_novo_ray.search import Searcher
    from whoosh_novo_ray.search.qparser import QueryParser

    q = QueryParser().parse(args.query)
    if args.pooled:
        # distributed serving: doc-shard actors evaluate the whole query,
        # the driver merges per-shard top-k (builds/reuses the resumable
        # serving layout next to the index)
        from whoosh_novo_ray.state.score_pool import ScorePool

        t = ScorePool(args.index, num_actors=args.actors).search(
            q, limit=args.limit
        )
    else:
        t = Searcher(Index(args.index)).search(q, limit=args.limit)
    return {
        "cmd": "search",
        "query": args.query,
        "parsed": repr(q),
        "pooled": bool(args.pooled),
        "hits": [
            {"doc_id": int(d), "score": round(float(sc), 6)}
            for d, sc in zip(t["doc_id"].to_pylist(), t["score"].to_pylist())
        ],
    }


def _cmd_stats(args) -> dict:
    with open(os.path.join(args.index, "manifest.json")) as f:
        man = json.load(f)
    return {
        "cmd": "stats",
        "index": args.index,
        "doc_count": man["doc_count"],
        "n_postings": man["n_postings"],
        "n_terms": man.get("n_terms"),
        "num_buckets": man.get("num_buckets"),
        "total_field_length": man.get("total_field_length"),
    }


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="whoosh_novo_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index from parquet docs")
    b.add_argument("--input", required=True, help="parquet file/dir/glob of docs")
    b.add_argument("--out", required=True, help="index output directory")
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--boost-col", default=None, help="per-doc boost column")
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--num-blocks", type=int, default=0, help="read parallelism (0 = cluster CPUs)")
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--resume", action="store_true", help="skip buckets already built with matching lineage")
    b.add_argument("--auto-heavy", action="store_true", help="df-sketch pre-pass salts heavy terms")
    b.add_argument("--lineage", default="", help="input fingerprint (default: cli:<input>)")
    b.set_defaults(fn=_cmd_build)

    s = sub.add_parser("search", help="run a parsed query against an index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--limit", type=int, default=10)
    s.add_argument("--pooled", action="store_true",
                   help="serve through the distributed doc-shard ScorePool")
    s.add_argument("--actors", type=int, default=4)
    s.set_defaults(fn=_cmd_search)

    st = sub.add_parser("stats", help="print an index manifest summary")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=_cmd_stats)
    return p


def main(argv=None) -> int:
    args = _parser().parse_args(argv)
    out = args.fn(args)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
