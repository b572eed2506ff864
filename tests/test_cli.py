"""CLI / ray-job entry points: build -> stats -> search roundtrip."""

import json
import os
import subprocess
import sys

from whoosh_novo_ray.cli import main

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF_DIR, "documents.parquet")


def _run(capsys, argv):
    assert main(argv) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_build_search_stats_roundtrip(ray_session, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    built = _run(capsys, ["build", "--input", DOCS, "--out", idx, "--buckets", "8"])
    assert built["cmd"] == "build" and built["doc_count"] > 0
    assert built["n_postings"] > built["doc_count"]

    stats = _run(capsys, ["stats", "--index", idx])
    assert stats["doc_count"] == built["doc_count"]
    assert stats["n_postings"] == built["n_postings"]

    res = _run(capsys, ["search", "--index", idx, "--query", "table OR window", "--limit", "5"])
    assert res["cmd"] == "search"
    assert 0 < len(res["hits"]) <= 5
    scores = [h["score"] for h in res["hits"]]
    assert scores == sorted(scores, reverse=True)

    # parity with the library Searcher on the same index
    from whoosh_novo_ray.index import Index
    from whoosh_novo_ray.search import Searcher
    from whoosh_novo_ray.search.qparser import QueryParser

    t = Searcher(Index(idx)).search(QueryParser().parse("table OR window"), limit=5)
    assert [h["doc_id"] for h in res["hits"]] == t["doc_id"].to_pylist()

    # distributed serving path returns the same ranking
    pooled = _run(capsys, ["search", "--index", idx, "--query",
                           "table OR window", "--limit", "5",
                           "--pooled", "--actors", "2"])
    assert pooled["hits"] == res["hits"]


def test_cli_build_resume_skips(ray_session, tmp_path, capsys):
    idx = str(tmp_path / "idx2")
    a = _run(capsys, ["build", "--input", DOCS, "--out", idx, "--buckets", "4",
                      "--lineage", "fixed"])
    b = _run(capsys, ["build", "--input", DOCS, "--out", idx, "--buckets", "4",
                      "--lineage", "fixed", "--resume"])
    assert b["resumed"] is True
    assert (a["doc_count"], a["n_postings"]) == (b["doc_count"], b["n_postings"])


def test_cli_module_subprocess(tmp_path):
    # the actual `ray job submit -- python -m whoosh_novo_ray.cli` path:
    # a fresh process owning its own Ray session
    idx = str(tmp_path / "idx3")
    env = dict(os.environ, RAY_ADDRESS="local")
    out = subprocess.run(
        [sys.executable, "-m", "whoosh_novo_ray.cli", "build", "--input", DOCS,
         "--out", idx, "--buckets", "4"],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["doc_count"] > 0
