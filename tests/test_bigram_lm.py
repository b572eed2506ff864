"""Bigram LM via co-partitioned model join: brute-force + layout invariance."""

import collections
import math

import numpy as np
import pyarrow as pa

from whoosh_novo_ray.analysis import simple_analyzer
from whoosh_novo_ray.ops.curation import bigram_lm_table

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


def _table(n=120, seed=4):
    rng = np.random.RandomState(seed)
    texts = [
        " ".join(WORDS[i] for i in rng.randint(0, len(WORDS), rng.randint(0, 10)))
        for _ in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def _collect(ray, ds):
    return pa.concat_tables(
        [t for t in ray.get(ds.materialize().to_arrow_refs()) if len(t)]
    ).sort_by("doc_id")


def _brute(texts):
    ana = simple_analyzer()
    toks = [ana(t) for t in texts]
    c12: collections.Counter = collections.Counter()
    c1: collections.Counter = collections.Counter()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    out = []
    for ts in toks:
        bis = list(zip(ts, ts[1:]))
        if not bis:
            out.append((0, 0.0))
            continue
        m = sum(math.log(c12[bi] / c1[bi[0]]) for bi in bis) / len(bis)
        out.append((len(bis), round(m, 6)))
    return out


def test_bigram_lm_matches_brute_force(ray_session):
    import ray.data

    tbl = _table()
    got = _collect(ray_session, bigram_lm_table(ray.data.from_arrow(tbl).repartition(7)))
    expect = _brute(tbl["text"].to_pylist())
    assert got["doc_id"].to_pylist() == list(range(len(tbl)))
    assert got["n_bigrams"].to_pylist() == [n for n, _ in expect]
    for g, (_n, m) in zip(got["mean_logprob"].to_pylist(), expect):
        assert abs(g - m) < 1e-9


def test_bigram_lm_block_layout_invariant(ray_session):
    import ray.data

    tbl = _table(seed=9)
    a = _collect(ray_session, bigram_lm_table(ray.data.from_arrow(tbl).repartition(2)))
    b = _collect(ray_session, bigram_lm_table(ray.data.from_arrow(tbl).repartition(13)))
    assert a["n_bigrams"].to_pylist() == b["n_bigrams"].to_pylist()
    for x, y in zip(a["mean_logprob"].to_pylist(), b["mean_logprob"].to_pylist()):
        assert abs(x - y) < 1e-9
