"""Span query algebra: verified against brute-force position scans."""

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.analysis import StandardAnalyzer
from whoosh_novo_ray.index import Index, IndexConfig, build_index
from whoosh_novo_ray.search import Searcher, Term
from whoosh_novo_ray.search.spans import (
    SpanBefore,
    SpanContains,
    SpanFirst,
    SpanNear2,
    SpanNot,
    SpanOr,
    SpanTerm,
)

TEXTS = [
    "alpha beta gamma delta",
    "beta alpha gamma",
    "gamma delta alpha beta epsilon",
    "alpha gamma beta",
    "delta epsilon",
    "alpha beta alpha beta",
    "the alpha and the beta",  # stopwords shift renumbered positions
]


@pytest.fixture(scope="module")
def env(ray_session, tmp_path_factory):
    import ray.data

    tbl = pa.table(
        {"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": TEXTS}
    )
    out = str(tmp_path_factory.mktemp("spans") / "idx")
    build_index(ray.data.from_arrow(tbl), out, IndexConfig(num_buckets=2), lineage="s")
    ana = StandardAnalyzer()
    toks = [ana(t) for t in TEXTS]
    return Searcher(Index(out)), toks


def _docs(searcher, q):
    ids, _ = searcher.postings(q)
    return sorted(int(d) for d in ids)


def test_span_near_ordered(env):
    s, toks = env
    # alpha immediately followed by beta
    got = _docs(s, SpanNear2([SpanTerm("alpha"), SpanTerm("beta")], slop=1))
    expect = sorted(
        i
        for i, tk in enumerate(toks)
        if any(a == "alpha" and b == "beta" for a, b in zip(tk, tk[1:]))
    )
    assert got == expect


def test_span_near_unordered(env):
    s, toks = env
    got = _docs(
        s, SpanNear2([SpanTerm("alpha"), SpanTerm("beta")], slop=1, ordered=False)
    )
    expect = sorted(
        i
        for i, tk in enumerate(toks)
        if any(
            {a, b} == {"alpha", "beta"} for a, b in zip(tk, tk[1:])
        )
    )
    assert got == expect


def test_span_near_slop2_chain(env):
    s, toks = env
    # alpha then gamma within 2 positions (one word may intervene)
    got = _docs(s, SpanNear2([SpanTerm("alpha"), SpanTerm("gamma")], slop=2))
    expect = sorted(
        i
        for i, tk in enumerate(toks)
        if any(
            tk[j] == "alpha" and "gamma" in tk[j + 1 : j + 3]
            for j in range(len(tk))
        )
    )
    assert got == expect


def test_span_first(env):
    s, toks = env
    got = _docs(s, SpanFirst(SpanTerm("alpha"), limit=0))
    # NB: stop-word renumbering keeps the first surviving token's ORIGINAL
    # position (reference StopFilter quirk), so "the alpha ..." has alpha at
    # position 1 — positions are pre-stop ordinals for the first run
    expect = sorted(
        i for i, t in enumerate(TEXTS) if t.split() and t.split()[0] == "alpha"
    )
    assert got == expect


def test_span_or(env):
    s, toks = env
    got = _docs(s, SpanOr([SpanTerm("epsilon"), SpanTerm("delta")]))
    expect = sorted(
        i for i, tk in enumerate(toks) if "epsilon" in tk or "delta" in tk
    )
    assert got == expect


def test_span_not(env):
    s, toks = env
    # alpha spans not overlapping beta spans: alpha occurrences are single
    # positions so this means docs keep alphas (always true if alpha present)
    got = _docs(s, SpanNot(SpanTerm("alpha"), SpanTerm("beta")))
    expect = sorted(i for i, tk in enumerate(toks) if "alpha" in tk)
    assert got == expect
    # near-span NOT overlapping gamma: "alpha beta" bigram not touching gamma
    got2 = _docs(
        s,
        SpanNot(
            SpanNear2([SpanTerm("alpha"), SpanTerm("beta")], slop=1),
            SpanTerm("gamma"),
        ),
    )
    assert set(got2) <= set(
        _docs(s, SpanNear2([SpanTerm("alpha"), SpanTerm("beta")], slop=1))
    )


def test_span_contains(env):
    s, toks = env
    # "alpha..gamma within slop 2" spans that contain a beta occurrence
    outer = SpanNear2([SpanTerm("alpha"), SpanTerm("gamma")], slop=2)
    got = _docs(s, SpanContains(outer, SpanTerm("beta")))
    # doc 3: alpha gamma beta -> span (0,1) does not contain beta(2)
    # doc 0: alpha beta gamma -> span (0,2) contains beta(1)
    assert 0 in got and 3 not in got


def test_span_before(env):
    s, toks = env
    got = _docs(s, SpanBefore(SpanTerm("alpha"), SpanTerm("epsilon")))
    expect = sorted(
        i
        for i, tk in enumerate(toks)
        if "alpha" in tk
        and "epsilon" in tk
        and min(j for j, w in enumerate(tk) if w == "alpha")
        < max(j for j, w in enumerate(tk) if w == "epsilon")
    )
    assert got == expect


def test_span_condition(env):
    s, toks = env
    from whoosh_novo_ray.search.spans import SpanCondition, evaluate_spans

    # alpha spans, but only in docs that also contain epsilon
    got = _docs(s, SpanCondition(SpanTerm("alpha"), SpanTerm("epsilon")))
    expect = sorted(
        i for i, tk in enumerate(toks) if "alpha" in tk and "epsilon" in tk
    )
    assert got == expect
    # spans come from a ONLY: same spans as a plain alpha scan on those docs
    aspans = evaluate_spans.__globals__["_spans_of"](
        s, SpanCondition(SpanTerm("alpha"), SpanTerm("epsilon"))
    )
    for d in set(aspans.docs.tolist()):
        starts = sorted(
            int(p)
            for p, dd in zip(aspans.starts, aspans.docs)
            if int(dd) == d
        )
        brute = [j for j, w in enumerate(toks[int(d)]) if w == "alpha"]
        assert starts == brute
    # condition on a compound span query
    outer = SpanNear2([SpanTerm("alpha"), SpanTerm("beta")], slop=1)
    got2 = _docs(s, SpanCondition(outer, SpanTerm("gamma")))
    expect2 = sorted(
        i
        for i, tk in enumerate(toks)
        if "gamma" in tk
        and any(a == "alpha" and b == "beta" for a, b in zip(tk, tk[1:]))
    )
    assert got2 == expect2
