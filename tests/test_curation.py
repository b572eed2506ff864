"""Corpus-curation ops: repetition signals, decontamination, unigram LM,
boilerplate n-grams (whoosh_novo_ray/ops/curation.py).

Semantics are verified against tiny hand-computed corpora here; the
bit-for-bit DuckDB oracles run through scripts/validate_oracles.py
(repetition_quality / decontam_4gram / unigram_lm_scores / boilerplate_frac).
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.ops.curation import (
    boilerplate_table,
    decontaminate_table,
    repetition_table,
    unigram_lm_table,
)


def _ds(texts, ids=None, blocks=3):
    import ray.data

    ids = list(range(len(texts))) if ids is None else ids
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return ray.data.from_arrow(tbl).repartition(blocks)


def _by_id(rows):
    return {r["doc_id"]: r for r in rows}


def test_repetition_signals(ray_session):
    rows = _by_id(
        repetition_table(
            _ds(
                [
                    "a b a b a b",  # top bigram 'a b' 3/5; all trigrams dup
                    "one two three four five",  # all bigrams unique
                    "x",  # no bigrams at all
                    "",
                ]
            )
        ).take_all()
    )
    assert rows[0]["top_2gram_frac"] == pytest.approx(3 / 5)
    assert rows[0]["dup_3gram_frac"] == 1.0
    assert rows[1]["top_2gram_frac"] == pytest.approx(0.25)
    assert rows[1]["dup_3gram_frac"] == 0.0
    assert rows[2]["top_2gram_frac"] == 0.0 and rows[2]["dup_3gram_frac"] == 0.0
    assert rows[3]["top_2gram_frac"] == 0.0 and rows[3]["dup_3gram_frac"] == 0.0


def test_repetition_partial_duplication(ray_session):
    # 'p q r' appears twice among 5 trigrams -> dup3 = 2/5; bigram 'p q' twice
    # of 6 bigrams -> top2 = 2/6
    rows = _by_id(repetition_table(_ds(["p q r s p q r"])).take_all())
    assert rows[0]["top_2gram_frac"] == pytest.approx(round(2 / 6, 6))
    assert rows[0]["dup_3gram_frac"] == pytest.approx(0.4)


def test_decontaminate(ray_session):
    # doc 0 is the benchmark (0 % 3 == 0 with bench_mod=3); doc 1 shares the
    # 4-gram 'w x y z', doc 2 is clean, doc 3 is benchmark (excluded)
    out = decontaminate_table(
        _ds(
            [
                "w x y z q r",
                "a b w x y z c",
                "totally clean words here",
                "another benchmark doc",
            ],
            ids=[0, 1, 2, 3],
        ),
        n=4,
        bench_mod=3,
    ).take_all()
    rows = _by_id(out)
    assert set(rows) == {1, 2}  # benchmark docs are not scored
    assert rows[1]["n_shared_grams"] == 1 and rows[1]["contaminated"] == 1
    assert rows[2]["n_shared_grams"] == 0 and rows[2]["contaminated"] == 0


def test_decontaminate_distinct(ray_session):
    # the shared gram occurs twice in doc 1 but counts once (DISTINCT)
    out = _by_id(
        decontaminate_table(
            _ds(["w x y z", "w x y z w x y z"], ids=[0, 1]), n=4, bench_mod=2
        ).take_all()
    )
    assert out[1]["n_shared_grams"] == 1


def test_unigram_lm(ray_session):
    # corpus: 'a' x3, 'b' x1 -> logp(a)=ln(3/4), logp(b)=ln(1/4)
    out = _by_id(unigram_lm_table(_ds(["a a b", "a"])).take_all())
    exp0 = (2 * math.log(3 / 4) + math.log(1 / 4)) / 3
    assert out[0]["n_tokens_raw"] == 3
    assert out[0]["mean_logprob"] == pytest.approx(round(exp0, 6), abs=1e-9)
    assert out[1]["mean_logprob"] == pytest.approx(round(math.log(3 / 4), 6), abs=1e-9)


def test_unigram_lm_empty_doc(ray_session):
    out = _by_id(unigram_lm_table(_ds(["", "a"])).take_all())
    assert out[0]["n_tokens_raw"] == 0 and out[0]["mean_logprob"] == 0.0


def test_boilerplate(ray_session):
    shared = "the quick brown fox jumps"
    out = _by_id(
        boilerplate_table(
            _ds(
                [
                    f"{shared} one two three four five",
                    f"{shared} six seven eight nine ten",
                    f"{shared}",
                    "completely different text with no shared grams at all ok",
                ]
            ),
            n=5,
            min_docs=3,
        ).take_all()
    )
    # docs 0/1 have 6 grams each, exactly one of them hot; doc 2 is all hot
    assert out[0]["n_grams"] == 6
    assert out[0]["boilerplate_frac"] == pytest.approx(round(1 / 6, 6))
    assert out[2]["n_grams"] == 1 and out[2]["boilerplate_frac"] == 1.0
    assert out[3]["boilerplate_frac"] == 0.0


def test_boilerplate_threshold(ray_session):
    # gram shared by only 2 docs stays cold at min_docs=3
    out = _by_id(
        boilerplate_table(
            _ds(["a b c d e", "a b c d e", "x y z w v"]), n=5, min_docs=3
        ).take_all()
    )
    assert all(r["boilerplate_frac"] == 0.0 for r in out.values())
    out2 = _by_id(
        boilerplate_table(
            _ds(["a b c d e", "a b c d e", "x y z w v"]), n=5, min_docs=2
        ).take_all()
    )
    assert out2[0]["boilerplate_frac"] == 1.0 and out2[2]["boilerplate_frac"] == 0.0


def test_ngram_windows_never_cross_docs(ray_session):
    # doc A ends 'x y', doc B starts 'z w': the cross-boundary gram 'x y z w'
    # must not exist, so nothing is shared with the benchmark doc 0
    out = _by_id(
        decontaminate_table(
            _ds(["x y z w", "q q x y", "z w q q"], ids=[0, 1, 2]), n=4, bench_mod=5
        ).take_all()
    )
    assert out[1]["n_shared_grams"] == 0 and out[2]["n_shared_grams"] == 0


def _ds_lang(texts, langs, blocks=3):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_dsir_weights(ray_session):
    """Docs sharing the target domain's vocabulary score higher than docs
    made of pool-only tokens; a brute-force replica over the same hashed
    buckets matches exactly."""
    import hashlib

    from whoosh_novo_ray.ops import dsir_table
    from whoosh_novo_ray.ops.curation import DSIR_BUCKETS

    texts = [
        "alpha beta gamma alpha beta",   # en (target)
        "alpha beta beta gamma",         # en (target)
        "rojo verde azul rojo",          # es
        "alpha beta gamma",              # es but target-like text
        "",                              # empty
    ]
    langs = ["en", "en", "es", "es", "es"]
    rows = _by_id(dsir_table(_ds_lang(texts, langs)).take_all())
    assert rows[4]["n_feats"] == 0 and rows[4]["log_weight"] == 0.0
    # target-like text beats pool-only text regardless of its own lang label
    assert rows[3]["log_weight"] > rows[2]["log_weight"]
    assert rows[0]["log_weight"] > rows[2]["log_weight"]

    # brute-force replica (unigrams + bigrams, add-1 smoothing)
    def bucket(g):
        return int.from_bytes(
            hashlib.md5(g.encode()).digest()[8:16], "little"
        ) % DSIR_BUCKETS

    def feats(t):
        toks = t.lower().split()
        return [bucket(g) for g in toks] + [
            bucket(a + " " + b) for a, b in zip(toks, toks[1:])
        ]

    ct = np.zeros(DSIR_BUCKETS)
    cq = np.zeros(DSIR_BUCKETS)
    for t, l in zip(texts, langs):
        for b in feats(t):
            cq[b] += 1
            if l == "en":
                ct[b] += 1
    logr = np.log((ct + 1) / (ct.sum() + DSIR_BUCKETS)) - np.log(
        (cq + 1) / (cq.sum() + DSIR_BUCKETS)
    )
    for i, t in enumerate(texts):
        fs = feats(t)
        want = round(float(np.mean([logr[b] for b in fs])), 6) if fs else 0.0
        assert rows[i]["log_weight"] == pytest.approx(want, abs=1.5e-6)
        assert rows[i]["n_feats"] == len(fs)


def test_dsir_bucket_collisions_shared(ray_session):
    """Weights depend only on hashed buckets: two distinct grams in the
    same bucket share mass (the DSIR hashing trick) — force tiny B."""
    from whoosh_novo_ray.ops.curation import dsir_table

    texts = ["aaa bbb", "ccc ddd"]
    rows = _by_id(
        dsir_table(_ds_lang(texts, ["en", "es"]), buckets=2).take_all()
    )
    assert set(rows) == {0, 1}
    assert all(r["n_feats"] == 3 for r in rows.values())  # 2 uni + 1 bi


def test_dsir_block_layout_invariant(ray_session):
    """Weights are invariant to block layout / batch boundaries (the
    groupby-sum reduce and hashing are layout-free)."""
    from whoosh_novo_ray.ops import dsir_table

    texts = [f"alpha beta w{i} w{i+1} gamma" for i in range(30)]
    langs = ["en" if i % 3 else "es" for i in range(30)]
    a = _by_id(dsir_table(_ds_lang(texts, langs, blocks=1)).take_all())
    b = _by_id(dsir_table(_ds_lang(texts, langs, blocks=7)).take_all())
    assert a.keys() == b.keys()
    for i in a:
        assert a[i]["log_weight"] == b[i]["log_weight"]
        assert a[i]["n_feats"] == b[i]["n_feats"]
