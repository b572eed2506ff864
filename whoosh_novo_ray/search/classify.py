"""Key-term extraction and more-like-this via query expansion models.

Reproduces the reference's expansion models exactly (de-odex/whoosh-novo
``src/whoosh/classify.py:39-205``): Bo1, Bo2 and KL divergence-from-random
scoring of candidate terms from a set of "top" documents against collection
statistics, with the same normalizer.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa


class ExpansionModel:
    def __init__(self, doc_count: int, field_length: float):
        self.N = doc_count
        self.collection_total = field_length
        self.mean_length = (field_length / doc_count) if doc_count else 0

    def normalizer(self, maxweight, top_total):
        raise NotImplementedError

    def score(self, weight_in_top, weight_in_collection, top_total):
        raise NotImplementedError


class Bo1Model(ExpansionModel):
    def normalizer(self, maxweight, top_total):
        if not maxweight:
            return maxweight
        f = maxweight / self.N
        return (maxweight * math.log((1.0 + f) / f) + math.log(1.0 + f)) / math.log(2.0)

    def score(self, weight_in_top, weight_in_collection, top_total):
        f = weight_in_collection / self.N
        return weight_in_top * math.log((1.0 + f) / f, 2) + math.log(1.0 + f, 2)


class Bo2Model(ExpansionModel):
    def normalizer(self, maxweight, top_total):
        if not self.collection_total:
            return maxweight
        f = maxweight * self.N / self.collection_total
        return maxweight * math.log((1.0 + f) / f, 2) + math.log(1.0 + f, 2)

    def score(self, weight_in_top, weight_in_collection, top_total):
        f = weight_in_top * top_total / self.collection_total
        return weight_in_top * math.log((1.0 + f) / f, 2) + math.log(1.0 + f, 2)


class KLModel(ExpansionModel):
    def normalizer(self, maxweight, top_total):
        if not self.collection_total:
            return maxweight
        return (
            maxweight * math.log(self.collection_total / top_total) / math.log(2.0)
        ) * top_total

    def score(self, weight_in_top, weight_in_collection, top_total):
        wit_over_tt = weight_in_top / top_total
        wic_over_ct = weight_in_collection / self.collection_total
        if wit_over_tt < wic_over_ct:
            return 0
        return wit_over_tt * math.log(
            wit_over_tt / (weight_in_top / self.collection_total), 2
        )


_MODELS = {"bo1": Bo1Model, "bo2": Bo2Model, "kl": KLModel}


def key_terms_from_text(
    searcher, texts: list[str], numterms: int = 5, model: str = "bo1",
    normalize: bool = True,
) -> list[tuple[str, float]]:
    """Most distinctive terms of the given document texts vs the collection
    (reference Expander.add_text + expanded_terms, classify.py:98-205)."""
    mcls = _MODELS[model]
    m = mcls(searcher.index.doc_count, searcher.index.total_field_length)
    ana = searcher.index.cfg.analyzer
    topwords: Counter = Counter()
    for t in texts:
        topwords.update(ana(t))
    if not topwords:
        return []
    top_total = sum(topwords.values())

    # collection weight per candidate term from the index stats
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


def more_like(searcher, text: str, numterms: int = 5, limit: int = 10) -> pa.Table:
    """More-like-this: expand the text's key terms into an OR query
    (reference Searcher.more_like, searching.py:509-613)."""
    from whoosh_novo_ray.search import query as Q

    kt = key_terms_from_text(searcher, [text], numterms=numterms)
    if not kt:
        return pa.table(
            {"doc_id": pa.array([], pa.uint64()), "score": pa.array([], pa.float64())}
        )
    return searcher.search(Q.Or(*[Q.Term(t) for t, _ in kt]), limit=limit)


# -- near-duplicate / clustering utilities (reference classify.py:208-330) ----


def token_shingles(seq, size: int = 2):
    """(shingle, count) pairs over a sequence (reference ``shingles``)."""
    counts: dict = {}
    for i in range(len(seq) - (size - 1)):
        sh = seq[i : i + size]
        counts[sh] = counts.get(sh, 0) + 1
    return list(counts.items())


def _varhash(s: str, hashbits: int) -> int:
    """The reference's variable-width string hash (classify.py:236-250)."""
    if s == "":
        return 0
    mask = 2**hashbits - 1
    x = ord(s[0]) << 7
    for c in s:
        x = ((x * 1000003) ^ ord(c)) & mask
    x ^= len(s)
    return -2 if x == -1 else x


def feature_simhash(features, hashbits: int = 32) -> int:
    """Weighted-feature SimHash (reference ``classify.simhash``): hashbits=32
    uses Python's builtin ``hash`` (matching the reference — NOT stable
    across interpreter runs for strings; use ``ops.dedup.simhash_table`` for
    the deterministic md5-based engine path)."""
    hashfn = hash if hashbits == 32 else (lambda s: _varhash(s, hashbits))
    votes = [0] * hashbits
    for feature, weight in features:
        h = hashfn(feature)
        for i in range(hashbits):
            votes[i] += weight if h & (1 << i) else -weight
    out = 0
    for i, v in enumerate(votes):
        if v > 0:
            out |= 1 << i
    return out


def hamming_distance(a: int, b: int, hashbits: int = 32) -> int:
    return ((a ^ b) & ((1 << hashbits) - 1)).bit_count()


def kmeans_1d(data, k: int, t: float = 0.0001, maxiter: int = 50, centers=None):
    """One-dimensional Lloyd's k-means (reference ``classify.kmeans``,
    adapted like it from Roger Zhang's public C version): returns
    (labels, centroids). ``centers=None`` samples random initial centroids
    (pass explicit centers for determinism)."""
    import random as _random

    n = len(data)
    c = list(centers) if centers else _random.sample(list(data), k)
    labels = [0] * n
    error = float("inf")
    it = 0
    while True:
        old_error = error
        error = 0.0
        sums = [0.0] * k
        counts = [0] * k
        for h in range(n):
            best = float("inf")
            for i in range(k):
                d = (data[h] - c[i]) ** 2
                if d < best:
                    labels[h] = i
                    best = d
            sums[labels[h]] += data[h]
            counts[labels[h]] += 1
            error += best
        for i in range(k):
            c[i] = sums[i] / counts[i] if counts[i] else sums[i]
        it += 1
        if abs(error - old_error) < t or it > maxiter:
            break
    return labels, c
