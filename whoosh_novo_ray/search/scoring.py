"""Scoring models, vectorized over posting arrays.

Reproduces the reference's formulas exactly (de-odex/whoosh-novo
``src/whoosh/scoring.py``):

* ``idf = ln(doc_count / (df + 1)) + 1``            (scoring.py:50-56)
* BM25: ``idf * tf*(K1+1) / (tf + K1*((1-B) + B*dl/avgdl))`` (scoring.py:263-270)
  with B=0.75, K1=1.2 defaults and ``dl`` the *quantized* field length
  (byte_to_length(length_to_byte(true_len)), codec detail whoosh3.py:442-453)
  and ``avgdl = total_field_length / doc_count`` (searching.py:275-278).

Scorers also expose the quality bounds used for block-max pruning:
``max_quality = score(max_weight, min_length)`` (scoring.py:195-212).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from whoosh_novo_ray.lengths import bytes_to_lengths, byte_to_length


def idf(doc_count: int, df: int) -> float:
    return math.log(doc_count / (df + 1)) + 1


@dataclass(frozen=True)
class WeightingModel:
    """Base: creates per-term scorers bound to global stats."""

    # reference final() doc-level hook (scoring.py:65-81): subclasses set
    # use_final = True and override final() to adjust accumulated scores;
    # here the hook is vectorized over the whole result set
    use_final = False

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        raise NotImplementedError

    def final(self, searcher, doc_ids: np.ndarray, scores: np.ndarray) -> np.ndarray:
        return scores


class TermScorer:
    """Per-term scorer: vectorized score over (tf, len_byte) posting arrays."""

    def score_arrays(self, tfs: np.ndarray, len_bytes: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def max_quality(self, max_weight: float, min_len_byte: int) -> float:
        return float(
            self.score_arrays(
                np.array([max_weight]), np.array([min_len_byte], np.uint8)
            )[0]
        )


@dataclass(frozen=True)
class BM25F(WeightingModel):
    B: float = 0.75
    K1: float = 1.2

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        return _BM25Scorer(idf(doc_count, df), avgfl or 1.0, self.B, self.K1)


class _BM25Scorer(TermScorer):
    def __init__(self, idf_: float, avgfl: float, B: float, K1: float):
        self.idf = idf_
        self.avgfl = avgfl
        self.B = B
        self.K1 = K1

    def score_arrays(self, tfs, len_bytes):
        tf = np.asarray(tfs, dtype=np.float64)
        dl = bytes_to_lengths(len_bytes).astype(np.float64)
        K1, B = self.K1, self.B
        return self.idf * (tf * (K1 + 1)) / (tf + K1 * ((1 - B) + B * dl / self.avgfl))


@dataclass(frozen=True)
class TFIDF(WeightingModel):
    """score = weight * idf (reference scoring.py:461-483)."""

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        i = idf(doc_count, df)

        class _S(TermScorer):
            def score_arrays(self, tfs, len_bytes):
                return np.asarray(tfs, np.float64) * i

        return _S()


@dataclass(frozen=True)
class Existence(WeightingModel):
    """score = 1.0 per matching term, no tf / length / idf — the matcher
    behavior of the reference's Existence-format fields (ID / IDLIST /
    BOOLEAN store no frequencies; their scorer is a WeightScorer returning
    the stored weight, i.e. the field boost: formats.py Existence +
    scoring.py WeightScorer). Query boosts multiply on top as usual."""

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        class _S(TermScorer):
            def score_arrays(self, tfs, len_bytes):
                return np.ones(len(np.asarray(tfs)), np.float64)

        return _S()


@dataclass(frozen=True)
class Frequency(WeightingModel):
    """score = raw weight (reference scoring.py:452-459)."""

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        class _S(TermScorer):
            def score_arrays(self, tfs, len_bytes):
                return np.asarray(tfs, np.float64)

        return _S()


@dataclass(frozen=True)
class DFree(WeightingModel):
    """Terrier DFree divergence-from-randomness model (reference
    scoring.py:334-383); cf = collection term weight, fl = total field
    length."""

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        cf = term_weight or 1.0
        fl = avgfl * doc_count

        class _S(TermScorer):
            def score_arrays(self, tfs, len_bytes):
                tf = np.asarray(tfs, np.float64)
                dl = bytes_to_lengths(len_bytes).astype(np.float64)
                prior = tf / dl
                post = (tf + 1.0) / (dl + 1.0)
                invpriorcol = fl / cf
                norm = tf * np.log(post / prior)
                return norm * (
                    tf * np.log(prior * invpriorcol)
                    + (tf + 1.0) * np.log(post * invpriorcol)
                    + 0.5 * np.log(post / prior)
                )

        return _S()


@dataclass(frozen=True)
class PL2(WeightingModel):
    """Terrier PL2 model (reference scoring.py:392-446)."""

    c: float = 1.0

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        cf = term_weight or 1.0
        dc = doc_count or 1
        c = self.c
        avg = avgfl or 1.0
        rec_log2_of_e = 1.0 / math.log(2)

        class _S(TermScorer):
            def score_arrays(self, tfs, len_bytes):
                tf = np.asarray(tfs, np.float64)
                fl = bytes_to_lengths(len_bytes).astype(np.float64)
                TF = tf * np.log(1.0 + (c * avg) / fl)
                norm = 1.0 / (TF + 1.0)
                f = cf / dc
                return norm * (
                    TF * math.log(1.0 / f)
                    + f * rec_log2_of_e
                    + 0.5 * np.log(2 * math.pi * TF)
                    + TF * (np.log(TF) - rec_log2_of_e)
                )

        return _S()


@dataclass(frozen=True)
class ReverseWeighting(WeightingModel):
    """Negates the wrapped model's scores (reference scoring.py:585-610)."""

    weighting: WeightingModel

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        sub = self.weighting.scorer(doc_count, avgfl, df, term_weight)

        class _S(TermScorer):
            def score_arrays(self, tfs, len_bytes):
                return 0.0 - sub.score_arrays(tfs, len_bytes)

            def max_quality(self, max_weight, min_len_byte):
                return 0.0 - sub.max_quality(max_weight, min_len_byte)

        return _S()


class FunctionWeighting(WeightingModel):
    """Score with a user function ``fn(tfs, len_bytes, stats) -> scores``
    where stats is a dict(doc_count, avgfl, df, term_weight) — the vectorized
    analog of the reference FunctionWeighting (scoring.py:514-555)."""

    def __init__(self, fn):
        self.fn = fn

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        stats = {
            "doc_count": doc_count,
            "avgfl": avgfl,
            "df": df,
            "term_weight": term_weight,
        }
        fn = self.fn

        class _S(TermScorer):
            def score_arrays(self, tfs, len_bytes):
                return np.asarray(fn(tfs, len_bytes, stats), np.float64)

        return _S()


class MultiWeighting(WeightingModel):
    """Per-field model selection (reference scoring.py:558-582). This engine
    indexes a single text field, so the default always applies unless a
    Searcher is constructed per field."""

    def __init__(self, default: WeightingModel, **per_field: WeightingModel):
        self.default = default
        self.per_field = per_field

    def for_field(self, fieldname: str) -> WeightingModel:
        return self.per_field.get(fieldname, self.default)

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        return self.default.scorer(doc_count, avgfl, df, term_weight)
