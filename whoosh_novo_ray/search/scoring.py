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

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        raise NotImplementedError


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
class Frequency(WeightingModel):
    """score = raw weight (reference scoring.py:452-459)."""

    def scorer(self, doc_count: int, avgfl: float, df: int, term_weight: float):
        class _S(TermScorer):
            def score_arrays(self, tfs, len_bytes):
                return np.asarray(tfs, np.float64)

        return _S()
