"""Text-analysis operators over a documents Dataset.

Each is a streaming ``map_batches`` transform (zero-copy Arrow in/out, no
shuffle) producing per-document feature rows — the building blocks of a
training-data curation pipeline. All are deterministic and SQL-expressible so
the driver's DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from whoosh_novo_ray.analysis import STOP_WORDS, StandardAnalyzer, simple_analyzer
from whoosh_novo_ray.lengths import bytes_to_lengths, lengths_to_bytes

_ANA = StandardAnalyzer()  # index-analyzer chain (stop-filtered)
_RAW = simple_analyzer()  # tokenize+lowercase only


class _DocLengths:
    """(doc_id, n_tokens, len_byte, quantized_len) — the per-doc scorable
    length and its 1-byte quantization (what BM25 actually uses)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ab = _ANA.analyze_batch(texts)
        lens = ab.field_lengths
        lb = lengths_to_bytes(lens)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "len_byte": pa.array(lb.astype(np.int64), pa.int64()),
                "quantized_len": pa.array(bytes_to_lengths(lb), pa.int64()),
            }
        )


def doc_length_table(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(_DocLengths(), batch_format="pyarrow", zero_copy_batch=True)


class _Quality:
    """Quality-scoring heuristics: token counts, mean token length, stopword
    ratio — the standard web-text quality signals."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ab = _RAW.analyze_batch(texts)  # raw tokens incl. stopwords
        n = len(texts)
        total = np.bincount(ab.doc_idx, minlength=n).astype(np.int64)
        if len(ab.tokens):
            import pandas as pd

            s = pd.Series(ab.tokens)
            is_stop = s.isin(STOP_WORDS).to_numpy()
            tok_len = s.str.len().to_numpy()
            n_stop = np.bincount(ab.doc_idx, weights=is_stop, minlength=n)
            sum_len = np.bincount(ab.doc_idx, weights=tok_len, minlength=n)
        else:
            n_stop = np.zeros(n)
            sum_len = np.zeros(n)
        denom = np.maximum(total, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens_raw": pa.array(total, pa.int64()),
                "stopword_ratio": pa.array(np.round(n_stop / denom, 6), pa.float64()),
                "mean_token_len": pa.array(np.round(sum_len / denom, 6), pa.float64()),
            }
        )


def quality_table(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(_Quality(), batch_format="pyarrow", zero_copy_batch=True)


class _LangId:
    """Stopword-ratio language heuristic: a doc whose raw-token stream has
    >= `threshold` English-stopword mass is labeled 'en'. (A real model is a
    drop-in replacement for this callable — same actor-pool shape.)"""

    def __init__(self, threshold: float = 0.08):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = _Quality()(batch)
        ratio = q["stopword_ratio"].to_numpy()
        pred = np.where(ratio >= self.threshold, "en", "other")
        return pa.table(
            {
                "doc_id": q["doc_id"],
                "en_stop_ratio": q["stopword_ratio"],
                "lang_pred": pa.array(pred, pa.string()),
            }
        )


def langid_table(docs: "ray.data.Dataset", threshold: float = 0.08) -> "ray.data.Dataset":
    return docs.map_batches(
        _LangId(threshold), batch_format="pyarrow", zero_copy_batch=True
    )


_BPE_RX = r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
_BPE_COMPILED = None  # compiled lazily once per worker process


def _bpe_counts(batch: pa.Table) -> pa.Table:
    """BPE-ish pre-tokenizer counts: the GPT-2-style split (leading-space
    word pieces / digit runs / punctuation runs / whitespace) WITHOUT the
    lookahead clauses, so the exact same pattern runs under Python re and
    DuckDB's RE2 (ASCII classes — identical semantics in both engines).
    The per-doc match count approximates the doc's BPE token budget before
    merges — the standard cheap "how many tokens will this cost" signal.
    Task-based (not an actor pool): the only state is one compiled regex,
    cached per worker process."""
    global _BPE_COMPILED
    if _BPE_COMPILED is None:
        import re

        _BPE_COMPILED = re.compile(_BPE_RX)
    texts = batch["text"].to_pylist()
    counts = np.fromiter(
        (len(_BPE_COMPILED.findall(t)) for t in texts), np.int64, len(texts)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_bpe_tokens": pa.array(counts, pa.int64()),
        }
    )


def bpe_token_table(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(
        _bpe_counts, batch_format="pyarrow", zero_copy_batch=True
    )


class _Fingerprint:
    """Normalized-content fingerprint: md5 of the analyzer token stream
    joined by single spaces. Collapses whitespace/case/punctuation variants
    of the same content to one fingerprint (reference analog: the content
    hashing used for update_document-style upserts)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        fps = []
        for t in texts:
            toks = _RAW(t)
            fps.append(hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "fingerprint": pa.array(fps, pa.string()),
            }
        )


def fingerprint_table(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(_Fingerprint(), batch_format="pyarrow", zero_copy_batch=True)
