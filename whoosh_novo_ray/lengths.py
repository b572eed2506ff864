"""Lossy per-document field-length quantization (1 byte per doc).

The reference engine stores each document's scorable field length as a single
byte via a 256-entry logarithmic table and BM25 uses the *decoded* (quantized)
length — see de-odex/whoosh-novo ``src/whoosh/util/numeric.py:372-644`` and
``src/whoosh/codec/whoosh3.py:234-243``. Reproducing this quantization is
required for rank-identical scores.

The table here is regenerated from the published generating formula
``int(round((1.033**n - 1) * 27))`` (documented in the reference source as the
origin of its literal table); a unit test asserts the well-known boundary
values (0, 1, ..., 106374 -> 255).
"""

from __future__ import annotations

import numpy as np

# 256 length thresholds; index n holds the decoded length for byte n.
LENGTH_TABLE: np.ndarray = np.array(
    [int(round((1.033**n - 1) * 27)) for n in range(256)], dtype=np.int64
)
_MAX_LEN = int(LENGTH_TABLE[255])  # 106374


def length_to_byte(length: int | None) -> int:
    """Quantize a field length to one byte (bisect-left over the table)."""
    if length is None:
        return 0
    if length >= _MAX_LEN:
        return 255
    return int(np.searchsorted(LENGTH_TABLE, length, side="left"))


def byte_to_length(b: int) -> int:
    """Decode a quantized length byte back to a representative length."""
    return int(LENGTH_TABLE[b])


def lengths_to_bytes(lengths: np.ndarray) -> np.ndarray:
    """Vectorized ``length_to_byte`` for a numpy array of lengths."""
    out = np.searchsorted(LENGTH_TABLE, lengths, side="left")
    return np.minimum(out, 255).astype(np.uint8)


def bytes_to_lengths(bs: np.ndarray) -> np.ndarray:
    """Vectorized ``byte_to_length``."""
    return LENGTH_TABLE[np.asarray(bs, dtype=np.int64)]


def length_table_sql_literal() -> str:
    """The 256-entry table as a DuckDB list literal, for oracle SQL.

    ``([...])[len_byte + 1]`` reproduces ``byte_to_length`` in SQL
    (DuckDB lists are 1-indexed).
    """
    return "[" + ",".join(str(int(v)) for v in LENGTH_TABLE) + "]"
