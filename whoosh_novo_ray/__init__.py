"""whoosh_novo_ray — a Ray-Data-native full-text indexing + BM25 search engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference pure-Python engine (de-odex/whoosh-novo) expressed as idiomatic
Ray Data pipelines over zero-copy Arrow batches:

* tokenize/normalize via ``map_batches`` (vectorized regex over Arrow string
  columns),
* posting-list construction via a hash-bucketed ``groupby`` shuffle with
  range-salting for heavy (stopword-like) terms,
* per-partition segment files (sorted term dictionary + delta/varint posting
  blocks with skip data) written as Parquet,
* BM25F top-k scoring with block-max pruning, rank-identical to the
  reference (same analyzer chain, same quantized field lengths, same idf,
  same (score desc, doc_id asc) tie-break).

Nothing here imports from or copies the reference; parity-critical constants
(stop words, length-quantization formula, BM25 constants) are re-derived from
published behavior and verified by differential tests.
"""

from whoosh_novo_ray.analysis import StandardAnalyzer, STOP_WORDS
from whoosh_novo_ray.lengths import byte_to_length, length_to_byte

__all__ = [
    "StandardAnalyzer",
    "STOP_WORDS",
    "byte_to_length",
    "length_to_byte",
]

__version__ = "0.1.0"
