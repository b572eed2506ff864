"""HTML -> text extraction stage (the first hop of the north-star pipeline).

``BASELINE.json``'s input hint mandates pages shaped
``(url, warc_ts, html:binary, text, lang)`` with the per-row invariant that
the extracted text is byte-identical per url to the reference extraction.
The synthetic corpus (testing/pages.py) wraps text as
``<html><body>...</body></html>`` so extraction is exactly invertible and
the invariant is testable end-to-end; for arbitrary html a real extractor
(trafilatura / bs4-style — libs absent from this env) would slot into the
same map_batches stage, so the generic fallback here is a plain tag-strip,
documented as a stand-in rather than a production extractor.

Everything is vectorized: binary -> utf8 cast plus anchored
``replace_substring_regex`` kernels on the whole Arrow column (C++, no
per-row Python), so the stage adds negligible cost in front of
tokenization even at crawl scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_PREFIX = "<html><body>"
_SUFFIX = "</body></html>"
# RE2 has no $ anchor issues with \n in our corpus; anchored literals only
_RX_PREFIX = r"^<html><body>"
_RX_SUFFIX = r"</body></html>$"
_RX_ANY_TAG = r"<[^>]*>"


def extract_text_array(html: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Vectorized html -> text over an Arrow binary (or string) column.

    Wrapper pages (``<html><body>TEXT</body></html>``) decode to TEXT
    byte-identically; anything else falls back to stripping all tags.
    """
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        s = html.cast(pa.string())
    else:
        s = html
    stripped = pc.replace_substring_regex(
        pc.replace_substring_regex(s, pattern=_RX_PREFIX, replacement=""),
        pattern=_RX_SUFFIX,
        replacement="",
    )
    leftover = pc.match_substring_regex(stripped, _RX_ANY_TAG)
    if pc.any(leftover).as_py():
        generic = pc.replace_substring_regex(
            stripped, pattern=_RX_ANY_TAG, replacement=""
        )
        stripped = pc.if_else(leftover, generic, stripped)
    return stripped


class ExtractText:
    """map_batches callable: add/replace ``out_col`` with text extracted from
    ``html_col``. Stateless and vectorized — a plain function would do, but
    the class form keeps the signature uniform with the stateful stages (a
    real extractor would compile its parser here, once per actor)."""

    def __init__(
        self, html_col: str = "html", out_col: str = "text", drop_html: bool = True
    ):
        self.html_col = html_col
        self.out_col = out_col
        self.drop_html = drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = extract_text_array(batch[self.html_col])
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        batch = batch.append_column(self.out_col, text)
        if self.drop_html and self.html_col in batch.column_names:
            batch = batch.drop_columns([self.html_col])
        return batch


def extract_pages_text(ds, html_col: str = "html", out_col: str = "text", drop_html: bool = True):
    """Dataset stage: pages (with a binary html column) -> pages with the
    extracted text column, html dropped (it never needs to enter the
    tokenize shuffle). Zero-copy Arrow in/out."""
    return ds.map_batches(
        ExtractText(html_col, out_col, drop_html),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def wrap_html_array(text: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Inverse of the synthetic wrapper (testing/pages.py): text -> html
    bytes. Used by the round-trip oracle to prove byte-identity."""
    joined = pc.binary_join_element_wise(
        pa.scalar(_PREFIX), text, pa.scalar(_SUFFIX), ""
    )
    return joined.cast(pa.binary())
