"""Searcher convenience lookups: document / documents / document_number(s),
find, docs_for_query (reference searching.py:350-695). Text keywords match
the indexed field; attribute keywords equality-match the stored-fields
table (our engine keeps stored fields in the source parquet)."""

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.search import Or, Searcher, Term


@pytest.fixture(scope="module")
def searcher(built_index):
    return Searcher(built_index)


@pytest.fixture(scope="module")
def attrs(pages_table):
    return pages_table.select(["doc_id", "url", "lang", "text"])


def test_document_numbers_text_kw(searcher):
    ids = searcher.document_numbers(text="search")
    ref, _ = searcher.postings(Term("search"))
    assert (ids == ref).all() and len(ids) > 0
    assert (np.diff(ids.astype(np.int64)) > 0).all()  # ascending doc order


def test_document_number_first(searcher):
    ids = searcher.document_numbers(text="search")
    assert searcher.document_number(text="search") == int(ids[0])
    assert searcher.document_number(text="zzzznope") is None


def test_document_unique_key(searcher, attrs, pages_table):
    url = pages_table["url"][7].as_py()
    row = searcher.document(attrs, url=url)
    assert row is not None and row["doc_id"] == 7 and row["url"] == url
    assert searcher.document(attrs, url="https://nope.example/x") is None


def test_documents_combined_kw(searcher, attrs, pages_table):
    """text term AND attribute equality — the And path."""
    rows = list(searcher.documents(attrs, text="search", lang="en"))
    langs = dict(
        zip(pages_table["doc_id"].to_pylist(), pages_table["lang"].to_pylist())
    )
    want = [
        int(i)
        for i in searcher.document_numbers(text="search")
        if langs[int(i)] == "en"
    ]
    assert [r["doc_id"] for r in rows] == want and len(want) > 0
    assert all(r["lang"] == "en" for r in rows)


def test_documents_no_kwargs_yields_all(searcher, attrs, pages_table):
    rows = list(searcher.documents(attrs))
    assert len(rows) == pages_table.num_rows


def test_attr_kw_without_attrs_raises(searcher):
    with pytest.raises(ValueError, match="stored-fields"):
        searcher.document_numbers(lang="en")


def test_find_parses_and_searches(searcher):
    got = searcher.find("search OR data", limit=10)
    want = searcher.search(Or(Term("search"), Term("data")), limit=10)
    assert got.equals(want)


def test_docs_for_query(searcher):
    ids = searcher.docs_for_query(Or(Term("search"), Term("data")))
    a, _ = searcher.postings(Term("search"))
    b, _ = searcher.postings(Term("data"))
    assert set(ids.tolist()) == set(a.tolist()) | set(b.tolist())
