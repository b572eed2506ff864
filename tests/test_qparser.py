"""Query-string parser: differential against the reference QueryParser by
comparing end-to-end search results on the same corpus."""

import numpy as np
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.search import Searcher
from whoosh_novo_ray.search.qparser import QueryParser, ParseError, NULL

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")


@pytest.fixture(scope="module")
def searcher(built_index, pages_table):
    ids = pages_table["doc_id"].to_numpy().astype(np.uint64)
    return Searcher(built_index, doc_ids=ids)


PARSER = QueryParser()

# queries where scores should be rank-identical
SCORED = [
    "search data",
    "search AND data",
    "search OR data",
    "search OR data OR index",
    "(search OR data) AND index",
    "search ANDNOT data",
    "search^2 OR data",
    "the data",  # 'the' is a stop word and must vanish
]

# queries where we assert the matched DOC SET (scoring semantics differ)
SET_ONLY = [
    '"search data"',
    "se*",
    "s?arch",
    "[sa TO se]",
]


def _ref(reference_searcher, qs, limit):
    from whoosh.qparser import QueryParser as RefQP

    q = RefQP("text", reference_searcher.schema).parse(qs)
    r = reference_searcher.search(q, limit=limit)
    return [(hit["doc_id"], r.score(i)) for i, hit in enumerate(r)]


@pytest.mark.parametrize("qs", SCORED)
def test_scored_parity(searcher, reference_searcher, qs):
    mine_t = searcher.search(PARSER.parse(qs), limit=10)
    mine = list(zip(mine_t["doc_id"].to_pylist(), mine_t["score"].to_pylist()))
    ref = _ref(reference_searcher, qs, 10)
    assert [d for d, _ in mine] == [d for d, _ in ref], qs
    assert [s for _, s in mine] == pytest.approx([s for _, s in ref], rel=1e-9)


@pytest.mark.parametrize("qs", SET_ONLY)
def test_docset_parity(searcher, reference_searcher, qs):
    mine_t = searcher.search(PARSER.parse(qs), limit=None)
    ref = _ref(reference_searcher, qs, None)
    assert sorted(mine_t["doc_id"].to_pylist()) == sorted(d for d, _ in ref), qs


def test_not_query(searcher, reference_searcher, pages_table):
    from whoosh_novo_ray.analysis import StandardAnalyzer

    mine_t = searcher.search(PARSER.parse("NOT search"), limit=None)
    ana = StandardAnalyzer()
    expect = sorted(
        int(d)
        for d, t in zip(
            pages_table["doc_id"].to_pylist(), pages_table["text"].to_pylist()
        )
        if "search" not in ana(t)
    )
    assert sorted(mine_t["doc_id"].to_pylist()) == expect


def test_stopword_only_query_is_null(searcher):
    assert PARSER.parse("the of and") is NULL


def test_parse_errors():
    with pytest.raises(ParseError):
        PARSER.parse("(search OR data")
