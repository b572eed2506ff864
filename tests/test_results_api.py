"""Results merge-algebra parity: extend / filter / upgrade /
upgrade_and_extend vs the reference Results (searching.py:1325-1410),
including the empty-other guard asymmetry and len() = total matches."""

import numpy as np
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.search import Or, Results, Searcher, Term

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")


@pytest.fixture(scope="module")
def searcher(built_index):
    return Searcher(built_index)


def _mine(searcher, terms, limit=10):
    q = Term(terms[0]) if len(terms) == 1 else Or(*[Term(t) for t in terms])
    return searcher.search_results(q, limit=limit)


def _ref(reference_searcher, terms, limit=10):
    from whoosh import query as wq

    q = (
        wq.Term("text", terms[0])
        if len(terms) == 1
        else wq.Or([wq.Term("text", t) for t in terms])
    )
    return reference_searcher.search(q, limit=limit)


def _ref_ranked(r):
    return [(hit["doc_id"], r.score(i)) for i, hit in enumerate(r)]


def _assert_same(mine: Results, ref):
    got = list(mine)
    want = _ref_ranked(ref)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want], rel=1e-9)


# pairs with real overlap / disjoint / subset shapes on the pages corpus
CASES = [
    (["search"], ["data"]),
    (["the"], ["search", "data"]),
    (["token", "page"], ["page", "web"]),
    (["zzzznope"], ["search"]),   # empty receiver
    (["search"], ["zzzznope"]),   # empty other
]


@pytest.mark.parametrize("ta,tb", CASES)
def test_extend(searcher, reference_searcher, ta, tb):
    a, b = _mine(searcher, ta), _mine(searcher, tb)
    ra, rb = _ref(reference_searcher, ta), _ref(reference_searcher, tb)
    a.extend(b)
    ra.extend(rb)
    _assert_same(a, ra)
    assert len(a) == len(ra.docset)


@pytest.mark.parametrize("ta,tb", CASES)
@pytest.mark.parametrize("reverse", [False, True])
def test_upgrade(searcher, reference_searcher, ta, tb, reverse):
    a, b = _mine(searcher, ta), _mine(searcher, tb)
    ra, rb = _ref(reference_searcher, ta), _ref(reference_searcher, tb)
    a.upgrade(b, reverse=reverse)
    ra.upgrade(rb, reverse=reverse)
    _assert_same(a, ra)


@pytest.mark.parametrize("ta,tb", CASES)
def test_upgrade_and_extend(searcher, reference_searcher, ta, tb):
    a, b = _mine(searcher, ta), _mine(searcher, tb)
    ra, rb = _ref(reference_searcher, ta), _ref(reference_searcher, tb)
    a.upgrade_and_extend(b)
    ra.upgrade_and_extend(rb)
    _assert_same(a, ra)


@pytest.mark.parametrize("ta,tb", CASES)
def test_filter(searcher, reference_searcher, ta, tb):
    a, b = _mine(searcher, ta), _mine(searcher, tb)
    ra, rb = _ref(reference_searcher, ta), _ref(reference_searcher, tb)
    a.filter(b)
    ra.filter(rb)
    _assert_same(a, ra)


def test_filter_empty_other_is_noop(searcher):
    """Reference quirk: filter() against an empty results object leaves the
    receiver UNCHANGED (early return), it does not empty it."""
    a = _mine(searcher, ["search"])
    before = list(a)
    a.filter(_mine(searcher, ["zzzznope"]))
    assert list(a) == before


def test_extend_empty_other_unions_anyway(searcher):
    """extend() has no empty guard: docset union always runs."""
    a = _mine(searcher, ["search"])
    n = len(a)
    a.extend(_mine(searcher, ["zzzznope"]))
    assert len(a) == n and a.scored_length() == 10


def test_len_is_total_matches(searcher, reference_searcher):
    a = _mine(searcher, ["page"], limit=5)
    ra = _ref(reference_searcher, ["page"], limit=5)
    assert a.scored_length() == 5
    assert len(a) == len(ra)


def test_copy_independent(searcher):
    a = _mine(searcher, ["search"])
    c = a.copy()
    c.upgrade(_mine(searcher, ["data"]))
    assert list(a) != list(c) or (a.ids == c.ids).all()
    assert len(a.docset) == len(c.docset)


def test_score_docnum_accessors(searcher):
    a = _mine(searcher, ["search"])
    assert a.score(0) >= a.score(1)
    assert isinstance(a.docnum(0), int)
    assert not a.is_empty()
    t = a.to_table()
    assert Results.from_table(t, a.docset).docnum(0) == a.docnum(0)
