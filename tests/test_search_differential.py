"""Differential rank-identity suite: our engine vs the reference whoosh on the
same synthetic Common-Crawl-style corpus (top-k doc ids exact, scores ~1e-9).

Models the reference's own semantic suites (tests/test_searching.py,
tests/test_results.py) — see SURVEY.md §5.
"""

import numpy as np
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.search import (
    And,
    AndMaybe,
    AndNot,
    DisMax,
    Or,
    Phrase,
    Prefix,
    Require,
    Searcher,
    Term,
    TermRange,
    Wildcard,
)

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")


def _ref_search(ref_searcher, wq_query, limit):
    r = ref_searcher.search(wq_query, limit=limit)
    return [(hit["doc_id"], r.score(i)) for i, hit in enumerate(r)]


def _my_search(searcher, q, limit):
    t = searcher.search(q, limit=limit).to_pydict()
    return list(zip(t["doc_id"], t["score"]))


def _assert_rank_identical(mine, ref):
    assert [d for d, _ in mine] == [d for d, _ in ref]
    assert [s for _, s in mine] == pytest.approx([s for _, s in ref], rel=1e-9)


@pytest.fixture(scope="module")
def searcher(built_index):
    return Searcher(built_index)


# terms chosen to cover: very common, mid, rare, absent, stopword-adjacent
TERMS = ["the", "search", "data", "token", "3.141", "under_score", "zzzznope"]
LIMITS = [1, 10, 100]


@pytest.mark.parametrize("term", TERMS)
@pytest.mark.parametrize("limit", LIMITS)
def test_single_term(searcher, reference_searcher, term, limit):
    from whoosh import query as wq

    _assert_rank_identical(
        _my_search(searcher, Term(term), limit),
        _ref_search(reference_searcher, wq.Term("text", term), limit),
    )


PAIRS = [("search", "data"), ("the", "index"), ("token", "zzzznope"), ("page", "web")]


@pytest.mark.parametrize("a,b", PAIRS)
def test_or(searcher, reference_searcher, a, b):
    from whoosh import query as wq

    _assert_rank_identical(
        _my_search(searcher, Or(Term(a), Term(b)), 10),
        _ref_search(reference_searcher, wq.Or([wq.Term("text", a), wq.Term("text", b)]), 10),
    )


@pytest.mark.parametrize("a,b", PAIRS)
def test_and(searcher, reference_searcher, a, b):
    from whoosh import query as wq

    _assert_rank_identical(
        _my_search(searcher, And(Term(a), Term(b)), 10),
        _ref_search(reference_searcher, wq.And([wq.Term("text", a), wq.Term("text", b)]), 10),
    )


def test_three_term_or(searcher, reference_searcher):
    from whoosh import query as wq

    terms = ["search", "data", "index"]
    _assert_rank_identical(
        _my_search(searcher, Or(*[Term(t) for t in terms]), 25),
        _ref_search(
            reference_searcher, wq.Or([wq.Term("text", t) for t in terms]), 25
        ),
    )


def test_andnot(searcher, reference_searcher):
    from whoosh import query as wq

    _assert_rank_identical(
        _my_search(searcher, AndNot(Term("search"), Term("data")), 10),
        _ref_search(
            reference_searcher,
            wq.AndNot(wq.Term("text", "search"), wq.Term("text", "data")),
            10,
        ),
    )


def test_require(searcher, reference_searcher):
    from whoosh import query as wq

    # NB: the reference's optimized (quality-pruning) path crashes on
    # RequireMatcher (IntersectionMatcher._find_next assertion), so the
    # oracle runs with optimize=False; scores are unaffected.
    r = reference_searcher.search(
        wq.Require(wq.Term("text", "search"), wq.Term("text", "data")),
        limit=10,
        optimize=False,
    )
    ref = [(hit["doc_id"], r.score(i)) for i, hit in enumerate(r)]
    _assert_rank_identical(
        _my_search(searcher, Require(Term("search"), Term("data")), 10), ref
    )


def test_andmaybe(searcher, reference_searcher):
    from whoosh import query as wq

    _assert_rank_identical(
        _my_search(searcher, AndMaybe(Term("search"), Term("data")), 10),
        _ref_search(
            reference_searcher,
            wq.AndMaybe(wq.Term("text", "search"), wq.Term("text", "data")),
            10,
        ),
    )


def test_dismax(searcher, reference_searcher):
    """DisMax implements the DOCUMENTED max-of-children semantics.

    NB: the reference's DisjunctionMaxMatcher mis-scores docs matched by only
    one child after its matcher tree reorders children by estimated size (it
    returns the other child's scorer value; the class carries a TODO about its
    broken inheritance from the additive UnionMatcher). So the oracle here is
    the reference's own *single-term* scores combined with max(), plus
    doc-set equality against the reference DisMax matcher.
    """
    from whoosh import query as wq

    ref_a = dict(_ref_search(reference_searcher, wq.Term("text", "search"), None))
    ref_b = dict(_ref_search(reference_searcher, wq.Term("text", "data"), None))
    expect = {
        d: max(ref_a.get(d, float("-inf")), ref_b.get(d, float("-inf")))
        for d in set(ref_a) | set(ref_b)
    }
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    _assert_rank_identical(
        _my_search(searcher, DisMax(Term("search"), Term("data")), 10), ranked
    )


def test_prefix(searcher, reference_searcher):
    from whoosh import query as wq

    _assert_rank_identical(
        _my_search(searcher, Prefix("se"), 10),
        _ref_search(reference_searcher, wq.Prefix("text", "se"), 10),
    )


def test_wildcard(searcher, reference_searcher):
    from whoosh import query as wq

    _assert_rank_identical(
        _my_search(searcher, Wildcard("s*ch"), 10),
        _ref_search(reference_searcher, wq.Wildcard("text", "s*ch"), 10),
    )


def test_term_range(searcher, reference_searcher):
    from whoosh import query as wq

    _assert_rank_identical(
        _my_search(searcher, TermRange("sa", "se"), 10),
        _ref_search(reference_searcher, wq.TermRange("text", "sa", "se"), 10),
    )


def test_phrase_doc_sets_match(searcher, reference_searcher):
    from whoosh import query as wq

    # phrase scoring internals differ; assert the matched DOC SET and that
    # our ordering is deterministic
    mine = _my_search(searcher, Phrase(["search", "data"]), None)
    r = reference_searcher.search(
        wq.Phrase("text", ["search", "data"]), limit=None
    )
    ref_ids = sorted(hit["doc_id"] for hit in r)
    assert sorted(d for d, _ in mine) == ref_ids


def test_stability_pagination(searcher, built_index):
    """Reference test_results.py:test_stability — page k of a larger limit is
    a prefix-consistent slice."""
    full = _my_search(searcher, Term("the"), 100)
    for k in (1, 5, 10, 50):
        assert _my_search(searcher, Term("the"), k) == full[:k]


def test_reference_andmaybe_skipto_bug_documented(ray_session, tmp_path):
    """KNOWN REFERENCE BUG (documented workaround): AndMaybeMatcher.skip_to
    (matching/binary.py:713-721) advances the maybe-side to the SKIP TARGET
    instead of to the required side's landing doc. Under an intersection,
    when the required side overshoots the target and the maybe side has an
    intermediate posting, the maybe bonus at the landing doc is silently
    lost even though the maybe side contains it (next() realigns correctly,
    so reference scores are PATH-dependent). Minimal trigger: aa in docs
    {5,10}, bb in {7,10}, cc in {6,10}; And(AndMaybe(aa,bb), cc) at doc 10
    scores aa+cc in the reference but the semantic aa+bb+cc here (the
    standalone AndMaybe agrees between engines, pinning the semantics)."""
    import ray.data
    from whoosh import index as windex
    from whoosh import query as wq
    from whoosh.fields import NUMERIC, TEXT, Schema

    from whoosh_novo_ray.index import Index, IndexConfig, build_index

    import pyarrow as pa

    texts = {i: "filler" for i in range(12)}
    texts[5] = "aa"
    texts[7] = "bb"
    texts[6] = "cc"
    texts[10] = "aa bb cc"
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)]),
        }
    )
    out = str(tmp_path / "amidx")
    build_index(ray.data.from_arrow(tbl), out, IndexConfig(num_buckets=2), lineage="am")
    s = Searcher(Index(out))

    wdir = str(tmp_path / "amref")
    import os

    os.makedirs(wdir)
    ix = windex.create_in(wdir, Schema(doc_id=NUMERIC(stored=True, bits=64), text=TEXT))
    w = ix.writer()
    for d in sorted(texts):
        w.add_document(doc_id=d, text=texts[d])
    w.commit()
    rs = ix.searcher()

    def ref_scores(q):
        r = rs.search(q, limit=None, optimize=False)
        return {h["doc_id"]: r.score(j) for j, h in enumerate(r)}

    aa = ref_scores(wq.Term("text", "aa"))
    bb = ref_scores(wq.Term("text", "bb"))
    cc = ref_scores(wq.Term("text", "cc"))

    # standalone AndMaybe: both engines agree on the semantics
    mine_am = _my_search(s, AndMaybe(Term("aa"), Term("bb")), None)
    ref_am = ref_scores(wq.AndMaybe(wq.Term("text", "aa"), wq.Term("text", "bb")))
    assert dict(mine_am) == pytest.approx(ref_am)
    assert ref_am[10] == pytest.approx(aa[10] + bb[10])

    # under an intersection the reference drops the maybe bonus...
    q_ref = wq.And(
        [wq.AndMaybe(wq.Term("text", "aa"), wq.Term("text", "bb")), wq.Term("text", "cc")]
    )
    ref_and = ref_scores(q_ref)
    assert ref_and[10] == pytest.approx(aa[10] + cc[10])  # bb LOST (the bug)

    # ...while this engine keeps the semantic score
    mine_and = dict(
        _my_search(s, And(AndMaybe(Term("aa"), Term("bb")), Term("cc")), None)
    )
    assert mine_and[10] == pytest.approx(aa[10] + bb[10] + cc[10])
    rs.close()


def test_array_path_or_drops_zero_scored_docs(searcher, reference_searcher):
    """The reference's array-path Or (>=3 children on a <=5000-doc corpus)
    never yields docs whose summed score is 0 — ArrayUnionMatcher._find_next
    requires a[i] > 0 (combo.py:232-235). A nested scaled Or whose built
    tree has ONE term matcher scores every doc 0 ((tc-1)/tc), so docs
    matched only through it vanish from the enclosing Or. Found by the
    fuzzer (seed 60 tree 15); full rank+score parity pinned here."""
    from whoosh import query as wq
    from whoosh.collectors import TopCollector

    # 'the' is a stopword (absent from the index) -> the phrase builds a
    # NullMatcher; 'data' is the single live term matcher -> tc == 1
    zeroing = Or(Phrase(["index", "the"]), Term("data"), scale=0.9)
    rz = wq.Or(
        [wq.Phrase("text", ["index", "the"]), wq.Term("text", "data")], scale=0.9
    )
    outer = Or(zeroing, Term("xzcjtvd"), Term("zzzznope"))
    router = wq.Or([rz, wq.Term("text", "xzcjtvd"), wq.Term("text", "zzzznope")])

    c = TopCollector(limit=10**9, usequality=False, replace=0)
    reference_searcher.search_with_collector(router, c)
    r = c.results()
    ref = [(h["doc_id"], round(r.score(j), 9)) for j, h in enumerate(r)]
    t = searcher.search(outer, limit=None)
    mine = [
        (d, round(sc, 9))
        for d, sc in zip(t["doc_id"].to_pylist(), t["score"].to_pylist())
    ]
    assert mine == ref
    # sanity: the zeroing child alone DOES match docs (score 0, kept when
    # evaluated standalone) — the drop is the array-path parent's doing
    alone = searcher.search(zeroing, limit=None)
    assert len(alone) > 0 and set(alone["score"].to_pylist()) == {0.0}
    assert len(mine) < len(alone) + len(searcher.search(Term("xzcjtvd"), limit=None))


def test_reference_fuzzy_overlong_prefix_bug_documented(searcher):
    """REFERENCE BUG (found by fuzz seeds 135/137): FuzzyTerm with
    prefixlength > len(word) crashes the reference's levenshtein automaton
    (automata/lev.py:8, term[i] IndexError) before any matching happens.
    Our terms_within slices the prefix gracefully (the whole word becomes
    the required prefix) and returns a normal expansion, so the shape is
    usable but has no reference oracle — the fuzz generator clamps it."""
    import pytest as _pytest

    from whoosh.automata import lev

    with _pytest.raises(IndexError):
        lev.levenshtein_automaton("a", 1, prefix=2)

    from whoosh_novo_ray.search.fuzzy import FuzzyTerm, terms_within

    exp = terms_within(searcher.index, "a", maxdist=1, prefix=2)
    assert isinstance(exp, list)  # graceful, no crash
    # and the full query path works
    t = searcher.search(FuzzyTerm("a", maxdist=1, prefixlength=2), limit=5)
    assert t.num_columns == 2
