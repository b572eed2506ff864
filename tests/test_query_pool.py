"""Actor-pool query serving: identical results to the local Searcher."""

import pytest

from whoosh_novo_ray.search import (
    And,
    ConstantScore,
    Or,
    Phrase,
    Searcher,
    Sequence,
    Term,
    Variations,
    WeightingQuery,
)
from whoosh_novo_ray.search.scoring import TFIDF
from whoosh_novo_ray.state import QueryPool


@pytest.fixture(scope="module")
def pool(ray_session, built_index):
    import warnings

    with warnings.catch_warnings():
        # QueryPool is kept as a deprecated A/B baseline; its parity suite
        # still runs
        warnings.simplefilter("ignore", DeprecationWarning)
        p = QueryPool(built_index.path, num_actors=2)
    yield p
    p.shutdown()


def test_querypool_is_deprecated(ray_session, built_index):
    with pytest.warns(DeprecationWarning, match="ScorePool"):
        p = QueryPool(built_index.path, num_actors=1)
    p.shutdown()


@pytest.mark.parametrize(
    "q",
    [
        Term("search"),
        Or(Term("search"), Term("data"), Term("index")),
        And(Term("search"), Term("data")),
        Phrase(["search", "data"]),
        Term("zzzznope"),
        # round-2 query types ride the same evaluation path through the pool
        Variations("searching"),
        Sequence(Term("search"), Term("data")),
        ConstantScore(Or(Term("search"), Term("data")), score=2.5),
        WeightingQuery(Term("search"), TFIDF()),
    ],
    ids=[
        "term",
        "or3",
        "and2",
        "phrase",
        "absent",
        "variations",
        "sequence",
        "constscore",
        "weighting",
    ],
)
def test_pool_matches_local(pool, built_index, q):
    local = Searcher(built_index).search(q, limit=10).to_pydict()
    remote = pool.search(q, limit=10).to_pydict()
    assert remote == local


def test_pool_caches_terms(pool):
    s = pool.searcher()
    s.search(Term("search"), limit=5)
    assert ("search", False) in s._term_cache
    # second search on the same searcher shouldn't need actor round-trips
    s.search(Term("search"), limit=5)
