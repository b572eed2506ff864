from whoosh_novo_ray.search.query import (
    NULL,
    NullQuery,
    And,
    AndMaybe,
    AndNot,
    DisMax,
    Every,
    Or,
    Phrase,
    Prefix,
    Require,
    Term,
    TermRange,
    Wildcard,
)
from whoosh_novo_ray.search.scoring import BM25F, Frequency, TFIDF
from whoosh_novo_ray.search.searcher import Searcher

__all__ = [
    "NULL",
    "NullQuery",
    "Term",
    "And",
    "Or",
    "AndNot",
    "AndMaybe",
    "Require",
    "DisMax",
    "Phrase",
    "Prefix",
    "Wildcard",
    "TermRange",
    "Every",
    "BM25F",
    "TFIDF",
    "Frequency",
    "Searcher",
]
