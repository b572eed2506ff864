"""Regex term expansion: prefix pruning must never drop matches.

Covers the reference guard (Regex._find_prefix returns no prefix when the
pattern contains '|'): the reference filters candidates with re.MATCH
(start-anchored, query/terms.py:304-307), so '^ab|cd' matches terms
STARTING with 'ab' or with 'cd' — but an [ab, ab￿] scan range would still
silently lose the 'cd' branch, hence no prefix under alternation."""

import re

import pytest

from whoosh_novo_ray.search import Searcher
from whoosh_novo_ray.search.query import Regex
from whoosh_novo_ray.search.searcher import _regex_literal_prefix


@pytest.mark.parametrize(
    ("pattern", "expect"),
    [
        ("^search", "search"),
        ("^se.rch", "se"),
        ("^ab|cd", ""),  # top-level alternation: no sound prefix
        ("^(ab|cd)e", ""),  # grouped alternation: conservative, no prefix
        ("search", ""),  # unanchored
        ("^ab+c", "a"),  # quantified literal ends the prefix
    ],
)
def test_regex_literal_prefix(pattern, expect):
    assert _regex_literal_prefix(pattern) == expect


def test_regex_alternation_expands_unanchored_branch(built_index):
    """'^se|ta' must include terms matching the 'ta' branch (which, under
    the reference's re.match semantics, still anchors at the term start)."""
    s = Searcher(built_index)
    got = set(s.expand(Regex("^se|ta")))
    lex = built_index.expand_terms(lambda col: col.is_valid())
    want = {t for t in lex if re.match("^se|ta", t)}
    assert got == want
    assert any(not t.startswith("se") for t in want), "corpus sanity"
