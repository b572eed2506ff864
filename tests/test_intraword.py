"""IntraWord splitting/merging parity with the reference filter."""

import random
import string

import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.intraword import IntraWord, fancy_tokens

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")

CASES = [
    ["PowerShot"],
    ["Wi-Fi"],
    ["SD500"],
    ["O'Neil's"],
    ["A's+B's&C's"],
    ["Super-Duper-XL500-42-AutoCoder!"],
    ["getInt", "get_real"],
    ["XMLHttpRequest"],
    ["abc123def"],
    ["--lead-trail--"],
    ["Mixed-UP_case99X"],
]


def _ref_expand(tokens, **kw):
    from whoosh.analysis import RegexTokenizer
    from whoosh.analysis.intraword import IntraWordFilter

    rt = RegexTokenizer(r"\S+")
    iwf = IntraWordFilter(**kw)
    return [(t.text, t.pos) for t in iwf(rt(" ".join(tokens), positions=True))]


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"mergewords": True, "mergenums": True},
        {"splitwords": False},
        {"splitnums": False},
        {"mergewords": True},
    ],
    ids=["plain", "merge-all", "nosplitwords", "nosplitnums", "mergewords"],
)
def test_differential(kw):
    iw = IntraWord(**kw)
    cases = list(CASES)
    random.seed(17)
    alph = string.ascii_letters + string.digits + "-_'."
    for _ in range(300):
        cases.append(
            ["".join(random.choices(alph, k=random.randrange(1, 14)))
             for _ in range(random.randrange(1, 5))]
        )
    for toks in cases:
        assert iw.expand(toks) == _ref_expand(toks, **kw), toks


def test_fancy_analyzer_parity():
    from whoosh.analysis import FancyAnalyzer

    ref = FancyAnalyzer()
    for text in [
        "Should I call getInt or get_real?",
        "The Wi-Fi PowerShot SD500 is O'Neil's",
        "Super-Duper-XL500-42-AutoCoder runs fine",
    ]:
        assert fancy_tokens(text) == [t.text for t in ref(text)], text
