"""Levenshtein automaton: acceptance must equal the banded DP, next_valid
must be the exact lexicographic successor over the accepted language, and
the bounded index scan must return the same terms as the full predicate
scan while reading fewer row groups."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.search.fuzzy import edit_distance, terms_within
from whoosh_novo_ray.search.lev import LevAutomaton


def _all_strings(alphabet, max_len):
    for ln in range(max_len + 1):
        for tup in itertools.product(alphabet, repeat=ln):
            yield "".join(tup)


@pytest.mark.parametrize("text,k", [("ab", 1), ("abc", 1), ("abc", 2), ("aab", 2), ("", 1)])
def test_accepts_matches_dp_bruteforce(text, k):
    dfa = LevAutomaton(text, k)
    for s in _all_strings("abcd", max_len=len(text) + k + 1):
        want = edit_distance(text, s, k) is not None
        assert dfa.accepts(s) == want, (text, k, s)


@pytest.mark.parametrize("text,k", [("ab", 1), ("abc", 2), ("banana", 1)])
def test_next_valid_is_exact_successor(text, k):
    dfa = LevAutomaton(text, k)
    # enumerate the accepted language over a small alphabet; next_valid of
    # any probe must be the first accepted string >= probe WITHIN that
    # enumeration, and must never be > it (it may be an out-of-alphabet
    # string that sorts earlier — that's fine and still sound)
    alphabet = "abcdnz"
    accepted = sorted(
        s for s in _all_strings(alphabet, len(text) + k) if dfa.accepts(s)
    )
    probes = list(_all_strings("abn", 3))[:200] + accepted[:50]
    acc_arr = np.asarray(accepted, object)
    for p in probes:
        nv = dfa.next_valid(p)
        j = int(np.searchsorted(acc_arr, p))
        if nv is None:
            assert j == len(acc_arr), (p, "automaton says exhausted")
            continue
        assert nv >= p
        assert dfa.accepts(nv)
        if j < len(acc_arr):
            # nv is a lower bound on the next in-alphabet accepted string
            assert nv <= acc_arr[j], (p, nv, acc_arr[j])
            # and nothing accepted lives in [p, nv)
            assert not any(p <= t < nv for t in accepted)


def test_bounded_scan_matches_predicate_scan(ray_session, tmp_path):
    import ray.data

    from whoosh_novo_ray.index import Index, IndexConfig, build_index

    rng = np.random.RandomState(5)
    vocab = sorted(
        {
            "".join(rng.choice(list("abcdefgh"), size=rng.randint(3, 9)))
            for _ in range(3000)
        }
    )
    texts = [
        " ".join(rng.choice(vocab, size=12)) for _ in range(400)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = str(tmp_path / "lexidx")
    build_index(
        ray.data.from_arrow(tbl).repartition(4), out, IndexConfig(num_buckets=4),
        lineage="lex",
    )
    idx = Index(out)

    # reference result: brute-force DP over the full lexicon
    lex = sorted({w for t in texts for w in t.split()})
    for probe, k, pfx in [
        ("abcde", 1, 0), ("abcde", 2, 0), ("hgfed", 2, 1), ("aaaa", 1, 0),
        ("zzzz", 2, 0),
    ]:
        want = sorted(
            (t, edit_distance(probe, t, k))
            for t in lex
            if edit_distance(probe, t, k) is not None
            and (pfx == 0 or t.startswith(probe[:pfx]))
        )
        got = terms_within(idx, probe, maxdist=k, prefix=pfx)
        assert sorted(got) == want, (probe, k, pfx)
    # the automaton path ran and recorded pruning stats
    st = idx.last_fuzzy_stats
    assert st["row_groups_total"] >= st["row_groups_read"]
    assert st["terms_scanned"] > 0
