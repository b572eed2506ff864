"""WordNet Thesaurus parity vs the reference wordnet module on a synthetic
wn_s.pl snippet (same parsing quirks: s( lines only, quoted-token extract,
isalpha filter, lowercase), plus the parquet round-trip."""

import io

import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.lang_wordnet import Thesaurus, parse_file, synonyms

WN = """s(100001,1,'hail',v,1,0).
s(100001,2,'acclaim',v,1,1).
s(100001,3,'Herald',v,1,0).
s(100002,1,'hail',v,2,0).
s(100002,2,'come',v,3,0).
s(100003,1,'multi-word',n,1,0).
s(100003,2,'light',n,1,0).
s(100004,1,'light',n,2,0).
s(100004,2,'illumination',n,1,0).
x(999999,1,'notasyn',n,1,0).
s(100005,1,'sol3',n,1,0).
"""


def test_parse_and_synonyms():
    w2n, n2w = parse_file(io.StringIO(WN))
    assert synonyms(w2n, n2w, "hail") == ["acclaim", "come", "herald"]
    assert synonyms(w2n, n2w, "light") == ["illumination"]  # multi-word dropped
    assert "multi-word" not in w2n and "sol3" not in w2n  # isalpha filter
    assert "notasyn" not in w2n  # non-s( line ignored
    assert synonyms(w2n, n2w, "herald") == ["acclaim", "hail"]


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_parity_vs_reference():
    from whoosh.lang import wordnet as ref

    rw, rn = ref.parse_file(io.StringIO(WN))
    w2n, n2w = parse_file(io.StringIO(WN))
    assert set(rw) == set(w2n)
    for w in rw:
        assert ref.synonyms(rw, rn, w) == synonyms(w2n, n2w, w)


def test_thesaurus_api_and_parquet_roundtrip(tmp_path):
    t = Thesaurus.from_file(io.BytesIO(WN.encode()))
    assert t.synonyms("HAIL") == ["acclaim", "come", "herald"]
    p = str(tmp_path / "thes.parquet")
    t.to_parquet(p)
    t2 = Thesaurus.from_parquet(p)
    assert t2.synonyms("hail") == ["acclaim", "come", "herald"]
    assert t2.synonyms("light") == ["illumination"]
    assert t2.synonyms("zzz") == []
