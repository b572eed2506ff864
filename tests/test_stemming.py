"""Porter stemmer + StemmingAnalyzer differential parity."""

import random
import string

import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.analysis import stemming_analyzer
from whoosh_novo_ray.porter import stem

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")


def test_porter_parity_wordlist():
    from whoosh.lang.porter import stem as ref_stem

    random.seed(99)
    words = set(
        "caresses ponies caress cats agreed feed plastered motoring sing "
        "hopping tanned hissing fizzed failing filing happy sky relational "
        "conditional rational digitizer vietnamization predication operator "
        "feudalism decisiveness hopefulness callousness formality sensitivity "
        "triplicate formative formalize electricity electrical hopeful "
        "goodness revival allowance inference airliner gyroscopic adjustable "
        "defensible irritant replacement adjustment dependent adoption "
        "communism activate effective bowdlerize probate rate cease controll "
        "roll yellow ytterbium y".split()
    )
    for _ in range(3000):
        words.add("".join(random.choices(string.ascii_lowercase, k=random.randrange(1, 14))))
    for suf in ["ing", "ed", "ies", "sses", "eed", "ization", "ousness", "ll", "ive", "tion"]:
        for _ in range(100):
            words.add(
                "".join(random.choices(string.ascii_lowercase, k=random.randrange(1, 8))) + suf
            )
    for w in words:
        assert stem(w) == ref_stem(w), w


def test_stemming_analyzer_parity():
    from whoosh.analysis import StemmingAnalyzer as RefStem

    ref = RefStem()
    ana = stemming_analyzer()
    random.seed(5)
    vocab = [
        "running", "jumps", "easily", "fairly", "the", "relational",
        "Happily", "cats", "PONIES", "a", "hopeful", "adjustment",
    ]
    for _ in range(200):
        t = " ".join(random.choices(vocab, k=random.randrange(0, 30)))
        expect = [tok.text for tok in ref(t)]
        assert ana(t) == expect, t
        b = ana.analyze_batch([t])
        assert b.tokens.tolist() == expect, t


def test_stemmed_index_merges_surface_forms(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from whoosh_novo_ray.index import Index, IndexConfig, build_index
    from whoosh_novo_ray.search import Searcher, Term

    tbl = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["jumped jumping jumps", "he jumps daily", "nothing here"],
        }
    )
    out = str(tmp_path / "stemidx")
    build_index(
        ray.data.from_arrow(tbl),
        out,
        IndexConfig(num_buckets=2, analyzer=stemming_analyzer()),
        lineage="s",
    )
    s = Searcher(Index(out))
    # jumped/jumping/jumps all stem to "jump" and must merge into one posting
    ids, tfs, _, _ = s.term_postings("jump")
    assert ids.tolist() == [0, 1]
    assert tfs.tolist() == [3, 1]
