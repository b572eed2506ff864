"""NGRAM-field analog: char-ngram index enabling substring search."""

import pyarrow as pa
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.analysis import NgramAnalyzer
from whoosh_novo_ray.index import Index, IndexConfig, build_index
from whoosh_novo_ray.search import And, Searcher, Term


@pytest.fixture(scope="module")
def ngram_index(ray_session, tmp_path_factory):
    import ray.data

    texts = ["hello world", "help wanted", "yellow mellow", "goodbye", "hull"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    out = str(tmp_path_factory.mktemp("ng") / "idx")
    build_index(
        ray.data.from_arrow(tbl),
        out,
        IndexConfig(num_buckets=2, analyzer=NgramAnalyzer(2, 4), with_positions=False),
        lineage="ng",
    )
    return Index(out), texts


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_ngram_analyzer_differential():
    from whoosh.analysis.ngrams import NgramAnalyzer as RefNA

    mine = NgramAnalyzer(2, 4)
    ref = RefNA(2, 4)
    for text in ["hi there", "Hello!", "a b c", "xy"]:
        assert mine(text) == [t.text for t in ref(text)]


def test_substring_search(ngram_index):
    idx, texts = ngram_index
    s = Searcher(idx)

    def docs_with_gram(g):
        ids, *_ = s.term_postings(g)
        return sorted(int(d) for d in ids)

    assert docs_with_gram("ell") == sorted(
        i for i, t in enumerate(texts) if "ell" in t.lower()
    )
    # substring query longer than maxsize: AND of query-mode grams
    ana = idx.cfg.analyzer
    grams = ana.query_tokens("ellow")
    ids, _ = s.postings(And(*[Term(g) for g in grams]))
    assert sorted(int(d) for d in ids) == sorted(
        i for i, t in enumerate(texts) if "ellow" in t.lower()
    )


def test_config_roundtrip(ngram_index):
    idx, _ = ngram_index
    assert isinstance(idx.cfg.analyzer, NgramAnalyzer)
    assert (idx.cfg.analyzer.minsize, idx.cfg.analyzer.maxsize) == (2, 4)


# ---------------------------------------------------------------------------
# NGRAMWORDS analog (reference NgramWordAnalyzer, ngrams.py:259-267)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_ngram_words_analyzer_differential():
    """Token text, position (grams inherit the word's pos) and query-mode
    grams vs the reference NgramWordAnalyzer / NgramFilter."""
    import random

    from whoosh.analysis import LowercaseFilter, NgramFilter, RegexTokenizer
    from whoosh.analysis import NgramWordAnalyzer as RefNWA

    from whoosh_novo_ray.analysis import NgramWordsAnalyzer

    rng = random.Random(7)
    vocab = ["Query", "window", "a", "of", "tablecloth", "x1y2", "go", "intra-word"]
    for _ in range(40):
        for at in (None, "start", "end"):
            for mn, mx in ((2, 4), (3, 3), (4, None)):
                text = " ".join(rng.choices(vocab, k=rng.randint(0, 10)))
                ref = [
                    (t.text, t.pos) for t in RefNWA(mn, mx, at=at)(text, positions=True)
                ]
                ours = NgramWordsAnalyzer(mn, mx, at=at)
                assert ours(text) == [r[0] for r in ref]
                di, codes, uniq, pos, fl = ours.analyze_batch_coded([text])
                assert [uniq[c] for c in codes] == [r[0] for r in ref]
                assert list(pos) == [r[1] for r in ref]
                assert fl[0] == len(ref)
    for at in (None, "start", "end"):
        for w in ["Query", "go", "tablecloth", "x"]:
            chain = RegexTokenizer() | LowercaseFilter() | NgramFilter(3, 3, at=at)
            ref_q = [t.text for t in chain(w, mode="query")]
            from whoosh_novo_ray.analysis import NgramWordsAnalyzer as NWA

            assert NWA(3, 3, at=at).query_tokens(w) == ref_q


def test_ngram_words_config_roundtrip(tmp_path, ray_session):
    import ray.data

    from whoosh_novo_ray.analysis import NgramWordsAnalyzer

    texts = ["hello world", "help wanted", "yellow mellow"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    out = str(tmp_path / "nw")
    build_index(
        ray.data.from_arrow(tbl),
        out,
        IndexConfig(num_buckets=2, analyzer=NgramWordsAnalyzer(3, 3)),
        lineage="nw",
    )
    idx = Index(out)
    assert isinstance(idx.cfg.analyzer, NgramWordsAnalyzer)
    assert (idx.cfg.analyzer.minsize, idx.cfg.analyzer.maxsize) == (3, 3)
    s = Searcher(idx)
    ids, *_ = s.term_postings("ell")
    assert sorted(int(d) for d in ids) == [0, 2]
