"""CollapseCollector parity vs the reference (collectors.py:854-1006):
collapse_limit > 1, the optional collapse_order facet (lowest order key
wins, kept docs stay in result order), and the falsy-key rule (documents
whose collapse key is falsy are never eliminated)."""

import pyarrow as pa
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.search import Or, Searcher, Term
from whoosh_novo_ray.search.sorting import FieldFacet, collapse_search

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")


def _blank_lang(pages):
    """lang with every 7th doc blanked — the falsy-key case."""
    langs = pages["lang"].to_pylist()
    ids = pages["doc_id"].to_pylist()
    return [("" if d % 7 == 0 else l) for d, l in zip(ids, langs)]


@pytest.fixture(scope="module")
def ref_collapse_searcher(pages_table, tmp_path_factory):
    """Reference index over the same corpus with a sortable collapse key
    (lang, blanked every 7th doc) and a sortable order column (n)."""
    import os

    from whoosh import index as windex
    from whoosh.fields import ID, NUMERIC, TEXT, Schema

    schema = Schema(
        doc_id=NUMERIC(stored=True, bits=64),
        text=TEXT,
        lang=ID(sortable=True),
        n=NUMERIC(sortable=True, bits=64),
    )
    d = str(tmp_path_factory.mktemp("refcollapse"))
    os.makedirs(d, exist_ok=True)
    ix = windex.create_in(d, schema)
    w = ix.writer()
    langs = _blank_lang(pages_table)
    for i in range(len(pages_table)):
        doc = {
            "doc_id": pages_table["doc_id"][i].as_py(),
            "text": pages_table["text"][i].as_py(),
            "n": len(pages_table["text"][i].as_py()),
        }
        if langs[i]:
            doc["lang"] = langs[i]
        w.add_document(**doc)
    w.commit()
    s = ix.searcher()
    yield s
    s.close()


@pytest.fixture(scope="module")
def attrs(pages_table):
    return pa.table(
        {
            "doc_id": pages_table["doc_id"].cast(pa.uint64()),
            "lang": pa.array(_blank_lang(pages_table), pa.string()),
            "n": pa.array(
                [len(t) for t in pages_table["text"].to_pylist()], pa.int64()
            ),
        }
    )


def _ref_collapse(ref_s, term_or_terms, per_key, order):
    from whoosh import query as wq
    from whoosh import sorting as wsorting

    if isinstance(term_or_terms, str):
        q = wq.Term("text", term_or_terms)
    else:
        q = wq.Or([wq.Term("text", t) for t in term_or_terms])
    r = ref_s.search(
        q,
        limit=None,
        collapse=wsorting.FieldFacet("lang"),
        collapse_limit=per_key,
        collapse_order=wsorting.FieldFacet("n") if order else None,
    )
    return [(hit["doc_id"], r.score(i)) for i, hit in enumerate(r)]


def _my_collapse(searcher, attrs, term_or_terms, per_key, order):
    q = (
        Term(term_or_terms)
        if isinstance(term_or_terms, str)
        else Or(*[Term(t) for t in term_or_terms])
    )
    t = collapse_search(
        searcher,
        q,
        FieldFacet(attrs, "lang"),
        per_key=per_key,
        order_facet=FieldFacet(attrs, "n") if order else None,
    ).to_pydict()
    return list(zip(t["doc_id"], t["score"]))


@pytest.mark.parametrize("per_key", [1, 2, 3])
@pytest.mark.parametrize("order", [False, True])
@pytest.mark.parametrize("terms", ["search", ("search", "data"), ("the", "web")])
def test_collapse_rank_identity(
    built_index, ref_collapse_searcher, attrs, per_key, order, terms
):
    mine = _my_collapse(Searcher(built_index), attrs, terms, per_key, order)
    ref = _ref_collapse(ref_collapse_searcher, terms, per_key, order)
    assert [d for d, _ in mine] == [d for d, _ in ref]
    assert [s for _, s in mine] == pytest.approx(
        [s for _, s in ref], rel=1e-9
    )


def test_sorted_multi_reverse_parity(built_index, ref_collapse_searcher, attrs):
    """Multi-key sort with a per-facet reverse flag (reference
    ``sortedby=[FieldFacet('lang'), FieldFacet('n', reverse=True)]``)."""
    from whoosh import query as wq
    from whoosh import sorting as wsorting

    from whoosh_novo_ray.search.sorting import MultiFacet, sorted_search

    r = ref_collapse_searcher.search(
        wq.Term("text", "search"),
        limit=None,
        sortedby=[
            wsorting.FieldFacet("lang"),
            wsorting.FieldFacet("n", reverse=True),
        ],
    )
    ref_ids = [h["doc_id"] for h in r]
    mine = sorted_search(
        Searcher(built_index),
        Term("search"),
        MultiFacet(
            [FieldFacet(attrs, "lang"), FieldFacet(attrs, "n", reverse=True)]
        ),
    )
    assert mine["doc_id"].to_pylist() == ref_ids


def test_falsy_keys_never_collapsed(built_index, ref_collapse_searcher, attrs):
    """Every blank-lang match survives even at per_key=1 (reference
    collect_matches: ``if not ckey`` docs bypass collapsing)."""
    mine = _my_collapse(Searcher(built_index), attrs, "search", 1, False)
    kept = {d for d, _ in mine}
    lang_by_id = dict(
        zip(attrs["doc_id"].to_pylist(), attrs["lang"].to_pylist())
    )
    full = Searcher(built_index).search(Term("search"), limit=None)
    blanks = {
        d for d in full["doc_id"].to_pylist() if lang_by_id[d] == ""
    }
    assert blanks, "corpus should have blank-key matches"
    assert blanks <= kept
