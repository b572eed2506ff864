"""Multi-field indexing: rank-identical to the reference's fielded schema."""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.index.build import IndexConfig
from whoosh_novo_ray.index.multifield import (
    MultiFieldIndex,
    MultiFieldSearcher,
    build_multifield_index,
)
from whoosh_novo_ray.search import And, Or, Term


@pytest.fixture(scope="module")
def mf_env(ray_session, tmp_path_factory):
    import ray.data

    from whoosh_novo_ray.testing.pages import synth_pages

    pages = synth_pages(n=300, seed=21)
    # derive a short "title" from the first words of the text
    titles = [" ".join(t.split()[:5]) for t in pages["text"].to_pylist()]
    tbl = pa.table(
        {
            "doc_id": pages["doc_id"],
            "title": pa.array(titles, pa.string()),
            "body": pages["text"],
        }
    )
    out = str(tmp_path_factory.mktemp("mf") / "idx")
    build_multifield_index(
        ray.data.from_arrow(tbl),
        out,
        fields={
            "title": IndexConfig(text_col="title", num_buckets=2),
            "body": IndexConfig(text_col="body", num_buckets=4),
        },
        lineage="mf",
    )
    return MultiFieldIndex(out), tbl


@pytest.fixture(scope="module")
def ref_mf(mf_env, tmp_path_factory):
    if not HAVE_REFERENCE:
        pytest.skip("reference not available")
    from whoosh import index as windex
    from whoosh.fields import NUMERIC, TEXT, Schema

    _idx, tbl = mf_env
    wdir = str(tmp_path_factory.mktemp("wmf"))
    schema = Schema(
        doc_id=NUMERIC(stored=True, bits=64), title=TEXT, body=TEXT
    )
    ix = windex.create_in(wdir, schema)
    w = ix.writer(limitmb=256)
    for r in tbl.to_pylist():
        w.add_document(doc_id=r["doc_id"], title=r["title"], body=r["body"])
    w.commit()
    return ix


def _ref(ix, q, limit=10):
    with ix.searcher() as s:
        r = s.search(q, limit=limit)
        return [(h["doc_id"], r.score(i)) for i, h in enumerate(r)]


def _mine(searcher, q, limit=10):
    t = searcher.search(q, limit=limit)
    return list(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_per_field_term_parity(mf_env, ref_mf):
    from whoosh import query as wq

    idx, _ = mf_env
    s = MultiFieldSearcher(idx, default_field="body")
    for field in ("title", "body"):
        mine = _mine(s, Term("search", field=field))
        ref = _ref(ref_mf, wq.Term(field, "search"))
        assert [d for d, _ in mine] == [d for d, _ in ref], field
        assert [x for _, x in mine] == pytest.approx([x for _, x in ref], rel=1e-9)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_cross_field_or_parity(mf_env, ref_mf):
    from whoosh import query as wq

    idx, _ = mf_env
    s = MultiFieldSearcher(idx, default_field="body")
    mine = _mine(s, Or(Term("search", field="title"), Term("search", field="body")))
    ref = _ref(
        ref_mf, wq.Or([wq.Term("title", "search"), wq.Term("body", "search")])
    )
    assert [d for d, _ in mine] == [d for d, _ in ref]
    assert [x for _, x in mine] == pytest.approx([x for _, x in ref], rel=1e-9)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_cross_field_and_parity(mf_env, ref_mf):
    from whoosh import query as wq

    idx, _ = mf_env
    s = MultiFieldSearcher(idx, default_field="body")
    mine = _mine(s, And(Term("search", field="title"), Term("data", field="body")))
    ref = _ref(
        ref_mf, wq.And([wq.Term("title", "search"), wq.Term("body", "data")])
    )
    assert [d for d, _ in mine] == [d for d, _ in ref]
    assert [x for _, x in mine] == pytest.approx([x for _, x in ref], rel=1e-9)


def test_default_field_routing(mf_env):
    idx, _ = mf_env
    s = MultiFieldSearcher(idx, default_field="body")
    a = s.search(Term("search"))
    b = s.search(Term("search", field="body"))
    assert a.to_pydict() == b.to_pydict()


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_multifield_parser_parity(mf_env, ref_mf):
    """MultifieldParser: parsed unfielded queries match the reference
    MultifieldParser's doc sets and scores (OrGroup expansion)."""
    from whoosh.qparser import MultifieldParser as WMFP

    from whoosh_novo_ray.search.qparser import MultifieldParser

    idx, _ = mf_env
    s = MultiFieldSearcher(idx, default_field="body")
    mine_p = MultifieldParser(["title", "body"])
    ref_p = WMFP(["title", "body"], ref_mf.schema)
    for qs in (
        "search",
        "search data",
        "title:search data",
        '"search data"',
        # FieldsPlugin group/phrase propagation under a multifield parser:
        # terms inside title:(...) must NOT expand to the other fields
        "title:(search data)",
        "title:(search OR data) index",
        'title:"search data" OR data',
    ):
        mine = _mine(s, mine_p.parse(qs), limit=10)
        ref = _ref(ref_mf, ref_p.parse(qs), limit=10)
        assert [d for d, _ in mine] == [d for d, _ in ref], qs
        assert [x for _, x in mine] == pytest.approx(
            [x for _, x in ref], rel=1e-9
        ), qs


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_multifield_parser_fieldboost_parity(mf_env, ref_mf):
    from whoosh.qparser import MultifieldParser as WMFP

    from whoosh_novo_ray.search.qparser import MultifieldParser

    idx, _ = mf_env
    s = MultiFieldSearcher(idx, default_field="body")
    mine_p = MultifieldParser(["title", "body"], fieldboosts={"title": 2.5})
    ref_p = WMFP(["title", "body"], ref_mf.schema, fieldboosts={"title": 2.5})
    mine = _mine(s, mine_p.parse("search"), limit=10)
    ref = _ref(ref_mf, ref_p.parse("search"), limit=10)
    assert [d for d, _ in mine] == [d for d, _ in ref]
    assert [x for _, x in mine] == pytest.approx([x for _, x in ref], rel=1e-9)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_field_alias_parity(mf_env, ref_mf):
    from whoosh.qparser import FieldAliasPlugin
    from whoosh.qparser import MultifieldParser as WMFP

    from whoosh_novo_ray.search.qparser import MultifieldParser

    idx, _ = mf_env
    s = MultiFieldSearcher(idx, default_field="body")
    mine_p = MultifieldParser(["body"], aliases={"title": ["headline"]})
    ref_p = WMFP(["body"], ref_mf.schema)
    ref_p.add_plugin(FieldAliasPlugin({"title": ["headline"]}))
    mine = _mine(s, mine_p.parse("headline:search"), limit=10)
    ref = _ref(ref_mf, ref_p.parse("headline:search"), limit=10)
    assert [d for d, _ in mine] == [d for d, _ in ref]
    assert [x for _, x in mine] == pytest.approx([x for _, x in ref], rel=1e-9)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_copyfield_parity(mf_env, ref_mf):
    from whoosh.qparser import CopyFieldPlugin
    from whoosh.qparser import QueryParser as WQP

    from whoosh_novo_ray.search.qparser import MultifieldParser

    idx, _ = mf_env
    s = MultiFieldSearcher(idx, default_field="body")
    # explicit title: terms also search body (reference CopyFieldPlugin)
    mine_p = MultifieldParser(["body"], copyfields={"title": "body"})
    ref_p = WQP("body", ref_mf.schema)
    ref_p.add_plugin(CopyFieldPlugin({"title": "body"}))
    mine = _mine(s, mine_p.parse("title:search"), limit=10)
    ref = _ref(ref_mf, ref_p.parse("title:search"), limit=10)
    assert [d for d, _ in mine] == [d for d, _ in ref]
    assert [x for _, x in mine] == pytest.approx([x for _, x in ref], rel=1e-9)


def test_pseudo_field_removes_node(mf_env):
    from whoosh_novo_ray.search.qparser import MultifieldParser

    idx, _ = mf_env
    s = MultiFieldSearcher(idx, default_field="body")
    p = MultifieldParser(["body"], pseudo_fields={"reverse": lambda n: None})
    q = p.parse("search reverse:anything")
    a = s.search(q, limit=10)
    b = s.search(p.parse("search"), limit=10)
    assert a.to_pydict() == b.to_pydict()
