"""Generational incremental indexing + query correction + field:term syntax."""

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.index import Index, IndexConfig, build_index
from whoosh_novo_ray.index.incremental import GenerationalIndex
from whoosh_novo_ray.search import Or, Phrase, Searcher, Term
from whoosh_novo_ray.search.fuzzy import correct_query
from whoosh_novo_ray.search.qparser import QueryParser
from whoosh_novo_ray.testing.pages import synth_pages


_PAGES = synth_pages(n=300, seed=77)


def _tbl(lo, hi):
    return _PAGES.select(["doc_id", "text"]).slice(lo, hi - lo)


def test_generational_lifecycle(ray_session, tmp_path):
    import ray.data

    root = str(tmp_path / "gen")
    gi = GenerationalIndex(root, IndexConfig(num_buckets=2))

    gi.create(ray.data.from_arrow(_tbl(0, 200)))
    assert gi.current_generation() == 1
    idx1 = gi.open()
    assert idx1.doc_count == 200

    # add 100 more docs
    gi.add_documents(ray.data.from_arrow(_tbl(200, 300)))
    assert gi.current_generation() == 2
    idx2 = gi.open()
    assert idx2.doc_count == 300

    # the merged generation equals a from-scratch build on the union
    whole_dir = str(tmp_path / "whole")
    build_index(
        ray.data.from_arrow(_tbl(0, 300)), whole_dir, IndexConfig(num_buckets=2),
        lineage="w",
    )
    sw, sg = Searcher(Index(whole_dir)), Searcher(idx2)
    for t in ("search", "data", "index"):
        assert sw.term_postings(t)[0].tolist() == sg.term_postings(t)[0].tolist()
        assert (
            sw.search(Term(t), limit=10).to_pydict()
            == sg.search(Term(t), limit=10).to_pydict()
        )

    # delete some docs
    gi.delete_documents(np.arange(10, dtype=np.uint64))
    idx3 = gi.open()
    assert idx3.doc_count == 290
    ids, *_ = Searcher(idx3).term_postings("search")
    assert not (ids < 10).any()

    # update: replace doc 50's text entirely
    upd = pa.table({"doc_id": pa.array([50], pa.int64()), "text": ["qqqunique words only"]})
    gi.update_documents(ray.data.from_arrow(upd))
    idx4 = gi.open()
    s4 = Searcher(idx4)
    assert idx4.doc_count == 290  # replaced, not added
    assert s4.term_postings("qqqunique")[0].tolist() == [50]
    assert 50 not in s4.term_postings("search")[0].tolist()

    gi.cleanup(keep=1)
    assert gi.open().doc_count == 290


def test_correct_query(built_index):
    s = Searcher(built_index)
    qp = QueryParser()
    q = qp.parse("searhc data")
    fixed, changed = correct_query(s, q, maxdist=2)
    assert changed
    r = s.search(fixed, limit=5)
    assert len(r) > 0
    # all-known query unchanged
    q2, changed2 = correct_query(s, qp.parse("search data"))
    assert not changed2


def test_field_term_parser_syntax():
    qp = QueryParser()
    q = qp.parse("title:search body:data")
    terms = list(q.children)
    assert terms[0] == Term("search", field="title")
    assert terms[1] == Term("data", field="body")
