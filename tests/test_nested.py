"""NestedParent / NestedChildren block joins (reference query/nested.py
chapter/paragraph example, differential vs the reference)."""

import pyarrow as pa
import pytest

from tests.conftest import HAVE_REFERENCE
from whoosh_novo_ray.index import Index, IndexConfig, build_index
from whoosh_novo_ray.search import NestedChildren, NestedParent, Searcher, Term

# the reference docstring corpus: chapters (parents) + paragraphs (children)
DOCS = [
    ("chap", "Chapter one"),
    ("p", "Able baker"),
    ("p", "Bright morning day"),
    ("chap", "Chapter two"),
    ("p", "Car trip"),
    ("p", "Dog eared"),
    ("p", "Every day"),
    ("chap", "Chapter three"),
    ("p", "Fine day"),
]


@pytest.fixture(scope="module")
def nested_env(ray_session, tmp_path_factory):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": [f"{typ} {text}" for typ, text in DOCS],
        }
    )
    out = str(tmp_path_factory.mktemp("nested") / "idx")
    build_index(ray.data.from_arrow(tbl), out, IndexConfig(num_buckets=2), lineage="n")
    return Searcher(Index(out))


def test_nested_parent(nested_env):
    s = nested_env
    q = NestedParent(Term("chap"), Term("day"))
    r = s.search(q, limit=None)
    # "day" appears in docs 2 (chap 0), 6 (chap 3), 8 (chap 7)
    assert r["doc_id"].to_pylist() in ([0, 3, 7], [3, 7, 0], [7, 3, 0]) or sorted(
        r["doc_id"].to_pylist()
    ) == [0, 3, 7]


def test_nested_parent_score_fns(nested_env):
    s = nested_env
    sums = s.search(NestedParent(Term("chap"), Term("day")), limit=None)
    maxs = s.search(
        NestedParent(Term("chap"), Term("day"), score_fn="max"), limit=None
    )
    assert sorted(sums["doc_id"].to_pylist()) == sorted(maxs["doc_id"].to_pylist())


def test_nested_children(nested_env):
    s = nested_env
    # children of chapters matching "two"
    q = NestedChildren(Term("chap"), Term("two"))
    r = s.search(q, limit=None)
    assert sorted(r["doc_id"].to_pylist()) == [4, 5, 6]


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference not available")
def test_nested_parent_differential(tmp_path):
    from whoosh import index as windex
    from whoosh import query as wq
    from whoosh.fields import ID, NUMERIC, TEXT, Schema

    import os

    wdir = str(tmp_path / "wref")
    os.makedirs(wdir, exist_ok=True)
    schema = Schema(doc_id=NUMERIC(stored=True, bits=64), text=TEXT)
    ix = windex.create_in(wdir, schema)
    w = ix.writer()
    for i, (typ, text) in enumerate(DOCS):
        w.add_document(doc_id=i, text=f"{typ} {text}")
    w.commit()
    with ix.searcher() as rs:
        rq = wq.NestedParent(wq.Term("text", "chap"), wq.Term("text", "day"))
        ref_ids = sorted(h["doc_id"] for h in rs.search(rq, limit=None))
    assert ref_ids == [0, 3, 7]
