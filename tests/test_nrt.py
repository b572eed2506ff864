"""Near-real-time BufferedWriter / AsyncWriter (whoosh_novo_ray/index/nrt.py).

Reference behavior: whoosh-novo src/whoosh/writing.py:998-1330 — buffered
docs are searchable before commit (RAM index + MultiReader union), buffered
deletes/updates mask the committed copy immediately while collection stats
stay unchanged until the flush, the buffer auto-flushes at ``limit``.
"""

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.index import Index, IndexConfig
from whoosh_novo_ray.index.incremental import GenerationalIndex
from whoosh_novo_ray.index.nrt import AsyncWriter, BufferedWriter
from whoosh_novo_ray.search import Searcher
from whoosh_novo_ray.search.query import Or, Term


def _tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


@pytest.fixture()
def gidx(ray_session, tmp_path):
    import ray.data

    g = GenerationalIndex(
        str(tmp_path / "gen"), IndexConfig(num_buckets=4), policy="merge_small"
    )
    g.create(
        ray.data.from_arrow(
            _tbl([(0, "alpha beta gamma"), (1, "alpha delta"), (2, "omega phi")])
        )
    )
    return g


def _ids(table):
    return table["doc_id"].to_pylist()


def test_buffered_docs_visible_before_commit(gidx):
    bw = BufferedWriter(gidx, limit=100)
    bw.add_document(10, "alpha zeta")
    s = bw.searcher()
    assert 10 in _ids(s.search(Term("alpha"), limit=10))
    # not yet committed: a plain reader over the generation can't see it
    plain = Searcher(gidx.open())
    assert 10 not in _ids(plain.search(Term("alpha"), limit=10))


def test_nrt_scores_match_committed_equivalent(gidx, tmp_path):
    """Buffered-state scores must equal the same corpus committed as a
    separate delta generation (stats union through MultiIndex)."""
    import ray.data

    bw = BufferedWriter(gidx, limit=100)
    bw.add_document(10, "alpha zeta")
    bw.add_document(11, "zeta zeta beta")
    q = Or(Term("alpha"), Term("zeta"))
    nrt = bw.searcher().search(q, limit=10)

    g2 = GenerationalIndex(
        str(tmp_path / "gen2"), IndexConfig(num_buckets=4), policy="no_merge"
    )
    g2.create(
        ray.data.from_arrow(
            _tbl([(0, "alpha beta gamma"), (1, "alpha delta"), (2, "omega phi")])
        )
    )
    g2.add_documents(ray.data.from_arrow(_tbl([(10, "alpha zeta"), (11, "zeta zeta beta")])))
    ref = Searcher(g2.open()).search(q, limit=10)
    assert nrt.to_pydict() == ref.to_pydict()


def test_update_masks_committed_copy(gidx):
    bw = BufferedWriter(gidx, limit=100)
    bw.update_document(1, "rho sigma")
    s = bw.searcher()
    # old content stops matching, new content matches, others unaffected
    assert _ids(s.search(Term("delta"), limit=10)) == []
    assert _ids(s.search(Term("rho"), limit=10)) == [1]
    assert 0 in _ids(s.search(Term("alpha"), limit=10))
    # stats keep the masked copy until flush (reference pending-delete
    # semantics): collection doc count includes both copies
    assert s.index.doc_count == 4


def test_delete_document_nrt_then_commit(gidx):
    bw = BufferedWriter(gidx, limit=100)
    bw.delete_document(0)
    s = bw.searcher()
    assert _ids(s.search(Term("alpha"), limit=10)) == [1]
    bw.commit()
    after = Searcher(gidx.open())
    assert _ids(after.search(Term("alpha"), limit=10)) == [1]
    assert gidx.open().doc_count == 2


def test_delete_then_readd_resurrects(gidx):
    bw = BufferedWriter(gidx, limit=100)
    bw.delete_document(0)
    bw.add_document(0, "alpha reborn")
    s = bw.searcher()
    assert 0 in _ids(s.search(Term("reborn"), limit=10))
    assert _ids(s.search(Term("gamma"), limit=10)) == []  # old copy masked


def test_auto_flush_at_limit(gidx):
    bw = BufferedWriter(gidx, limit=3)
    bw.add_document(20, "flush one")
    bw.add_document(21, "flush two")
    assert bw._buf  # below limit: still buffered
    bw.add_document(22, "flush three")
    assert not bw._buf  # limit reached: flushed
    assert set(_ids(Searcher(gidx.open()).search(Term("flush"), limit=10))) == {
        20,
        21,
        22,
    }


def test_commit_flushes_updates(gidx):
    with BufferedWriter(gidx, limit=100) as bw:
        bw.update_document(1, "rho sigma")
        bw.add_document(30, "alpha rho")
    idx = gidx.open()
    s = Searcher(idx)
    assert idx.doc_count == 4  # 0,1(new),2,30
    assert set(_ids(s.search(Term("rho"), limit=10))) == {1, 30}
    assert _ids(s.search(Term("delta"), limit=10)) == []


def test_async_writer_replays_on_commit(gidx):
    aw = AsyncWriter(gidx)
    aw.add_document(40, "async alpha")
    aw.update_document(1, "async beta")
    aw.delete_document(2)
    aw.commit()
    aw.join()
    idx = gidx.open()
    s = Searcher(idx)
    assert idx.doc_count == 3  # 0, 1(new), 40
    assert 40 in _ids(s.search(Term("async"), limit=10))
    assert _ids(s.search(Term("omega"), limit=10)) == []
    assert _ids(s.search(Term("delta"), limit=10)) == []


def test_search_exclude_param(gidx):
    s = Searcher(gidx.open())
    full = _ids(s.search(Term("alpha"), limit=10))
    assert full == [0, 1] or set(full) == {0, 1}
    masked = _ids(s.search(Term("alpha"), limit=10, exclude=np.array([0], np.uint64)))
    assert masked == [1]
