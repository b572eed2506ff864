import functools
import os
import sys
import types

import pytest

# The reference engine (used only as a differential test oracle) imports
# `cached_property`; provide the stdlib equivalent.
if "cached_property" not in sys.modules:
    _m = types.ModuleType("cached_property")
    _m.cached_property = functools.cached_property
    sys.modules["cached_property"] = _m

REFERENCE_SRC = "/root/reference/src"
HAVE_REFERENCE = os.path.isdir(REFERENCE_SRC)
if HAVE_REFERENCE and REFERENCE_SRC not in sys.path:
    sys.path.append(REFERENCE_SRC)  # append: our package wins name conflicts

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_table():
    """Deterministic synthetic Common-Crawl-style pages corpus (small)."""
    from whoosh_novo_ray.testing.pages import synth_pages

    return synth_pages(n=400, seed=42)


@pytest.fixture(scope="session")
def built_index(ray_session, pages_table, tmp_path_factory):
    """Index over the synthetic pages corpus + the matching reference index."""
    import ray.data

    from whoosh_novo_ray.index import IndexConfig, build_index, Index

    out = str(tmp_path_factory.mktemp("idx") / "pages_idx")
    docs = ray.data.from_arrow(pages_table.select(["doc_id", "text"]))
    cfg = IndexConfig(num_buckets=4)
    build_index(docs, out, cfg, lineage="test-pages")
    return Index(out)


@pytest.fixture(scope="session")
def reference_index(pages_table, tmp_path_factory):
    """A reference whoosh index over the same corpus (oracle)."""
    if not HAVE_REFERENCE:
        pytest.skip("reference repo not available")
    from whoosh import index as windex
    from whoosh.fields import NUMERIC, TEXT, Schema

    wdir = str(tmp_path_factory.mktemp("whooshref"))
    schema = Schema(doc_id=NUMERIC(stored=True, bits=64), text=TEXT)
    ix = windex.create_in(wdir, schema)
    w = ix.writer(limitmb=256)
    for r in pages_table.select(["doc_id", "text"]).to_pylist():
        w.add_document(doc_id=r["doc_id"], text=r["text"])
    w.commit()
    return ix


@pytest.fixture(scope="session")
def reference_searcher(reference_index):
    s = reference_index.searcher()
    yield s
    s.close()
