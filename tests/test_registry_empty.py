"""Regression: registry queries must survive a filter that matches NOTHING.

At the synthesized sf1 scale no document has n_chars in [500, 900], so every
block coming out of the numeric_range filter is empty; _collect used to drop
them all and pa.concat_tables([]) raised ArrowInvalid ("Must pass at least
one table"). _collect now keeps one empty block (it carries the schema).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def tiny_sf_dir(tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["alpha beta", "gamma delta", "epsilon zeta"],
            "lang": ["en", "en", "de"],
            "source": ["src1", "src2", "src1"],
            # all far below the query's [500, 900] window
            "n_chars": pa.array([10, 11, 12], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_numeric_range_zero_matches(ray_session, tiny_sf_dir):
    from whoosh_novo_ray.pipelines import queries

    out = queries()["numeric_range"](tiny_sf_dir)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "n_chars"]
    assert out.schema.field("doc_id").type == pa.int64()
    assert out.schema.field("n_chars").type == pa.int64()


def test_collect_keeps_schema_when_all_blocks_empty(ray_session):
    import ray

    from whoosh_novo_ray.pipelines.registry import _collect

    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    ).filter(expr="a > 100")
    tables = _collect(ds)
    assert len(tables) == 1 and len(tables[0]) == 0
    merged = pa.concat_tables(tables)
    assert merged.column_names == ["a"]
