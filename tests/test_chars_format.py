"""Characters posting format: per-occurrence char offsets + index-powered
highlighting."""

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.analysis import StandardAnalyzer
from whoosh_novo_ray.index import Index, IndexConfig, build_index
from whoosh_novo_ray.index.merge import merge_indexes
from whoosh_novo_ray.search import Searcher, Term
from whoosh_novo_ray.search.highlight import (
    WholeFragmenter,
    highlight,
    highlight_from_index,
)

TEXTS = [
    "Hello hello world says hello",
    "the world says hello back",
    "nothing to see",
    "Worldly affairs; hello-world compound",
]


@pytest.fixture(scope="module")
def chars_index(ray_session, tmp_path_factory):
    import ray.data

    tbl = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": TEXTS})
    out = str(tmp_path_factory.mktemp("chars") / "idx")
    build_index(
        ray.data.from_arrow(tbl),
        out,
        IndexConfig(num_buckets=2, with_chars=True),
        lineage="c",
    )
    return Index(out)


def _expected_spans(text, term):
    import re

    rx = re.compile(StandardAnalyzer().pattern)
    return [
        [m.start(), m.end()]
        for m in rx.finditer(text.lower())
        if m.group(0) == term
    ]


def test_char_offsets_roundtrip(chars_index):
    rows = chars_index.term_rows(["hello", "world"], with_chars=True)
    for term, rl in rows.items():
        for r in rl:
            ids, tfs, _ = r.decode_all()
            spans, counts = r.decode_all_chars()
            assert (counts == tfs.astype(np.int64)).all()
            offs = np.cumsum(counts) - counts
            for i, d in enumerate(ids.tolist()):
                seg = spans[int(offs[i]) : int(offs[i] + counts[i])].tolist()
                assert seg == _expected_spans(TEXTS[d], term), (term, d)


def test_highlight_from_index_matches_retokenize(chars_index):
    s = Searcher(chars_index)
    for d, text in enumerate(TEXTS):
        a = highlight_from_index(
            s, d, text, ["hello", "world"], fragmenter=WholeFragmenter()
        )
        b = highlight(text, ["hello", "world"], fragmenter=WholeFragmenter())
        assert a == b, (d, a, b)


def test_chars_survive_merge(chars_index, ray_session, tmp_path):
    import ray.data

    tbl = pa.table(
        {"doc_id": pa.array([100], pa.int64()), "text": ["extra hello text"]}
    )
    other = str(tmp_path / "other")
    build_index(
        ray.data.from_arrow(tbl),
        other,
        IndexConfig(num_buckets=2, with_chars=True),
        lineage="o",
    )
    merged = str(tmp_path / "merged")
    merge_indexes([chars_index.path, other], merged, lineage="m")
    mi = Index(merged)
    rows = mi.term_rows(["hello"], with_chars=True)["hello"]
    all_ids = np.concatenate([r.decode_all()[0] for r in rows])
    assert 100 in all_ids.tolist()
    for r in rows:
        ids, tfs, _ = r.decode_all()
        spans, counts = r.decode_all_chars()
        assert (counts == tfs.astype(np.int64)).all()
        offs = np.cumsum(counts) - counts
        for i, d in enumerate(ids.tolist()):
            text = TEXTS[d] if d < len(TEXTS) else "extra hello text"
            seg = spans[int(offs[i]) : int(offs[i] + counts[i])].tolist()
            assert seg == _expected_spans(text, "hello")
