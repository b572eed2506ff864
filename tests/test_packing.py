"""Context-window shaping ops: chunking, packing, stratified sampling.

The driver oracle (scripts/validate_oracles.py) pins these against DuckDB at
sf0.01; here we pin the edge semantics and the serial-reference equivalence
of the distributed prefix-sum.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


def test_chunk_windows_semantics(ray_session):
    from whoosh_novo_ray.ops.packing import chunk_documents

    docs = _ds(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                " ".join(f"t{i}" for i in range(10)),  # 10 toks: starts 0,4,8
                "a b",  # shorter than one chunk
                "",  # no tokens -> no chunks
                " ".join(f"u{i}" for i in range(8)),  # exactly 2 strided
            ],
        }
    )
    t = chunk_documents(docs, chunk_tokens=6, stride=4).materialize().to_pandas()
    t = t.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    got = list(zip(t["doc_id"], t["chunk_idx"], t["n_chunk_tokens"], t["chunk_text"]))
    toks1 = [f"t{i}" for i in range(10)]
    toks4 = [f"u{i}" for i in range(8)]
    expect = [
        (1, 0, 6, " ".join(toks1[0:6])),
        (1, 1, 6, " ".join(toks1[4:10])),
        (1, 2, 2, " ".join(toks1[8:10])),
        (2, 0, 2, "a b"),
        (4, 0, 6, " ".join(toks4[0:6])),
        (4, 1, 4, " ".join(toks4[4:8])),
    ]
    assert got == expect


def test_chunk_no_overlap_covers_exactly(ray_session):
    from whoosh_novo_ray.ops.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))
    docs = _ds({"doc_id": [7], "text": [text]})
    t = (
        chunk_documents(docs, chunk_tokens=16, stride=16)
        .materialize()
        .to_pandas()
        .sort_values("chunk_idx")
    )
    # stride == chunk -> exact partition of the token stream
    assert " ".join(t["chunk_text"]) == text
    assert t["n_chunk_tokens"].sum() == 100


def test_pack_sequences_matches_serial(ray_session):
    from whoosh_novo_ray.ops.packing import pack_sequences

    rng = np.random.default_rng(7)
    n_docs = 500
    lens = rng.integers(1, 60, n_docs)
    texts = [" ".join("x" * 1 for _ in range(k)) for k in lens]
    # shuffle input order: packing must still follow doc_id order
    order = rng.permutation(n_docs)
    docs = _ds(
        {
            "doc_id": [int(i) for i in order],
            "text": [texts[i] for i in order],
        }
    )
    t = (
        pack_sequences(docs, budget=256, range_width=37)
        .materialize()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # serial reference: prefix-before // budget in doc_id order
    before = np.cumsum(lens) - lens
    assert list(t["doc_id"]) == list(range(n_docs))
    assert list(t["n_tokens"]) == list(lens)
    assert list(t["pack_id"]) == list(before // 256)
    # every pack except possibly the last reaches the budget with its docs
    sums = t.groupby("pack_id")["n_tokens"].sum()
    assert (sums.iloc[:-1] + 59 >= 256).all()  # budget minus max doc size


def test_stratified_sample_deterministic(ray_session):
    from whoosh_novo_ray.ops.packing import stratified_sample

    n = 2000
    langs = ["en", "de", "zh", "fr"]
    docs = _ds(
        {
            "doc_id": list(range(n)),
            "lang": [langs[i % 4] for i in range(n)],
        }
    )
    rates = {"en": 0.25, "zh": 1.0, "fr": 0.0}
    t = (
        stratified_sample(docs, rates, default_rate=0.5)
        .materialize()
        .to_pandas()
        .sort_values("doc_id")
    )
    # exact membership: recompute the hash rule serially
    def keep(i, lang):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return u < int(rates.get(lang, 0.5) * 2**32)

    expect = [(i, langs[i % 4]) for i in range(n) if keep(i, langs[i % 4])]
    assert list(zip(t["doc_id"], t["lang"])) == expect
    # rate sanity: zh all kept, fr none, en ~25%
    by = t.groupby("lang").size()
    assert by.get("zh", 0) == n // 4 and "fr" not in by.index
    assert abs(by.get("en", 0) / (n // 4) - 0.25) < 0.08


def test_chunk_rejects_bad_stride(ray_session):
    from whoosh_novo_ray.ops.packing import chunk_documents

    docs = _ds({"doc_id": [1], "text": ["a b c"]})
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, stride=8)


def test_pii_scrub_semantics(ray_session):
    from whoosh_novo_ray.ops.curation import pii_scrub_table

    docs = _ds(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail bob.smith+x@foo-bar.co.uk or sue@a.io now",
                "server 10.0.0.1 and 255.255.255.0 up; call +1 (415) 555-2671",
                "clean text with no contact details at all",
            ],
        }
    )
    t = pii_scrub_table(docs).materialize().to_pandas().sort_values("doc_id")
    r1, r2, r3 = [t[t.doc_id == i].iloc[0] for i in (1, 2, 3)]
    assert r1.n_email == 2 and r1.n_pii == 2
    assert r1.clean_text == "mail <EMAIL> or <EMAIL> now"
    assert r2.n_ip == 2 and r2.n_phone == 1 and r2.n_email == 0
    assert r2.clean_text == "server <IP> and <IP> up; call <PHONE>"
    assert r3.n_pii == 0 and r3.clean_text.startswith("clean text")
