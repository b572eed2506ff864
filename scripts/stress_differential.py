"""Large differential stress: build a 5k-doc salted index and compare ~100
query results (ids AND scores) against the reference engine.

Usage: python scripts/stress_differential.py  (expects /root/reference)
Round-1 result: 102 runs, 0 failures.
"""

import functools
import itertools
import sys
import tempfile
import types

sys.path.insert(0, __file__.rsplit("/", 2)[0])
_m = types.ModuleType("cached_property")
_m.cached_property = functools.cached_property
sys.modules["cached_property"] = _m
sys.path.append("/root/reference/src")


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    from whoosh_novo_ray.index import Index, IndexConfig, build_index
    from whoosh_novo_ray.search import And, AndNot, Or, Prefix, Searcher, Term
    from whoosh_novo_ray.testing.pages import synth_pages

    pages = synth_pages(n=5000, seed=777, vocab_size=4000, mean_len=90)
    out = tempfile.mkdtemp() + "/idx"
    build_index(
        ray.data.from_arrow(pages.select(["doc_id", "text"])),
        out,
        IndexConfig(num_buckets=8, heavy_terms=("search", "the", "data"),
                    salt_k=4, salt_shift=6),
        lineage="stress",
    )
    s = Searcher(Index(out))

    from whoosh import index as windex
    from whoosh import query as wq
    from whoosh.fields import NUMERIC, TEXT, Schema

    wdir = tempfile.mkdtemp()
    ix = windex.create_in(wdir, Schema(doc_id=NUMERIC(stored=True, bits=64), text=TEXT))
    w = ix.writer(limitmb=512)
    for r in pages.select(["doc_id", "text"]).to_pylist():
        w.add_document(doc_id=r["doc_id"], text=r["text"])
    w.commit()

    terms = ["search", "data", "index", "page", "token", "crawl", "rank",
             "web", "the", "field", "block", "zzznope"]
    fails = runs = 0
    with ix.searcher() as rs:
        def ref(q, limit):
            r = rs.search(q, limit=limit)
            return [(h["doc_id"], round(r.score(i), 8)) for i, h in enumerate(r)]

        def mine(q, limit):
            t = s.search(q, limit=limit).to_pydict()
            return [(d, round(x, 8)) for d, x in zip(t["doc_id"], t["score"])]

        for t1 in terms:
            for lim in (1, 10, 100):
                runs += 1
                if mine(Term(t1), lim) != ref(wq.Term("text", t1), lim):
                    fails += 1
                    print("TERM FAIL", t1, lim)
        for t1, t2 in itertools.combinations(terms[:8], 2):
            runs += 2
            if mine(Or(Term(t1), Term(t2)), 20) != ref(
                wq.Or([wq.Term("text", t1), wq.Term("text", t2)]), 20
            ):
                fails += 1
                print("OR FAIL", t1, t2)
            if mine(And(Term(t1), Term(t2)), 20) != ref(
                wq.And([wq.Term("text", t1), wq.Term("text", t2)]), 20
            ):
                fails += 1
                print("AND FAIL", t1, t2)
        for t1 in terms[:6]:
            runs += 1
            if mine(AndNot(Term(t1), Term("data")), 20) != ref(
                wq.AndNot(wq.Term("text", t1), wq.Term("text", "data")), 20
            ):
                fails += 1
                print("ANDNOT FAIL", t1)
        for pre in ("se", "da", "to", "xy"):
            runs += 1
            a = sorted(d for d, _x in mine(Prefix(pre), None))
            b = sorted(h["doc_id"] for h in rs.search(wq.Prefix("text", pre), limit=None))
            if a != b:
                fails += 1
                print("PREFIX FAIL", pre)

        # round-2 query types -----------------------------------------------
        from whoosh_novo_ray.search import (
            Ordered,
            Otherwise,
            Phrase,
            Sequence,
            Variations,
        )

        for t1, t2 in itertools.combinations(terms[:6], 2):
            runs += 1
            a = sorted(d for d, _x in mine(Phrase([t1, t2]), None))
            b = sorted(
                h["doc_id"]
                for h in rs.search(
                    wq.Phrase("text", [t1, t2]), limit=None, optimize=False
                )
            )
            if a != b:
                fails += 1
                print("PHRASE FAIL", t1, t2)
            runs += 1
            a = sorted(d for d, _x in mine(Ordered(Term(t1), Term(t2)), None))
            b = sorted(
                h["doc_id"]
                for h in rs.search(
                    wq.Ordered([wq.Term("text", t1), wq.Term("text", t2)]),
                    limit=None,
                    optimize=False,
                )
            )
            if a != b:
                fails += 1
                print("ORDERED FAIL", t1, t2)
        for t1 in terms[:6]:
            runs += 1
            if mine(Variations(t1), 20) != ref(
                wq.Variations("text", t1), 20
            ):
                fails += 1
                print("VARIATIONS FAIL", t1)
            runs += 1
            if mine(Otherwise(Term("zzznope"), Term(t1)), 20) != ref(
                wq.Otherwise(wq.Term("text", "zzznope"), wq.Term("text", t1)), 20
            ):
                fails += 1
                print("OTHERWISE FAIL", t1)
        for t1, t2 in itertools.combinations(terms[:5], 2):
            runs += 1
            a = sorted(
                d for d, _x in mine(Sequence(Term(t1), Prefix(t2[:2])), None)
            )
            b = sorted(
                h["doc_id"]
                for h in rs.search(
                    wq.Sequence(
                        [wq.Term("text", t1), wq.Prefix("text", t2[:2])]
                    ),
                    limit=None,
                    optimize=False,
                )
            )
            if a != b:
                fails += 1
                print("SEQUENCE FAIL", t1, t2)
    print(f"stress: {runs} runs, {fails} failures")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
