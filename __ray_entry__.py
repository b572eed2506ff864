"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in whoosh_novo_ray) calls ray.init()/ray.shutdown().

* ``entry()`` — flagship pipeline on /root/testdata/sf0.001: build the
  distributed inverted index over the documents table and run the standard
  query set; returns a (query, rank, doc_id, score) Arrow table.
* ``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
  SURVEY.md §2 + the training-data ops; see
  whoosh_novo_ray/pipelines/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from whoosh_novo_ray.pipelines.flagship import run_flagship

    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from whoosh_novo_ray.pipelines import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from whoosh_novo_ray.pipelines import oracle_sql as _o

    return _o()
