"""English morphological variation generation (LiteMorph).

Fresh implementation of Sun's LiteMorph_en algorithm over the public data
tables in ``lang_morph_data.py``. Behavioral spec: the reference engine's
``lang/morph_en.py:1100-1147`` — including its quirks, which matter for
rank/doc-set parity:

* rules are evaluated in PARTITIONS of 20: the first partition containing
  any match wins, and within it the match at the leftmost position (ties
  broken by rule order) — the semantics of ``re.search`` over an ordered
  alternation, computed here per-rule instead of via a mega-regex;
* a ``&`` result doubles the root's final letter before the suffix;
* ``*`` results are INERT: the reference calls ``out.union(...)`` and
  discards the return value, so recursive expansion never lands in the
  output — reproduced faithfully;
* exception families and unmatched words return as-is (word lists).
"""

from __future__ import annotations

import re

from whoosh_novo_ray.lang_morph_data import EXCEPTIONS_BLOB, RULES

_PARTITION = 20

_EXCEPTIONS: dict[str, list[str]] = {}
for _line in EXCEPTIONS_BLOB.splitlines():
    _family = _line.split(" ")
    for _w in _family:
        _EXCEPTIONS[_w] = _family

_COMPILED = [(re.compile("(" + pat + ")$"), results) for pat, results in RULES]


def variations(word: str) -> list[str] | set[str]:
    """All morphological variations of ``word`` (may include non-words)."""
    fam = _EXCEPTIONS.get(word)
    if fam is not None:
        return list(fam)

    n = len(_COMPILED)
    for start in range(0, n, _PARTITION):
        best = None  # (match_pos, rule_idx, match)
        for idx in range(start, min(start + _PARTITION, n)):
            m = _COMPILED[idx][0].search(word)
            if m is not None and (best is None or m.start() < best[0]):
                best = (m.start(), idx, m)
        if best is None:
            continue
        _pos, idx, m = best
        groups = [g for g in m.groups() if g is not None]
        ending = groups[-1]
        root = word[: -len(ending)] if ending else word
        out = {word}
        for result in _COMPILED[idx][1].split(","):
            if result.startswith("&"):
                out.add(root + root[-1] + result[1:])
            elif result.startswith("*"):
                pass  # reference discards the recursive union (morph_en quirk)
            else:
                out.add(root + result)
        return out

    return [word]
