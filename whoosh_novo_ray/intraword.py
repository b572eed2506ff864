"""Intra-word splitting/merging — the reference IntraWordFilter semantics
(de-odex/whoosh-novo ``src/whoosh/analysis/intraword.py:237-523``, itself
functionally modeled on Solr's WordDelimiterFilter):

* split on delimiter characters (``Wi-Fi`` -> ``Wi``, ``Fi``),
* split at lower->upper case transitions (``PowerShot`` -> ``Power, Shot``),
* split at letter<->digit transitions (``SD500`` -> ``SD, 500``),
* strip trailing possessive ``'s`` from subwords,
* optionally merge consecutive alphabetic / numeric runs into an extra token
  sharing the last subword's position (``PowerShot`` -> pos0 ``Power``,
  pos1 ``Shot``, pos1 ``PowerShot``),
* renumber the whole stream's positions as tokens expand.

Differential tests assert token-and-position parity with the reference
filter over hand-picked and randomized inputs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

DEFAULT_DELIMS = "-_'\"()!@#$%^&*[]{}<>\\|;:,./?`~=+"


@dataclass
class IntraWord:
    delims: str = DEFAULT_DELIMS
    splitwords: bool = True
    splitnums: bool = True
    mergewords: bool = False
    mergenums: bool = False

    def __post_init__(self):
        esc = re.escape(self.delims)
        self._between = re.compile(f"[^{esc}]+")
        self._possessive = re.compile(f"(?<=[^\\W\\d_])'[Ss](?=$|[{esc}])", re.UNICODE)

    # -- low-level span splitting ---------------------------------------------

    def _boundaries(self, s: str, lo: int, hi: int):
        """Indices of split pivots inside s[lo:hi] (the char index where the
        new subword starts). Transition matches CONSUME two characters
        (the reference finds them with non-overlapping regex finditer), so
        back-to-back transitions skip — e.g. ``Y3rZ`` splits as Y3|rZ, not
        Y|3|r|Z."""
        i = lo
        while i < hi - 1:
            a, b = s[i], s[i + 1]
            hit = (self.splitwords and a.islower() and b.isupper()) or (
                self.splitnums
                and (
                    (a.isalpha() and b.isdigit()) or (a.isdigit() and b.isalpha())
                )
            )
            if hit:
                yield i + 1
                i += 2
            else:
                i += 1

    def split_spans(self, text: str) -> list[tuple[int, int]]:
        """(startchar, endchar) spans of the subwords of one token."""
        out: list[tuple[int, int]] = []
        if "'" in text:
            runs = []
            prev = 0
            for m in self._possessive.finditer(text):
                runs.append((prev, m.start()))
                prev = m.end()
            if prev < len(text):
                runs.append((prev, len(text)))
        else:
            runs = [(0, len(text))]
        for sc, ec in runs:
            for pm in self._between.finditer(text, sc, ec):
                lo, hi = pm.start(), pm.end()
                if self.splitwords or self.splitnums:
                    prev = lo
                    for pivot in self._boundaries(text, lo, hi):
                        out.append((prev, pivot))
                        prev = pivot
                    if prev < hi:
                        out.append((prev, hi))
                else:
                    out.append((lo, hi))
        return out

    def _merge(self, parts: list[tuple[str, int]]) -> None:
        """Insert merged-run tokens (reference _merge semantics: a merged
        token is inserted before the run's last part, at that part's
        position - 1... matching the reference's insert-at bookkeeping)."""
        last = 0
        insertat = 0
        buf: list[tuple[str, int]] = []
        pos = 0
        for item in list(parts):
            text, pos = item
            if text.isalpha():
                this = 1
            elif text.isdigit():
                this = 2
            else:
                this = None
            if buf and (
                (this == last == 1 and self.mergewords)
                or (this == last == 2 and self.mergenums)
            ):
                buf.append(item)
            else:
                if len(buf) > 1:
                    parts.insert(insertat, ("".join(t for t, _p in buf), pos - 1))
                    insertat += 1
                buf = [item]
                last = this
            insertat += 1
        if len(buf) > 1:
            parts.insert(len(parts), ("".join(t for t, _p in buf), pos))

    # -- stream expansion ------------------------------------------------------

    def expand(self, tokens: list[str], startpos: int = 0) -> list[tuple[str, int]]:
        """Expand a token stream -> [(text, pos)] with renumbered positions
        (reference __call__, intraword.py:465-523)."""
        out: list[tuple[str, int]] = []
        newpos = startpos
        for text in tokens:
            if (text.isalpha() and (text.islower() or text.isupper())) or text.isdigit():
                out.append((text, newpos))
                newpos += 1
                continue
            spans = self.split_spans(text)
            parts = [(text[sc:ec], newpos + i) for i, (sc, ec) in enumerate(spans)]
            if len(parts) > 1 and (self.mergewords or self.mergenums):
                self._merge(parts)
            out.extend(parts)
            if parts:
                newpos = parts[-1][1] + 1
        return out


def fancy_tokens(
    text: str,
    stoplist=None,
    minsize: int = 2,
    splitwords: bool = True,
    splitnums: bool = True,
    mergewords: bool = False,
    mergenums: bool = False,
) -> list[str]:
    """The reference FancyAnalyzer chain (analyzers.py:257-294):
    whitespace-split -> IntraWord -> lowercase -> stop filter."""
    from whoosh_novo_ray.analysis import STOP_WORDS

    stops = STOP_WORDS if stoplist is None else stoplist
    iw = IntraWord(
        splitwords=splitwords,
        splitnums=splitnums,
        mergewords=mergewords,
        mergenums=mergenums,
    )
    raw = [t for t in re.split(r"\s+", text) if t]
    out = []
    for tok, _pos in iw.expand(raw):
        low = tok.lower()
        if len(low) >= minsize and low not in stops:
            out.append(low)
    return out
