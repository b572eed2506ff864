"""Levenshtein automaton with ordered dictionary seek.

Replaces the unbounded banded-DP lexicon scan for fuzzy expansion /
spelling with the reference's automaton-intersection shape
(de-odex/whoosh-novo ``src/whoosh/automata/lev.py`` + the FST intersection
in ``codec/base.py:363-389``) — re-expressed for THIS engine's term
dictionary (term-sorted parquet with per-row-group min/max statistics):

  * ``accepts(s)``     — is ``s`` within ``k`` edits of the query?
  * ``next_valid(s)``  — the lexicographically smallest ACCEPTED string
    ``>= s`` (None when no accepted string follows). This single primitive
    gives bounded traversal everywhere a sorted order exists:
      - skip a parquet ROW GROUP whenever ``next_valid(group_min) >
        group_max`` (no candidate can live inside it);
      - jump-scan a sorted in-memory term array with ``searchsorted``
        instead of testing every term.

Construction is the classic NFA-of-(offset, errors) positions with
subsumption, determinized lazily (Schulz & Mihov, "Fast string correction
with Levenshtein automata", 2002). States are tiny for k <= 2; the DFA
cache is per-query-term.

Ordering note: Python ``str`` comparison is by code point and UTF-8 byte
order preserves code-point order, so seek decisions made here agree with
the parquet/Arrow term sort.
"""

from __future__ import annotations

_MAX_CP = 0x10FFFF


class LevAutomaton:
    """DFA for "within ``k`` edits of ``text``", built lazily."""

    def __init__(self, text: str, k: int):
        self.text = text
        self.n = len(text)
        self.k = k
        self.chars = sorted(set(text))  # the only chars with distinct moves
        self._charset = set(self.chars)
        # a representative char guaranteed to not be in text (for the
        # "any other char" transition class)
        self._other = None
        for cp in range(ord("\x01"), _MAX_CP):
            if chr(cp) not in self._charset:
                self._other = chr(cp)
                break
        self.start = self._reduce(((0, 0),))
        self._steps: dict[tuple, dict[str, tuple]] = {}

    # -- NFA machinery ---------------------------------------------------------

    def _reduce(self, positions) -> tuple:
        """Subsumption-reduced canonical state: (i, e) subsumes (j, f) when
        f > e and |j - i| <= f - e (anything (j, f) accepts, (i, e) accepts
        within the leftover budget)."""
        ps = sorted(set(positions))
        keep = []
        for i, e in ps:
            if any(
                f < e and abs(i - j) <= e - f for j, f in ps if (j, f) != (i, e)
            ):
                continue
            keep.append((i, e))
        return tuple(keep)

    def _step_raw(self, state: tuple, c: str) -> tuple:
        n, k, text = self.n, self.k, self.text
        out = set()
        for i, e in state:
            if i < n and text[i] == c:
                out.add((i + 1, e))
            if e < k:
                out.add((i, e + 1))  # insertion
                if i < n:
                    out.add((i + 1, e + 1))  # substitution
                # j deletions then a match
                for j in range(1, k - e + 1):
                    if i + j < n and text[i + j] == c:
                        out.add((i + j + 1, e + j))
        return self._reduce(out)

    def _step(self, state: tuple, c: str) -> tuple:
        key = c if c in self._charset else "\x00"
        cache = self._steps.setdefault(state, {})
        if key not in cache:
            cache[key] = self._step_raw(
                state, c if key != "\x00" else self._other
            )
        return cache[key]

    def _accepting(self, state: tuple) -> bool:
        return any(self.n - i + e <= self.k for i, e in state)

    # invariant used below: every LIVE (non-empty) state can reach an
    # accepting state — any (i, e) position accepts after appending
    # text[i:] verbatim — so "has a live transition" == "can complete".

    # -- public surface ----------------------------------------------------------

    def accepts(self, s: str) -> bool:
        st = self.start
        for ch in s:
            st = self._step(st, ch)
            if not st:
                return False
        return self._accepting(st)

    def _smallest_live_char(self, state: tuple, lb: str) -> str | None:
        """Smallest char >= ``lb`` with a live transition from ``state``."""
        best: str | None = None
        for c in self.chars:  # sorted; tiny (chars of the query term)
            if c >= lb and self._step(state, c):
                best = c
                break
        # the "other" class: smallest char >= lb that is NOT a query char
        if self._step(state, self._other):
            cp = ord(lb)
            while cp <= _MAX_CP:
                ch = chr(cp)
                if ch not in self._charset:
                    if best is None or ch < best:
                        best = ch
                    break
                if best is not None and ch >= best:
                    break
                cp += 1
        return best

    def _min_completion(self, state: tuple) -> str:
        """Lexicographically smallest suffix from ``state`` to acceptance
        (exists for every live state; see invariant above)."""
        out = []
        while not self._accepting(state):
            c = self._smallest_live_char(state, "\x00")
            # live non-accepting states always have a live transition
            out.append(c)
            state = self._step(state, c)
        return "".join(out)

    def next_valid(self, s: str) -> str | None:
        """Smallest accepted string >= ``s``, or None if none exists."""
        # walk s as far as the DFA stays live, remembering states
        states = [self.start]
        depth = 0
        for ch in s:
            nxt = self._step(states[-1], ch)
            if not nxt:
                break
            states.append(nxt)
            depth += 1
        if depth == len(s) and self._accepting(states[-1]):
            return s
        if depth == len(s):
            # s itself is a live prefix: smallest accepted extension
            return s + self._min_completion(states[-1])
        # backtrack: bump the char at ``depth`` (then earlier ones) upward
        while depth >= 0:
            lb_cp = ord(s[depth]) + 1 if depth < len(s) else 1
            if lb_cp <= _MAX_CP:
                c = self._smallest_live_char(states[depth], chr(lb_cp))
                if c is not None:
                    nxt = self._step(states[depth], c)
                    return s[:depth] + c + self._min_completion(nxt)
            depth -= 1
        return None
