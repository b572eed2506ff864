"""Paice-Husk (Lancaster) stemmer — C.D. Paice, "Another stemmer",
ACM SIGIR Forum 24:3, 1990.

Fresh implementation of the published algorithm around the published default
rule table (the canonical Lancaster rule set, 115 rules in the paper's
reversed-ending notation). Behavior-parity target:
``/root/reference/src/whoosh/lang/paicehusk.py`` (``stem()``) — verified
word-for-word by the differential fuzz in ``tests/test_lovins_paicehusk.py``.

Reference quirks, and how we handle each (pinned by the tests):

* "protect" rules (remove-count 0, e.g. ``ss0.`` / ``nee0.``) are meant to
  terminate with the ending intact, but the reference computes
  ``stem[:0 - 0]`` — the EMPTY string — so every protected word stems to
  ``""`` (``stem("seen") == ""``, ``stem("doubtless") == ""``). Replicated
  by default (rank parity beats the paper); pass ``fixed=True`` for the
  published semantics (protect = keep stem, stop).
* a stem with no ``aeiou`` vowel makes the reference's first-vowel scan
  raise ``ValueError`` (``stem("rhythm")``), even when no rule would apply.
  We return the current stem instead — graceful, documented divergence.
* only the leading ``\\w+`` run is stemmed and the REMAINDER IS DROPPED
  (``stem("can't") == "can"``). Replicated.
* one measure-prefix strip (kilo/micro/milli/intra/ultra/mega/nano/pico/
  pseudo) before stemming; the intact flag still refers to the stripped
  form. Replicated.
"""

from __future__ import annotations

import re

# The published default rule table, in the paper's compact notation:
# <reversed ending><'*' if intact-only><chars to remove><append><'.' stop
# or '>' continue>. Order within a final-letter group is significant
# (first match wins).
_RULE_TABLE = """
ai*2. a*1.
bb1.
city3s. ci2> cn1t>
dd1. dei3y> deec2ss. dee1. de2> dooh4>
e1>
feil1v. fi2>
gni3> gai3y. ga2> gg1.
ht*2. hsiug5ct. hsi3>
i*1. i1y>
ji1d. juf1s. ju1d. jo1d. jeh1r. jrev1t. jsim2t. jn1d. j1s.
lbaifi6. lbai4y. lba3> lbi3. lib2l> lc1. lufi4y. luf3> lu2. lai3> lau3>
la2> ll1.
mui3. mu*2. msi3> mm1.
nois4j> noix4ct. noi3> nai3> na2> nee0. ne2> nn1.
pihs4> pp1.
re2> rae0. ra2. ro2> ru2> rr1. rt1> rei3y>
sei3y> sis2. si2> ssen4> ss0. suo3> su*2. s*1> s0.
tacilp4y. ta2> tnem4> tne3> tna3> tpir2b. tpro2b. tcud1. tpmus2. tpec2iv.
tulo2v. tsis0. tsi3> tt1.
uqi3. ugo1.
vis3j> vie0. vi2>
ylb1> yli3y> ylp0. yl2> ygo1. yhp1. ymo1. ypo1. yti3> yte3> ytl2. yrtsi5.
yra3> yro3> yfi3. ycn2t> yca3>
zi2> zy1s.
"""

_MEASURE_PREFIXES = (
    "kilo",
    "micro",
    "milli",
    "intra",
    "ultra",
    "mega",
    "nano",
    "pico",
    "pseudo",
)

_WORD_RUN = re.compile(r"\w+", re.UNICODE)


def _parse_rules(table: str) -> dict[str, list[tuple[str, bool, int, str, bool]]]:
    """Parse the compact notation into {word_last_char: [(forward_ending,
    intact_only, n_remove, append, keep_going), ...]} preserving order."""
    by_last: dict[str, list[tuple[str, bool, int, str, bool]]] = {}
    for tok in table.split():
        i = 0
        while tok[i].isalpha() or tok[i] == "'":
            i += 1
        rev = tok[:i]
        intact = tok[i] == "*"
        if intact:
            i += 1
        j = i
        while tok[j].isdigit():
            j += 1
        n_remove = int(tok[i:j])
        k = j
        while tok[k] not in ".>":
            k += 1
        append = tok[j:k]
        keep_going = tok[k] == ">"
        fwd = rev[::-1]
        by_last.setdefault(fwd[-1], []).append(
            (fwd, intact, n_remove, append, keep_going)
        )
    return by_last


class PaiceHuskStemmer:
    """Rule-driven stemmer; pass a custom table in the paper's compact
    notation, or nothing for the published Lancaster default set."""

    def __init__(self, table: str = _RULE_TABLE, fixed: bool = False):
        self._rules = _parse_rules(table)
        self._fixed = fixed

    @staticmethod
    def _first_vowel_pos(s: str) -> int | None:
        """Position of the first a/e/i/o/u; a 'y' beats it only when it is
        interior (position > 0) and earlier. None when there is no aeiou
        (where the reference raises ValueError)."""
        best = None
        for v in "aeiou":
            p = s.find(v)
            if p != -1 and (best is None or p < best):
                best = p
        if best is None:
            return None
        yp = s.find("y")
        if 0 < yp < best:
            return yp
        return best

    def stem(self, word: str) -> str:
        m = _WORD_RUN.match(word)
        if m is None:
            return word
        s = m.group(0)
        for p in _MEASURE_PREFIXES:
            if s.startswith(p):
                s = s[len(p) :]
                break
        virgin = True
        while True:
            pfv = self._first_vowel_pos(s)
            if pfv is None:
                # reference raises here; we stop stemming instead
                return s
            bucket = self._rules.get(s[-1] if s else "")
            if not bucket:
                return s
            advanced = False
            for ending, intact_only, n_remove, append, keep_going in bucket:
                if not s.endswith(ending):
                    continue
                if intact_only and not virgin:
                    continue
                new_len = len(s) - n_remove + len(append)
                # acceptability: vowel-initial stems keep >=2 chars,
                # consonant-initial keep >=3
                if new_len < (2 if pfv == 0 else 3):
                    continue
                virgin = False
                if n_remove == 0 and self._fixed:
                    return s  # published protect semantics
                # NOTE: n_remove == 0 reproduces the reference's
                # stem[:0] == "" protect quirk on the default path
                s = s[: len(s) - n_remove] + append if n_remove else append
                advanced = keep_going
                break
            if not advanced:
                return s


_default = PaiceHuskStemmer()


def stem(word: str) -> str:
    """Stem ``word`` with the default Lancaster rules (reference-identical
    except where the reference raises — see module docstring)."""
    return _default.stem(word)
