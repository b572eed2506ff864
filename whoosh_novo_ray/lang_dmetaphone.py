"""Double Metaphone phonetic encoding (Lawrence Philips, C/C++ Users
Journal, June 2000; public-domain C source by Kevin Atkinson / aspell).

Fresh implementation as per-letter handler functions over a dispatch table
— each handler maps (padded text, pos, first, last, slavo_germanic) to
(primary_add, secondary_add, advance). The branch conditions ARE the
published algorithm (every public port shares them, incl. the reference's
``lang/dmetaphone.py``); known port quirks are preserved and marked, e.g.
the dead ``text[pos+1:pos+2] == "ER"`` test in the G handler (a length-1
slice can never equal a 2-char string).
"""

from __future__ import annotations

import re
from functools import lru_cache

_VOWELS = frozenset("AEIOUY")

# Port quirk: a few G/GH paths in the published port assign nothing to its
# `next` tuple, so the main loop REPLAYS the previous character's action
# (same emission, same advance). Handlers signal that with _STALE.
_STALE = object()
_SLAVO_RX = re.compile("W|K|CZ|WITZ")
_SILENT_START_RX = re.compile("GN|KN|PN|WR|PS")


def _h_vowel(t, p, first, last, sg):
    if p == first:
        return "A", "A", 1
    return None, None, 1


def _h_b(t, p, first, last, sg):
    return "P", "P", 2 if t[p + 1] == "B" else 1


def _h_c(t, p, first, last, sg):
    if (
        p > first + 1
        and t[p - 2] not in _VOWELS
        and t[p - 1 : p + 2] == "ACH"
        and (t[p + 2] not in ("I", "E") or t[p - 2 : p + 4] in ("BACHER", "MACHER"))
    ):
        return "K", "K", 2
    if p == first and t[first : first + 6] == "CAESAR":
        return "S", "S", 2
    if t[p : p + 4] == "CHIA":
        return "K", "K", 2
    if t[p : p + 2] == "CH":
        if p > first and t[p : p + 4] == "CHAE":
            return "K", "X", 2
        if (
            p == first
            and (
                t[p + 1 : p + 6] in ("HARAC", "HARIS")
                or t[p + 1 : p + 4] in ("HOR", "HYM", "HIA", "HEM")
            )
            and t[first : first + 5] != "CHORE"
        ):
            return "K", "K", 2
        if (
            t[first : first + 4] in ("VAN ", "VON ")
            or t[first : first + 3] == "SCH"
            or t[p - 2 : p + 4] in ("ORCHES", "ARCHIT", "ORCHID")
            or t[p + 2] in ("T", "S")
            or (
                (t[p - 1] in ("A", "O", "U", "E") or p == first)
                and t[p + 2] in ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
            )
        ):
            return "K", "K", 1
        if p > first:
            if t[first : first + 2] == "MC":
                return "K", "K", 2
            return "X", "K", 2
        return "X", "X", 2
    if t[p : p + 2] == "CZ" and t[p - 2 : p + 2] != "WICZ":
        return "S", "X", 2
    if t[p + 1 : p + 4] == "CIA":
        return "X", "X", 3
    if t[p : p + 2] == "CC" and not (p == first + 1 and t[first] == "M"):
        if t[p + 2] in ("I", "E", "H") and t[p + 2 : p + 4] != "HU":
            if (p == first + 1 and t[first] == "A") or t[p - 1 : p + 4] in (
                "UCCEE",
                "UCCES",
            ):
                return "KS", "KS", 3
            return "X", "X", 3
        return "K", "K", 2
    if t[p : p + 2] in ("CK", "CG", "CQ"):
        return "K", "K", 2
    if t[p : p + 2] in ("CI", "CE", "CY"):
        if t[p : p + 3] in ("CIO", "CIE", "CIA"):
            return "S", "X", 2
        return "S", "S", 2
    if t[p + 1 : p + 3] in (" C", " Q", " G"):
        return "K", "K", 3
    if t[p + 1] in ("C", "K", "Q") and t[p + 1 : p + 3] not in ("CE", "CI"):
        return "K", "K", 2
    return "K", "K", 1


def _h_cedilla(t, p, first, last, sg):
    return "S", "S", 1


def _h_d(t, p, first, last, sg):
    if t[p : p + 2] == "DG":
        if t[p + 2] in ("I", "E", "Y"):
            return "J", "J", 3
        return "TK", "TK", 2
    if t[p : p + 2] in ("DT", "DD"):
        return "T", "T", 2
    return "T", "T", 1


def _h_f(t, p, first, last, sg):
    return "F", "F", 2 if t[p + 1] == "F" else 1


def _h_g(t, p, first, last, sg):
    if t[p + 1] == "H":
        if p > first and t[p - 1] not in _VOWELS:
            return "K", "K", 2
        if p < first + 3:
            if p == first:
                if t[p + 2] == "I":
                    return "J", "J", 2
                return "K", "K", 2
            return _STALE  # no assignment in the port: previous action replays
        if (
            (p > first + 1 and t[p - 2] in ("B", "H", "D"))
            or (p > first + 2 and t[p - 3] in ("B", "H", "D"))
            or (p > first + 3 and t[p - 4] in ("B", "H"))
        ):
            return None, None, 2
        if p > first + 2 and t[p - 1] == "U" and t[p - 3] in ("C", "G", "L", "R", "T"):
            return "F", "F", 2
        if p > first and t[p - 1] != "I":
            return "K", "K", 2
        return _STALE  # no assignment in the port: previous action replays
    if t[p + 1] == "N":
        if p == first + 1 and t[first] in _VOWELS and not sg:
            return "KN", "N", 2
        if t[p + 2 : p + 4] != "EY" and t[p + 1] != "Y" and not sg:
            return "N", "KN", 2
        return "KN", "KN", 2
    if t[p + 1 : p + 3] == "LI" and not sg:
        return "KL", "L", 2
    if p == first and (
        t[p + 1] == "Y"
        or t[p + 1 : p + 3]
        in ("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
    ):
        return "K", "J", 2
    # NB: the published port tests t[p+1:p+2] == "ER" here — a dead
    # comparison (1-char slice vs 2 chars); only the Y test can fire
    if (
        t[p + 1] == "Y"
        and t[first : first + 6] not in ("DANGER", "RANGER", "MANGER")
        and t[p - 1] not in ("E", "I")
        and t[p - 1 : p + 2] not in ("RGY", "OGY")
    ):
        return "K", "J", 2
    if t[p + 1] in ("E", "I", "Y") or t[p - 1 : p + 3] in ("AGGI", "OGGI"):
        if (
            t[first : first + 4] in ("VON ", "VAN ")
            or t[first : first + 3] == "SCH"
            or t[p + 1 : p + 3] == "ET"
        ):
            return "K", "K", 2
        if t[p + 1 : p + 5] == "IER ":
            return "J", "J", 2
        return "J", "K", 2
    if t[p + 1] == "G":
        return "K", "K", 2
    return "K", "K", 1


def _h_h(t, p, first, last, sg):
    if (p == first or t[p - 1] in _VOWELS) and t[p + 1] in _VOWELS:
        return "H", "H", 2
    return None, None, 1


def _h_j(t, p, first, last, sg):
    if t[p : p + 4] == "JOSE" or t[first : first + 4] == "SAN ":
        if (p == first and t[p + 4] == " ") or t[first : first + 4] == "SAN ":
            pri, sec = "H", "H"
        else:
            pri, sec = "J", "H"
    elif p == first and t[p : p + 4] != "JOSE":
        pri, sec = "J", "A"
    elif t[p - 1] in _VOWELS and not sg and t[p + 1] in ("A", "O"):
        pri, sec = "J", "H"
    elif p == last:
        pri, sec = "J", " "
    elif t[p + 1] not in ("L", "T", "K", "S", "N", "M", "B", "Z") and t[
        p - 1
    ] not in ("S", "K", "L"):
        pri, sec = "J", "J"
    else:
        pri, sec = None, None
    return pri, sec, 2 if t[p + 1] == "J" else 1


def _h_k(t, p, first, last, sg):
    return "K", "K", 2 if t[p + 1] == "K" else 1


def _h_l(t, p, first, last, sg):
    if t[p + 1] == "L":
        if (p == last - 2 and t[p - 1 : p + 3] in ("ILLO", "ILLA", "ALLE")) or (
            (t[last - 1 : last + 1] in ("AS", "OS") or t[last] in ("A", "O"))
            and t[p - 1 : p + 3] == "ALLE"
        ):
            return "L", "", 2
        return "L", "L", 2
    return "L", "L", 1


def _h_m(t, p, first, last, sg):
    if (
        t[p + 1 : p + 4] == "UMB"
        and (p + 1 == last or t[p + 2 : p + 4] == "ER")
        or t[p + 1] == "M"
    ):
        return "M", "M", 2
    return "M", "M", 1


def _h_n(t, p, first, last, sg):
    return "N", "N", 2 if t[p + 1] == "N" else 1


def _h_enye(t, p, first, last, sg):
    return "N", "N", 1


def _h_p(t, p, first, last, sg):
    if t[p + 1] == "H":
        return "F", "F", 2
    if t[p + 1] in ("P", "B"):
        return "P", "P", 2
    return "P", "P", 1


def _h_q(t, p, first, last, sg):
    return "K", "K", 2 if t[p + 1] == "Q" else 1


def _h_r(t, p, first, last, sg):
    if (
        p == last
        and not sg
        and t[p - 2 : p] == "IE"
        and t[p - 4 : p - 2] not in ("ME", "MA")
    ):
        pri, sec = "", "R"
    else:
        pri, sec = "R", "R"
    return pri, sec, 2 if t[p + 1] == "R" else 1


def _h_s(t, p, first, last, sg):
    if t[p - 1 : p + 2] in ("ISL", "YSL"):
        return None, None, 1
    if p == first and t[first : first + 5] == "SUGAR":
        return "X", "S", 1
    if t[p : p + 2] == "SH":
        if t[p + 1 : p + 5] in ("HEIM", "HOEK", "HOLM", "HOLZ"):
            return "S", "S", 2
        return "X", "X", 2
    if t[p : p + 3] in ("SIO", "SIA") or t[p : p + 4] == "SIAN":
        if not sg:
            return "S", "X", 3
        return "S", "S", 3
    if (p == first and t[p + 1] in ("M", "N", "L", "W")) or t[p + 1] == "Z":
        return "S", "X", 2 if t[p + 1] == "Z" else 1
    if t[p : p + 2] == "SC":
        if t[p + 2] == "H":
            if t[p + 3 : p + 5] in ("OO", "ER", "EN", "UY", "ED", "EM"):
                if t[p + 3 : p + 5] in ("ER", "EN"):
                    return "X", "SK", 3
                return "SK", "SK", 3
            if p == first and t[first + 3] not in _VOWELS and t[first + 3] != "W":
                return "X", "S", 3
            return "X", "X", 3
        if t[p + 2] in ("I", "E", "Y"):
            return "S", "S", 3
        return "SK", "SK", 3
    if p == last and t[p - 2 : p] in ("AI", "OI"):
        return "", "S", 1
    return "S", "S", 2 if t[p + 1] in ("S", "Z") else 1


def _h_t(t, p, first, last, sg):
    if t[p : p + 4] == "TION":
        return "X", "X", 3
    if t[p : p + 3] in ("TIA", "TCH"):
        return "X", "X", 3
    if t[p : p + 2] == "TH" or t[p : p + 3] == "TTH":
        if (
            t[p + 2 : p + 4] in ("OM", "AM")
            or t[first : first + 4] in ("VON ", "VAN ")
            or t[first : first + 3] == "SCH"
        ):
            return "T", "T", 2
        return "0", "T", 2
    if t[p + 1] in ("T", "D"):
        return "T", "T", 2
    return "T", "T", 1


def _h_v(t, p, first, last, sg):
    return "F", "F", 2 if t[p + 1] == "V" else 1


def _h_w(t, p, first, last, sg):
    if t[p : p + 2] == "WR":
        return "R", "R", 2
    if p == first and (t[p + 1] in _VOWELS or t[p : p + 2] == "WH"):
        if t[p + 1] in _VOWELS:
            return "A", "F", 1
        return "A", "A", 1
    if (
        (p == last and t[p - 1] in _VOWELS)
        or t[p - 1 : p + 5] in ("EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or t[first : first + 3] == "SCH"
    ):
        return "", "F", 1
    if t[p : p + 4] in ("WICZ", "WITZ"):
        return "TS", "FX", 4
    return None, None, 1


def _h_x(t, p, first, last, sg):
    if p == last and (
        t[p - 3 : p] in ("IAU", "EAU") or t[p - 2 : p] in ("AU", "OU")
    ):
        pri = sec = None
    else:
        pri = sec = "KS"
    return pri, sec, 2 if t[p + 1] in ("C", "X") else 1


def _h_z(t, p, first, last, sg):
    if t[p + 1] == "H":
        pri, sec = "J", "J"
    elif t[p + 1 : p + 3] in ("ZO", "ZI", "ZA") or (
        sg and p > first and t[p - 1] != "T"
    ):
        pri, sec = "S", "TS"
    else:
        pri, sec = "S", "S"
    return pri, sec, 2 if t[p + 1] == "Z" else 1


_HANDLERS = {
    **{v: _h_vowel for v in "AEIOUY"},
    "B": _h_b,
    "C": _h_c,
    "\xc7": _h_cedilla,
    "D": _h_d,
    "F": _h_f,
    "G": _h_g,
    "H": _h_h,
    "J": _h_j,
    "K": _h_k,
    "L": _h_l,
    "M": _h_m,
    "N": _h_n,
    "\xd1": _h_enye,
    "P": _h_p,
    "Q": _h_q,
    "R": _h_r,
    "S": _h_s,
    "T": _h_t,
    "V": _h_v,
    "W": _h_w,
    "X": _h_x,
    "Z": _h_z,
}


def _default(t, p, first, last, sg):
    return None, None, 1


@lru_cache(maxsize=50000)
def double_metaphone(word: str) -> tuple[str, str | None]:
    """(primary, secondary) codes; secondary is None when identical."""
    text = word.upper()
    sg = bool(_SLAVO_RX.search(text))
    length = len(text)
    text = "--" + text + "     "
    first = pos = 2
    last = first + length - 1
    if _SILENT_START_RX.match(text, pos):
        pos += 1
    pri: list[str] = []
    sec: list[str] = []
    prev = (None, None, 0)  # an initial _STALE replays a no-op (port: empty tuple)
    while pos < length + 2:
        res = _HANDLERS.get(text[pos], _default)(text, pos, first, last, sg)
        if res is _STALE:
            res = prev
        p, s, adv = res
        if p:
            pri.append(p)
        if s:
            sec.append(s)
        if adv == 0:
            break  # the port would loop forever here; we terminate
        pos += adv
        prev = res
    primary = "".join(pri)
    secondary = "".join(sec)
    return (primary, None) if primary == secondary else (primary, secondary)


def dmetaphone_tokens(
    tokens,
    primary_boost: float = 1.0,
    secondary_boost: float = 0.5,
    combine: bool = False,
) -> list[tuple[str, float]]:
    """DoubleMetaphoneFilter analog (reference analysis/morph.py:245-304):
    (text, boost) pairs — primary code per token, secondary code (when it
    differs) at ``secondary_boost``; ``combine`` keeps the original token
    first. Input may be plain strings or (text, boost) pairs."""
    out: list[tuple[str, float]] = []
    for tok in tokens:
        text, boost = tok if isinstance(tok, tuple) else (tok, 1.0)
        if combine:
            out.append((text, boost))
        primary, secondary = double_metaphone(text)
        if primary:
            out.append((primary, boost * primary_boost))
        if secondary:
            out.append((secondary, boost * secondary_boost))
    return out
