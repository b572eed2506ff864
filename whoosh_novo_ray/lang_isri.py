"""ISRI Arabic stemmer (Taghva, Elkhoury & Coombs 2005) — root extraction
without a root dictionary.

Fresh functional implementation of the published algorithm, matched against
the reference engine's NLTK-derived port (de-odex/whoosh-novo
``src/whoosh/lang/isri.py``) including its quirks:

* ``pre32``'s interleaved prefix order (each unmatched length-3 prefix
  retries every length-2 prefix before the next length-3 one);
* ``pro_w64``'s ``(stm[0] and stm[4]) == alif`` — Python evaluates this as
  ``stm[4] == alif`` only (the first operand is a truthy 1-char string), so
  the intended two-position check degenerates to one;
* the stop-word exclusion list and the norm(1)/norm(2) ordering.
"""

from __future__ import annotations

import re
from functools import lru_cache

_P3 = ("كال", "بال", "ولل", "وال")
_P2 = ("ال", "لل")
_P1 = ("ل", "ب", "ف", "س", "و", "ي", "ت", "ن", "ا")
_S3 = ("تمل", "همل", "تان", "تين", "كمل")
_S2 = (
    "ون", "ات", "ان", "ين",
    "تن", "كم", "هن", "نا",
    "يا", "ها", "تم", "كن",
    "ني", "وا", "ما", "هم",
)
_S1 = ("ة", "ه", "ي", "ك", "ت", "ا", "ن")
_PR4 = {
    0: ("م",),
    1: ("ا",),
    2: ("ا", "و", "ي"),
    3: ("ة",),
}
_PR53 = {
    0: ("ا", "ت"),
    1: ("ا", "ي", "و"),
    2: ("ا", "ت", "م"),
    3: ("م", "ي", "ت"),
    4: ("م", "ت"),
    5: ("ا", "و"),
    6: ("ا", "م"),
}
_RE_SHORT_VOWELS = re.compile("[ً-ْ]")
_RE_INITIAL_HAMZA = re.compile("^[آأإ]")
_ALIF = "ا"
_STOPS = frozenset(
    (
        "يكون", "وليس",
        "وكان", "كذلك",
        "التي", "وبين",
        "عليها", "مساء",
        "الذي", "وكانت",
        "ولكن", "والتي",
        "تكون", "اليوم",
        "اللذين", "عليه",
        "كانت", "لذلك",
        "أمام", "هناك",
        "منها", "مازال",
        "لازال",
        "لايزال",
        "مايزال",
        "اصبح", "أصبح",
        "أمسى", "امسى",
        "أضحى", "اضحى",
        "مابرح", "مافتئ",
        "ماانفك",
        "لاسيما",
        "ولايزال",
        "الحالي",
        "اليها",
        "الذين", "فانه",
        "والذي", "وهذا",
        "لهذا", "فكان",
        "ستكون", "اليه",
        "يمكن", "بهذا",
        "الذى",
    )
)


def _pre32(s: str) -> str:
    # the port's interleaved order: each length-3 prefix that fails retries
    # every length-2 prefix before moving on
    if len(s) >= 6:
        for p3 in _P3:
            if s.startswith(p3):
                return s[3:]
            if len(s) >= 5:
                for p2 in _P2:
                    if s.startswith(p2):
                        return s[2:]
    return s


def _suf32(s: str) -> str:
    if len(s) >= 6:
        for s3 in _S3:
            if s.endswith(s3):
                return s[:-3]
            if len(s) >= 5:
                for s2 in _S2:
                    if s.endswith(s2):
                        return s[:-2]
    return s


def _suf1(s: str) -> str:
    for sf in _S1:
        if s.endswith(sf):
            return s[:-1]
    return s


def _pre1(s: str) -> str:
    for sp in _P1:
        if s.startswith(sp):
            return s[1:]
    return s


def _pro_w4(s: str) -> str:
    if s[0] in _PR4[0]:
        return s[1:]
    if s[1] in _PR4[1]:
        return s[0] + s[2:]
    if s[2] in _PR4[2]:
        return s[:2] + s[3]
    if s[3] in _PR4[3]:
        return s[:-1]
    s = _suf1(s)
    if len(s) == 4:
        s = _pre1(s)
    return s


def _pro_w53(s: str) -> str:
    if s[2] in _PR53[0] and s[0] == _ALIF:
        return s[1] + s[3:]
    if s[3] in _PR53[1] and s[0] == "م":
        return s[1:3] + s[4]
    if s[0] in _PR53[2] and s[4] == "ة":
        return s[1:4]
    if s[0] in _PR53[3] and s[2] == "ت":
        return s[1] + s[3:]
    if s[0] in _PR53[4] and s[2] == _ALIF:
        return s[1] + s[3:]
    if s[2] in _PR53[5] and s[4] == "ة":
        return s[:2] + s[3]
    if s[0] in _PR53[6] and s[1] == "ن":
        return s[2:]
    if s[3] == _ALIF and s[0] == _ALIF:
        return s[1:3] + s[4]
    if s[4] == "ن" and s[3] == _ALIF:
        return s[:3]
    if s[3] == "ي" and s[0] == "ت":
        return s[1:3] + s[4]
    if s[3] == "و" and s[1] == _ALIF:
        return s[0] + s[2] + s[4]
    if s[2] == _ALIF and s[1] == "و":
        return s[0] + s[3:]
    if s[3] == "ئ" and s[2] == _ALIF:
        return s[:2] + s[4]
    if s[4] == "ة" and s[1] == _ALIF:
        return s[0] + s[2:4]
    if s[4] == "ي" and s[2] == _ALIF:
        return s[:2] + s[3]
    s = _suf1(s)
    if len(s) == 5:
        s = _pre1(s)
    return s


def _pro_w54(s: str) -> str:
    if s[0] in _PR53[2]:
        return s[1:]
    if s[4] == "ة":
        return s[:4]
    if s[2] == _ALIF:
        return s[:2] + s[3:]
    return s


def _end_w5(s: str) -> str:
    if len(s) == 4:
        return _pro_w4(s)
    if len(s) == 5:
        return _pro_w54(s)
    return s


def _pro_w6(s: str) -> str:
    if s.startswith("است") or s.startswith("مست"):
        return s[3:]
    if s[0] == "م" and s[3] == _ALIF and s[5] == "ة":
        return s[1:3] + s[4]
    if s[0] == _ALIF and s[2] == "ت" and s[4] == _ALIF:
        return s[1] + s[3] + s[5]
    if s[0] == _ALIF and s[3] == "و" and s[2] == s[4]:
        return s[1] + s[4:]
    if s[0] == "ت" and s[2] == _ALIF and s[4] == "ي":
        return s[1] + s[3] + s[5]
    s = _suf1(s)
    if len(s) == 6:
        s = _pre1(s)
    return s


def _pro_w64(s: str) -> str:
    # port quirk: "(stm[0] and stm[4]) == alif" only tests stm[4]
    if s[4] == _ALIF:
        return s[1:4] + s[5]
    if s.startswith("مت"):
        return s[2:]
    return s


def _end_w6(s: str) -> str:
    if len(s) == 5:
        s = _pro_w53(s)
        s = _end_w5(s)
        return s
    if len(s) == 6:
        return _pro_w64(s)
    return s


@lru_cache(maxsize=50000)
def stem_ar(token: str) -> str:
    """ISRI root extraction for an Arabic token."""
    s = _RE_SHORT_VOWELS.sub("", token)  # norm(1)
    if s in _STOPS:
        return s
    s = _pre32(s)
    s = _suf32(s)
    # connective waw before waw-initial word
    if len(s) >= 4 and s[:2] == "وو":
        s = s[1:]
    s = _RE_INITIAL_HAMZA.sub(_ALIF, s)  # norm(2)
    if len(s) <= 3:
        return s
    if len(s) == 4:
        return _pro_w4(s)
    if len(s) == 5:
        s = _pro_w53(s)
        return _end_w5(s)
    if len(s) == 6:
        s = _pro_w6(s)
        return _end_w6(s)
    if len(s) == 7:
        s = _suf1(s)
        if len(s) == 7:
            s = _pre1(s)
        if len(s) == 6:
            s = _pro_w6(s)
            return _end_w6(s)
    return s
