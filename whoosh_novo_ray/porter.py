"""Porter stemmer, matching the canonical tartarus.org reference port.

This follows the widely-circulated regex formulation of Porter's 1980
algorithm (M. Porter, https://tartarus.org/martin/PorterStemmer/ — the same
public formulation the reference engine's ``lang/porter.py`` derives from),
including that formulation's well-known quirks:

* the "double consonant -> single" and "add e after short stem" conditions in
  step 1b are ANCHORED matches, so they only fire on 2-3 letter stems;
* step 1a removes a trailing ``s`` only when not preceded by another ``s``;
* a leading ``y`` is shielded during processing.

Differential tests assert word-for-word agreement with the reference's
stemmer over thousands of words.
"""

from __future__ import annotations

import re
from functools import lru_cache

_C = "[^aeiouy]+"  # consonant sequence (y counts as vowel here)
_V5 = "[aeiou]+"  # vowel sequence (strict five)

# measure predicates over a candidate stem
_HAS_M_GT0 = re.compile(f"^({_C})?{_V5}{_C}")
_HAS_M_EQ1 = re.compile(f"^({_C})?{_V5}{_C}({_V5})?$")
_HAS_M_GT1 = re.compile(f"^({_C})?{_V5}{_C}{_V5}{_C}")
_HAS_VOWEL = re.compile(f"^({_C})?[aeiouy]")
_SHORT_CVC = re.compile(f"^{_C}[aeiouy][^aeiouwxy]$")

_ED_ING = re.compile("^(.*)(ed|ing)$")
_EXACT_AT_BL_IZ = re.compile("(at|bl|iz)$")
_ANCHORED_DOUBLE = re.compile("([^aeiouylsz])\\1$")

_SUF2 = {
    "ational": "ate", "tional": "tion", "enci": "ence", "anci": "ance",
    "izer": "ize", "bli": "ble", "alli": "al", "entli": "ent", "eli": "e",
    "ousli": "ous", "ization": "ize", "ation": "ate", "ator": "ate",
    "alism": "al", "iveness": "ive", "fulness": "ful", "ousness": "ous",
    "aliti": "al", "iviti": "ive", "biliti": "ble", "logi": "log",
}
_SUF3 = {
    "icate": "ic", "ative": "", "alize": "al", "iciti": "ic",
    "ical": "ic", "ful": "", "ness": "",
}
_RX2 = re.compile("^(.+?)(" + "|".join(_SUF2) + ")$")
_RX3 = re.compile("^(.+?)(" + "|".join(_SUF3) + ")$")
_RX4A = re.compile(
    "^(.+?)(al|ance|ence|er|ic|able|ible|ant|ement|ment|ent|ou|ism|ate|iti"
    "|ous|ive|ize)$"
)
_RX4B = re.compile("^(.+?)(s|t)(ion)$")
_RX5 = re.compile("^(.+?)e$")


@lru_cache(maxsize=50000)
def stem(w: str) -> str:
    if len(w) < 3:
        return w

    shield_y = w[0] == "y"
    if shield_y:
        w = "Y" + w[1:]

    # Step 1a: plurals
    if w.endswith("s"):
        if w.endswith(("sses", "ies")):
            w = w[:-2]
        elif w[-2] != "s":
            w = w[:-1]

    # Step 1b: -eed / -ed / -ing
    if w.endswith("eed"):
        if _HAS_M_GT0.match(w[:-3]):
            w = w[:-1]
    else:
        m = _ED_ING.match(w)
        if m and _HAS_VOWEL.match(m.group(1)):
            w = m.group(1)
            if _EXACT_AT_BL_IZ.match(w):
                w += "e"
            elif _ANCHORED_DOUBLE.match(w):
                w = w[:-1]
            elif _SHORT_CVC.match(w):
                w += "e"

    # Step 1c: terminal y -> i
    if w.endswith("y") and _HAS_VOWEL.match(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    m = _RX2.match(w)
    if m and _HAS_M_GT0.match(m.group(1)):
        w = m.group(1) + _SUF2[m.group(2)]

    # Step 3
    m = _RX3.match(w)
    if m and _HAS_M_GT0.match(m.group(1)):
        w = m.group(1) + _SUF3[m.group(2)]

    # Step 4
    m = _RX4A.match(w)
    if m:
        if _HAS_M_GT1.match(m.group(1)):
            w = m.group(1)
    else:
        m = _RX4B.match(w)
        if m:
            cand = m.group(1) + m.group(2)
            if _HAS_M_GT1.match(cand):
                w = cand

    # Step 5a: terminal e
    m = _RX5.match(w)
    if m:
        cand = m.group(1)
        if _HAS_M_GT1.match(cand) or (
            _HAS_M_EQ1.match(cand) and not _SHORT_CVC.match(cand)
        ):
            w = cand

    # Step 5b: -ll with m > 1
    if w.endswith("ll") and _HAS_M_GT1.match(w):
        w = w[:-1]

    if shield_y:
        w = "y" + w[1:]
    return w
