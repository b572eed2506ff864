"""Quasi-phonetic encoders (English/Spanish/Arabic soundex variants).

Fresh implementations of the published recipes the reference vendors in
``lang/phonetic.py`` (ActiveState recipe 52213, Ferreyra's Spanish coder,
Koujan's Arabic soundex), behavior-matched including quirks: the Arabic
coder reuses the PREVIOUS character's code for uncoded characters and
raises when the first processed character is uncoded (the port's unbound
``code``)."""

from __future__ import annotations

import re

_EN_CODES = "01230120022455012623010202"


def soundex_en(word: str) -> str:
    out = []
    first_alpha = None
    prev = None
    for ch in word.lower():
        o = ord(ch)
        if 97 <= o <= 122:
            if first_alpha is None:
                first_alpha = ch
            code = _EN_CODES[o - 97]
            if code != prev:
                out.append(code)
            prev = code
    if first_alpha is None:
        return ""
    return first_alpha + "".join(out)[1:]


_ES_RULES = tuple(
    (re.compile(pat), repl)
    for pat, repl in (
        (r"\Aw?[uh]?([aeiou])", ""),
        (r"c[eiéí]|z|ll|sh|ch|sch|cc|y[aeiouáéíóú]|ps|bs|x|j|g[eiéí]", "s"),
        (r"[aeiouhwáéíóúü]+", ""),
        (r"y", ""),
        (r"ñ|gn", "n"),
        (r"[dpc]t", "t"),
        (r"c[aouáóú]|ck|q", "k"),
        (r"v", "b"),
        (r"d$", "t"),
    )
)


def soundex_esp(word: str) -> str:
    word = word.lower()
    out = []
    prev = None
    i = 0
    while i < len(word):
        code = None
        for rx, repl in _ES_RULES:
            m = rx.match(word, i)
            if m:
                i = m.end()
                code = repl
                break
        if code is None:
            code = word[i]
            i += 1
        if code != prev:
            out.append(code)
        prev = code
    return "".join(out)


_AR_CODES = {}
for _chars, _code in {
    "اأإآحخهعغشوي": "0",
    "فب": "1",
    "جزسصظقك": "2",
    "تثدذضط": "3",
    "ل": "4",
    "من": "5",
    "ر": "6",
}.items():
    for _c in _chars:
        _AR_CODES[_c] = _code


def soundex_ar(word: str) -> str:
    if word[0] in "اأإآ":
        word = word[1:]
    out = ["0"]
    prev = "0"
    code = None
    if len(word) > 1:
        for ch in word[1:]:
            if ch in _AR_CODES:
                code = _AR_CODES[ch]
            if code is None:
                # the reference's `code` is unbound here and raises
                raise NameError("first processed character has no code")
            if code != prev and code != "0":
                out.append(code)
            prev = code
    return "".join(out)
