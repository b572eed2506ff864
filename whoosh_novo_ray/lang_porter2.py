"""Porter2 ("snowball English") stemmer, standalone.

Fresh implementation of the published algorithm
(http://snowball.tartarus.org/algorithms/english/stemmer.html): exception
lists, Y-marking, R1/R2 regions, steps 0/1a/1b/1c/2/3/4/5, then Y
normalization.

Behavior-parity target: ``/root/reference/src/whoosh/lang/porter2.py``
(``stem()``) — verified word-for-word by the differential fuzz in
``tests/test_porter2.py``. That implementation deviates from the official
Snowball description in a few ways, and parity beats the spec here; each
quirk is replicated and pinned by the tests:

* **R1/R2 are computed BEFORE step 0** (on the Y-marked word, apostrophes
  included), not after the apostrophe suffixes are removed, so ``'s``
  endings count toward the regions (reference ``stem()``, porter2.py:328-331).
* **Y-marking is a non-overlapping left-to-right scan** (reference uses one
  ``re.sub``): in ``ayy`` only the first ``y`` is marked — the official rule
  would also mark the second (``y`` is a vowel) (porter2.py:64-67).
* **First matching suffix wins in steps 2/3/4** even when its region check
  then fails — the word is returned unchanged rather than trying shorter
  suffixes (porter2.py:149-158,197-206,251-262). The suffix TABLES and their
  order are the reference's.
* step 1a's trailing-``s`` rule keeps the word when the only vowel is
  immediately before the ``s`` (``gas`` → ``gas``), per the official spec —
  the reference implements this with a ``[aeiouy].`` search; we check it
  positionally (porter2.py:17,90-94).
* ``is_short_word`` / region helpers are invoked on intermediate words, so
  the ``gener``/``arsen``/``commun`` R1 prefix exceptions apply there too
  (porter2.py:21-26).

One graceful divergence (unreachable in practice, asserted by the fuzz): the
reference's step 1c indexes ``word[-2]`` before checking ``len > 2``
(porter2.py:141-146); we check the length first. No input that survives the
``len <= 2`` early exit can reach step 1c as a single character, so the two
never disagree on reachable words.
"""

from __future__ import annotations

_VOWELS = "aeiouy"  # marked consonant-Y is uppercase, so it's excluded


def _region_after(word: str, pos: int) -> int:
    """Index just past the first non-vowel that follows the first vowel run
    at/after ``pos`` (the snowball region rule); ``len(word)`` if none."""
    n = len(word)
    i = pos
    while i < n and word[i] not in _VOWELS:
        i += 1
    while i < n and word[i] in _VOWELS:
        i += 1
    if i >= n:
        return n
    return i + 1


def _r1(word: str) -> int:
    # published exceptional prefixes
    if word.startswith("gener") or word.startswith("arsen"):
        return 5
    if word.startswith("commun"):
        return 6
    return _region_after(word, 0)


def _r2(word: str) -> int:
    return _region_after(word, _r1(word))


def _ends_short_syllable(word: str) -> bool:
    if len(word) == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    return (
        len(word) >= 3
        and word[-3] not in _VOWELS
        and word[-2] in _VOWELS
        and word[-1] not in "aeiouywxY"
    )


def _is_short(word: str) -> bool:
    return _ends_short_syllable(word) and _r1(word) == len(word)


def _mark_ys(word: str) -> str:
    """Uppercase consonant-role ys: an initial y, and (non-overlapping,
    left to right) any y directly after an unmarked vowel."""
    if word.startswith("y"):
        word = "Y" + word[1:]
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        c = word[i]
        out.append(c)
        if c in _VOWELS and i + 1 < n and word[i + 1] == "y":
            out.append("Y")
            i += 2
        else:
            i += 1
    return "".join(out)


def _step0(word: str) -> str:
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            return word[: -len(suf)]
    return word


def _step1a(word: str) -> str:
    if word.endswith("sses"):
        return word[:-2]
    if word.endswith("ied") or word.endswith("ies"):
        return word[:-3] + ("i" if len(word) > 4 else "ie")
    if word.endswith("us") or word.endswith("ss"):
        return word
    if word.endswith("s"):
        # delete if some vowel precedes it NOT immediately before the s
        stem_part = word[:-1]
        if any(c in _VOWELS for c in stem_part[:-1]):
            return stem_part
    return word


_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")


def _step1b(word: str, r1: int) -> str:
    if word.endswith("eedly"):
        return word[:-3] if len(word) - 5 >= r1 else word
    if word.endswith("eed"):
        return word[:-1] if len(word) - 3 >= r1 else word
    for suf in ("ed", "edly", "ing", "ingly"):
        if word.endswith(suf):
            base = word[: -len(suf)]
            if not any(c in _VOWELS for c in base):
                return word
            if base.endswith(("at", "bl", "iz")):
                return base + "e"
            if base.endswith(_DOUBLES):
                return base[:-1]
            if _is_short(base):
                return base + "e"
            return base
    return word


def _step1c(word: str) -> str:
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        return word[:-1] + "i"
    return word


# (suffix, replacement, required chars just before the suffix — empty =
# unconditional). Order is the reference's scan order; first endswith match
# decides, even when its R1/prev check then fails.
_STEP2 = (
    ("ization", "ize", ""),
    ("ational", "ate", ""),
    ("fulness", "ful", ""),
    ("ousness", "ous", ""),
    ("iveness", "ive", ""),
    ("tional", "tion", ""),
    ("biliti", "ble", ""),
    ("lessli", "less", ""),
    ("entli", "ent", ""),
    ("ation", "ate", ""),
    ("alism", "al", ""),
    ("aliti", "al", ""),
    ("ousli", "ous", ""),
    ("iviti", "ive", ""),
    ("fulli", "ful", ""),
    ("enci", "ence", ""),
    ("anci", "ance", ""),
    ("abli", "able", ""),
    ("izer", "ize", ""),
    ("ator", "ate", ""),
    ("alli", "al", ""),
    ("bli", "ble", ""),
    ("ogi", "og", "l"),
    ("li", "", "cdeghkmnrt"),
)


def _step2(word: str, r1: int) -> str:
    for suf, repl, prev in _STEP2:
        if word.endswith(suf):
            base = word[: -len(suf)]
            if len(base) >= r1 and (not prev or (base and base[-1] in prev)):
                attempt = base + repl
                # the reference tests the result's TRUTHINESS, so an empty
                # result would fall through to later suffixes; mirror it
                if attempt:
                    return attempt
                continue
            return word
    return word


_STEP3 = (
    ("ational", "ate", False),
    ("tional", "tion", False),
    ("alize", "al", False),
    ("icate", "ic", False),
    ("iciti", "ic", False),
    ("ative", "", True),
    ("ical", "ic", False),
    ("ness", "", False),
    ("ful", "", False),
)


def _step3(word: str, r1: int, r2: int) -> str:
    for suf, repl, need_r2 in _STEP3:
        if word.endswith(suf):
            base = word[: -len(suf)]
            if len(base) >= r1 and (not need_r2 or len(base) >= r2):
                attempt = base + repl
                if attempt:
                    return attempt
                continue
            return word
    return word


_STEP4 = (
    "al",
    "ance",
    "ence",
    "er",
    "ic",
    "able",
    "ible",
    "ant",
    "ement",
    "ment",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
)


def _step4(word: str, r2: int) -> str:
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                return word[: -len(suf)]
            return word
    if (word.endswith("sion") or word.endswith("tion")) and len(word) - 3 >= r2:
        return word[:-3]
    return word


def _step5(word: str, r1: int, r2: int) -> str:
    if word.endswith("l"):
        if len(word) - 1 >= r2 and word[-2] == "l":
            return word[:-1]
        return word
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            return word[:-1]
        if len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            return word[:-1]
    return word


_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTIONS_POST_1A = frozenset(
    (
        "inning",
        "outing",
        "canning",
        "herring",
        "earring",
        "proceed",
        "exceed",
        "succeed",
    )
)


def stem(word: str) -> str:
    """Porter2 stem of ``word`` (expects lowercase input, like the
    reference)."""
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]
    hit = _EXCEPTIONS.get(word)
    if hit is not None:
        return hit
    word = _mark_ys(word)
    r1 = _r1(word)
    r2 = _r2(word)
    word = _step0(word)
    word = _step1a(word)
    if word in _EXCEPTIONS_POST_1A:
        return word
    word = _step1b(word, r1)
    word = _step1c(word)
    word = _step2(word, r1)
    word = _step3(word, r1, r2)
    word = _step4(word, r2)
    word = _step5(word, r1, r2)
    return word.replace("Y", "y")
