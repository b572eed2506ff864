"""Snowball stemmers: German, Danish, Norwegian, Swedish, Dutch.

Fresh implementations of Dr. Martin Porter's published Snowball algorithms
(https://snowballstem.org/algorithms/), matched behavior-for-behavior against
the reference engine's NLTK-derived ports (de-odex/whoosh-novo
``src/whoosh/lang/snowball/{german,danish,norwegian,swedish,dutch}.py``) including
the ports' quirks — differential suites in ``tests/test_snowball.py`` keep
them word-for-word identical. Each stemmer is a plain function over integer
region offsets (R1/R2 as indices, not string slices) with an LRU cache.
"""

from __future__ import annotations

from functools import lru_cache

_DE_VOWELS = "aeiouy\xe4\xf6\xfc"
_SCAND_VOWELS = "aeiouy\xe6\xe5\xf8"
_SV_VOWELS = "aeiouy\xe4\xe5\xf6"


def _r1_start(word: str, vowels: str) -> int:
    """Offset of R1 (after the first non-vowel that follows a vowel)."""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return i + 1
    return len(word)


def _r1_scand_start(word: str, vowels: str) -> int:
    """Scandinavian R1: standard R1, but at least 3 letters before it."""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return max(i + 1, 3)
    return len(word)


def _ends_in(word: str, region_start: int, suffix: str) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= region_start


# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------

_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"
_DE_STEP1 = ("ern", "em", "er", "en", "es", "e", "s")
_DE_STEP2 = ("est", "en", "er", "st")
_DE_STEP3 = ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")


@lru_cache(maxsize=50000)
def stem_de(word: str) -> str:
    word = word.lower().replace("\xdf", "ss")
    # protect u/y between vowels; the left-neighbour check sees the ALREADY
    # protected char (uppercase = no longer a vowel), so consecutive u/y
    # runs don't chain-protect — the reference port mutates in-place and
    # has the same behavior
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "uy"
            and chars[i - 1] in _DE_VOWELS
            and word[i + 1] in _DE_VOWELS
        ):
            chars[i] = chars[i].upper()
    word = "".join(chars)

    r1 = _r1_start(word, _DE_VOWELS)
    r2 = r1 + _r1_start(word[r1:], _DE_VOWELS) if r1 < len(word) else len(word)
    # R1 adjusted: at least 3 letters before it
    r1 = max(r1, 3) if r1 < len(word) else r1
    r1 = min(r1, len(word))
    r2 = min(max(r2, r1), len(word))

    # step 1
    for suf in _DE_STEP1:
        if _ends_in(word, r1, suf):
            if suf in ("en", "es", "e") and word[-len(suf) - 4 : -len(suf)] == "niss":
                word = word[: -len(suf) - 1]
            elif suf == "s":
                if word[-2] in _DE_S_END:
                    word = word[:-1]
            else:
                word = word[: -len(suf)]
            break

    # step 2
    for suf in _DE_STEP2:
        if _ends_in(word, r1, suf):
            if suf == "st":
                if word[-3] in _DE_ST_END and len(word) >= 6:
                    word = word[:-2]
            else:
                word = word[: -len(suf)]
            break

    # step 3 (derivational), conditions over the R1/R2 regions
    def in_r2(suffix):
        return _ends_in(word, r2, suffix)

    # NB: the 'e'/'ig'/'lich' context tests below are against the R2/R1
    # REGION, not the word — a context character outside the region makes
    # the test vacuously pass/fail exactly as an empty slice would in the
    # reference's r1/r2 string slicing.
    def region_eq(r_start, lo, hi, s):
        """word[lo:hi] == s AND that slice lies inside the region."""
        return len(word) + lo >= r_start and word[lo:hi] == s

    for suf in _DE_STEP3:
        if in_r2(suf):
            n = len(suf)
            if suf in ("end", "ung"):
                if region_eq(r2, -n - 2, -n, "ig") and not region_eq(
                    r2, -n - 3, -n - 2, "e"
                ):
                    word = word[: -n - 2]
                else:
                    word = word[: -n]
            elif suf in ("ig", "ik", "isch"):
                if not region_eq(r2, -n - 1, -n, "e"):
                    word = word[: -n]
            elif suf in ("lich", "heit"):
                if region_eq(r1, -n - 2, -n, "er") or region_eq(
                    r1, -n - 2, -n, "en"
                ):
                    word = word[: -n - 2]
                else:
                    word = word[: -n]
            elif suf == "keit":
                if region_eq(r2, -n - 4, -n, "lich"):
                    word = word[: -n - 4]
                elif region_eq(r2, -n - 2, -n, "ig"):
                    word = word[: -n - 2]
                else:
                    word = word[: -n]
            break

    return (
        word.replace("\xe4", "a")
        .replace("\xf6", "o")
        .replace("\xfc", "u")
        .replace("U", "u")
        .replace("Y", "y")
    )


# ---------------------------------------------------------------------------
# Danish
# ---------------------------------------------------------------------------

_DA_S_END = "abcdfghjklmnoprtvyz\xe5"
_DA_STEP1 = (
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e", "s",
)
_DA_STEP2 = ("gd", "dt", "gt", "kt")
_DA_STEP3 = ("elig", "l\xf8st", "lig", "els", "ig")
_DA_DOUBLES = tuple(c + c for c in "bcdfghjklmnpqrstvwxz")


@lru_cache(maxsize=50000)
def stem_da(word: str) -> str:
    word = word.lower()
    r1 = _r1_scand_start(word, _SCAND_VOWELS)

    for suf in _DA_STEP1:
        if _ends_in(word, r1, suf):
            if suf == "s":
                if word[-2] in _DA_S_END:
                    word = word[:-1]
            else:
                word = word[: -len(suf)]
            break

    for suf in _DA_STEP2:
        if _ends_in(word, r1, suf):
            word = word[:-1]
            break

    if _ends_in(word, r1, "igst"):
        word = word[:-2]

    for suf in _DA_STEP3:
        if _ends_in(word, r1, suf):
            if suf == "l\xf8st":
                word = word[:-1]
            else:
                word = word[: -len(suf)]
                if any(_ends_in(word, r1, s2) for s2 in _DA_STEP2):
                    word = word[:-1]
            break

    for dc in _DA_DOUBLES:
        if word.endswith(dc) and len(word) > 3:
            word = word[:-1]
            break
    return word


# ---------------------------------------------------------------------------
# Norwegian
# ---------------------------------------------------------------------------

_NO_S_END = "bcdfghjlmnoprtvyz"
_NO_STEP1 = (
    "hetenes", "hetene", "hetens", "heter", "heten", "endes", "ande",
    "ende", "edes", "enes", "erte", "ede", "ane", "ene", "ens", "ers",
    "ets", "het", "ast", "ert", "en", "ar", "er", "as", "es", "et",
    "a", "e", "s",
)
_NO_STEP2 = ("dt", "vt")
_NO_STEP3 = (
    "hetslov", "eleg", "elig", "elov", "slov", "leg", "eig", "lig",
    "els", "lov", "ig",
)


@lru_cache(maxsize=50000)
def stem_no(word: str) -> str:
    word = word.lower()
    r1 = _r1_scand_start(word, _SCAND_VOWELS)

    for suf in _NO_STEP1:
        if _ends_in(word, r1, suf):
            if suf in ("erte", "ert"):
                word = word[: -len(suf)] + "er"
            elif suf == "s":
                if word[-2] in _NO_S_END or (
                    word[-2] == "k" and word[-3] not in _SCAND_VOWELS
                ):
                    word = word[:-1]
            else:
                word = word[: -len(suf)]
            break

    for suf in _NO_STEP2:
        if _ends_in(word, r1, suf):
            word = word[:-1]
            break

    for suf in _NO_STEP3:
        if _ends_in(word, r1, suf):
            word = word[: -len(suf)]
            break
    return word


# ---------------------------------------------------------------------------
# Swedish
# ---------------------------------------------------------------------------

_SV_S_END = "bcdfghjklmnoprtvy"
_SV_STEP1 = (
    "heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas",
    "ornas", "andes", "andet", "arens", "arna", "erna", "orna", "ande",
    "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens",
    "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at",
    "a", "e", "s",
)
_SV_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = ("fullt", "l\xf6st", "els", "lig", "ig")


@lru_cache(maxsize=50000)
def stem_sv(word: str) -> str:
    word = word.lower()
    r1 = _r1_scand_start(word, _SV_VOWELS)

    for suf in _SV_STEP1:
        if _ends_in(word, r1, suf):
            if suf == "s":
                if word[-2] in _SV_S_END:
                    word = word[:-1]
            else:
                word = word[: -len(suf)]
            break

    for suf in _SV_STEP2:
        if _ends_in(word, r1, suf):
            word = word[:-1]
            break

    for suf in _SV_STEP3:
        if _ends_in(word, r1, suf):
            if suf in ("els", "lig", "ig"):
                word = word[: -len(suf)]
            else:  # fullt / löst
                word = word[:-1]
            break
    return word


# ---------------------------------------------------------------------------
# Dutch
# ---------------------------------------------------------------------------

_NL_VOWELS = "aeiouy\xe8"
_NL_STEP1 = ("heden", "ene", "en", "se", "s")
_NL_STEP3B = ("baar", "lijk", "bar", "end", "ing", "ig")
_NL_ACCENTS = str.maketrans("\xe4\xe1\xeb\xe9\xed\xef\xf6\xf3\xfc\xfa", "aaeeiioouu")


def _nl_undouble(word: str) -> str:
    return word[:-1] if word.endswith(("kk", "dd", "tt")) else word


@lru_cache(maxsize=50000)
def stem_nl(word: str) -> str:
    word = word.lower().translate(_NL_ACCENTS)
    # initial y / y-after-vowel / i-between-vowels become consonants
    # (uppercase). Neighbor checks read the MUTATED string, so an already
    # protected Y/I (no longer a vowel) blocks chain protection — the
    # reference port mutates in place and behaves the same way.
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
    for i in range(1, len(chars) - 1):
        if (
            chars[i] == "i"
            and chars[i - 1] in _NL_VOWELS
            and chars[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    word = "".join(chars)

    r1 = _r1_start(word, _NL_VOWELS)
    r2 = r1 + _r1_start(word[r1:], _NL_VOWELS) if r1 < len(word) else len(word)
    r1 = min(max(r1, 3), len(word)) if r1 < len(word) else r1
    r2 = min(max(r2, r1), len(word))

    step2_success = False

    # step 1
    for suf in _NL_STEP1:
        if _ends_in(word, r1, suf):
            if suf == "heden":
                word = word[:-5] + "heid"
            elif (
                suf in ("ene", "en")
                and not word.endswith("heden")
                and word[-len(suf) - 1] not in _NL_VOWELS
                and word[-len(suf) - 3 : -len(suf)] != "gem"
            ):
                word = _nl_undouble(word[: -len(suf)])
            elif (
                suf in ("se", "s")
                and word[-len(suf) - 1] not in _NL_VOWELS
                and word[-len(suf) - 1] != "j"
            ):
                word = word[: -len(suf)]
            break

    # step 2
    if _ends_in(word, r1, "e") and word[-2] not in _NL_VOWELS:
        step2_success = True
        word = _nl_undouble(word[:-1])

    # step 3a
    if _ends_in(word, r2, "heid") and word[-5] != "c":
        word = word[:-4]
        if (
            _ends_in(word, r1, "en")
            and word[-3] not in _NL_VOWELS
            and word[-5:-2] != "gem"
        ):
            word = _nl_undouble(word[:-2])

    # step 3b (derivational)
    for suf in _NL_STEP3B:
        if _ends_in(word, r2, suf):
            if suf in ("end", "ing"):
                word = word[:-3]
                if _ends_in(word, r2, "ig") and word[-3] != "e":
                    word = word[:-2]
                else:
                    word = _nl_undouble(word)
            elif suf == "ig" and word[-3] != "e":
                word = word[:-2]
            elif suf == "lijk":
                word = word[:-4]
                if _ends_in(word, r1, "e") and word[-2] not in _NL_VOWELS:
                    word = _nl_undouble(word[:-1])
            elif suf == "baar":
                word = word[:-4]
            elif suf == "bar" and step2_success:
                word = word[:-3]
            break

    # step 4: undouble vowel
    if (
        len(word) >= 4
        and word[-1] not in _NL_VOWELS
        and word[-1] != "I"
        and word[-3:-1] in ("aa", "ee", "oo", "uu")
        and word[-4] not in _NL_VOWELS
    ):
        word = word[:-3] + word[-3] + word[-1]

    return word.replace("I", "i").replace("Y", "y")


STEMMERS = {
    "de": stem_de,
    "da": stem_da,
    "no": stem_no,
    "sv": stem_sv,
    "nl": stem_nl,
}


def stemmer_for_language(lang: str):
    """Stemming function for a 2-letter language code ('en' = Porter)."""
    if lang == "en":
        from whoosh_novo_ray.porter import stem as stem_en

        return stem_en
    try:
        return STEMMERS[lang]
    except KeyError:
        raise ValueError(
            f"no stemmer for language {lang!r} (have: en, "
            + ", ".join(sorted(STEMMERS)) + ")"
        ) from None
