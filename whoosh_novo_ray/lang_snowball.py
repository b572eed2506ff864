"""Snowball stemmers for all 14 languages the reference ships: German,
Danish, Norwegian, Swedish, Dutch, Spanish, French, Italian, Portuguese,
Finnish, Romanian, Russian, Hungarian (+ Porter English in porter.py).

Fresh implementations of Dr. Martin Porter's published Snowball algorithms
(https://snowballstem.org/algorithms/), matched behavior-for-behavior against
the reference engine's NLTK-derived ports (de-odex/whoosh-novo
``src/whoosh/lang/snowball/{german,...,french}.py``) including
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


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xfc"
_ES_STEP0 = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_ES_STEP1 = (
    "amientos", "imientos", "amiento", "imiento", "aciones", "uciones",
    "adoras", "adores", "ancias", "log\xedas", "encias", "amente",
    "idades", "anzas", "ismos", "ables", "ibles", "istas", "adora",
    "aci\xf3n", "antes", "ancia", "log\xeda", "uci\xf3n", "encia",
    "mente", "anza", "icos", "icas", "ismo", "able", "ible", "ista",
    "osos", "osas", "ador", "ante", "idad", "ivas", "ivos", "ico",
    "ica", "oso", "osa", "iva", "ivo",
)
_ES_STEP2A = (
    "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
    "ya", "ye", "yo", "y\xf3",
)
_ES_STEP2B = (
    "ar\xedamos", "er\xedamos", "ir\xedamos", "i\xe9ramos", "i\xe9semos",
    "ar\xedais", "aremos", "er\xedais", "eremos", "ir\xedais", "iremos",
    "ierais", "ieseis", "asteis", "isteis", "\xe1bamos", "\xe1ramos",
    "\xe1semos", "ar\xedan", "ar\xedas", "ar\xe9is", "er\xedan",
    "er\xedas", "er\xe9is", "ir\xedan", "ir\xedas", "ir\xe9is",
    "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
    "arais", "aseis", "\xe9amos", "ar\xe1n", "ar\xe1s", "ar\xeda",
    "er\xe1n", "er\xe1s", "er\xeda", "ir\xe1n", "ir\xe1s", "ir\xeda",
    "iera", "iese", "aste", "iste", "aban", "aran", "asen", "aron",
    "ando", "abas", "adas", "idas", "aras", "ases", "\xedais", "ados",
    "idos", "amos", "imos", "emos", "ar\xe1", "ar\xe9", "er\xe1",
    "er\xe9", "ir\xe1", "ir\xe9", "aba", "ada", "ida", "ara", "ase",
    "\xedan", "ado", "ido", "\xedas", "\xe1is", "\xe9is", "\xeda",
    "ad", "ed", "id", "an", "i\xf3", "ar", "er", "ir", "as", "\xeds",
    "en", "es",
)
_ES_STEP3 = ("os", "a", "e", "o", "\xe1", "\xe9", "\xed", "\xf3")
_ES_DEACCENT = str.maketrans("\xe1\xe9\xed\xf3\xfa", "aeiou")


def _r1r2_strings(word: str, vowels: str) -> tuple[str, str]:
    r1 = _r1_start(word, vowels)
    r1s = word[r1:] if r1 < len(word) else ""
    r2 = _r1_start(r1s, vowels)
    r2s = r1s[r2:] if r2 < len(r1s) else ""
    return r1s, r2s


def _rv_string(word: str, vowels: str) -> str:
    """Standard RV region (reference bases.py:94-132 semantics)."""
    if len(word) < 2:
        return ""
    if word[1] not in vowels:
        for i in range(2, len(word)):
            if word[i] in vowels:
                return word[i + 1 :]
        return ""
    if word[:2] in vowels:  # quirk: a 2-char SLICE tested against the string
        for i in range(2, len(word)):
            if word[i] not in vowels:
                return word[i + 1 :]
        return ""
    return word[3:]


@lru_cache(maxsize=50000)
def stem_es(word: str) -> str:
    word = word.lower()
    step1_success = False
    r1, r2 = _r1r2_strings(word, _ES_VOWELS)
    rv = _rv_string(word, _ES_VOWELS)

    # step 0: attached pronoun
    for suf in _ES_STEP0:
        if word.endswith(suf):
            if rv.endswith(suf):
                n = len(suf)
                head = rv[:-n]
                if head.endswith(("i\xe9ndo", "\xe1ndo", "\xe1r", "\xe9r", "\xedr")):
                    deacc = str.maketrans("\xe1\xe9\xed", "aei")
                    word = word[:-n].translate(deacc)
                    r1 = r1[:-n].translate(deacc)
                    r2 = r2[:-n].translate(deacc)
                    rv = head.translate(deacc)
                elif head.endswith(("ando", "iendo", "ar", "er", "ir")) or (
                    head.endswith("yendo") and word[:-n].endswith("uyendo")
                ):
                    word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], head
            break

    # step 1: standard suffixes
    for suf in _ES_STEP1:
        if word.endswith(suf):
            n = len(suf)
            if suf == "amente" and r1.endswith(suf):
                step1_success = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic", "ad")):
                    word, rv = word[:-2], rv[:-2]
            elif r2.endswith(suf):
                step1_success = True
                if suf in (
                    "adora", "ador", "aci\xf3n", "adoras", "adores",
                    "aciones", "ante", "antes", "ancia", "ancias",
                ):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("ic"):
                        word, rv = word[:-2], rv[:-2]
                elif suf in ("log\xeda", "log\xedas"):
                    # the reference uses str.replace — EVERY occurrence in
                    # the word is replaced, not just the suffix (port quirk)
                    word = word.replace(suf, "log")
                    rv = rv.replace(suf, "log")
                elif suf in ("uci\xf3n", "uciones"):
                    word = word.replace(suf, "u")
                    rv = rv.replace(suf, "u")
                elif suf in ("encia", "encias"):
                    word = word.replace(suf, "ente")
                    rv = rv.replace(suf, "ente")
                elif suf == "mente":
                    word, r2, rv = word[:-5], r2[:-5], rv[:-5]
                    if r2.endswith(("ante", "able", "ible")):
                        word, rv = word[:-4], rv[:-4]
                elif suf in ("idad", "idades"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    for pre in ("abil", "ic", "iv"):
                        if r2.endswith(pre):
                            word, rv = word[: -len(pre)], rv[: -len(pre)]
                elif suf in ("ivo", "iva", "ivos", "ivas"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # step 2a: verb suffixes beginning with y (preceded by 'u')
    if not step1_success:
        for suf in _ES_STEP2A:
            if rv.endswith(suf) and word[-len(suf) - 1 : -len(suf)] == "u":
                word, rv = word[: -len(suf)], rv[: -len(suf)]
                break

        for suf in _ES_STEP2B:
            if rv.endswith(suf):
                n = len(suf)
                word, rv = word[:-n], rv[:-n]
                if suf in ("en", "es", "\xe9is", "emos"):
                    if word.endswith("gu"):
                        word = word[:-1]
                    if rv.endswith("gu"):
                        rv = rv[:-1]
                break

    # step 3: residual suffix
    for suf in _ES_STEP3:
        if rv.endswith(suf):
            n = len(suf)
            if suf in ("e", "\xe9"):
                word, rv = word[:-n], rv[:-n]
                if len(word) >= 2 and word[-2:] == "gu" and rv and rv[-1] == "u":
                    word = word[:-1]
            else:
                word = word[:-n]
            break

    return word.translate(_ES_DEACCENT)


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_VOWELS = "aeiouy\xe2\xe0\xeb\xe9\xea\xe8\xef\xee\xf4\xfb\xf9"
_FR_STEP1 = (
    "issements", "issement", "atrices", "atrice", "ateurs", "ations",
    "logies", "usions", "utions", "ements", "amment", "emment", "ances",
    "iqUes", "ismes", "ables", "istes", "ateur", "ation", "logie",
    "usion", "ution", "ences", "ement", "euses", "ments", "ance",
    "iqUe", "isme", "able", "iste", "ence", "it\xe9s", "ives", "eaux",
    "euse", "ment", "eux", "it\xe9", "ive", "ifs", "aux", "if",
)
_FR_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "\xeemes", "\xeetes", "irai", "iras", "irez", "isse",
    "ies", "ira", "\xeet", "ie", "ir", "is", "it", "i",
)
_FR_STEP2B = (
    "eraIent", "assions", "erions", "assent", "assiez", "\xe8rent",
    "erais", "erait", "eriez", "erons", "eront", "aIent", "antes",
    "asses", "ions", "erai", "eras", "erez", "\xe2mes", "\xe2tes",
    "ante", "ants", "asse", "\xe9es", "era", "iez", "ais", "ait",
    "ant", "\xe9e", "\xe9s", "er", "ez", "\xe2t", "ai", "as",
    "\xe9", "a",
)
_FR_2B_ER = frozenset(
    (
        "eraIent", "erions", "\xe8rent", "erais", "erait", "eriez",
        "erons", "eront", "erai", "eras", "erez", "\xe9es", "era",
        "iez", "\xe9e", "\xe9s", "er", "ez", "\xe9",
    )
)
_FR_2B_A = frozenset(
    (
        "assions", "assent", "assiez", "aIent", "antes", "asses",
        "\xe2mes", "\xe2tes", "ante", "ants", "asse", "ais", "ait",
        "ant", "\xe2t", "ai", "as", "a",
    )
)
_FR_STEP4 = ("i\xe8re", "I\xe8re", "ion", "ier", "Ier", "e", "\xeb")


def _rv_french(word: str) -> str:
    """French RV: after the 3rd letter when the word starts with two vowels
    or with par/col/tap; else after the first non-initial vowel."""
    if len(word) < 2:
        return ""
    if word.startswith(("par", "col", "tap")) or (
        word[0] in _FR_VOWELS and word[1] in _FR_VOWELS
    ):
        return word[3:]
    for i in range(1, len(word)):
        if word[i] in _FR_VOWELS:
            return word[i + 1 :]
    return ""


@lru_cache(maxsize=50000)
def stem_fr(word: str) -> str:
    word = word.lower()
    step1_success = False
    rv_ending_found = False
    step2a_success = False
    step2b_success = False

    # protections (reading the mutated string, as the port does): u after q;
    # u/i between vowels; y adjacent to a vowel
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    for i in range(1, len(chars) - 1):
        if chars[i - 1] in _FR_VOWELS and chars[i + 1] in _FR_VOWELS:
            if chars[i] == "u":
                chars[i] = "U"
            elif chars[i] == "i":
                chars[i] = "I"
        if chars[i] == "y" and (
            chars[i - 1] in _FR_VOWELS or chars[i + 1] in _FR_VOWELS
        ):
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _r1r2_strings(word, _FR_VOWELS)
    rv = _rv_french(word)

    # STEP 1 — NB: the port tests `suffix in region` as a SUBSTRING (not a
    # suffix-of-region) test, and never refreshes r1/r2 after deletions;
    # both quirks are preserved.
    for suf in _FR_STEP1:
        if word.endswith(suf):
            n = len(suf)
            if suf == "eaux":
                word = word[:-1]
                step1_success = True
            elif suf in ("euse", "euses"):
                if suf in r2:
                    word = word[:-n]
                    step1_success = True
                elif suf in r1:
                    word = word[:-n] + "eux"
                    step1_success = True
            elif suf in ("ement", "ements") and suf in rv:
                word = word[:-n]
                step1_success = True
                if word[-2:] == "iv" and "iv" in r2:
                    word = word[:-2]
                    if word[-2:] == "at" and "at" in r2:
                        word = word[:-2]
                elif word[-3:] == "eus":
                    if "eus" in r2:
                        word = word[:-3]
                    elif "eus" in r1:
                        word = word[:-1] + "x"
                elif word[-3:] in ("abl", "iqU"):
                    if "abl" in r2 or "iqU" in r2:
                        word = word[:-3]
                elif word[-3:] in ("i\xe8r", "I\xe8r"):
                    if "i\xe8r" in rv or "I\xe8r" in rv:
                        word = word[:-3] + "i"
            elif suf == "amment" and suf in rv:
                word = word[:-6] + "ant"
                rv = rv[:-6] + "ant"
                rv_ending_found = True
            elif suf == "emment" and suf in rv:
                word = word[:-6] + "ent"
                rv_ending_found = True
            elif (
                suf in ("ment", "ments")
                and suf in rv
                and not rv.startswith(suf)
                and rv[rv.rindex(suf) - 1] in _FR_VOWELS
            ):
                word = word[:-n]
                rv = rv[:-n]
                rv_ending_found = True
            elif suf == "aux" and suf in r1:
                word = word[:-2] + "l"
                step1_success = True
            elif (
                suf in ("issement", "issements")
                and suf in r1
                and word[-n - 1] not in _FR_VOWELS
            ):
                word = word[:-n]
                step1_success = True
            elif (
                suf
                in (
                    "ance", "iqUe", "isme", "able", "iste", "eux",
                    "ances", "iqUes", "ismes", "ables", "istes",
                )
                and suf in r2
            ):
                word = word[:-n]
                step1_success = True
            elif (
                suf in ("atrice", "ateur", "ation", "atrices", "ateurs", "ations")
                and suf in r2
            ):
                word = word[:-n]
                step1_success = True
                if word[-2:] == "ic":
                    if "ic" in r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
            elif suf in ("logie", "logies") and suf in r2:
                word = word[:-n] + "log"
                step1_success = True
            elif suf in ("usion", "ution", "usions", "utions") and suf in r2:
                word = word[:-n] + "u"
                step1_success = True
            elif suf in ("ence", "ences") and suf in r2:
                word = word[:-n] + "ent"
                step1_success = True
            elif suf in ("it\xe9", "it\xe9s") and suf in r2:
                word = word[:-n]
                step1_success = True
                if word[-4:] == "abil":
                    if "abil" in r2:
                        word = word[:-4]
                    else:
                        word = word[:-2] + "l"
                elif word[-2:] == "ic":
                    if "ic" in r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word[-2:] == "iv":
                    if "iv" in r2:
                        word = word[:-2]
            elif suf in ("if", "ive", "ifs", "ives") and suf in r2:
                word = word[:-n]
                step1_success = True
                if word[-2:] == "at" and "at" in r2:
                    word = word[:-2]
                    if word[-2:] == "ic":
                        if "ic" in r2:
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
            break

    # STEP 2a: verb suffixes beginning 'i'
    if not step1_success or rv_ending_found:
        for suf in _FR_STEP2A:
            if word.endswith(suf):
                if (
                    suf in rv
                    and len(rv) > len(suf)
                    and rv[rv.rindex(suf) - 1] not in _FR_VOWELS
                ):
                    word = word[: -len(suf)]
                    step2a_success = True
                break

        # STEP 2b: other verb suffixes
        if not step2a_success:
            for suf in _FR_STEP2B:
                if rv.endswith(suf):
                    if suf == "ions" and "ions" in r2:
                        word = word[:-4]
                        step2b_success = True
                    elif suf in _FR_2B_ER:
                        word = word[: -len(suf)]
                        step2b_success = True
                    elif suf in _FR_2B_A:
                        word = word[: -len(suf)]
                        rv = rv[: -len(suf)]
                        step2b_success = True
                        if rv.endswith("e"):
                            word = word[:-1]
                    # 'ions' failing its r2 test matches but does nothing
                    break

    if step1_success or step2a_success or step2b_success:
        # STEP 3
        if word[-1:] == "Y":
            word = word[:-1] + "i"
        elif word[-1:] == "\xe7":
            word = word[:-1] + "c"
    else:
        # STEP 4: residual suffixes
        if len(word) >= 2 and word[-1] == "s" and word[-2] not in "aiou\xe8s":
            word = word[:-1]
        for suf in _FR_STEP4:
            if word.endswith(suf):
                if suf in rv:
                    if suf == "ion" and suf in r2 and rv[-4] in "st":
                        word = word[:-3]
                    elif suf in ("ier", "i\xe8re", "Ier", "I\xe8re"):
                        word = word[: -len(suf)] + "i"
                    elif suf == "e":
                        word = word[:-1]
                    elif suf == "\xeb" and word[-3:-1] == "gu":
                        word = word[:-1]
                    break

    # STEP 5: undouble
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]

    # STEP 6: un-accent the last é/è before the trailing consonant run
    for i in range(1, len(word)):
        if word[-i] in _FR_VOWELS:
            if i != 1 and word[-i] in ("\xe9", "\xe8"):
                word = word[:-i] + "e" + word[len(word) - i + 1 :]
            break

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")


# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiou\xe0\xe8\xec\xf2\xf9"
_IT_STEP0 = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene", "gli", "ci", "la", "le", "li", "lo",
    "mi", "ne", "si", "ti", "vi",
)
_IT_STEP1 = (
    "atrice", "atrici", "azione", "azioni", "uzione", "uzioni",
    "usione", "usioni", "amento", "amenti", "imento", "imenti",
    "amente", "abile", "abili", "ibile", "ibili", "mente", "atore",
    "atori", "logia", "logie", "anza", "anze", "iche", "ichi", "ismo",
    "ismi", "ista", "iste", "isti", "ist\xe0", "ist\xe8", "ist\xec",
    "ante", "anti", "enza", "enze", "ico", "ici", "ica", "ice",
    "oso", "osi", "osa", "ose", "it\xe0", "ivo", "ivi", "iva", "ive",
)
_IT_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo",
    "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are",
    "ata", "ate", "ati", "ato", "ava", "avi", "avo", "er\xe0", "ere",
    "er\xf2", "ete", "eva", "evi", "evo", "ir\xe0", "ire", "ir\xf2",
    "ita", "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta",
    "ute", "uti", "uto", "ar", "ir",
)
_IT_ACUTE_TO_GRAVE = str.maketrans(
    "\xe1\xe9\xed\xf3\xfa", "\xe0\xe8\xec\xf2\xf9"
)


@lru_cache(maxsize=50000)
def stem_it(word: str) -> str:
    word = word.lower().translate(_IT_ACUTE_TO_GRAVE)
    step1_success = False

    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    for i in range(1, len(chars) - 1):
        if chars[i - 1] in _IT_VOWELS and chars[i + 1] in _IT_VOWELS:
            if chars[i] == "u":
                chars[i] = "U"
            elif chars[i] == "i":
                chars[i] = "I"
    word = "".join(chars)

    r1, r2 = _r1r2_strings(word, _IT_VOWELS)
    rv = _rv_string(word, _IT_VOWELS)

    # step 0: attached pronoun
    for suf in _IT_STEP0:
        if rv.endswith(suf):
            n = len(suf)
            if rv[-n - 4 : -n] in ("ando", "endo"):
                word, r1, r2, rv = word[:-n], r1[:-n], r2[:-n], rv[:-n]
            elif rv[-n - 2 : -n] in ("ar", "er", "ir"):
                word = word[:-n] + "e"
                r1 = r1[:-n] + "e"
                r2 = r2[:-n] + "e"
                rv = rv[:-n] + "e"
            break

    # step 1: standard suffixes
    for suf in _IT_STEP1:
        if word.endswith(suf):
            n = len(suf)
            if suf == "amente" and r1.endswith(suf):
                step1_success = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic")):
                    word, rv = word[:-2], rv[:-2]
                elif r2.endswith("abil"):
                    word, rv = word[:-4], rv[:-4]
            elif suf in ("amento", "amenti", "imento", "imenti") and rv.endswith(
                suf
            ):
                step1_success = True
                word, rv = word[:-6], rv[:-6]
            elif r2.endswith(suf):
                step1_success = True
                if suf in ("azione", "azioni", "atore", "atori"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("ic"):
                        word, rv = word[:-2], rv[:-2]
                elif suf in ("logia", "logie"):
                    word = word[:-2]
                    rv = word[:-2]  # port quirk: rv reassigned FROM WORD
                elif suf in ("uzione", "uzioni", "usione", "usioni"):
                    word, rv = word[:-5], rv[:-5]
                elif suf in ("enza", "enze"):
                    word = word[:-2] + "te"
                    rv = rv[:-2] + "te"
                elif suf == "it\xe0":
                    word, r2, rv = word[:-3], r2[:-3], rv[:-3]
                    if r2.endswith(("ic", "iv")):
                        word, rv = word[:-2], rv[:-2]
                    elif r2.endswith("abil"):
                        word, rv = word[:-4], rv[:-4]
                elif suf in ("ivo", "ivi", "iva", "ive"):
                    word, r2, rv = word[:-3], r2[:-3], rv[:-3]
                    if r2.endswith("at"):
                        word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                        if r2.endswith("ic"):
                            word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # step 2: verb suffixes
    if not step1_success:
        for suf in _IT_STEP2:
            if rv.endswith(suf):
                word, rv = word[: -len(suf)], rv[: -len(suf)]
                break

    # step 3a: final vowel
    if rv.endswith(("a", "e", "i", "o", "\xe0", "\xe8", "\xec", "\xf2")):
        word, rv = word[:-1], rv[:-1]
        if rv.endswith("i"):
            word, rv = word[:-1], rv[:-1]

    # step 3b
    if rv.endswith(("ch", "gh")):
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Portuguese — NB: the reference port's tables carry some Spanish leftovers
# ('uciones', 'logías', 'ución'); preserved verbatim for parity.
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xe2\xea\xf4"
_PT_STEP1 = (
    "amentos", "imentos", "uciones", "amento", "imento", "adoras",
    "adores", "a\xe7o~es", "log\xedas", "\xeancias", "amente",
    "idades", "ismos", "istas", "adora", "a\xe7a~o", "antes",
    "\xe2ncia", "log\xeda", "uci\xf3n", "\xeancia", "mente", "idade",
    "ezas", "icos", "icas", "ismo", "\xe1vel", "\xedvel", "ista",
    "osos", "osas", "ador", "ante", "ivas", "ivos", "iras", "eza",
    "ico", "ica", "oso", "osa", "iva", "ivo", "ira",
)
_PT_STEP2 = (
    "ar\xedamos", "er\xedamos", "ir\xedamos", "\xe1ssemos",
    "\xeassemos", "\xedssemos", "ar\xedeis", "er\xedeis", "ir\xedeis",
    "\xe1sseis", "\xe9sseis", "\xedsseis", "\xe1ramos", "\xe9ramos",
    "\xedramos", "\xe1vamos", "aremos", "eremos", "iremos", "ariam",
    "eriam", "iriam", "assem", "essem", "issem", "ara~o", "era~o",
    "ira~o", "arias", "erias", "irias", "ardes", "erdes", "irdes",
    "asses", "esses", "isses", "astes", "estes", "istes", "\xe1reis",
    "areis", "\xe9reis", "ereis", "\xedreis", "ireis", "\xe1veis",
    "\xedamos", "armos", "ermos", "irmos", "aria", "eria", "iria",
    "asse", "esse", "isse", "aste", "este", "iste", "arei", "erei",
    "irei", "aram", "eram", "iram", "avam", "arem", "erem", "irem",
    "ando", "endo", "indo", "adas", "idas", "ar\xe1s", "aras",
    "er\xe1s", "eras", "ir\xe1s", "avas", "ares", "eres", "ires",
    "\xedeis", "ados", "idos", "\xe1mos", "amos", "emos", "imos",
    "iras", "ada", "ida", "ar\xe1", "ara", "er\xe1", "era",
    "ir\xe1", "ava", "iam", "ado", "ido", "ias", "ais", "eis",
    "ira", "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es",
    "is", "eu", "iu", "ou",
)
_PT_STEP4 = ("os", "a", "i", "o", "\xe1", "\xed", "\xf3")


@lru_cache(maxsize=50000)
def stem_pt(word: str) -> str:
    word = word.lower().replace("\xe3", "a~").replace("\xf5", "o~")
    step1_success = False
    step2_success = False

    r1, r2 = _r1r2_strings(word, _PT_VOWELS)
    rv = _rv_string(word, _PT_VOWELS)

    # step 1: standard suffixes
    for suf in _PT_STEP1:
        if word.endswith(suf):
            n = len(suf)
            if suf == "amente" and r1.endswith(suf):
                step1_success = True
                word, r2, rv = word[:-6], r2[:-6], rv[:-6]
                if r2.endswith("iv"):
                    word, r2, rv = word[:-2], r2[:-2], rv[:-2]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                elif r2.endswith(("os", "ic", "ad")):
                    word, rv = word[:-2], rv[:-2]
            elif (
                suf in ("ira", "iras")
                and rv.endswith(suf)
                and word[-n - 1 : -n] == "e"
            ):
                step1_success = True
                word = word[:-n] + "ir"
                rv = rv[:-n] + "ir"
            elif r2.endswith(suf):
                step1_success = True
                if suf in ("log\xeda", "log\xedas"):
                    word, rv = word[:-2], rv[:-2]
                elif suf in ("uci\xf3n", "uciones"):
                    word = word[:-n] + "u"
                    rv = rv[:-n] + "u"
                elif suf in ("\xeancia", "\xeancias"):
                    word = word[:-n] + "ente"
                    rv = rv[:-n] + "ente"
                elif suf == "mente":
                    word, r2, rv = word[:-5], r2[:-5], rv[:-5]
                    if r2.endswith(("ante", "avel", "\xedvel")):
                        word, rv = word[:-4], rv[:-4]
                elif suf in ("idade", "idades"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith(("ic", "iv")):
                        word, rv = word[:-2], rv[:-2]
                    elif r2.endswith("abil"):
                        word, rv = word[:-4], rv[:-4]
                elif suf in ("iva", "ivo", "ivas", "ivos"):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    if r2.endswith("at"):
                        word, rv = word[:-2], rv[:-2]
                else:
                    word, rv = word[:-n], rv[:-n]
            break

    # step 2: verb suffixes
    if not step1_success:
        for suf in _PT_STEP2:
            if rv.endswith(suf):
                step2_success = True
                word, rv = word[: -len(suf)], rv[: -len(suf)]
                break

    # step 3
    if (step1_success or step2_success) and rv.endswith("i") and word[-2] == "c":
        word, rv = word[:-1], rv[:-1]

    # step 4: residual suffix
    if not step1_success and not step2_success:
        for suf in _PT_STEP4:
            if rv.endswith(suf):
                word, rv = word[: -len(suf)], rv[: -len(suf)]
                break

    # step 5
    if rv.endswith(("e", "\xe9", "\xea")):
        word, rv = word[:-1], rv[:-1]
        if (word.endswith("gu") and rv.endswith("u")) or (
            word.endswith("ci") and rv.endswith("i")
        ):
            word = word[:-1]
    elif word.endswith("\xe7"):
        word = word[:-1] + "c"

    return word.replace("a~", "\xe3").replace("o~", "\xf5")


# ---------------------------------------------------------------------------
# Finnish
# ---------------------------------------------------------------------------

_FI_VOWELS = "aeiouy\xe4\xf6"
_FI_RESTRICTED = "aeiou\xe4\xf6"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "\xe4\xe4", "\xf6\xf6")
_FI_CONS = "bcdfghjklmnpqrstvwxz"
_FI_DOUBLES = tuple(c + c for c in "bcdfghjklmnpqrstvwxz")
_FI_STEP1 = (
    "kaan", "k\xe4\xe4n", "sti", "kin", "han", "h\xe4n", "ko",
    "k\xf6", "pa", "p\xe4",
)
_FI_STEP2 = ("nsa", "ns\xe4", "mme", "nne", "si", "ni", "an", "\xe4n", "en")
_FI_STEP3 = (
    "siin", "tten", "seen", "han", "hen", "hin", "hon", "h\xe4n",
    "h\xf6n", "den", "tta", "tt\xe4", "ssa", "ss\xe4", "sta",
    "st\xe4", "lla", "ll\xe4", "lta", "lt\xe4", "lle", "ksi", "ine",
    "ta", "t\xe4", "na", "n\xe4", "a", "\xe4", "n",
)
_FI_STEP4 = (
    "impi", "impa", "imp\xe4", "immi", "imma", "imm\xe4", "mpi",
    "mpa", "mp\xe4", "mmi", "mma", "mm\xe4", "eja", "ej\xe4",
)
_FI_H3 = {
    "han": "a", "hen": "e", "hin": "i", "hon": "o",
    "h\xe4n": "\xe4", "h\xf6n": "\xf6",
}


@lru_cache(maxsize=50000)
def stem_fi(word: str) -> str:
    word = word.lower()
    step3_success = False
    r1, r2 = _r1r2_strings(word, _FI_VOWELS)

    # step 1: particles
    for suf in _FI_STEP1:
        if r1.endswith(suf):
            if suf == "sti":
                if suf in r2:
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            elif word[-len(suf) - 1] in "ntaeiouy\xe4\xf6":
                n = len(suf)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # step 2: possessives
    for suf in _FI_STEP2:
        if r1.endswith(suf):
            if suf == "si":
                if word[-3] != "k":
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suf == "ni":
                word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
                if word.endswith("kse"):
                    word = word[:-3] + "ksi"
                if r1.endswith("kse"):
                    r1 = r1[:-3] + "ksi"
                if r2.endswith("kse"):
                    r2 = r2[:-3] + "ksi"
            elif suf == "an":
                if word[-4:-2] in ("ta", "na") or word[-5:-2] in (
                    "ssa", "sta", "lla", "lta",
                ):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suf == "\xe4n":
                if word[-4:-2] in ("t\xe4", "n\xe4") or word[-5:-2] in (
                    "ss\xe4", "st\xe4", "ll\xe4", "lt\xe4",
                ):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            elif suf == "en":
                if word[-5:-2] in ("lle", "ine"):
                    word, r1, r2 = word[:-2], r1[:-2], r2[:-2]
            else:
                word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            break

    # step 3: cases
    for suf in _FI_STEP3:
        if r1.endswith(suf):
            if suf in _FI_H3:
                if word[-4] == _FI_H3[suf]:
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                    step3_success = True
            elif suf in ("siin", "den", "tten"):
                n = len(suf)
                if word[-n - 1] == "i" and word[-n - 2] in _FI_RESTRICTED:
                    word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                    step3_success = True
                else:
                    continue  # try the next suffix (reference behavior)
            elif suf == "seen":
                if word[-6:-4] in _FI_LONG:
                    word, r1, r2 = word[:-4], r1[:-4], r2[:-4]
                    step3_success = True
                else:
                    continue
            elif suf in ("a", "\xe4"):
                if word[-2] in _FI_VOWELS and word[-3] in _FI_CONS:
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                    step3_success = True
            elif suf in ("tta", "tt\xe4"):
                if word[-4] == "e":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
                    step3_success = True
            elif suf == "n":
                word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
                step3_success = True
                if word[-2:] == "ie" or word[-2:] in _FI_LONG:
                    word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
            else:
                n = len(suf)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
                step3_success = True
            break

    # step 4: other endings
    for suf in _FI_STEP4:
        if r2.endswith(suf):
            if suf in ("mpi", "mpa", "mp\xe4", "mmi", "mma", "mm\xe4"):
                if word[-5:-3] != "po":
                    word, r1, r2 = word[:-3], r1[:-3], r2[:-3]
            else:
                n = len(suf)
                word, r1, r2 = word[:-n], r1[:-n], r2[:-n]
            break

    # step 5: plurals
    if step3_success and len(r1) >= 1 and r1[-1] in "ij":
        word, r1 = word[:-1], r1[:-1]
    elif (
        not step3_success
        and len(r1) >= 2
        and r1[-1] == "t"
        and r1[-2] in _FI_VOWELS
    ):
        word, r1, r2 = word[:-1], r1[:-1], r2[:-1]
        if r2.endswith("imma"):
            word, r1 = word[:-4], r1[:-4]
        elif r2.endswith("mma") and r2[-5:-3] != "po":
            word, r1 = word[:-3], r1[:-3]

    # step 6: tidying
    if r1[-2:] in _FI_LONG:
        word, r1 = word[:-1], r1[:-1]
    if len(r1) >= 2 and r1[-2] in _FI_CONS and r1[-1] in "a\xe4ei":
        word, r1 = word[:-1], r1[:-1]
    if r1.endswith(("oj", "uj")):
        word, r1 = word[:-1], r1[:-1]
    if r1.endswith("jo"):
        word, r1 = word[:-1], r1[:-1]

    # remove one consonant of a final double-consonant(+vowels) cluster
    for i in range(1, len(word)):
        if word[-i] in _FI_VOWELS:
            continue
        if i == 1:
            if word[-i - 1 :] in _FI_DOUBLES:
                word = word[:-1]
        elif word[-i - 1 : -i + 1] in _FI_DOUBLES:
            word = word[:-i] + word[-i + 1 :]
        break

    return word


# ---------------------------------------------------------------------------
# Romanian
# ---------------------------------------------------------------------------

_RO_VOWELS = "aeiouă\xe2\xee"
_RO_STEP0 = (
    "iilor", "ului", "elor", "iile", "ilor", "atei", "aţie",
    "aţia", "aua", "ele", "iua", "iei", "ile", "ul", "ea", "ii",
)
_RO_STEP1 = (
    "abilitate", "abilitati", "abilităţi", "ibilitate",
    "abilităi", "ivitate", "ivitati", "ivităţi",
    "icitate", "icitati", "icităţi", "icatori",
    "ivităi", "icităi", "icator", "aţiune", "atoare",
    "ătoare", "iţiune", "itoare", "iciva", "icive", "icivi",
    "icivă", "icala", "icale", "icali", "icală", "ativa",
    "ative", "ativi", "ativă", "atori", "ători", "itiva",
    "itive", "itivi", "itivă", "itori", "iciv", "ical", "ativ",
    "ator", "ător", "itiv", "itor",
)
_RO_STEP2 = (
    "abila", "abile", "abili", "abilă", "ibila", "ibile",
    "ibili", "ibilă", "atori", "itate", "itati", "ităţi",
    "abil", "ibil", "oasa", "oasă", "oase", "anta", "ante",
    "anti", "antă", "ator", "ităi", "iune", "iuni", "isme",
    "ista", "iste", "isti", "istă", "işti", "ata",
    "ată", "ati", "ate", "uta", "ută", "uti", "ute", "ita",
    "ită", "iti", "ite", "ica", "ice", "ici", "ică", "osi",
    "oşi", "ant", "iva", "ive", "ivi", "ivă", "ism", "ist",
    "at", "ut", "it", "ic", "os", "iv",
)
_RO_STEP3 = (
    "seserăţi", "aserăţi", "iserăţi",
    "\xe2serăţi", "userăţi", "seserăm",
    "aserăm", "iserăm", "\xe2serăm", "userăm",
    "serăţi", "seseşi", "seseră", "ească",
    "arăţi", "urăţi", "irăţi",
    "\xe2răţi", "aseşi", "aseră", "iseşi",
    "iseră", "\xe2seşi", "\xe2seră", "useşi",
    "useră", "serăm", "sesem", "indu", "\xe2ndu",
    "ează", "eşti", "eşte", "ăşti",
    "ăşte", "eaţi", "iaţi", "arăm",
    "urăm", "irăm", "\xe2răm", "asem", "isem",
    "\xe2sem", "usem", "seşi", "seră", "sese", "are",
    "ere", "ire", "\xe2re", "ind", "\xe2nd", "eze", "ezi", "esc",
    "ăsc", "eam", "eai", "eau", "iam", "iai", "iau", "aşi",
    "ară", "uşi", "ură", "işi", "iră",
    "\xe2şi", "\xe2ră", "ase", "ise", "\xe2se", "use",
    "aţi", "eţi", "iţi", "\xe2ţi", "sei", "ez",
    "am", "ai", "au", "ea", "ia", "ui", "\xe2i", "ăm", "em",
    "im", "\xe2m", "se",
)
_RO_3_WORDRV = frozenset(
    (
        "seserăţi", "seserăm", "serăţi",
        "seseşi", "seseră", "serăm", "sesem",
        "seşi", "seră", "sese", "aţi", "eţi",
        "iţi", "\xe2ţi", "sei", "ăm", "em", "im",
        "\xe2m", "se",
    )
)


@lru_cache(maxsize=50000)
def stem_ro(word: str) -> str:
    word = word.lower()
    step1_success = False
    step2_success = False

    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i - 1] in _RO_VOWELS and chars[i + 1] in _RO_VOWELS:
            if chars[i] == "u":
                chars[i] = "U"
            elif chars[i] == "i":
                chars[i] = "I"
    word = "".join(chars)

    r1, r2 = _r1r2_strings(word, _RO_VOWELS)
    rv = _rv_string(word, _RO_VOWELS)

    # step 0: plurals etc. (r1/rv SUBSTRING tests; failed rv test blanks rv)
    for suf in _RO_STEP0:
        if word.endswith(suf):
            if suf in r1:
                n = len(suf)
                if suf in ("ul", "ului"):
                    word = word[:-n]
                    rv = rv[:-n] if suf in rv else ""
                elif suf in ("aua", "atei") or (
                    suf == "ile" and word[-5:-3] != "ab"
                ):
                    word = word[:-2]
                elif suf in ("ea", "ele", "elor"):
                    word = word[:-n] + "e"
                    rv = rv[:-n] + "e" if suf in rv else ""
                elif suf in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
                    word = word[:-n] + "i"
                    rv = rv[:-n] + "i" if suf in rv else ""
                elif suf in ("aţie", "aţia"):
                    word = word[:-1]
            break

    # step 1: combining suffixes, repeated until no replacement happens
    # (r1/r2 go stale across iterations — reference behavior)
    while True:
        replaced = False
        for suf in _RO_STEP1:
            if word.endswith(suf):
                if suf in r1:
                    step1_success = True
                    replaced = True
                    n = len(suf)
                    if suf in (
                        "abilitate", "abilitati", "abilităi",
                        "abilităţi",
                    ):
                        word = word[:-n] + "abil"
                    elif suf == "ibilitate":
                        word = word[:-5]
                    elif suf in (
                        "ivitate", "ivitati", "ivităi",
                        "ivităţi",
                    ):
                        word = word[:-n] + "iv"
                    elif suf in (
                        "icitate", "icitati", "icităi",
                        "icităţi", "icator", "icatori", "iciv",
                        "iciva", "icive", "icivi", "icivă", "ical",
                        "icala", "icale", "icali", "icală",
                    ):
                        word = word[:-n] + "ic"
                    elif suf in (
                        "ativ", "ativa", "ative", "ativi", "ativă",
                        "aţiune", "atoare", "ator", "atori",
                        "ătoare", "ător", "ători",
                    ):
                        word = word[:-n] + "at"
                        if suf in r2:
                            r2 = r2[:-n] + "at"
                    else:  # itiv family
                        word = word[:-n] + "it"
                        if suf in r2:
                            r2 = r2[:-n] + "it"
                else:
                    step1_success = False
                break
        if not replaced:
            break

    # step 2: standard suffixes (r2 substring test)
    for suf in _RO_STEP2:
        if word.endswith(suf):
            if suf in r2:
                step2_success = True
                if suf in ("iune", "iuni"):
                    if word[-5] == "ţ":
                        word = word[:-5] + "t"
                elif suf in (
                    "ism", "isme", "ist", "ista", "iste", "isti",
                    "istă", "işti",
                ):
                    word = word[: -len(suf)] + "ist"
                else:
                    word = word[: -len(suf)]
            break

    # step 3: verb suffixes (rv; non-word-rv group needs a consonant before
    # the FIRST rv occurrence — the reference uses rv.index, not rindex)
    if not step1_success and not step2_success:
        for suf in _RO_STEP3:
            if word.endswith(suf):
                if suf in rv:
                    if suf in _RO_3_WORDRV:
                        word = word[: -len(suf)]
                        rv = rv[: -len(suf)]
                    elif (
                        not rv.startswith(suf)
                        and rv[rv.index(suf) - 1] not in "aeioă\xe2\xee"
                    ):
                        word = word[: -len(suf)]
                    break

    # step 4: final vowel
    for suf in ("ie", "a", "e", "i", "ă"):
        if word.endswith(suf):
            if suf in rv:
                word = word[: -len(suf)]
            break

    return word.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Russian (tables in lang_snowball_ru_data; stems in the NLTK ports'
# transliteration and converts back)
# ---------------------------------------------------------------------------

_RU_C2R = (
    ("А", "a"), ("а", "a"), ("Б", "b"), ("б", "b"),
    ("В", "v"), ("в", "v"), ("Г", "g"), ("г", "g"),
    ("Д", "d"), ("д", "d"), ("Е", "e"), ("е", "e"),
    ("Ё", "e"), ("ё", "e"), ("Ж", "zh"), ("ж", "zh"),
    ("З", "z"), ("з", "z"), ("И", "i"), ("и", "i"),
    ("Й", "i`"), ("й", "i`"), ("К", "k"), ("к", "k"),
    ("Л", "l"), ("л", "l"), ("М", "m"), ("м", "m"),
    ("Н", "n"), ("н", "n"), ("О", "o"), ("о", "o"),
    ("П", "p"), ("п", "p"), ("Р", "r"), ("р", "r"),
    ("С", "s"), ("с", "s"), ("Т", "t"), ("т", "t"),
    ("У", "u"), ("у", "u"), ("Ф", "f"), ("ф", "f"),
    ("Х", "kh"), ("х", "kh"), ("Ц", "t^s"), ("ц", "t^s"),
    ("Ч", "ch"), ("ч", "ch"), ("Ш", "sh"), ("ш", "sh"),
    ("Щ", "shch"), ("щ", "shch"), ("Ъ", "''"),
    ("ъ", "''"), ("Ы", "y"), ("ы", "y"), ("Ь", "'"),
    ("ь", "'"), ("Э", "e`"), ("э", "e`"),
    ("Ю", "i^u"), ("ю", "i^u"), ("Я", "i^a"),
    ("я", "i^a"),
)
_RU_R2C = (
    ("i^u", "ю"), ("i^a", "я"), ("shch", "щ"),
    ("kh", "х"), ("t^s", "ц"), ("ch", "ч"),
    ("e`", "э"), ("i`", "й"), ("sh", "ш"),
    ("k", "к"), ("e", "е"), ("zh", "ж"), ("a", "а"),
    ("b", "б"), ("v", "в"), ("g", "г"), ("d", "д"),
    ("z", "з"), ("i", "и"), ("l", "л"), ("m", "м"),
    ("n", "н"), ("o", "о"), ("p", "п"), ("r", "р"),
    ("s", "с"), ("t", "т"), ("u", "у"), ("f", "ф"),
    ("''", "ъ"), ("y", "ы"), ("'", "ь"),
)


def _ru_chain(word: str, pairs) -> str:
    for a, b in pairs:
        word = word.replace(a, b)
    return word


def _ru_regions(word: str) -> tuple[str, str]:
    """(RV, R2) over the transliterated word; multigraph vowels i^a/i^u/e`
    are packed to single markers for the scan (reference
    __regions_russian)."""
    vowels = "AUEaeiouy"
    packed = (
        word.replace("i^a", "A").replace("i^u", "U").replace("e`", "E")
    )
    r1 = r2 = rv = ""
    for i in range(1, len(packed)):
        if packed[i] not in vowels and packed[i - 1] in vowels:
            r1 = packed[i + 1 :]
            break
    for i in range(1, len(r1)):
        if r1[i] not in vowels and r1[i - 1] in vowels:
            r2 = r1[i + 1 :]
            break
    for i in range(len(packed)):
        if packed[i] in vowels:
            rv = packed[i + 1 :]
            break
    unpack = lambda s: (
        s.replace("A", "i^a").replace("U", "i^u").replace("E", "e`")
    )
    return unpack(rv), unpack(r2)


def _ru_a_precedes(rv: str, n: int) -> bool:
    """The participle-group-1 precondition: an 'a' or 'i^a' right before
    the suffix (in RV)."""
    return rv[-n - 3 : -n] == "i^a" or rv[-n - 1 : -n] == "a"


@lru_cache(maxsize=50000)
def stem_ru(word: str) -> str:
    from whoosh_novo_ray.lang_snowball_ru_data import (
        ADJ_A,
        ADJECTIVAL,
        DERIVATIONAL,
        NOUN,
        PERF_A,
        PERFECTIVE_GERUND,
        REFLEXIVE,
        SUPERLATIVE,
        VERB,
        VERB_A,
    )

    cyrillic = any(ord(c) > 255 for c in word)
    if cyrillic:
        word = _ru_chain(word, _RU_C2R)

    rv, r2 = _ru_regions(word)

    step1_success = False
    adjectival_removed = False
    verb_removed = False

    for suf in PERFECTIVE_GERUND:
        if rv.endswith(suf):
            n = len(suf)
            if suf in PERF_A:
                if _ru_a_precedes(rv, n):
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    step1_success = True
                    break
            else:
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                step1_success = True
                break

    if not step1_success:
        for suf in REFLEXIVE:
            if rv.endswith(suf):
                n = len(suf)
                word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                break

        for suf in ADJECTIVAL:
            if rv.endswith(suf):
                n = len(suf)
                if suf in ADJ_A:
                    if _ru_a_precedes(rv, n):
                        word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                        adjectival_removed = True
                        break
                else:
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    adjectival_removed = True
                    break

        if not adjectival_removed:
            for suf in VERB:
                if rv.endswith(suf):
                    n = len(suf)
                    if suf in VERB_A:
                        if _ru_a_precedes(rv, n):
                            word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                            verb_removed = True
                            break
                    else:
                        word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                        verb_removed = True
                        break

        if not adjectival_removed and not verb_removed:
            for suf in NOUN:
                if rv.endswith(suf):
                    n = len(suf)
                    word, r2, rv = word[:-n], r2[:-n], rv[:-n]
                    break

    if rv.endswith("i"):
        word, r2 = word[:-1], r2[:-1]

    for suf in DERIVATIONAL:
        if r2.endswith(suf):
            word = word[: -len(suf)]
            break

    undouble = False
    superlative = False
    if word.endswith("nn"):
        word = word[:-1]
        undouble = True
    if not undouble:
        for suf in SUPERLATIVE:
            if word.endswith(suf):
                word = word[: -len(suf)]
                superlative = True
                break
        if word.endswith("nn"):
            word = word[:-1]
    if not undouble and not superlative and word.endswith("'"):
        word = word[:-1]

    if cyrillic:
        word = _ru_chain(word, _RU_R2C)
    return word


# ---------------------------------------------------------------------------
# Hungarian
# ---------------------------------------------------------------------------

_HU_VOWELS = "aeiou\xf6\xfc\xe1\xe9\xed\xf3\xf5\xfa\xfb"
_HU_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "ty", "zs")
_HU_DOUBLES = (
    "bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll",
    "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt", "tty",
    "vv", "zz", "zzs",
)
_HU_S2 = (
    "k\xe9ppen", "onk\xe9nt", "enk\xe9nt", "ank\xe9nt", "k\xe9pp",
    "k\xe9nt", "ban", "ben", "nak", "nek", "val", "vel", "t\xf3l",
    "t\xf5l", "r\xf3l", "r\xf5l", "b\xf3l", "b\xf5l", "hoz", "hez",
    "h\xf6z", "n\xe1l", "n\xe9l", "\xe9rt", "kor", "ba", "be", "ra",
    "re", "ig", "at", "et", "ot", "\xf6t", "ul", "\xfcl", "v\xe1",
    "v\xe9", "en", "on", "an", "\xf6n", "n", "t",
)
_HU_S3 = ("\xe1nk\xe9nt", "\xe1n", "\xe9n")
_HU_S4 = ("astul", "est\xfcl", "\xe1stul", "\xe9st\xfcl", "stul", "st\xfcl")
_HU_S6 = (
    "ok\xe9", "\xf6k\xe9", "ak\xe9", "ek\xe9", "\xe1k\xe9",
    "\xe1\xe9i", "\xe9k\xe9", "\xe9\xe9i", "k\xe9", "\xe9i",
    "\xe9\xe9", "\xe9",
)
_HU_S7 = (
    "\xe1juk", "\xe9j\xfck", "\xfcnk", "unk", "juk", "j\xfck",
    "\xe1nk", "\xe9nk", "nk", "uk", "\xfck", "em", "om", "am", "od",
    "ed", "ad", "\xf6d", "ja", "je", "\xe1m", "\xe1d", "\xe9m",
    "\xe9d", "m", "d", "a", "e", "o", "\xe1", "\xe9",
)
_HU_S8 = (
    "jaitok", "jeitek", "jaink", "jeink", "aitok", "eitek", "\xe1itok",
    "\xe9itek", "jaim", "jeim", "jaid", "jeid", "eink", "aink",
    "itek", "jeik", "jaik", "\xe1ink", "\xe9ink", "aim", "eim",
    "aid", "eid", "jai", "jei", "ink", "aik", "eik", "\xe1im",
    "\xe1id", "\xe1ik", "\xe9im", "\xe9id", "\xe9ik", "im", "id",
    "ai", "ei", "ik", "\xe1i", "\xe9i", "i",
)
_HU_S9 = ("\xe1k", "\xe9k", "\xf6k", "ok", "ek", "ak", "k")


def _r1_hungarian(word: str) -> str:
    """Vowel-initial words: after the first consonant — but the port's
    digraph shortcut indexes the digraph's LAST CHAR anywhere in the word
    (quirk preserved). Consonant-initial: after the first vowel."""
    if word[0] in _HU_VOWELS:
        for dg in _HU_DIGRAPHS:
            if dg in word[1:]:
                return word[word.index(dg[-1]) + 1 :]
        for i in range(1, len(word)):
            if word[i] not in _HU_VOWELS:
                return word[i + 1 :]
        return ""
    for i in range(1, len(word)):
        if word[i] in _HU_VOWELS:
            return word[i + 1 :]
    return ""


@lru_cache(maxsize=50000)
def stem_hu(word: str) -> str:
    word = word.lower()
    if not word:
        return word
    r1 = _r1_hungarian(word)

    # step 1: instrumental case (undouble before -al/-el)
    if r1.endswith(("al", "el")):
        for dc in _HU_DOUBLES:
            if word[-2 - len(dc) : -2] == dc:
                word = word[:-4] + word[-3]
                if r1[-2 - len(dc) : -2] == dc:
                    r1 = r1[:-4] + r1[-3]
                break

    # step 2: frequent cases
    for suf in _HU_S2:
        if word.endswith(suf):
            if r1.endswith(suf):
                n = len(suf)
                word, r1 = word[:-n], r1[:-n]
                if r1.endswith("\xe1"):
                    word, r1 = word[:-1] + "a", r1[:-1] + "a"
                elif r1.endswith("\xe9"):
                    word, r1 = word[:-1] + "e", r1[:-1] + "e"
            break

    # step 3: special cases
    for suf in _HU_S3:
        if r1.endswith(suf):
            if suf == "\xe9n":
                word, r1 = word[:-2] + "e", r1[:-2] + "e"
            else:
                n = len(suf)
                word, r1 = word[:-n] + "a", r1[:-n] + "a"
            break

    # step 4: other cases
    for suf in _HU_S4:
        if r1.endswith(suf):
            if suf == "\xe1stul":
                word, r1 = word[:-5] + "a", r1[:-5] + "a"
            elif suf == "\xe9st\xfcl":
                word, r1 = word[:-5] + "e", r1[:-5] + "e"
            else:
                n = len(suf)
                word, r1 = word[:-n], r1[:-n]
            break

    # step 5: factive case (undouble before final á/é)
    for suf in ("\xe1", "\xe9"):
        if r1.endswith(suf):
            for dc in _HU_DOUBLES:
                if word[-1 - len(dc) : -1] == dc:
                    word = word[:-3] + word[-2]
                    if r1[-1 - len(dc) : -1] == dc:
                        r1 = r1[:-3] + r1[-2]
                    break

    # step 6: owned
    for suf in _HU_S6:
        if r1.endswith(suf):
            if suf in ("\xe1k\xe9", "\xe1\xe9i"):
                word, r1 = word[:-3] + "a", r1[:-3] + "a"
            elif suf in ("\xe9k\xe9", "\xe9\xe9i", "\xe9\xe9"):
                n = len(suf)
                word, r1 = word[:-n] + "e", r1[:-n] + "e"
            else:
                n = len(suf)
                word, r1 = word[:-n], r1[:-n]
            break

    # step 7: singular owner
    for suf in _HU_S7:
        if word.endswith(suf):
            if r1.endswith(suf):
                n = len(suf)
                if suf in ("\xe1nk", "\xe1juk", "\xe1m", "\xe1d", "\xe1"):
                    word, r1 = word[:-n] + "a", r1[:-n] + "a"
                elif suf in ("\xe9nk", "\xe9j\xfck", "\xe9m", "\xe9d", "\xe9"):
                    word, r1 = word[:-n] + "e", r1[:-n] + "e"
                else:
                    word, r1 = word[:-n], r1[:-n]
            break

    # step 8: plural owner
    for suf in _HU_S8:
        if word.endswith(suf):
            if r1.endswith(suf):
                n = len(suf)
                if suf in (
                    "\xe1im", "\xe1id", "\xe1i", "\xe1ink",
                    "\xe1itok", "\xe1ik",
                ):
                    word, r1 = word[:-n] + "a", r1[:-n] + "a"
                elif suf in (
                    "\xe9im", "\xe9id", "\xe9i", "\xe9ink",
                    "\xe9itek", "\xe9ik",
                ):
                    word, r1 = word[:-n] + "e", r1[:-n] + "e"
                else:
                    word, r1 = word[:-n], r1[:-n]
            break

    # step 9: plural
    for suf in _HU_S9:
        if word.endswith(suf):
            if r1.endswith(suf):
                if suf == "\xe1k":
                    word = word[:-2] + "a"
                elif suf == "\xe9k":
                    word = word[:-2] + "e"
                else:
                    word = word[: -len(suf)]
            break

    return word


STEMMERS = {
    "de": stem_de,
    "da": stem_da,
    "no": stem_no,
    "sv": stem_sv,
    "nl": stem_nl,
    "es": stem_es,
    "fr": stem_fr,
    "it": stem_it,
    "pt": stem_pt,
    "fi": stem_fi,
    "ro": stem_ro,
    "ru": stem_ru,
    "hu": stem_hu,
}


def stemmer_for_language(lang: str):
    """Stemming function for a 2-letter language code ('en' = Porter,
    'ar' = ISRI, rest = snowball)."""
    if lang == "en":
        from whoosh_novo_ray.porter import stem as stem_en

        return stem_en
    if lang == "ar":
        from whoosh_novo_ray.lang_isri import stem_ar

        return stem_ar
    try:
        return STEMMERS[lang]
    except KeyError:
        raise ValueError(
            f"no stemmer for language {lang!r} (have: en, ar, "
            + ", ".join(sorted(STEMMERS)) + ")"
        ) from None
