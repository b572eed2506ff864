"""Lovins stemmer (J.B. Lovins, "Development of a Stemming Algorithm",
Mechanical Translation and Computational Linguistics 11:1-2, 1968).

Fresh implementation of the published algorithm: the longest-match ending
table (294 endings, each gated by one of 29 context conditions), followed by
the recoding step (undouble certain final doubles, then one of 35 published
respelling rules keyed on the new ending).

Behavior-parity target: ``/root/reference/src/whoosh/lang/lovins.py``
(``stem()``) — verified word-for-word by the differential fuzz in
``tests/test_lovins_paicehusk.py``. The ending/condition/recode tables are
the paper's published data (Appendix A/B), which the reference also encodes;
the engine around them is new.

Reference quirks, and how we handle each (pinned by the tests):

* condition S tests ``base[-2] == "rd"`` — a single character compared to a
  two-char string, so the published "after dr" arm is dead code and the
  "unless t follows t" arm is always satisfied; S degenerates to
  ``base[-1] == "t"``. Replicated exactly (parity beats the paper here).
* conditions K and X index ``base[-3]`` before length-checking, so the
  reference RAISES IndexError on a two-letter base (``stem("soar")``).
  We instead treat the missing third-from-last character as failing that
  disjunct (the paper's natural reading) — graceful, documented divergence.
* the recode except-char check indexes ``word[-(len(tail)+1)]``, so when the
  stem IS the rule tail the reference raises (``stem("ends")``,
  ``stem("ets")``). With no preceding character the exception can't apply,
  so we apply the transformation — graceful, documented divergence.
"""

from __future__ import annotations

# --- Context conditions (paper Appendix B). Each takes the candidate base
# (the word minus the ending) and says whether the ending may be removed.
# The base is always at least 2 characters (the engine enforces it).


def _cond_S(base: str) -> bool:
    # Published rule: "remove ending only after dr or t, unless t follows t".
    # Reference quirk (see module docstring): base[-2] is ONE character, so
    # the string comparisons to "rd"/"tt" never succeed/fail respectively.
    two = base[-2]
    return two == "rd" or (base[-1] == "t" and two != "tt")


def _cond_K(base: str) -> bool:
    last = base[-1]
    third = base[-3] if len(base) >= 3 else ""
    return len(base) > 2 and (last in "li" or (last == "e" and third == "u"))


def _cond_X(base: str) -> bool:
    last = base[-1]
    third = base[-3] if len(base) >= 3 else ""
    return last in "li" or (last == "e" and third == "u")


_CONDITIONS = {
    "A": lambda b: True,
    "B": lambda b: len(b) > 2,
    "C": lambda b: len(b) > 3,
    "D": lambda b: len(b) > 4,
    "E": lambda b: b[-1] != "e",
    "F": lambda b: len(b) > 2 and b[-1] != "e",
    "G": lambda b: len(b) > 2 and b[-1] == "f",
    "H": lambda b: b[-1] == "t" or b.endswith("ll"),
    "I": lambda b: b[-1] not in "oe",
    "J": lambda b: b[-1] not in "ae",
    "K": _cond_K,
    "L": lambda b: b[-1] not in "ux" and (b[-1] != "s" or b[-2] == "o"),
    "M": lambda b: b[-1] not in "acem",
    "N": lambda b: len(b) > 3 or (len(b) == 3 and b[-1] != "s"),
    "O": lambda b: b[-1] in "li",
    "P": lambda b: b[-1] != "c",
    "Q": lambda b: len(b) > 2 and b[-1] not in "ln",
    "R": lambda b: b[-1] in "nr",
    "S": _cond_S,
    "T": lambda b: b[-1] == "s" or (b[-1] == "t" and b[-2] != "o"),
    "U": lambda b: b[-1] in "lmnr",
    "V": lambda b: b[-1] == "c",
    "W": lambda b: b[-1] not in "su",
    "X": _cond_X,
    "Y": lambda b: b.endswith("in"),
    "Z": lambda b: b[-1] != "f",
    # the paper's AA / BB / CC (lowercase in the reference)
    "a": lambda b: b[-1] in "dflt"
    or b[-2:] in ("ph", "th", "er", "or", "es"),
    "b": lambda b: len(b) > 2 and not (b.endswith("met") or b.endswith("ryst")),
    "c": lambda b: b[-1] == "l",
}

# --- Ending table (paper Appendix A): "ending condition-letter", longest
# endings first within the scan. Encoded as one whitespace-separated token
# stream: ENDING:COND.

_ENDING_DATA = """
alistically:B arizability:A izationally:B
antialness:A arisations:A arizations:A entialness:A
allically:C antaneous:A antiality:A arisation:A arization:A ationally:B
ativeness:A eableness:E entations:A entiality:A entialize:A entiation:A
ionalness:A istically:A itousness:A izability:A izational:A
ableness:A arizable:A entation:A entially:A eousness:A ibleness:A
icalness:A ionalism:A ionality:A ionalize:A iousness:A izations:A
lessness:A
ability:A aically:A alistic:B alities:A ariness:E aristic:A arizing:A
ateness:A atingly:A ational:B atively:A ativism:A elihood:E encible:A
entally:A entials:A entiate:A entness:A fulness:A ibility:A icalism:A
icalist:A icality:A icalize:A ication:G icianry:A ination:A ingness:A
ionally:A isation:A ishness:A istical:A iteness:A iveness:A ivistic:A
ivities:A ization:F izement:A oidally:A ousness:A
aceous:A acious:B action:G alness:A ancial:A ancies:A ancing:B
ariser:A arized:A arizer:A atable:A ations:B atives:A eature:Z
efully:A encies:A encing:A ential:A enting:C entist:A eously:A
ialist:A iality:A ialize:A ically:A icance:A icians:A icists:A
ifully:A ionals:A ionate:D ioning:A ionist:A iously:A istics:A
izable:E lessly:A nesses:A oidism:A
acies:A acity:A aging:B aical:A alist:A alism:B ality:A alize:A
allic:b anced:B ances:B antic:C arial:A aries:A arily:A arity:B
arize:A aroid:A ately:A ating:I ation:B ative:A ators:A atory:A
ature:E early:Y ehood:A eless:A elily:A ement:A enced:A ences:A
eness:E ening:E ental:A ented:C ently:A fully:A ially:A icant:A
ician:A icide:A icism:A icist:A icity:A idine:I iedly:A ihood:A
inate:A iness:A ingly:B inism:J inity:c ional:A ioned:A ished:A
istic:A ities:A itous:A ively:A ivity:A izers:F izing:F oidal:A
oides:A otide:A ously:A
able:A ably:A ages:B ally:B ance:B ancy:B ants:B aric:A arly:K
ated:I ates:A atic:B ator:A ealy:Y edly:E eful:A eity:A ence:A
ency:A ened:E enly:E eous:A hood:A ials:A ians:A ible:A ibly:A
ical:A ides:L iers:A iful:A ines:M ings:N ions:B ious:A isms:B
ists:A itic:H ized:F izer:F less:A lily:A ness:A ogen:A ward:A
wise:A ying:B yish:A
acy:A age:B aic:A als:b ant:B ars:O ary:F ata:A ate:A eal:Y ear:Y
ely:E ene:E ent:C ery:E ese:A ful:A ial:A ian:A ics:A ide:L ied:A
ier:A ies:P ily:A ine:M ing:N ion:Q ish:C ism:B ist:A ite:a ity:A
ium:A ive:A ize:F oid:A one:R ous:A
ae:A al:b ar:X as:B ed:E en:F es:E ia:A ic:A is:A ly:B on:S or:T
um:U us:V yl:R s':A 's:A
a:A e:A i:A o:A s:W y:B
"""

# endings bucketed by length, 11 down to 1
_ENDINGS: dict[int, dict[str, object]] = {n: {} for n in range(1, 12)}
for _tok in _ENDING_DATA.split():
    _end, _c = _tok.rsplit(":", 1)
    _ENDINGS[len(_end)][_end] = _CONDITIONS[_c]


def _remove_ending(word: str) -> str:
    """Longest matching ending whose condition accepts the base; the base
    must keep at least 2 characters (the paper's minimum-stem rule)."""
    n = len(word)
    for size in range(11, 0, -1):
        if n - size < 2:
            continue
        cond = _ENDINGS[size].get(word[n - size :])
        if cond is not None:
            base = word[: n - size]
            if cond(base):
                return base
    return word


# --- Recoding (paper Appendix C / the reference's transformation rules 2-34
# plus the undoubling rule 1). Each entry: (old_tail, replacement) or
# (old_tail, replacement, forbidden_preceding_chars).

_RECODE_RULES = (
    ("iev", "ief"),
    ("uct", "uc"),
    ("umpt", "um"),
    ("rpt", "rb"),
    ("urs", "ur"),
    ("istr", "ister"),
    ("metr", "meter"),
    ("olv", "olut"),
    ("ul", "l", "aoi"),
    ("bex", "bic"),
    ("dex", "dic"),
    ("pex", "pic"),
    ("tex", "tic"),
    ("ax", "ac"),
    ("ex", "ec"),
    ("ix", "ic"),
    ("lux", "luc"),
    ("uad", "uas"),
    ("vad", "vas"),
    ("cid", "cis"),
    ("lid", "lis"),
    ("erid", "eris"),
    ("pand", "pans"),
    ("end", "ens", "s"),
    ("ond", "ons"),
    ("lud", "lus"),
    ("rud", "rus"),
    ("her", "hes", "pt"),
    ("mit", "mis"),
    ("ent", "ens", "m"),
    ("ert", "ers"),
    ("et", "es", "n"),
    ("yt", "ys"),
    ("yz", "ys"),
)

# first-match-wins within the rules sharing a final letter, in table order
_RECODE_BY_LAST: dict[str, tuple] = {}
for _r in _RECODE_RULES:
    _RECODE_BY_LAST.setdefault(_r[0][-1], [])
    _RECODE_BY_LAST[_r[0][-1]].append(_r)

_DOUBLED = frozenset("bdglmnprst")  # bb dd gg ll mm nn pp rr ss tt


def _recode(stem: str) -> str:
    if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] in _DOUBLED:
        # rule 1: undouble — but the reference only undoubles the pairs in
        # its _doubles set, which excludes "bb"
        if stem[-1] != "b":
            stem = stem[:-1]
    for rule in _RECODE_BY_LAST.get(stem[-1], ()):
        tail, repl = rule[0], rule[1]
        if stem.endswith(tail):
            if len(rule) > 2 and len(stem) > len(tail):
                if stem[-len(tail) - 1] in rule[2]:
                    return stem
            return stem[: len(stem) - len(tail)] + repl
    return stem


def stem(word: str) -> str:
    """Stem ``word`` with the Lovins algorithm (reference-identical)."""
    return _recode(_remove_ending(word))
