"""Query-string parser: the rank-relevant subset of the reference's
plugin-based QueryParser (de-odex/whoosh-novo ``src/whoosh/qparser/``).

Supported syntax (single default field):
  term                         analyzed term (stop words vanish)
  a b c                        implicit AND (reference default AndGroup)
  a AND b / a OR b             explicit boolean (left-assoc, OR binds looser)
  NOT a                        negation (requires doc universe at eval)
  a ANDNOT b / a ANDMAYBE b    binary operators
  "a b c" / "a b"~2            phrase, optional slop
  "search dat*"                SequencePlugin: wildcards inside quotes
                               match in sequence
  pre*                         prefix; wild*card / wi?ld -> wildcard
  [a TO b] / {a TO b}          term range (inclusive / exclusive)
  term~ / term~2 / term~2/3    fuzzy term (maxdist, optional prefix length)
  field:>x  field:<=y          GtLt ranges (GtLtPlugin; field name dropped —
                               single-field parser)
  date:'last tuesday to now'   natural-language datetime filter for fields
                               registered via ``datetime_fields``
  term^2.5                     boost
  ( ... )                      grouping
  *                            Every (match all)

``simple_parse`` implements the reference SimpleParser / PlusMinusPlugin:
a flat query where ``+term`` is required, ``-term`` banned, everything else
optional (OR), combined as AndMaybe(required, optional) AndNot banned.
"""

from __future__ import annotations

import re

from whoosh_novo_ray.analysis import StandardAnalyzer
from whoosh_novo_ray.search import query as Q

_TOKEN_RX = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<dtq>(?P<dt_field>[A-Za-z_][A-Za-z0-9_]*):'(?P<dt_text>[^']*)') |
    (?P<phrase>"(?P<phr>[^"]*)"(~(?P<slop>\d+))?) |
    (?P<brange>\[(?P<b_lo>\S+)\s+TO\s+(?P<b_hi>\S+)\]) |
    (?P<crange>\{(?P<c_lo>\S+)\s+TO\s+(?P<c_hi>\S+)\}) |
    (?P<word>[^\s()"]+)
    """,
    re.VERBOSE,
)

# GtLtPlugin relations (reference qparser/plugins.py:1081-1140)
_GTLT_RX = re.compile(r"^(<=|>=|=<|=>|<|>)(.+)$")
# FuzzyTermPlugin: word~ , word~N , word~N/M (reference plugins.py:443-520)
_FUZZY_RX = re.compile(r"^(.+?)~(\d)?(?:/(\d+))?$")


class ParseError(ValueError):
    pass


NULL = Q.NULL


class QueryParser:
    def __init__(
        self,
        analyzer: StandardAnalyzer | None = None,
        datetime_fields: dict | None = None,
    ):
        """``datetime_fields`` maps a field name to (attrs, column,
        basedate) — the DateParserPlugin wiring: ``field:'<natural
        language>'`` becomes a native DateRange filter over that column."""
        self.analyzer = analyzer or StandardAnalyzer()
        self.datetime_fields = datetime_fields or {}

    # -- lexing ----------------------------------------------------------------

    def _lex(self, s: str) -> list[tuple[str, object]]:
        out = []
        for m in _TOKEN_RX.finditer(s):
            kind = m.lastgroup if m.lastgroup in ("lparen", "rparen") else None
            if m.group("lparen"):
                out.append(("(", None))
            elif m.group("rparen"):
                out.append((")", None))
            elif m.group("dtq") is not None:
                out.append(("dtq", (m.group("dt_field"), m.group("dt_text"))))
            elif m.group("phrase") is not None:
                slop = int(m.group("slop") or 1)
                out.append(("phrase", (m.group("phr"), slop)))
            elif m.group("brange") is not None:
                out.append(("range", (m.group("b_lo"), m.group("b_hi"), False, False)))
            elif m.group("crange") is not None:
                out.append(("range", (m.group("c_lo"), m.group("c_hi"), True, True)))
            else:
                w = m.group("word")
                if w in ("AND", "OR", "NOT", "ANDNOT", "ANDMAYBE"):
                    out.append((w, None))
                else:
                    out.append(("word", w))
        return out

    # -- parsing (precedence: OR < AND/implicit < ANDNOT/ANDMAYBE < NOT) -------

    def parse(self, s: str) -> Q.Query:
        self._toks = self._lex(s)
        self._i = 0
        q = self._parse_or()
        if self._i != len(self._toks):
            raise ParseError(f"unexpected token at {self._i}: {self._toks[self._i]}")
        return self._simplify(q)

    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else (None, None)

    def _next(self):
        t = self._peek()
        self._i += 1
        return t

    def _parse_or(self) -> Q.Query:
        parts = [self._parse_and()]
        while self._peek()[0] == "OR":
            self._next()
            parts.append(self._parse_and())
        parts = [p for p in parts if p is not NULL]
        if not parts:
            return NULL
        return parts[0] if len(parts) == 1 else Q.Or(*parts)

    def _parse_and(self) -> Q.Query:
        parts = [self._parse_binop()]
        while True:
            kind, _ = self._peek()
            if kind == "AND":
                self._next()
                parts.append(self._parse_binop())
            elif kind in ("word", "phrase", "range", "dtq", "(", "NOT"):
                parts.append(self._parse_binop())  # implicit AND
            else:
                break
        parts = [p for p in parts if p is not NULL]
        if not parts:
            return NULL
        return parts[0] if len(parts) == 1 else Q.And(*parts)

    def _parse_binop(self) -> Q.Query:
        left = self._parse_unary()
        while self._peek()[0] in ("ANDNOT", "ANDMAYBE"):
            op, _ = self._next()
            right = self._parse_unary()
            if right is NULL:
                continue
            if left is NULL:
                left = right if op == "ANDMAYBE" else NULL
                continue
            left = Q.AndNot(left, right) if op == "ANDNOT" else Q.AndMaybe(left, right)
        return left

    def _parse_unary(self) -> Q.Query:
        kind, val = self._peek()
        if kind == "NOT":
            self._next()
            inner = self._parse_unary()
            if inner is NULL:
                return NULL
            return Q.AndNot(Q.Every(), inner)
        return self._parse_atom()

    def _parse_atom(self) -> Q.Query:
        kind, val = self._next()
        if kind == "(":
            q = self._parse_or()
            if self._next()[0] != ")":
                raise ParseError("missing closing paren")
            return q
        if kind == "phrase":
            text, slop = val
            raw_words = text.split()
            if any("*" in w or "?" in w for w in raw_words):
                # SequencePlugin (reference qparser/plugins.py:758-800):
                # quotes may contain term-expanding sub-queries, matched in
                # sequence — e.g. "search dat*"
                children = [self._parse_word(w) for w in raw_words]
                children = [c for c in children if c is not NULL]
                if not children:
                    return NULL
                if len(children) == 1:
                    return children[0]
                return Q.Sequence(*children, slop=slop)
            words = self.analyzer(text)
            if not words:
                return NULL
            if len(words) == 1:
                return Q.Term(words[0])
            return Q.Phrase(words, slop=slop)
        if kind == "range":
            lo, hi, loexcl, hiexcl = val
            lo = None if lo == "*" else lo.lower()
            hi = None if hi == "*" else hi.lower()
            return Q.TermRange(lo, hi, loexcl, hiexcl)
        if kind == "dtq":
            field, text = val
            if field in self.datetime_fields:
                from whoosh_novo_ray.search.dateparse import date_range_query

                attrs, column, basedate = self.datetime_fields[field]
                return date_range_query(attrs, column, text, basedate)
            # unregistered field: treat the quoted text as a phrase
            words = self.analyzer(text)
            if not words:
                return NULL
            if len(words) == 1:
                return Q.Term(words[0], field=field)
            return Q.Phrase(words)
        if kind == "word":
            return self._parse_word(val)
        raise ParseError(f"unexpected token {kind}")

    def _parse_word(self, w: str) -> Q.Query:
        boost = 1.0
        m = re.match(r"^(.*)\^(\d+(\.\d+)?)$", w)
        if m:
            w, boost = m.group(1), float(m.group(2))
        field = None
        fm = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", w)
        if fm:
            field, w = fm.group(1), fm.group(2)
        if w == "*":
            return Q.Every(boost=boost)
        gm = _GTLT_RX.match(w)
        if gm and field is not None:
            rel, text = gm.group(1), gm.group(2).lower()
            # single-field parser: the field specifier selects GtLt syntax
            # but the range applies to the default field (documented)
            if rel in ("<", "=<", "<="):
                return Q.TermRange(None, text, False, rel == "<")
            return Q.TermRange(text, None, rel == ">", False)
        fz = _FUZZY_RX.match(w)
        if fz and ("*" not in w and "?" not in w):
            from whoosh_novo_ray.search.fuzzy import FuzzyTerm

            text = fz.group(1).lower()
            maxdist = int(fz.group(2)) if fz.group(2) else 1
            plen = int(fz.group(3)) if fz.group(3) else 0
            return FuzzyTerm(
                text, maxdist=maxdist, prefixlength=plen, boost=boost
            )
        if "*" in w or "?" in w:
            wl = w.lower()
            if (
                wl.endswith("*")
                and "*" not in wl[:-1]
                and "?" not in wl
                and len(wl) > 1
            ):
                q = Q.Prefix(wl[:-1], boost=boost)
            else:
                q = Q.Wildcard(wl, boost=boost)
            return q
        toks = self.analyzer(w)
        if not toks:
            return NULL
        if len(toks) == 1:
            return Q.Term(toks[0], boost=boost, field=field)
        # one input word analyzing to several tokens (e.g. "big-time")
        return Q.And(*[Q.Term(t, boost=boost, field=field) for t in toks])

    def _simplify(self, q: Q.Query) -> Q.Query:
        return q

    def simple_parse(self, s: str) -> Q.Query:
        """Reference SimpleParser / PlusMinusPlugin (plugins.py:1016-1078):
        flat tokens; '+term' required, '-term' banned, the rest optional
        (OR). Result = AndMaybe(And(required), Or(optional)) AndNot
        Or(banned)."""
        required, optional, banned = [], [], []
        for raw in s.split():
            bucket = optional
            if raw.startswith("+") and len(raw) > 1:
                bucket, raw = required, raw[1:]
            elif raw.startswith("-") and len(raw) > 1:
                bucket, raw = banned, raw[1:]
            for t in self.analyzer(raw):
                bucket.append(Q.Term(t))

        def _group(parts, cls):
            if not parts:
                return None
            return parts[0] if len(parts) == 1 else cls(*parts)

        req = _group(required, Q.And)
        opt = _group(optional, Q.Or)
        ban = _group(banned, Q.Or)
        q = opt
        if req is not None:
            q = Q.AndMaybe(req, opt) if opt is not None else req
        if q is None:
            if ban is None:
                return NULL
            return Q.AndNot(Q.Every(), ban)
        if ban is not None:
            q = Q.AndNot(q, ban)
        return q
