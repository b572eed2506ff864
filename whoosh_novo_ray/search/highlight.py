"""Search-result highlighting: fragmenters + formatters.

Query-time port of the reference highlight pipeline (de-odex/whoosh-novo
``src/whoosh/highlight.py``): re-tokenize the stored text with character
offsets, pick fragments around matched terms (Whole / Context fragmenters),
score fragments by matched-term count (BasicFragmentScorer), format with
uppercase or HTML markers.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

import numpy as np

from whoosh_novo_ray.analysis import DEFAULT_PATTERN, StandardAnalyzer


@dataclass(frozen=True)
class Span:
    start: int
    end: int
    text: str


def _all_tokens(
    text: str, terms: set[str], analyzer: StandardAnalyzer
) -> list[tuple[int, int, bool, str]]:
    """Every token as (startchar, endchar, matched, analyzed_text).

    Mirrors the reference highlight() token stream (highlight.py:953-954):
    the full analyzer chain with ``removestops=False`` — stopwords stay in
    the stream (they pace the fragmenter's char countdown) and ``matched``
    compares the ANALYZED token text against the term set."""
    rx = re.compile(analyzer.pattern if analyzer else DEFAULT_PATTERN)
    do_stem = bool(analyzer and analyzer.stem)
    if do_stem:
        from whoosh_novo_ray.porter import stem as _stem
    out = []
    for m in rx.finditer(text):
        tok = m.group(0).lower()
        if do_stem:
            tok = _stem(tok)
        out.append((m.start(), m.end(), tok in terms, tok))
    return out


def _matched_spans(text: str, terms: set[str], analyzer: StandardAnalyzer) -> list[Span]:
    return [
        Span(s, e, tok)
        for (s, e, matched, tok) in _all_tokens(text, terms, analyzer)
        if matched
    ]


@dataclass(frozen=True)
class Fragment:
    start: int
    end: int
    matches: tuple

    def __lt__(self, other: "Fragment") -> bool:
        # reference Fragment.__lt__ compares startchar only — this ordering
        # decides nlargest cutoff ties in top_fragments
        return self.start < other.start


@dataclass
class WholeFragmenter:
    """The entire text as one fragment (reference WholeFragmenter,
    highlight.py:312-347; matches beyond ``charlimit`` are dropped)."""

    charlimit: int = 2**15

    def fragments(self, text: str, spans: list[Span]) -> list[Fragment]:
        if self.charlimit:
            spans = [sp for sp in spans if sp.end <= self.charlimit]
        return [Fragment(0, len(text), tuple(spans))]

    def fragment_tokens(
        self, text: str, tokens: list[tuple[int, int, bool, str]]
    ) -> list[Fragment]:
        matches = []
        for s, e, matched, tok in tokens:
            if self.charlimit and e > self.charlimit:
                break
            if matched:
                matches.append(Span(s, e, tok))
        return [Fragment(0, len(text), tuple(matches))]


@dataclass
class ContextFragmenter:
    """Fragments of ~maxchars around match clusters — byte-identical to the
    reference ContextFragmenter (highlight.py:428-514): a char-countdown
    state machine over the FULL token stream. Non-matched tokens inside a
    fragment consume the countdown without joining the match list; the
    fragment opens up to ``surround`` chars of buffered context before the
    first match (doubled when no context precedes it) and closes when
    ``surround`` chars pass without a new match (or ``maxchars`` fills);
    the closing boundary is the endchar of whatever token expired it."""

    maxchars: int = 200
    surround: int = 20
    charlimit: int = 2**15

    def fragment_tokens(
        self, text: str, tokens: list[tuple[int, int, bool, str]]
    ) -> list[Fragment]:
        from collections import deque

        maxchars, surround, charlimit = self.maxchars, self.surround, self.charlimit
        first = None
        firsts: deque = deque()
        countdown = -1
        tks: list[Span] = []
        currentlen = 0
        endchar = None
        frags: list[Fragment] = []
        for s, e, matched, tok in tokens:
            tlength = e - s
            if charlimit and e > charlimit:
                break
            if countdown < 0 and not matched:
                firsts.append(s)
                while firsts and e - firsts[0] > surround:
                    firsts.popleft()
            elif currentlen + tlength > maxchars:
                countdown = 0
            elif matched:
                countdown = surround
                if first is None:
                    if firsts:
                        first = firsts[0]
                    else:
                        first = s
                        countdown += surround
                tks.append(Span(s, e, tok))
            if countdown >= 0:
                currentlen += tlength
                countdown -= tlength
                if countdown <= 0:
                    # first may be None on the oversized-token edge (a token
                    # longer than maxchars trips the size branch before any
                    # match opened the fragment); reference mkfrag defaults
                    # the start to 0 there (highlight.py:70-71)
                    frags.append(
                        Fragment(first if first is not None else 0, e, tuple(tks))
                    )
                    tks = []
                    firsts = deque()
                    first = None
                    currentlen = 0
            endchar = e
        if tks:
            frags.append(
                Fragment(first if first is not None else 0, endchar, tuple(tks))
            )
        return frags

    def fragments(self, text: str, spans: list[Span]) -> list[Fragment]:
        """Matched-spans-only entry (index-stored-chars path): rebuilds a
        token stream from the raw tokenizer so the state machine above still
        applies; matches are taken from ``spans`` by position."""
        starts = {sp.start for sp in spans}
        rx = re.compile(DEFAULT_PATTERN)
        tokens = [
            (m.start(), m.end(), m.start() in starts, m.group(0).lower())
            for m in rx.finditer(text)
        ]
        return self.fragment_tokens(text, tokens)


@dataclass
class SentenceFragmenter:
    """Whole sentences containing at least one match — byte-identical to the
    reference SentenceFragmenter (highlight.py:354-426): a sentence closes
    when the character AFTER a token is '.', '!' or '?' (but not when two
    punctuation chars run together, e.g. '...'); the fragment spans first
    token start .. last token end (punctuation excluded); sentences with
    more than ``maxchars`` of TOKEN text are dropped; a trailing unclosed
    sentence is still emitted. Use an analyzer without a stoplist for best
    results."""

    maxchars: int = 200
    sentencechars: str = ".!?"
    charlimit: int = 2**15

    def fragment_tokens(
        self, text: str, tokens: list[tuple[int, int, bool, str]]
    ) -> list[Fragment]:
        sentencechars = frozenset(self.sentencechars)
        textlen = len(text)
        first = None
        tks: list[Span] = []
        endchar = None
        currentlen = 0
        frags: list[Fragment] = []
        for s, e, matched, tok in tokens:
            if self.charlimit and e > self.charlimit:
                break
            if first is None:
                first = s
                currentlen = 0
            currentlen += e - s
            if matched:
                tks.append(Span(s, e, tok))
            endchar = e
            if e < textlen and text[e] in sentencechars:
                if e + 1 < textlen and text[e + 1] in sentencechars:
                    continue  # '..' / '...' is not a sentence break
                if tks and currentlen <= self.maxchars:
                    frags.append(Fragment(first, e, tuple(tks)))
                tks = []
                first = None
                currentlen = 0
        if tks:
            frags.append(Fragment(first, endchar, tuple(tks)))
        return frags

    def fragments(self, text: str, spans: list[Span]) -> list[Fragment]:
        starts = {sp.start for sp in spans}
        rx = re.compile(DEFAULT_PATTERN)
        tokens = [
            (m.start(), m.end(), m.start() in starts, m.group(0).lower())
            for m in rx.finditer(text)
        ]
        return self.fragment_tokens(text, tokens)


@dataclass
class PinpointFragmenter:
    """Builds fragments directly from match positions without retokenizing —
    byte-identical to the reference PinpointFragmenter (highlight.py:
    516-600): a greedy group grows while the next match starts within
    ``surround`` of the current right edge AND ends within ``maxchars`` of
    the group start (token-char budget); the fragment is the group padded
    by ``surround`` on both sides; ``autotrim`` moves the edges inside the
    first/last space but never into a matched token."""

    maxchars: int = 200
    surround: int = 20
    autotrim: bool = False
    charlimit: int = 2**15

    def fragments(self, text: str, spans: list[Span]) -> list[Fragment]:
        if not spans:
            return []
        frags: list[Fragment] = []
        j = -1
        for i, t in enumerate(spans):
            if j >= i:
                continue
            j = i
            left, right = t.start, t.end
            if self.charlimit and right > self.charlimit:
                break
            currentlen = right - left
            while j < len(spans) - 1 and currentlen < self.maxchars:
                nxt = spans[j + 1]
                if nxt.end - right <= self.surround and nxt.end - left <= self.maxchars:
                    j += 1
                    currentlen += nxt.end - nxt.start
                    right = nxt.end
                else:
                    break
            lo = max(0, left - self.surround)
            hi = min(len(text), right + self.surround)
            group = spans[i : j + 1]
            if self.autotrim:
                lo, hi = self._autotrim(text, lo, hi, group)
            frags.append(Fragment(lo, hi, tuple(group)))
        return frags

    def fragment_tokens(
        self, text: str, tokens: list[tuple[int, int, bool, str]]
    ) -> list[Fragment]:
        return self.fragments(
            text, [Span(s, e, tok) for s, e, matched, tok in tokens if matched]
        )

    @staticmethod
    def _autotrim(text: str, lo: int, hi: int, group: list[Span]):
        firstspace = text.find(" ", lo, hi)
        if firstspace > 0:
            lo = firstspace + 1
        lastspace = text.rfind(" ", lo, hi)
        if lastspace > 0:
            hi = lastspace
        if group:
            lo = min(lo, group[0].start)
            hi = max(hi, group[-1].end)
        return lo, hi


def basic_fragment_score(f: Fragment) -> float:
    """Reference BasicFragmentScorer (highlight.py:610-619): sum of match
    boosts (1.0 each here) times 100x the number of DISTINCT matched terms
    (diversity bonus), or times 1 when nothing matched."""
    return len(f.matches) * ((len({m.text for m in f.matches}) * 100) or 1)


# fragment sorters (reference highlight.py:625-644); SCORE's constant key
# plus Python's stable sort preserves the nlargest score-desc order


def SCORE(f: Fragment):
    return 1


def FIRST(f: Fragment):
    return f.start


def LONGER(f: Fragment):
    return f.start - f.end


def SHORTER(f: Fragment):
    return f.end - f.start


def top_fragments(
    frags: list[Fragment], top: int, minscore: float = 1.0, order=FIRST
):
    """Reference top_fragments (highlight.py:919-924): heapq.nlargest over
    (score, fragment) — on score ties the LATER fragment (larger startchar)
    wins the cutoff slot, unlike a stable sort — then re-sort the winners by
    ``order`` (FIRST/SCORE/LONGER/SHORTER) and a minscore floor (1.0 drops
    match-free fragments)."""
    import heapq

    best = heapq.nlargest(top, ((basic_fragment_score(f), f) for f in frags))
    out = [f for sc, f in best if sc >= minscore]
    out.sort(key=order)
    return out


def _fragment_matches(f: Fragment):
    """Reference Formatter.format_fragment match ordering (highlight.py:
    717-724): by (startchar, longest-first), skipping tokens that overlap an
    already-formatted one — picks the longest of overlapping tokens."""
    out = []
    index = f.start
    for m in sorted(f.matches, key=lambda m: (m.start, -(m.end - m.start))):
        if m.start < index:
            continue
        out.append(m)
        index = m.end
    return out


class UppercaseFormatter:
    def format_fragment(self, text: str, f: Fragment) -> str:
        out = []
        pos = f.start
        for m in _fragment_matches(f):
            out.append(text[pos : m.start])
            out.append(text[m.start : m.end].upper())
            pos = m.end
        out.append(text[pos : f.end])
        return "".join(out)


class HtmlFormatter:
    """Reference HtmlFormatter (highlight.py:769-846): every matched token
    gets ``class="<classname> <termclass><N>"`` where N is assigned per
    distinct matched text in first-seen order and recycled mod
    ``maxclasses``; the ``seen`` map persists across fragments/calls so the
    same term keeps its class (call ``clean()`` between searches);
    everything is escaped with quote=False (quotes pass through)."""

    def __init__(
        self,
        tagname: str = "strong",
        classname: str = "match",
        termclass: str = "term",
        maxclasses: int = 5,
        attrquote: str = '"',
    ):
        self.tagname = tagname
        self.classname = classname
        self.termclass = termclass
        self.maxclasses = maxclasses
        self.attrquote = attrquote
        self.seen: dict[str, int] = {}

    def clean(self) -> None:
        self.seen = {}

    def format_fragment(self, text: str, f: Fragment) -> str:
        out = []
        pos = f.start
        esc = lambda s: _html.escape(s, quote=False)  # noqa: E731
        for m in _fragment_matches(f):
            out.append(esc(text[pos : m.start]))
            ttext = esc(text[m.start : m.end])
            if ttext in self.seen:
                termnum = self.seen[ttext]
            else:
                termnum = len(self.seen) % self.maxclasses
                self.seen[ttext] = termnum
            q = self.attrquote
            out.append(
                f"<{self.tagname} class={q}{self.classname} "
                f"{self.termclass}{termnum}{q}>{ttext}</{self.tagname}>"
            )
            pos = m.end
        out.append(esc(text[pos : f.end]))
        return "".join(out)


def highlight_from_index(
    searcher,
    doc_id: int,
    text: str,
    terms,
    fragmenter=None,
    formatter=None,
    top: int = 3,
    sep: str = "...",
    order=FIRST,
) -> str:
    """Highlight using the INDEX-STORED character offsets (Characters
    format, requires IndexConfig(with_chars=True)) — no re-tokenization of
    the document at query time (reference highlight-from-stored-chars path,
    highlight.py set_matched_chars)."""
    fragmenter = fragmenter or ContextFragmenter()
    formatter = formatter or UppercaseFormatter()
    rows = searcher.index.term_rows(list(terms), with_chars=True)
    spans = []
    for t, rl in rows.items():
        for r in rl:
            ids, _tfs, _ = r.decode_all()
            hit = np.flatnonzero(ids == np.uint64(doc_id))
            if not len(hit):
                continue
            ch, counts = r.decode_all_chars()
            offs = np.cumsum(counts) - counts
            i = int(hit[0])
            seg = ch[int(offs[i]) : int(offs[i] + counts[i])]
            for sc, ec in seg.tolist():
                spans.append(Span(int(sc), int(ec), text[int(sc) : int(ec)]))
    spans.sort(key=lambda sp: sp.start)
    frags = fragmenter.fragments(text, spans)
    frags = top_fragments(frags, top, order=order)
    return sep.join(formatter.format_fragment(text, f) for f in frags)


def highlight(
    text: str,
    terms,
    analyzer: StandardAnalyzer | None = None,
    fragmenter=None,
    formatter=None,
    top: int = 3,
    sep: str = "...",
    order=FIRST,
) -> str:
    """Highlight occurrences of ``terms`` in ``text`` (reference
    ``highlight.highlight`` / Hit.highlights)."""
    analyzer = analyzer or StandardAnalyzer()
    fragmenter = fragmenter or ContextFragmenter()
    formatter = formatter or UppercaseFormatter()
    termset = {t.lower() for t in terms}
    if hasattr(fragmenter, "fragment_tokens"):
        # the reference pipeline: the fragmenter paces itself on the FULL
        # token stream (stopwords kept), not just the matches
        frags = fragmenter.fragment_tokens(text, _all_tokens(text, termset, analyzer))
    else:
        frags = fragmenter.fragments(text, _matched_spans(text, termset, analyzer))
    frags = top_fragments(frags, top, order=order)
    return sep.join(formatter.format_fragment(text, f) for f in frags)


class HighlightStage:
    """map_batches actor: snippet per document, for highlighting result
    sets / whole corpora at scale. The analyzer / fragmenter / formatter
    build ONCE per actor (``__init__``), each batch is plain per-row string
    work (inherently scalar, but embarrassingly parallel across actors)."""

    def __init__(
        self,
        terms,
        analyzer=None,
        fragmenter=None,
        formatter=None,
        top: int = 3,
        sep: str = "...",
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.terms = {t.lower() for t in terms}
        self.analyzer = analyzer or StandardAnalyzer()
        self.fragmenter = fragmenter or ContextFragmenter()
        self.formatter = formatter or UppercaseFormatter()
        self.top = top
        self.sep = sep
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch):
        import pyarrow as pa

        snippets = [
            highlight(
                t,
                self.terms,
                analyzer=self.analyzer,
                fragmenter=self.fragmenter,
                formatter=self.formatter,
                top=self.top,
                sep=self.sep,
            )
            for t in batch[self.text_col].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "snippet": pa.array(snippets, pa.string()),
            }
        )


def highlight_dataset(
    docs,
    terms,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
    **kwargs,
):
    """Distributed highlighting: (doc_id, snippet) Dataset over an input
    docs Dataset — the batch path for "show snippets for every hit of a
    crawl-wide filter" workloads.

    Default is TASK-based: the stage is built once on the driver and ships
    in each task's closure (analyzer/fragmenter construction is trivially
    cheap, and a fixed actor pool can stall behind other pools when few
    CPUs are free). Pass ``concurrency=N`` explicitly to run a fixed actor
    pool instead — worth it only when a custom analyzer is expensive to
    construct or unpicklable state must be built on the worker."""
    import ray.data  # noqa: F401

    if concurrency is None:
        stage = HighlightStage(
            list(terms), text_col=text_col, id_col=id_col, **kwargs
        )
        return docs.map_batches(
            lambda batch: stage(batch),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return docs.map_batches(
        HighlightStage,
        fn_constructor_args=(list(terms),),
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col, **kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
