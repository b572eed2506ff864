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


def _matched_spans(text: str, terms: set[str], analyzer: StandardAnalyzer) -> list[Span]:
    rx = re.compile(analyzer.pattern if analyzer else DEFAULT_PATTERN)
    out = []
    for m in rx.finditer(text):
        tok = m.group(0).lower()
        if analyzer and analyzer.stem:
            from whoosh_novo_ray.porter import stem

            tok = stem(tok)
        if tok in terms:
            out.append(Span(m.start(), m.end(), m.group(0)))
    return out


@dataclass(frozen=True)
class Fragment:
    start: int
    end: int
    matches: tuple


class WholeFragmenter:
    """The entire text as one fragment (reference WholeFragmenter)."""

    def fragments(self, text: str, spans: list[Span]) -> list[Fragment]:
        return [Fragment(0, len(text), tuple(spans))]


@dataclass
class ContextFragmenter:
    """Fragments of ~maxchars around match clusters (reference
    ContextFragmenter, highlight.py:436-515)."""

    maxchars: int = 200
    surround: int = 40

    def fragments(self, text: str, spans: list[Span]) -> list[Fragment]:
        if not spans:
            return []
        frags: list[Fragment] = []
        cur: list[Span] = [spans[0]]
        start = max(0, spans[0].start - self.surround)
        end = min(len(text), spans[0].end + self.surround)
        for sp in spans[1:]:
            if sp.start - end <= self.surround and (
                min(len(text), sp.end + self.surround) - start
            ) <= self.maxchars:
                cur.append(sp)
                end = min(len(text), sp.end + self.surround)
            else:
                frags.append(Fragment(start, end, tuple(cur)))
                cur = [sp]
                start = max(0, sp.start - self.surround)
                end = min(len(text), sp.end + self.surround)
        frags.append(Fragment(start, end, tuple(cur)))
        return frags


@dataclass
class SentenceFragmenter:
    """Whole sentences containing at least one match (reference
    SentenceFragmenter, highlight.py:275-335): a sentence ends at '.', '!'
    or '?' immediately following a token; sentences longer than ``maxchars``
    are dropped. Use an analyzer without a stoplist for best results."""

    maxchars: int = 200
    sentencechars: str = ".!?"

    def fragments(self, text: str, spans: list[Span]) -> list[Fragment]:
        if not spans:
            return []
        rx = re.compile(DEFAULT_PATTERN)
        ends = [
            m.end()
            for m in rx.finditer(text)
            if m.end() < len(text) and text[m.end()] in self.sentencechars
        ]
        bounds = [0] + [e + 1 for e in ends] + [len(text)]
        frags: list[Fragment] = []
        si = 0
        for lo, hi in zip(bounds, bounds[1:]):
            if hi - lo > self.maxchars:
                continue
            matches = []
            while si < len(spans) and spans[si].start < hi:
                if spans[si].start >= lo:
                    matches.append(spans[si])
                si += 1
            if matches:
                frags.append(Fragment(lo, hi, tuple(matches)))
        return frags


@dataclass
class PinpointFragmenter:
    """Builds fragments directly from match positions without retokenizing
    (reference PinpointFragmenter, highlight.py:516-600): matches within
    ``maxchars`` of each other share a fragment, padded by ``surround``
    chars; ``autotrim`` snaps fragment edges to whitespace."""

    maxchars: int = 200
    surround: int = 20
    autotrim: bool = False

    def fragments(self, text: str, spans: list[Span]) -> list[Fragment]:
        if not spans:
            return []
        frags: list[Fragment] = []
        cur = [spans[0]]
        for sp in spans[1:]:
            if sp.end - cur[0].start <= self.maxchars:
                cur.append(sp)
            else:
                frags.append(self._make(text, cur))
                cur = [sp]
        frags.append(self._make(text, cur))
        return frags

    def _make(self, text: str, group: list[Span]) -> Fragment:
        lo = max(0, group[0].start - self.surround)
        hi = min(len(text), group[-1].end + self.surround)
        if self.autotrim:
            sp = text.find(" ", lo, group[0].start)
            if lo > 0 and sp > -1:
                lo = sp + 1
            sp = text.rfind(" ", group[-1].end, hi)
            if hi < len(text) and sp > -1:
                hi = sp
        return Fragment(lo, hi, tuple(group))


def basic_fragment_score(f: Fragment) -> float:
    """Matched-term count + distinct bonus (reference BasicFragmentScorer)."""
    return len(f.matches) + len({m.text.lower() for m in f.matches}) * 0.5


class UppercaseFormatter:
    def format_fragment(self, text: str, f: Fragment) -> str:
        out = []
        pos = f.start
        for m in f.matches:
            out.append(text[pos : m.start])
            out.append(text[m.start : m.end].upper())
            pos = m.end
        out.append(text[pos : f.end])
        return "".join(out)


@dataclass
class HtmlFormatter:
    tagname: str = "strong"
    classname: str = "match"

    def format_fragment(self, text: str, f: Fragment) -> str:
        out = []
        pos = f.start
        for m in f.matches:
            out.append(_html.escape(text[pos : m.start]))
            out.append(
                f'<{self.tagname} class="{self.classname}">'
                f"{_html.escape(text[m.start:m.end])}</{self.tagname}>"
            )
            pos = m.end
        out.append(_html.escape(text[pos : f.end]))
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
    frags = sorted(frags, key=basic_fragment_score, reverse=True)[:top]
    frags.sort(key=lambda f: f.start)
    return sep.join(formatter.format_fragment(text, f) for f in frags)


def highlight(
    text: str,
    terms,
    analyzer: StandardAnalyzer | None = None,
    fragmenter=None,
    formatter=None,
    top: int = 3,
    sep: str = "...",
) -> str:
    """Highlight occurrences of ``terms`` in ``text`` (reference
    ``highlight.highlight`` / Hit.highlights)."""
    analyzer = analyzer or StandardAnalyzer()
    fragmenter = fragmenter or ContextFragmenter()
    formatter = formatter or UppercaseFormatter()
    spans = _matched_spans(text, {t.lower() for t in terms}, analyzer)
    frags = fragmenter.fragments(text, spans)
    frags = sorted(frags, key=basic_fragment_score, reverse=True)[:top]
    frags.sort(key=lambda f: f.start)
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
