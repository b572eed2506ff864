"""WordNet thesaurus: parse the ``wn_s.pl`` Prolog synset file into a
synonym lookup, with an optional parquet-persisted form.

Behavioral port of the reference wordnet module
(``/root/reference/src/whoosh/lang/wordnet.py:40-96``) — same parsing
quirks (only ``s(`` lines, first single-quoted token, ``isalpha()``
word filter, lowercase) and the same ``synonyms`` contract (union of the
word's synsets minus the word itself, sorted).  Where the reference
persists to a whoosh index (``to_storage``/``from_storage``), this engine
persists to a single sorted parquet file — the natural storage unit here,
and (like the reference's index form) much faster to reopen than
re-parsing the Prolog file.

The WordNet data file itself is not bundled; any file in the published
``wn_s.pl`` format works (http://wordnetcode.princeton.edu WNprolog-3.0).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq


def parse_file(f):
    """Parse a ``wn_s.pl`` file-like (text or bytes lines) into
    (word2nums, num2words)."""
    word2nums = defaultdict(list)
    num2words = defaultdict(list)
    for line in f:
        if isinstance(line, bytes):
            line = line.decode("utf-8", "replace")
        if not line.startswith("s("):
            continue
        line = line[2:]
        num = int(line[: line.find(",")])
        qt = line.find("'")
        line = line[qt + 1 :]
        qt = line.find("'")
        word = line[:qt].lower()
        if not word.isalpha():
            continue
        word2nums[word].append(num)
        num2words[num].append(word)
    return word2nums, num2words


def synonyms(word2nums, num2words, word: str) -> list[str]:
    """Union of the word's synsets, minus the word, sorted."""
    syns = set()
    for key in word2nums[word]:
        syns = syns.union(num2words[key])
    syns.discard(word)
    return sorted(syns)


class Thesaurus:
    """Synonym lookup over WordNet synsets.

    In-memory: ``Thesaurus.from_file/from_filename`` (parses the Prolog
    file).  Persisted: ``to_parquet`` writes one sorted (word, syns) row
    per word; ``from_parquet`` reopens it without re-parsing."""

    def __init__(self):
        self.w2n = None
        self.n2w = None
        self._table = None
        self._words = None

    @classmethod
    def from_file(cls, fileobj) -> "Thesaurus":
        t = cls()
        t.w2n, t.n2w = parse_file(fileobj)
        return t

    @classmethod
    def from_filename(cls, filename: str) -> "Thesaurus":
        with open(filename, "rb") as f:
            return cls.from_file(f)

    def to_parquet(self, path: str) -> None:
        """Persist as a word-sorted parquet of (word, syns list<string>)."""
        if self.w2n is None:
            raise ValueError("no in-memory thesaurus to save")
        words = sorted(self.w2n)
        pq.write_table(
            pa.table(
                {
                    "word": pa.array(words, pa.string()),
                    "syns": pa.array(
                        [synonyms(self.w2n, self.n2w, w) for w in words],
                        pa.list_(pa.string()),
                    ),
                }
            ),
            path,
        )

    @classmethod
    def from_parquet(cls, path: str) -> "Thesaurus":
        t = cls()
        t._table = pq.read_table(path)
        t._words = t._table["word"].to_pylist()
        return t

    def synonyms(self, word: str) -> list[str]:
        word = word.lower()
        if self.w2n is not None:
            return synonyms(self.w2n, self.n2w, word)
        import bisect

        i = bisect.bisect_left(self._words, word)
        if i < len(self._words) and self._words[i] == word:
            return self._table["syns"][i].as_py()
        return []
