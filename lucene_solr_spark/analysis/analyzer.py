"""Analyzer chain: StandardTokenizer → LowerCaseFilter → StopFilter → PorterStemFilter.

Reference semantics (see SURVEY.md §2.A):

- StandardTokenizer (``L/analysis/standard/StandardTokenizer.java``):
  UAX#29 word-break segmentation, ``maxTokenLength=255`` (longer runs split).
  For the ASCII corpus this engine targets, tokens are runs of
  ``[0-9A-Za-z_]`` with embedded apostrophes (UAX#29 MidNumLet) — punctuation
  and whitespace are dropped. Non-ASCII UAX#29 fidelity is a documented v2 gap.
- LowerCaseFilter (``L/analysis/LowerCaseFilter.java``).
- StopFilter (``L/analysis/StopFilter.java``): drops the 33-word English set
  (``LA/en/EnglishAnalyzer.java#ENGLISH_STOP_WORDS_SET``) and — critically for
  phrase rank-identity — **advances the position counter across the hole**
  (``enablePositionIncrements`` is always on in 8.x). Positions are 0-based.
- PorterStemFilter (``LA/en/PorterStemFilter.java``).

Everything operates on pandas Series (Arrow-batched inside Spark UDFs) —
no per-row Python in the hot path: regex tokenization via ``Series.str``,
stop filtering via vectorized ``isin``, stemming via a memoized dict built
from the batch's *unique* tokens only.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .porter import porter_stem

# The exact 33-word Lucene English stop set (EnglishAnalyzer#ENGLISH_STOP_WORDS_SET).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# Tokens: alnum/underscore runs (with embedded apostrophes), split at 255 chars
# to mirror StandardTokenizer#maxTokenLength.
_TOKEN_RE = re.compile(r"[0-9A-Za-z_](?:['’]?[0-9A-Za-z_]){0,254}")


class _BaseAnalyzer:
    """Shared vectorized tokenize machinery. Subclasses set the filters."""

    lowercase = True
    stop_words: frozenset = frozenset()
    stem = False

    def __init__(self) -> None:
        self._stem_memo: dict[str, str] = {}

    # -- single-string path (query compile, tests) ---------------------------

    def analyze(self, text: str) -> list[tuple[str, int]]:
        """text → [(term, position)]; positions 0-based with stop holes."""
        out: list[tuple[str, int]] = []
        for pos, raw in enumerate(_TOKEN_RE.findall(text)):
            tok = raw.lower() if self.lowercase else raw
            if tok in self.stop_words:
                continue
            if self.stem:
                tok = self._memo_stem(tok)
            out.append((tok, pos))
        return out

    def _memo_stem(self, tok: str) -> str:
        s = self._stem_memo.get(tok)
        if s is None:
            s = porter_stem(tok)
            self._stem_memo[tok] = s
        return s

    # -- batched path (build/search kernels) ---------------------------------

    def analyze_batch(self, texts: pd.Series) -> pd.DataFrame:
        """Vectorized analysis of a batch of documents.

        Returns an exploded DataFrame with columns:
          row   int64  positional index into ``texts`` (0..len-1)
          term  str    analyzed term (post stop/stem)
          pos   int32  0-based token position (stop holes preserved)
        plus attribute access to per-row kept-token counts via
        ``frame.attrs['doc_len']`` (np.int64 array aligned to texts) — the
        BM25 norm length (tokens AFTER stop removal; holes don't count).
        """
        texts = texts.fillna("").astype(str).reset_index(drop=True)
        toks = texts.str.findall(_TOKEN_RE)
        counts = toks.str.len().to_numpy(dtype=np.int64)
        row = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        if len(row) == 0:
            flat = pd.Series([], dtype=object)
        else:
            flat = pd.Series(np.concatenate([np.array(t, dtype=object) for t in toks if t]), dtype=object)
        # 0-based position within each row (pre-stop, so holes are preserved)
        starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        pos = np.arange(len(row), dtype=np.int64) - np.repeat(starts[:-1], counts)

        if self.lowercase:
            flat = flat.str.lower()
        if self.stop_words:
            keep = ~flat.isin(self.stop_words).to_numpy()
            flat, row, pos = flat[keep].reset_index(drop=True), row[keep], pos[keep]
        if self.stem:
            uniq = pd.unique(flat)
            memo = self._stem_memo
            for u in uniq:
                if u not in memo:
                    memo[u] = porter_stem(u)
            flat = flat.map(memo)

        doc_len = np.bincount(row, minlength=len(texts)).astype(np.int64)
        frame = pd.DataFrame(
            {"row": row, "term": flat.to_numpy(), "pos": pos.astype(np.int32)}
        )
        frame.attrs["doc_len"] = doc_len
        return frame


class LuceneChainAnalyzer(_BaseAnalyzer):
    """The graft target chain: Standard → LowerCase → Stop(33) → PorterStem
    (= EnglishAnalyzer minus EnglishPossessiveFilter, per BASELINE.json)."""

    lowercase = True
    stop_words = ENGLISH_STOP_WORDS
    stem = True


class SimpleAnalyzer(_BaseAnalyzer):
    """Tokenize + lowercase only — no stop/stem. SQL-oracle-expressible
    (DuckDB ``string_split``), used for the driver's documents-table checks."""

    lowercase = True
    stop_words = frozenset()
    stem = False


class StopChainAnalyzer(_BaseAnalyzer):
    """Standard → LowerCase → Stop(33) — the Lucene ``StandardAnalyzer`` with
    its English stop set (``L/analysis/standard/StandardAnalyzer.java``), i.e.
    the target chain minus Porter. Fully SQL-oracle-expressible (the stop set
    is a literal NOT IN list), so the driver can cross-check stop-hole
    positions and stop-aware norms, which the stemmed chain can't (DuckDB has
    no Porter stemmer in-sandbox)."""

    lowercase = True
    stop_words = ENGLISH_STOP_WORDS
    stem = False


def analyze_frame(texts: pd.Series, analyzer: _BaseAnalyzer | None = None) -> pd.DataFrame:
    """Module-level convenience for kernels."""
    return (analyzer or LuceneChainAnalyzer()).analyze_batch(texts)
