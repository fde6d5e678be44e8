"""Spec-exact brute-force BM25 oracle — pure pandas/numpy, no Spark, no
pruning, no posting codec. The in-sandbox stand-in for "the reference Lucene
index" (SURVEY.md §5.2-5): the WAND engine must be rank-identical (docIDs AND
float32 scores) to this on every fixture query.

Deliberately independent of the engine's index/codec/kernel code paths: it
scores straight from an exploded (doc, term, pos) frame. It shares only the
unit-tested primitive formulas (SmallFloat table, BM25 float32 ops) — those
ARE the spec.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..analysis import LuceneChainAnalyzer, SimpleAnalyzer
from ..util.smallfloat import LENGTH_TABLE, encode_lengths
from .query import BooleanSpec, PhraseClause


class BruteForceOracle:
    def __init__(self, corpus: pd.DataFrame, key_cols=("conv_id", "turn_idx"),
                 text_col: str = "text", analyzer: str = "lucene",
                 k1: float = 1.2, b: float = 0.75):
        self.analyzer = (LuceneChainAnalyzer if analyzer == "lucene" else SimpleAnalyzer)()
        corpus = corpus.sort_values(list(key_cols), kind="mergesort").reset_index(drop=True)
        self.keys = corpus[list(key_cols)]
        frame = self.analyzer.analyze_batch(corpus[text_col])
        # plain object strings (analyze_batch may return a dictionary-encoded
        # Categorical; the oracle's groupbys want materialized terms)
        frame = frame.assign(term=np.asarray(frame["term"], dtype=object))
        self.frame = frame  # doc-local 'row' == docID (dense rank in key order)
        self.doc_len = frame.attrs["doc_len"]
        self.norms = encode_lengths(self.doc_len)
        self.doc_count = int((self.doc_len > 0).sum())
        self.sum_ttf = int(self.doc_len.sum())
        # per-term postings: dict term -> (docs, tfs) and positions frame
        g = frame.groupby(["term", "row"], sort=True).size()
        self._tf = g  # MultiIndex (term, row) -> tf
        self._df = g.groupby(level=0).size()
        # float32 avgdl and norm cache, same primitive ops as the spec
        self.avgdl = np.float32(self.sum_ttf / float(self.doc_count)) if self.doc_count else np.float32(0)
        k1f, bf = np.float32(k1), np.float32(b)
        table = LENGTH_TABLE.astype(np.float32)
        self.cache = (k1f * ((np.float32(1) - bf) + (bf * table) / self.avgdl)).astype(np.float32)

    def idf(self, term: str) -> np.float32:
        n = int(self._df.get(term, 0))
        return np.float32(math.log(1.0 + (self.doc_count - n + 0.5) / (n + 0.5)))

    def _term_postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        if term not in self._df.index:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        sub = self._tf.loc[term]
        return sub.index.to_numpy(dtype=np.int64), sub.to_numpy(dtype=np.int64)

    def _phrase_postings(self, terms, offsets) -> tuple[np.ndarray, np.ndarray]:
        sets = []
        pos_by_doc = []
        for t, off in zip(terms, offsets):
            sub = self.frame[self.frame.term == t]
            if sub.empty:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
            sets.append(np.unique(sub.row.to_numpy()))
            pos_by_doc.append(sub.groupby("row")["pos"].apply(lambda s: s.to_numpy() - 0))
        cand = sets[0]
        for s in sets[1:]:
            cand = np.intersect1d(cand, s, assume_unique=True)
        docs, freqs = [], []
        for d in cand:
            acc = None
            for t_i, off in enumerate(offsets):
                p = pos_by_doc[t_i].loc[d] - off
                acc = p if acc is None else np.intersect1d(acc, p)
                if acc.size == 0:
                    break
            if acc is not None and acc.size:
                docs.append(d)
                freqs.append(acc.size)
        return np.array(docs, dtype=np.int64), np.array(freqs, dtype=np.int64)

    def _sloppy_phrase_postings(self, terms, offsets, slop) -> tuple[np.ndarray, np.ndarray]:
        """Sloppy-phrase freq per doc — an independent restatement of
        Lucene's SloppyPhraseMatcher (no-repeats): instead of a priority
        queue, keep the vector of current offset-adjusted positions and take
        argmin each round (ties by phrase offset). Each time the advancing
        minimum overtakes the min of the others, the minimized
        matchLength = end − min contributes 1/(matchLength+1) when ≤ slop."""
        sets, pos_by_doc = [], []
        for t in terms:
            sub = self.frame[self.frame.term == t]
            if sub.empty:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            sets.append(np.unique(sub.row.to_numpy()))
            pos_by_doc.append(sub.groupby("row")["pos"].apply(lambda s: np.sort(s.to_numpy())))
        cand = sets[0]
        for s in sets[1:]:
            cand = np.intersect1d(cand, s, assume_unique=True)
        n = len(terms)
        docs, freqs = [], []
        for d in cand:
            pls = [pos_by_doc[t].loc[d] - offsets[t] for t in range(n)]
            if n == 1:
                f = np.float32(len(pls[0]))
            else:
                it = [0] * n
                cur = [int(pl[0]) for pl in pls]
                end = max(cur)

                def argmin_cur(exclude=None):
                    best = None
                    for t in range(n):
                        if t == exclude or cur[t] is None:
                            continue
                        if best is None or cur[t] < cur[best]:
                            best = t  # ties: smaller t = smaller offset wins
                    return best

                f = np.float32(0.0)
                active = argmin_cur()
                nxt = cur[argmin_cur(exclude=active)]
                match_length = end - cur[active]
                while True:
                    it[active] += 1
                    if it[active] >= len(pls[active]):
                        break
                    p = int(pls[active][it[active]])
                    cur[active] = p
                    if p > end:
                        end = p
                    if p > nxt:
                        if match_length <= slop:
                            f = np.float32(f + np.float32(1.0 / (match_length + 1)))
                        active = argmin_cur()
                        nxt = cur[argmin_cur(exclude=active)]
                        match_length = end - cur[active]
                    else:
                        ml2 = end - p
                        if ml2 < match_length:
                            match_length = ml2
                if match_length <= slop:
                    f = np.float32(f + np.float32(1.0 / (match_length + 1)))
            if f > 0:
                docs.append(d)
                freqs.append(f)
        return np.array(docs, dtype=np.int64), np.array(freqs, dtype=np.float32)

    def _clause_scores(self, docs, tfs, weight) -> np.ndarray:
        freq = tfs.astype(np.float64)
        norm = self.cache[self.norms[docs].astype(np.int64)].astype(np.float64)
        return (np.float32(weight) * (freq / (freq + norm)).astype(np.float32)).astype(np.float32)

    def search(self, spec: BooleanSpec, k: int = 10) -> pd.DataFrame:
        """→ DataFrame(rank, doc_id, score float32[, key cols])."""
        per_doc: dict[int, float] = {}
        must_cnt: dict[int, int] = {}
        should_cnt: dict[int, int] = {}
        n_must = 0
        empty = pd.DataFrame({"rank": [], "doc_id": [], "score": []})
        for occur, group in (("must", spec.must), ("should", spec.should)):
            for c in group:
                if isinstance(c, PhraseClause):
                    if getattr(c, "slop", 0) > 0:
                        docs, tfs = self._sloppy_phrase_postings(c.terms, c.offsets, c.slop)
                    else:
                        docs, tfs = self._phrase_postings(c.terms, c.offsets)
                    w = np.float32(c.boost) * np.float32(
                        sum(float(self.idf(t)) for t in c.terms)
                    )
                else:
                    docs, tfs = self._term_postings(c.term)
                    w = np.float32(c.boost) * self.idf(c.term)
                if occur == "must":
                    n_must += 1
                    if docs.size == 0:
                        return empty
                scores = self._clause_scores(docs, tfs, w)
                for d, s in zip(docs.tolist(), scores.tolist()):
                    per_doc[d] = per_doc.get(d, 0.0) + s  # float64 accumulate
                    if occur == "must":
                        must_cnt[d] = must_cnt.get(d, 0) + 1
                    else:
                        should_cnt[d] = should_cnt.get(d, 0) + 1
        if not per_doc:
            return empty
        excl = set()
        for c in spec.must_not:
            excl.update(self._term_postings(c.term)[0].tolist())
        msm = spec.min_should_match
        if n_must == 0 and msm < 1:
            msm = 1
        rows = [
            (d, np.float32(s))
            for d, s in per_doc.items()
            if must_cnt.get(d, 0) == n_must
            and should_cnt.get(d, 0) >= msm
            and d not in excl
        ]
        if not rows:
            return empty
        rows.sort(key=lambda r: (-r[1], r[0]))
        rows = rows[:k]
        out = pd.DataFrame({
            "rank": np.arange(1, len(rows) + 1, dtype=np.int32),
            "doc_id": np.array([r[0] for r in rows], dtype=np.int64),
            "score": np.array([r[1] for r in rows], dtype=np.float32),
        })
        return out
