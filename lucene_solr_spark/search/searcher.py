"""Distributed IndexSearcher (``L/search/IndexSearcher`` analog).

Query lifecycle (SURVEY.md §3.1, Spark shape):

1. compile on driver: analyze surface terms (query-time chain == index-time
   chain), bind global stats from the broadcast-sized ``stats``/``term_stats``
   tables into float32 weights → CompiledQuery.
2. one narrow job: postings scan pruned to the query's terms (parquet
   row-group pruning via term-sorted files + seg partition dirs) → cogrouped
   per-segment scoring kernel (WAND or exact) → per-segment top-k.
3. global TakeOrdered (score desc, docID asc) limit k — the one shuffle.
4. optionally join the docs table back for doc keys (fetch-fields-late,
   Solr PURPOSE_GET_FIELDS discipline: text/keys never flow through scoring).
"""

from __future__ import annotations

import os
from functools import cached_property

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..index.build import ANALYZERS, IndexMeta
from .bm25 import CollectionStats, norm_cache
from .kernels import score_segment_exact, score_segment_wand
from .query import BooleanSpec, CompiledQuery, compile_query, parse_fixture_query

RESULT_SCHEMA = "seg int, doc_id long, score float"
MULTI_SCHEMA = "query_id string, doc_id long, score float"
_EMPTY_LOCALS = np.empty(0, dtype=np.int64)

# Above this many tombstones the driver-collect + closure-broadcast path is
# replaced by a DISTRIBUTED per-segment join (the tombstone array rides the
# seg_norms cogroup side): driver memory stays O(1) and each task ships only
# its own segment's deletes — the 10^12-docs-with-churn shape.
TOMB_DRIVER_BUDGET = 200_000
# Bloom sidecar: hold all segment blooms on the driver only below this many
# bytes (~64 KiB per 50k-term segment ⇒ ~1000 segments); above it the admit
# test runs distributed per term set and only seg ids cross to the driver.
BLOOM_DRIVER_BUDGET = 64 << 20
# A disjunction wider than this almost surely touches every segment — skip
# the probe instead of paying it for no pruning.
BLOOM_MAX_TERMS = 16


def _seg_dele(
    norms: pd.DataFrame, seg: int, deleted_by_seg: dict | None
) -> np.ndarray | None:
    """Per-segment deleted local ids from either delivery path: the
    driver-broadcast map (small delete sets) or the ``tomb`` column joined
    onto the norms cogroup side (large sets, distributed)."""
    if deleted_by_seg:
        return deleted_by_seg.get(seg)
    if "tomb" in norms.columns:
        t = norms["tomb"].iloc[0]
        if t is not None and len(t):
            return np.asarray(t, dtype=np.int64)
    return None


def _make_multi_kernel(
    queries: dict[str, CompiledQuery], mode: str,
    deleted_by_seg: dict[int, np.ndarray] | None = None,
):
    def kernel(posts: pd.DataFrame, norms: pd.DataFrame) -> pd.DataFrame:
        if len(norms) == 0 or len(posts) == 0:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        seg = int(norms["seg"].iloc[0])
        base = int(norms["base"].iloc[0])
        norms_arr = np.frombuffer(norms["norms"].iloc[0], dtype=np.uint8)
        term_blocks = {t: list(b) for t, b in zip(posts["term"], posts["blocks"])}
        dele = _seg_dele(norms, seg, deleted_by_seg)
        qids, docs_out, scores_out = [], [], []
        shared_decode: dict = {}  # queries sharing terms decode blocks once
        for qid, q in queries.items():
            if not q.clauses:
                continue
            fn = score_segment_exact if (mode == "exact" or q.needs_exact) else score_segment_wand
            incl = None
            if q.filter_by_base is not None:
                incl = q.filter_by_base.get(base, _EMPTY_LOCALS)
            docs, scores = fn(term_blocks, norms_arr, 0, q, None, incl, shared_decode, dele)
            qids.extend([qid] * len(docs))
            docs_out.append(docs + base)  # globalize at the boundary
            scores_out.append(scores)
        if not docs_out:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        return pd.DataFrame({
            "query_id": np.array(qids, dtype=object),
            "doc_id": np.concatenate(docs_out),
            "score": np.concatenate(scores_out).astype(np.float32),
        })

    return kernel


def _make_search_kernel(
    q: CompiledQuery, mode: str, after: tuple | None = None,
    deleted_by_seg: dict[int, np.ndarray] | None = None,
):
    exact = mode == "exact" or q.needs_exact

    def kernel(posts: pd.DataFrame, norms: pd.DataFrame) -> pd.DataFrame:
        if len(norms) == 0 or len(posts) == 0:
            return pd.DataFrame({"seg": [], "doc_id": [], "score": []})
        seg = int(norms["seg"].iloc[0])
        base = int(norms["base"].iloc[0])
        norms_arr = np.frombuffer(norms["norms"].iloc[0], dtype=np.uint8)
        term_blocks = {
            t: list(b) for t, b in zip(posts["term"], posts["blocks"])
        }
        fn = score_segment_exact if exact else score_segment_wand
        # postings are seg-local; rebase the global searchAfter cursor too
        after_local = (after[0], int(after[1]) - base) if after is not None else None
        incl = None
        if q.filter_by_base is not None:  # FILTER: per-segment allowed set
            incl = q.filter_by_base.get(base, _EMPTY_LOCALS)
        dele = _seg_dele(norms, seg, deleted_by_seg)
        docs, scores = fn(term_blocks, norms_arr, 0, q, after_local, incl, None, dele)
        return pd.DataFrame({
            "seg": np.full(len(docs), seg, dtype=np.int32),
            "doc_id": docs + base,  # globalize at the boundary
            "score": scores.astype(np.float32),
        })

    return kernel


def _osa_distance(a: str, b: str) -> int:
    """Optimal string alignment distance (restricted Damerau–Levenshtein):
    insert/delete/substitute cost 1, an adjacent transposition costs 1 but
    no substring is edited twice — the distance Lucene's
    ``LevenshteinAutomata`` with transpositions accepts."""
    la, lb = len(a), len(b)
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1 and j > 1
                and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[lb]


class IndexSearcher:
    def __init__(
        self, spark: SparkSession, index_dir: str, commit: int | None = None
    ):
        """``commit=N`` opens the index AT a retained commit point — the
        ``DirectoryReader.open(IndexCommit)`` analog (``index/commits.py``):
        every scan is seg-partition-pruned to the commit's live segments,
        only the commit's tombstone files load, and scoring stats bind from
        the commit's retained stats tables, so answers are bitwise what the
        live index returned at capture time regardless of later appends /
        updates / deletes."""
        self.spark = spark
        self.index_dir = index_dir
        self.meta = IndexMeta.load(index_dir)
        self.analyzer = ANALYZERS[self.meta.analyzer]()
        self._commit = None
        self._stats_root = index_dir
        if commit is not None:
            from ..index.commits import load_commit

            self._commit = load_commit(index_dir, commit)
            self._stats_root = self._commit.stats_dir
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.seg_norms = spark.read.parquet(os.path.join(index_dir, "seg_norms"))
        # docs are stored with SEGMENT-LOCAL ids; expose the global view
        # (local + segment base) via a broadcast join on the tiny bases map.
        raw_docs = spark.read.parquet(os.path.join(index_dir, "docs"))
        if self._commit is not None:
            # seg is the partition column on all three — the isin folds to
            # partition pruning, later segments' files are never opened
            live = F.col("seg").isin(list(self._commit.segs))
            self.postings = self.postings.filter(live)
            self.seg_norms = self.seg_norms.filter(live)
            raw_docs = raw_docs.filter(live)
        bases = self.seg_norms.select("seg", "base")
        self.docs = (
            raw_docs.join(F.broadcast(bases), "seg")
            .withColumn("doc_id", F.col("doc_local") + F.col("base"))
            .drop("doc_local", "base")
        )
        # filterCache (S/search/SolrIndexSearcher filterCache): fq → DocSet,
        # LRU under an entry + total-id budget; see filter_docset
        from collections import OrderedDict

        self._filter_cache: "OrderedDict[str, dict[int, np.ndarray]]" = OrderedDict()
        self._filter_cache_ids = 0
        self.filter_cache_stats = {"hits": 0, "misses": 0, "evictions": 0}
        # queryResultCache: query → cached ordered window; see cached_topk
        self._query_result_cache: "OrderedDict[str, tuple[int, list]]" = OrderedDict()
        self.query_result_cache_stats = {"hits": 0, "misses": 0, "evictions": 0}

    @cached_property
    def stats(self) -> CollectionStats:
        row = self.spark.read.parquet(os.path.join(self._stats_root, "stats")).collect()[0]
        return CollectionStats(int(row.doc_count), int(row.sum_ttf))

    @cached_property
    def cache(self) -> np.ndarray:
        return norm_cache(self.stats.avgdl)

    @cached_property
    def classic_cache(self) -> np.ndarray:
        from .bm25 import classic_norm_cache

        return classic_norm_cache()

    @cached_property
    def lm_cache(self) -> np.ndarray:
        from .bm25 import lm_norm_cache

        return lm_norm_cache()

    @cached_property
    def dfr_cache(self) -> np.ndarray:
        from .bm25 import dfr_h2_cache

        return dfr_h2_cache(self.stats.avgdl)

    @cached_property
    def lmjm_cache(self) -> np.ndarray:
        from .bm25 import lmjm_norm_cache

        return lmjm_norm_cache()

    @cached_property
    def f2exp_cache(self) -> np.ndarray:
        from .bm25 import f2exp_norm_cache

        return f2exp_norm_cache(self.stats.avgdl)

    @cached_property
    def sweetspot_cache(self) -> np.ndarray:
        from .bm25 import sweetspot_norm_cache

        return sweetspot_norm_cache()

    @cached_property
    def _tomb_df(self) -> DataFrame | None:
        import glob as _glob

        from ..index.updates import tombstones_path

        if self._commit is not None:
            # only the tombstone FILES recorded at capture time — later
            # delete batches append new files, which must stay invisible
            if not self._commit.tomb_files:
                return None
            return self.spark.read.parquet(
                *[os.path.join(self.index_dir, f) for f in self._commit.tomb_files]
            )
        p = tombstones_path(self.index_dir)
        if not _glob.glob(os.path.join(p, "*.parquet")) and not _glob.glob(
            os.path.join(p, "*", "*.parquet")
        ):
            return None
        return self.spark.read.parquet(p)

    @cached_property
    def _tomb_count(self) -> int:
        return 0 if self._tomb_df is None else int(self._tomb_df.count())

    @cached_property
    def deleted_by_seg(self) -> dict[int, np.ndarray]:
        """Per-segment tombstoned local ids (PendingDeletes live-docs
        analog) — empty when the index has no deletes. Loaded once per
        searcher; shipped inside the kernel closure — ONLY while the delete
        set fits the driver budget. Beyond TOMB_DRIVER_BUDGET this map stays
        empty and tombstones ride the norms cogroup side instead
        (``norms_side``), fully distributed."""
        if self._tomb_df is None or self._tomb_count > TOMB_DRIVER_BUDGET:
            return {}
        from ..index.updates import tombstones_by_seg

        # derive from _tomb_df (not the directory) so a commit-point
        # searcher sees exactly its recorded delete files
        return tombstones_by_seg(self._tomb_df)

    @cached_property
    def norms_side(self) -> DataFrame:
        """The norms cogroup input: seg_norms, plus a per-segment sorted
        ``tomb`` array column when the delete set exceeds the driver budget
        — each scoring task then receives exactly its own segment's deletes
        through the cogroup shuffle (O(per-segment deletes) per task, O(1)
        driver memory; the Spark shape of per-leaf PendingDeletes)."""
        if self._tomb_df is None or self._tomb_count <= TOMB_DRIVER_BUDGET:
            return self.seg_norms
        agg = self._tomb_df.groupBy("seg").agg(
            F.sort_array(
                F.collect_set(F.col("doc_local").cast("long"))
            ).alias("tomb")
        )
        return self.seg_norms.join(agg, "seg", "left")

    # --- per-segment term blooms (BloomFilteringPostingsFormat analog) ----

    @cached_property
    def _bloom_dir(self) -> str | None:
        import glob as _glob

        from ..index.bloom import BLOOM_DIRNAME

        p = os.path.join(self.index_dir, BLOOM_DIRNAME)
        return p if _glob.glob(os.path.join(p, "*", "*.parquet")) else None

    @cached_property
    def _all_segs(self) -> frozenset:
        return frozenset(
            int(r.seg) for r in self.seg_norms.select("seg").collect()
        )

    @cached_property
    def _bloom_driver(self) -> dict | None:
        """{seg: (m, packed bits)} when the whole sidecar fits the driver
        budget (the common case: ~64 KiB per 50k-term segment). Above the
        budget this stays None and ``bloom_live_segs`` probes DISTRIBUTED
        (one tiny mapInPandas job per new term set, bits never reach the
        driver) — the same two-tier shape as the tombstone map."""
        if self._bloom_dir is None:
            return None
        import glob as _glob
        import re as _re

        import pyarrow.parquet as _pq  # driver-read-ok (size-gated below)

        paths = sorted(_glob.glob(os.path.join(self._bloom_dir, "*", "*.parquet")))
        if sum(os.path.getsize(p) for p in paths) > BLOOM_DRIVER_BUDGET:
            return None
        out = {}
        for p in paths:
            mseg = _re.search(r"seg=(\d+)", p)
            if mseg is None:
                continue
            # bounded by the byte-budget check above (bits never exceed
            # BLOOM_DRIVER_BUDGET in total); above the budget the probe
            # runs distributed instead — see bloom_live_segs
            t = _pq.read_table(p)  # driver-read-ok
            out[int(mseg.group(1))] = (
                int(t["m"][0].as_py()),
                np.frombuffer(t["bits"][0].as_py(), dtype=np.uint8),
            )
        return out

    @cached_property
    def _bloom_cache(self) -> dict:
        return {}

    _BLOOM_CACHE_MAX = 256

    def bloom_live_segs(self, terms: list) -> list | None:
        """Sorted segment ids that MAY contain at least one of ``terms``
        per the bloom sidecars, or None when pruning is unavailable (no
        sidecar / no terms / term set too wide) or vacuous (every segment
        admitted). Segments without a bloom row are always admitted, so a
        partially-covered index (e.g. pre-upgrade segments) stays correct.
        False positives cost an extra scan; false negatives cannot happen
        (``index/bloom.py``), so pruning never changes results."""
        from ..index.bloom import bloom_admits

        if self._bloom_dir is None or not terms or len(terms) > BLOOM_MAX_TERMS:
            return None
        key = frozenset(terms)
        if key in self._bloom_cache:
            return self._bloom_cache[key]
        tl = sorted(key)
        if self._bloom_driver is not None:
            admitted = {
                seg
                for seg, (m, bits) in self._bloom_driver.items()
                if bloom_admits(bits, m, tl).any()
            }
            covered = set(self._bloom_driver)
        else:
            df = self.spark.read.parquet(self._bloom_dir)

            def probe(it):
                for pdf in it:
                    adm = [
                        bool(bloom_admits(b, int(m), tl).any())
                        for m, b in zip(pdf["m"], pdf["bits"])
                    ]
                    yield pd.DataFrame({
                        "seg": pdf["seg"].astype("int32"),
                        "admit": np.asarray(adm, dtype=bool),
                    })

            rows = df.mapInPandas(probe, "seg int, admit boolean").collect()
            admitted = {int(r.seg) for r in rows if r.admit}
            covered = {int(r.seg) for r in rows}
        # intersect with _all_segs: the sidecar may describe segments this
        # searcher cannot see (a commit-point view excludes later segments)
        live = sorted((admitted & self._all_segs) | (self._all_segs - covered))
        out = live if len(live) < len(self._all_segs) else None
        if len(self._bloom_cache) >= self._BLOOM_CACHE_MAX:
            self._bloom_cache.pop(next(iter(self._bloom_cache)))
        self._bloom_cache[key] = out
        return out

    def _bloom_pruned_sides(self, q: "CompiledQuery") -> tuple[DataFrame, DataFrame]:
        """(postings side, norms side) for the scoring cogroup, with whole
        segments removed when every scoring term is bloom-rejected there.
        A pruned segment cannot produce a hit — every match needs at least
        one scoring term present — so this only skips provably-empty
        kernels (MUST_NOT / FILTER terms never gate admission)."""
        posts = (
            self.postings
            .filter(F.col("term").isin(q.scoring_terms + list(q.must_not_terms)))
            .select("seg", "term", "blocks")
        )
        norms = self.norms_side
        live = self.bloom_live_segs(list(q.scoring_terms))
        if live is not None:
            cond = F.col("seg").isin(live) if live else F.lit(False)
            posts, norms = posts.filter(cond), norms.filter(cond)
        return posts, norms

    def term_stats_rows(self, terms: list[str]) -> tuple[dict[str, int], dict[str, int]]:
        """({term: df}, {term: ttf}) for the query's terms (TermStates#build
        analog) — ONE term-pruned scan of the small term_stats table."""
        if not terms:
            return {}, {}
        rows = (
            self.spark.read.parquet(os.path.join(self._stats_root, "term_stats"))
            .filter(F.col("term").isin(list(terms)))
            .collect()
        )
        return (
            {r.term: int(r.df) for r in rows},
            {r.term: int(r.ttf) for r in rows},
        )

    def term_stats(self, terms: list[str]) -> dict[str, int]:
        """Global docFreq for the query's terms."""
        return self.term_stats_rows(terms)[0]

    def compile(
        self, spec: BooleanSpec, k: int = 10, similarity: str = "bm25"
    ) -> CompiledQuery:
        if similarity in ("bm25", "docsonly"):
            cache = self.cache
        elif similarity == "lm":
            cache = self.lm_cache
        elif similarity in ("dfr", "ib"):
            cache = self.dfr_cache
        elif similarity in ("lmjm", "dfi"):
            # both score off the decoded doc length directly
            cache = self.lmjm_cache
        elif similarity == "f2exp":
            cache = self.f2exp_cache
        elif similarity == "sweetspot":
            cache = self.sweetspot_cache
        else:
            cache = self.classic_cache
        df_map, ttf_map = self.term_stats_rows(spec.all_terms())
        return compile_query(
            spec, df_map, self.stats.doc_count, cache, k,
            similarity=similarity,
            term_ttf=ttf_map if similarity in ("lm", "lmjm", "dfi") else None,
            sum_ttf=self.stats.sum_total_term_freq,
        )

    def compile_many(self, specs: dict[str, tuple[BooleanSpec, int]]) -> dict[str, CompiledQuery]:
        """Compile a whole query set with ONE stats lookup job (TermStates
        for the union of all query terms — the batched analog of
        ``IndexSearcher#createWeight`` per request)."""
        all_terms = sorted({t for spec, _ in specs.values() for t in spec.all_terms()})
        df_map = self.term_stats(all_terms)
        return {
            qid: compile_query(spec, df_map, self.stats.doc_count, self.cache, k)
            for qid, (spec, k) in specs.items()
        }

    # --- filterCache (S/search/SolrIndexSearcher#getDocSet / filterCache) ---

    FILTER_CACHE_MAX_ENTRIES = 64
    FILTER_CACHE_ID_BUDGET = 1 << 22   # total cached doc ids across entries

    def filter_docset(self, spec: BooleanSpec) -> dict[int, np.ndarray]:
        """Solr filterCache analog: ``spec``'s unranked DocSet as a
        per-segment ``{base: sorted local ids}`` map, memoized per searcher
        (``S/search/SolrIndexSearcher#getDocSet`` backed by filterCache —
        a repeated ``fq`` pays its hits pass once per searcher lifetime).
        The map rides the query kernels as ``filter_by_base``: a
        non-scoring FILTER occur, candidates restricted BEFORE ranking,
        BM25 stats untouched.

        Scale honesty: the cached set is DRIVER-held, as Solr's
        filterCache is shard-heap-held — but one driver serves every
        segment, so the cache is budget-bounded (entry count + total ids,
        LRU): an fq whose DocSet exceeds the id budget is computed but NOT
        retained (the ``{!cache=false}`` shape). Selective fqs — the ones
        worth caching — fit by definition; filters over INDEXED keyword
        fields should keep using the posting-list FILTER path
        (``engine.filtered_topk``), which never materializes a DocSet."""
        key = repr(spec)
        cached = self._filter_cache.get(key)
        if cached is not None:
            self._filter_cache.move_to_end(key)
            self.filter_cache_stats["hits"] += 1
            return cached
        self.filter_cache_stats["misses"] += 1
        rows = (
            self.hits(self.compile(spec, k=1 << 30), mode="exact")
            .select("doc_id").collect()
        )
        gdocs = np.sort(np.array([r.doc_id for r in rows], dtype=np.int64))
        layout = self.seg_norms.select("base", "n").collect()
        fbb = {
            int(r.base): gdocs[(gdocs >= r.base) & (gdocs < r.base + r.n)] - r.base
            for r in layout
        }
        self._filter_cache_insert(key, fbb)
        return fbb

    # --- queryResultCache (S/search/SolrIndexSearcher queryResultCache) -----

    QUERY_RESULT_CACHE_MAX = 128
    QUERY_RESULT_WINDOW = 50   # solrconfig queryResultWindowSize

    def cached_topk(self, spec: BooleanSpec, k: int = 10, mode: str = "wand"):
        """queryResultCache analog: the ordered (doc_id, score) page for a
        query is memoized per searcher, with Solr's windowing rule — a miss
        computes and caches ceil-to-``queryResultWindowSize`` rows, so any
        subsequent request for the same query with k ≤ window is a pure
        cache hit served by slicing (``SolrIndexSearcher#getDocListC`` +
        ``queryResultWindowSize``). Returns a list of (doc_id, score)
        rows — the superset window is cached, the first k returned.

        Scale shape: O(window) driver rows per entry (Solr caches DocList
        pages exactly the same way); the distributed top-k only re-runs on
        a genuine miss."""
        key = f"{mode}|{repr(spec)}"
        win = self._query_result_cache.get(key)
        if win is not None and k <= win[0]:
            self._query_result_cache.move_to_end(key)
            self.query_result_cache_stats["hits"] += 1
            return win[1][:k]
        self.query_result_cache_stats["misses"] += 1
        w = self.QUERY_RESULT_WINDOW
        window_k = ((k + w - 1) // w) * w
        rows = [
            (int(r.doc_id), r.score)
            for r in self.search(spec, k=window_k, mode=mode).collect()
        ]
        self._query_result_cache[key] = (window_k, rows)
        while len(self._query_result_cache) > self.QUERY_RESULT_CACHE_MAX:
            self._query_result_cache.popitem(last=False)
            self.query_result_cache_stats["evictions"] += 1
        return rows[:k]

    def _filter_cache_insert(self, key: str, fbb: dict[int, np.ndarray]) -> None:
        """Shared budgeted insert for both filterCache faces (query DocSets
        and non-indexed filter maps): skip retention when the set alone
        exceeds the id budget ({!cache=false} shape), else LRU-evict down
        to the entry and total-id budgets with exact id accounting."""
        n_ids = sum(len(v) for v in fbb.values())
        if n_ids > self.FILTER_CACHE_ID_BUDGET:
            return
        self._filter_cache[key] = fbb
        self._filter_cache_ids += n_ids
        while (
            len(self._filter_cache) > self.FILTER_CACHE_MAX_ENTRIES
            or self._filter_cache_ids > self.FILTER_CACHE_ID_BUDGET
        ):
            _, old = self._filter_cache.popitem(last=False)
            self._filter_cache_ids -= sum(len(v) for v in old.values())
            self.filter_cache_stats["evictions"] += 1

    def parse(
        self, qtype: str, surface_terms: list[str], min_should: int = 0, slop: int = 0
    ) -> BooleanSpec:
        return parse_fixture_query(self.analyzer, qtype, surface_terms, min_should, slop=slop)

    def expand_terms(self, kind: str, pattern, max_expansions: int = 1024) -> list[str]:
        """MultiTermQuery rewrite (``L/search/MultiTermQuery#RewriteMethod``):
        expand a prefix/wildcard/regexp/fuzzy/set pattern against the term
        dictionary into a sorted term list (SCORING_BOOLEAN_REWRITE).
        Wildcards use SQL LIKE syntax (%/_) — the Spark-native analog of
        Lucene's */? automata; fuzzy = Levenshtein distance (the edit-distance
        semantics behind ``FuzzyQuery``'s Levenshtein automaton)."""
        from ..index.build import KEYWORD_PREFIX

        ts = (
            self.spark.read.parquet(os.path.join(self._stats_root, "term_stats"))
            .filter(~F.col("term").startswith(KEYWORD_PREFIX))  # internal terms
        )
        if kind == "prefix":
            cond = F.col("term").startswith(pattern)
        elif kind == "wildcard":
            cond = F.col("term").like(pattern)
        elif kind == "regexp":
            cond = F.col("term").rlike(f"^(?:{pattern})$")
        elif kind == "fuzzy":
            term, max_edits = pattern
            cond = F.levenshtein(F.col("term"), F.lit(term)) <= max_edits
        elif kind == "fuzzy_osa":
            # FuzzyQuery's DEFAULT (transpositions=true): edit distance is
            # optimal string alignment — a transposition counts ONE edit
            # (``L/search/FuzzyQuery.java`` defaultTranspositions,
            # ``L/util/automaton/LevenshteinAutomata`` withTranspositions).
            # Spark has no OSA builtin: the dictionary is prefiltered with a
            # JVM levenshtein <= 2·maxEdits superset scan (a transposition
            # costs <= 2 plain edits), and the small candidate list is
            # OSA-refined driver-side — the same bounded collect every
            # MultiTermQuery rewrite already performs. At maxEdits <= 1 the
            # OSA / unrestricted-Damerau distinction is vacuous (a single
            # edit is identical in both); >= 2 diverges only on overlapping
            # edits (documented).
            term, max_edits = pattern
            rows = (
                ts.filter(
                    F.levenshtein(F.col("term"), F.lit(term)) <= 2 * max_edits
                )
                .select("term").orderBy("term").limit(4 * max_expansions)
                .collect()
            )
            out = [
                t.term for t in rows if _osa_distance(t.term, term) <= max_edits
            ]
            return out[:max_expansions]
        elif kind == "leading_wildcard":
            # ReversedWildcardFilter (``S/analysis/ReversedWildcardFilterFactory``):
            # a leading wildcard ``*<suffix>`` is a PREFIX query on the
            # reversed dictionary sidecar (written by _finalize, sorted +
            # range-partitioned on rterm) — the StartsWith predicate pushes
            # to the parquet scan and min/max stats prune whole files, vs
            # the full-dictionary LIKE '%suffix' scan a naive leading
            # wildcard forces. Falls back to the naive scan when the
            # sidecar is absent (pre-upgrade index).
            rev_path = os.path.join(self._stats_root, "term_stats_rev")
            if os.path.isdir(rev_path):
                ts = (
                    self.spark.read.parquet(rev_path)
                    .filter(~F.col("term").startswith(KEYWORD_PREFIX))
                )
                cond = F.col("rterm").startswith(pattern[::-1])
            else:
                cond = F.col("term").like("%" + pattern)
        elif kind == "set":
            cond = F.col("term").isin(list(pattern))
        elif kind == "range":
            # TermRangeQuery (``L/search/TermRangeQuery``): lexicographic
            # [lo, hi) over the term dictionary — includeLower=true,
            # includeUpper=false (the BytesRef compare, here UTF-8 string
            # order); None on either side = open-ended
            lo, hi = pattern
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col("term") >= lo)
            if hi is not None:
                cond = cond & (F.col("term") < hi)
        elif kind == "phonetic":
            # PhoneticFilter/Soundex expansion (analysis/phonetic.py): the
            # dictionary term's code equals any query token's code — the
            # code column is pure JVM expressions (translate/regexp chain)
            from ..analysis.phonetic import soundex, soundex_spark_col

            codes = sorted({soundex(tok) for tok in pattern})
            cond = soundex_spark_col(F.col("term")).isin(codes)
        else:
            raise ValueError(f"unknown multiterm kind {kind!r}")
        rows = ts.filter(cond).select("term").orderBy("term").limit(max_expansions).collect()
        return [r.term for r in rows]

    def multiterm_spec(self, kind: str, pattern, max_expansions: int = 1024) -> BooleanSpec:
        from .query import TermClause

        return BooleanSpec(should=[TermClause(t) for t in self.expand_terms(kind, pattern, max_expansions)])

    def more_like_this_spec(self, text: str, top_terms: int = 5) -> BooleanSpec:
        """``lucene/queries/.../mlt/MoreLikeThis`` — rank the doc's terms by
        classic tf·idf (idf = ln(N/(df+1)) + 1, ClassicSimilarity-style),
        keep the top ``top_terms`` (score desc, term asc), and build the
        interesting-terms disjunction."""
        from .query import TermClause

        scored = self.more_like_this_terms(text, top_terms)
        return BooleanSpec(should=[TermClause(t) for t, _ in scored])

    def more_like_this_terms(
        self, text: str, top_terms: int = 5
    ) -> list[tuple[str, float]]:
        """The MLT interesting-terms list WITH scores —
        ``MoreLikeThis#retrieveInterestingTerms``: [(term, tf·idf)] by
        (score desc, term asc), top ``top_terms``."""
        import math
        from collections import Counter

        tf = Counter(t for t, _ in self.analyzer.analyze(text))
        dfs = self.term_stats(sorted(tf))
        n = self.stats.doc_count
        scored = [
            (float(c) * (math.log(n / (dfs[t] + 1.0)) + 1.0), t)
            for t, c in tf.items() if dfs.get(t, 0) > 0
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        return [(t, sc) for sc, t in scored[:top_terms]]

    def explain(self, spec: BooleanSpec, global_doc_id: int) -> pd.DataFrame:
        """``IndexSearcher#explain`` / Solr debugQuery analog: the per-clause
        BM25 breakdown for ONE (query, doc) — term, docFreq, idf, termFreq,
        doc length, and the clause score, using the exact float32 op order
        the kernels use. Reads only the doc's segment (partition-pruned) and
        only the query's terms (term-pruned scan)."""
        from ..index.codec import decode_postings
        from .bm25 import score_postings

        q = self.compile(spec, k=1)
        layout = sorted(
            (int(r.seg), int(r.base), int(r.n))
            for r in self.seg_norms.select("seg", "base", "n").collect()
        )
        seg = base = None
        for s, b, n in layout:
            if b <= global_doc_id < b + n:
                seg, base = s, b
                break
        if seg is None:
            raise ValueError(f"doc {global_doc_id} out of range")
        local = global_doc_id - base
        drow = (
            self.docs.filter(F.col("doc_id") == global_doc_id)
            .select("length", "norm").collect()[0]
        )
        terms = q.scoring_terms
        posts = (
            self.postings.filter((F.col("seg") == seg) & (F.col("term").isin(terms)))
            .select("term", "blocks").collect()
        )
        blocks_by_term = {r.term: list(r.blocks) for r in posts}
        df_map = self.term_stats(terms)
        rows = []
        for c in q.clauses:
            if c.kind != "term":
                continue  # explain covers term clauses (Lucene per-leaf TermQuery)
            t = c.terms[0]
            docs_t, tfs_t = decode_postings(blocks_by_term.get(t, []))[:2]
            i = np.searchsorted(docs_t, local)
            tf = int(tfs_t[i]) if i < len(docs_t) and docs_t[i] == local else 0
            score = (
                float(score_postings(
                    np.array([tf]), np.array([drow.norm]), c.weight, q.cache
                )[0]) if tf > 0 else 0.0
            )
            rows.append({
                "term": t,
                "df": int(df_map.get(t, 0)),
                "idf": float(np.float32(c.weight)),  # boost=1 ⇒ weight == idf
                "tf": tf,
                "doc_len": int(drow.length),
                "clause_score": np.float32(score),
            })
        return pd.DataFrame(sorted(rows, key=lambda r: r["term"]))

    def termfreq_df(self, term: str) -> DataFrame:
        """``termfreq(field, term)`` ValueSource as a (doc_id, tf) DataFrame:
        one term-pruned postings scan, decode-only kernel (no norms, no
        weights). Tombstoned docs are excluded. Docs without the term are
        simply absent (left-join + coalesce(0) at the consumer)."""
        from ..index.codec import decode_postings

        bases = {
            int(r.seg): int(r.base)
            for r in self.seg_norms.select("seg", "base").collect()
        }
        dele = self.deleted_by_seg or None
        big_tomb = dele is None and self._tomb_df is not None

        def kern(iterator):
            for pdf in iterator:
                for seg, blocks in zip(pdf["seg"], pdf["blocks"]):
                    docs, tfs = decode_postings(list(blocks))[:2]
                    if dele:
                        d = dele.get(int(seg))
                        if d is not None and d.size:
                            keep = ~np.isin(docs, d, assume_unique=True)
                            docs, tfs = docs[keep], tfs[keep]
                    yield pd.DataFrame({
                        "seg": np.full(len(docs), int(seg), dtype=np.int32),
                        "doc_local": docs,
                        "doc_id": docs + bases[int(seg)],
                        "tf": tfs,
                    })

        posts = (
            self.postings.filter(F.col("term") == F.lit(term))
            .select("seg", "blocks")
        )
        out = posts.mapInPandas(kern, "seg int, doc_local long, doc_id long, tf long")
        if big_tomb:
            # delete set over the driver budget: distributed anti-join on
            # (seg, doc_local) instead of the closure map
            out = out.join(self._tomb_df, ["seg", "doc_local"], "left_anti")
        return out.select("doc_id", "tf")

    def termfreq_topk(self, term: str, k: int = 10) -> DataFrame:
        """Function query as THE ranking function (``S/search/
        ValueSourceParser`` / ``lucene/queries/function`` — here
        ``termfreq(field, term)``): docs ordered by raw term frequency
        instead of BM25, global TakeOrdered — the same sublinear shape as a
        scored search."""
        top = (
            self.termfreq_df(term)
            .orderBy(F.desc("tf"), F.asc("doc_id"))
            .limit(k)
        )
        return (
            top.coalesce(1)
            .sortWithinPartitions(F.desc("tf"), F.asc("doc_id"))
            .withColumn("rank", (F.monotonically_increasing_id() + 1).cast("int"))
            .orderBy("rank")
        )

    def filter_map(self, keys: DataFrame) -> dict[int, np.ndarray]:
        """Compile a doc-key filter into per-segment allowed-local-ID sets —
        the Spark shape of Lucene's cached per-leaf filter DocIdSet: the
        keyword predicate is evaluated ONCE against the docs table (pruned
        columnar scan), collected as sorted local ids keyed by segment base,
        and broadcast to the scoring kernels inside the query closure.
        Sized for selective filters (the useful kind — an unselective filter
        should be a post-scan `.filter`); a high-cardinality/unselective
        predicate at 10^12-doc scale belongs in a keyword-field posting list
        joined segment-side instead of collected."""
        rows = (
            self.docs.join(F.broadcast(keys), list(keys.columns))
            .select("doc_id").collect()
        )
        gdocs = np.sort(np.array([r.doc_id for r in rows], dtype=np.int64))
        layout = self.seg_norms.select("base", "n").collect()
        return {
            int(r.base): gdocs[(gdocs >= r.base) & (gdocs < r.base + r.n)] - r.base
            for r in layout
        }

    def cached_filter_map(
        self, keys: DataFrame, cache_key: str
    ) -> dict[int, np.ndarray]:
        """Solr filterCache analog (``S/search/SolrIndexSearcher`` filterCache
        / ``L/search/LRUQueryCache``): the per-segment allowed-doc sets a
        non-indexed filter compiles to are memoized by ``cache_key`` for the
        searcher's lifetime — repeated fq's skip the evaluation pass
        entirely, exactly like the reference caching a filter's DocSet per
        reader (this searcher IS one reader: the cache never outlives the
        index view it was computed against). Bounded FIFO eviction keeps
        driver memory O(CACHE_MAX · matched docs)."""
        hit = self._filter_cache.get(cache_key)
        if hit is not None:
            self._filter_cache.move_to_end(cache_key)
            self.filter_cache_stats["hits"] += 1
            return hit
        self.filter_cache_stats["misses"] += 1
        out = self.filter_map(keys)
        self._filter_cache_insert(cache_key, out)
        return out

    def search(
        self,
        spec: BooleanSpec | CompiledQuery,
        k: int = 10,
        mode: str = "wand",
        with_keys: bool = False,
        after: tuple | None = None,
        filter_by_base: dict[int, np.ndarray] | None = None,
    ) -> DataFrame:
        """Top-k → DataFrame(doc_id, score[, rank, key cols]).

        mode: 'wand' (block-max pruning; phrase clauses fall back to exact
        automatically) or 'exact' (brute force — the distributed oracle).
        after: (score, doc_id) cursor for searchAfter paging — returns the
        next k hits strictly after the cursor in (score desc, doc asc)."""
        q = spec if isinstance(spec, CompiledQuery) else self.compile(spec, k)
        if filter_by_base is not None:
            # never mutate a caller-supplied CompiledQuery (it may be shared
            # across searches via compile_many) — bind the filter on a copy
            import dataclasses

            q = dataclasses.replace(q, filter_by_base=filter_by_base)
        return self._finish(self.hits(q, mode=mode, after=after), q.k, with_keys)

    def hits(
        self,
        q: CompiledQuery,
        mode: str = "wand",
        after: tuple | None = None,
    ) -> DataFrame:
        """ALL matching hits as an UNRANKED DataFrame(doc_id, score) — no
        global sort. The building block for roll-ups (block join, grouping)
        that aggregate hits without needing a total order; ``search`` adds
        the TakeOrdered top-k on top."""
        if not q.clauses:
            return self.spark.createDataFrame([], "doc_id long, score float")
        posts, norms_side = self._bloom_pruned_sides(q)
        return (
            posts.groupBy("seg")
            .cogroup(norms_side.groupBy("seg"))
            .applyInPandas(
                _make_search_kernel(q, mode, after, self.deleted_by_seg or None),
                RESULT_SCHEMA,
            )
            .select("doc_id", "score")
        )

    def total_hits(self, spec: BooleanSpec | CompiledQuery, threshold: int = 1000) -> tuple[int, str]:
        """``TotalHits`` — (value, relation). Counts matching docs with the
        non-scoring count kernel (TotalHitCountCollector analog: per-segment
        doc-level counts, summed — one narrow term-pruned job, no norms, no
        top-k). Lucene reports an exact count up to a threshold and a lower
        bound beyond it (``TotalHits.Relation.GREATER_THAN_OR_EQUAL_TO``);
        deterministically: value = min(exact, threshold), relation = 'EQ' |
        'GTE'."""
        from .kernels import count_segment_matches

        q = spec if isinstance(spec, CompiledQuery) else self.compile(spec, 1)
        if not q.clauses:
            return 0, "EQ"
        dele = self.deleted_by_seg or None

        def kernel(posts: pd.DataFrame, norms: pd.DataFrame) -> pd.DataFrame:
            if len(norms) == 0 or len(posts) == 0:
                return pd.DataFrame({"seg": [], "cnt": []})
            seg = int(norms["seg"].iloc[0])
            base = int(norms["base"].iloc[0])
            term_blocks = {t: list(b) for t, b in zip(posts["term"], posts["blocks"])}
            incl = None
            if q.filter_by_base is not None:
                incl = q.filter_by_base.get(base, _EMPTY_LOCALS)
            d = _seg_dele(norms, seg, dele)
            cnt = count_segment_matches(term_blocks, q, incl, d)
            return pd.DataFrame({"seg": [seg], "cnt": [cnt]})

        posts, norms_side = self._bloom_pruned_sides(q)
        total = (
            posts.groupBy("seg")
            .cogroup(norms_side.groupBy("seg"))
            .applyInPandas(kernel, "seg int, cnt long")
            .agg(F.sum("cnt").alias("n")).collect()[0].n
        )
        total = int(total or 0)
        if total <= threshold:
            return total, "EQ"
        return threshold, "GTE"

    def search_many(
        self, compiled: dict[str, CompiledQuery], mode: str = "wand"
    ) -> DataFrame:
        """Run a whole query set in ONE job (the distributed 2-phase shape:
        per-segment top-k per query → global per-query TakeOrdered).
        → DataFrame(query_id, rank, doc_id, score)."""
        from pyspark.sql import Window

        terms = sorted({
            t for q in compiled.values()
            for t in (*q.scoring_terms, *q.must_not_terms)
        })
        if not terms:
            return self.spark.createDataFrame([], "query_id string, rank int, doc_id long, score float")
        posts = (
            self.postings.filter(F.col("term").isin(terms))
            .select("seg", "term", "blocks")
        )
        hits = (
            posts.groupBy("seg")
            .cogroup(self.norms_side.groupBy("seg"))
            .applyInPandas(
                _make_multi_kernel(compiled, mode, self.deleted_by_seg or None),
                MULTI_SCHEMA,
            )
        )
        ks = {qid: q.k for qid, q in compiled.items()}
        k_df = self.spark.createDataFrame(
            [(qid, k) for qid, k in ks.items()], "query_id string, k int"
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            hits.withColumn("rank", F.row_number().over(w))
            .join(F.broadcast(k_df), "query_id")
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "doc_id", "score")
            .orderBy("query_id", "rank")
        )

    def _finish(self, hits: DataFrame, k: int, with_keys: bool) -> DataFrame:
        top = hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if with_keys:
            top = top.join(self.docs.select(*self.meta.key_cols, "doc_id"), "doc_id", "left")
        # rank runs AFTER limit(k) — k rows only. coalesce(1) + in-partition
        # sort + monotonically_increasing_id (partition 0 ⇒ ids 0..k−1 in
        # row order) gives row_number without a WindowExec, so no
        # unpartitioned-window warning and no extra shuffle on k rows
        return (
            top.coalesce(1)
            .sortWithinPartitions(F.desc("score"), F.asc("doc_id"))
            .withColumn("rank", (F.monotonically_increasing_id() + 1).cast("int"))
            .orderBy("rank")
        )
