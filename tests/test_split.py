"""Index / shard splitting (``S/update/SolrIndexSplitter`` / SPLITSHARD,
``lucene/misc`` PKIndexSplitter): children = parent segments behind child
liveDocs masks — no re-tokenize, no postings rewrite — and a merged-stats
scatter-gather over the children is bitwise the parent collection."""

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.engine import (
    get_engine, get_split_searchers, split_union_topk,
)
from lucene_solr_spark.index.split import split_bucket_col, split_index

SF = "/root/testdata/sf0.001"
TERMS = ["merge", "scan", "window"]


@pytest.fixture(scope="module")
def searchers(spark):
    return get_split_searchers(spark, SF, "simple", 3)


def test_children_partition_live_docs(spark, searchers):
    """Every parent doc is live in EXACTLY ONE child (hash routing is a
    partition — SolrIndexSplitter's correctness precondition)."""
    parent = get_engine(spark, SF, "simple")
    n_parent = spark.read.parquet(
        os.path.join(parent.index_dir, "docs")
    ).count()
    seen = set()
    total = 0
    for s in searchers:
        docs = spark.read.parquet(os.path.join(s.index_dir, "docs"))
        tomb = spark.read.parquet(
            os.path.join(s.index_dir, "tombstones")
        ).select("seg", "doc_local").distinct()
        live = (
            docs.join(tomb, ["seg", "doc_local"], "left_anti")
            .select("doc_key").toPandas()["doc_key"].tolist()
        )
        assert not (seen & set(live)), "children overlap"
        seen |= set(live)
        total += len(live)
    assert total == n_parent


def test_routing_matches_bucket_expr(spark, searchers):
    """Child c's live set == the md5-bucket expression's bucket-c slice
    (the compositeId-router analog the oracle side can reproduce)."""
    parent = get_engine(spark, SF, "simple")
    docs = spark.read.parquet(os.path.join(parent.index_dir, "docs"))
    assign = docs.select(
        "doc_key", split_bucket_col("doc_key", 3).alias("b")
    ).toPandas()
    for c, s in enumerate(searchers):
        expect = set(assign[assign["b"] == c]["doc_key"])
        cdocs = spark.read.parquet(os.path.join(s.index_dir, "docs"))
        tomb = spark.read.parquet(
            os.path.join(s.index_dir, "tombstones")
        ).select("seg", "doc_local").distinct()
        live = set(
            cdocs.join(tomb, ["seg", "doc_local"], "left_anti")
            .select("doc_key").toPandas()["doc_key"]
        )
        assert live == expect


def test_scatter_gather_bitwise_equals_parent(spark, searchers):
    """The SolrIndexSplitter invariant: merged-exact-stats scatter-gather
    over the children returns the parent's page bitwise (ranks, ids AND
    f32 scores) — locals/norms/positions flow through the masks unchanged
    and the stats re-merge reconstructs the parent's weights exactly."""
    split = split_union_topk(spark, SF, "or3", TERMS, k=10).toPandas()
    parent = get_engine(spark, SF, "simple").topk("or3", TERMS, k=10).toPandas()
    pd.testing.assert_frame_equal(split, parent)


def test_child_stats_refreshed(spark, searchers):
    """Each child's collection stats cover ONLY its live slice (the
    per-child _finalize refresh) — sum over children == parent stats."""
    parent = get_engine(spark, SF, "simple").searcher
    assert sum(s.stats.doc_count for s in searchers) == parent.stats.doc_count
    assert (
        sum(s.stats.sum_total_term_freq for s in searchers)
        == parent.stats.sum_total_term_freq
    )


def test_scan_stats_equal_per_child_refresh(spark, tmp_path):
    """The single-scan stats pass (one distributed postings decode + one
    (child, term) hash-agg, no driver removal dicts) must produce EXACTLY
    the per-child _finalize refresh's term_stats and collection stats —
    the independently-derived reference path."""
    parent = get_engine(spark, SF, "simple")
    a = split_index(spark, parent.index_dir, 2, str(tmp_path / "scan"),
                    stats_mode="scan")
    b = split_index(spark, parent.index_dir, 2, str(tmp_path / "ref"),
                    stats_mode="per_child")
    for ca, cb in zip(a, b):
        ts_a = (
            spark.read.parquet(os.path.join(ca, "term_stats"))
            .toPandas().sort_values("term").reset_index(drop=True)
        )
        ts_b = (
            spark.read.parquet(os.path.join(cb, "term_stats"))
            .toPandas().sort_values("term").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(ts_a, ts_b)
        st_a = spark.read.parquet(os.path.join(ca, "stats")).toPandas()
        st_b = spark.read.parquet(os.path.join(cb, "stats")).toPandas()
        pd.testing.assert_frame_equal(
            st_a[["max_doc", "doc_count", "sum_ttf"]],
            st_b[["max_doc", "doc_count", "sum_ttf"]],
        )


def test_parent_untouched_by_split(spark, tmp_path):
    """Splitting must not mutate the parent (hard links + child-local
    overwrite): parent term_stats and tombstone-free search are unchanged
    after a fresh split into a scratch dir."""
    parent = get_engine(spark, SF, "simple")
    before = parent.topk("or3", TERMS, k=10).toPandas()
    ts_before = sorted(os.listdir(os.path.join(parent.index_dir, "term_stats")))
    split_index(spark, parent.index_dir, 2, str(tmp_path / "children"))
    after = parent.topk("or3", TERMS, k=10).toPandas()
    ts_after = sorted(os.listdir(os.path.join(parent.index_dir, "term_stats")))
    assert ts_before == ts_after
    pd.testing.assert_frame_equal(before, after)


def test_split_expunge_merge_back_roundtrip(spark, tmp_path):
    """Full shard lifecycle: SPLITSHARD → per-child expungeDeletes
    (physical mask reclaim) → addIndexes graft back into one core. The
    reconstituted collection must return the parent's page — same doc
    keys AND bitwise f32 scores (internal-id tiebreaks may reorder only
    equal-score rows, so the comparison keys on (score, doc_id))."""
    from lucene_solr_spark.index.merge import add_indexes
    from lucene_solr_spark.index.updates import expunge_deletes
    from lucene_solr_spark.search.searcher import IndexSearcher

    parent = get_engine(spark, SF, "simple")
    children = split_index(
        spark, parent.index_dir, 2, str(tmp_path / "kids"), stats_mode="scan"
    )
    for c in children:
        expunge_deletes(spark, c)
    merged = str(tmp_path / "merged")
    n_segs = add_indexes(spark, children, merged)
    assert n_segs >= 2
    s = IndexSearcher(spark, merged)
    spec = s.parse("or3", TERMS, 0)
    got = (
        s.search(spec, k=10, with_keys=True)
        .select("doc_key", "score").toPandas()
        .sort_values(["score", "doc_key"], ascending=[False, True])
        .reset_index(drop=True)
    )
    want = (
        parent.topk("or3", TERMS, k=10).toPandas()
        .rename(columns={"doc_id": "doc_key"})[["doc_key", "score"]]
        .sort_values(["score", "doc_key"], ascending=[False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # and the reconstituted corpus is complete: doc count == parent's
    assert s.stats.doc_count == parent.searcher.stats.doc_count
