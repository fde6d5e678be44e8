"""Merge invariance (SURVEY.md §5.2-7): an index merged K→M segments —
including the salted two-phase path and conservative impacts — must return
IDENTICAL query results (docIDs and float32 scores) on the full reference
query set, for both the exact and the block-max-WAND scorers.

Reference analog: ``SegmentMerger`` output must be CheckIndex-clean and
search-equivalent; ``TestWANDScorer``-style pruning-never-changes-results.
"""

import numpy as np
import pytest

from lucene_solr_spark.datagen import generate_queries
from lucene_solr_spark.index.merge import merge_segments
from lucene_solr_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def merged_dirs(spark, small_index, tmp_path_factory):
    src, _ = small_index
    d2 = str(tmp_path_factory.mktemp("merge") / "m2")
    d1 = str(tmp_path_factory.mktemp("merge") / "m1")
    merge_segments(spark, src, d2, n_out=2, salt=2)
    merge_segments(spark, src, d1, n_out=1, salt=4, conservative_impacts=True)
    return src, d2, d1


def _run_all(spark, index_dir, mode):
    s = IndexSearcher(spark, index_dir)
    qs = generate_queries()
    compiled = s.compile_many({
        f"q{q['query_id']:02d}": (s.parse(q["qtype"], q["terms"], q["min_should"]), q["k"])
        for q in qs
    })
    return (
        s.search_many(compiled, mode=mode)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("mode", ["wand", "exact"])
def test_merge_invariance_query_results(spark, merged_dirs, mode):
    src, d2, d1 = merged_dirs
    base = _run_all(spark, src, mode)
    for d in (d2, d1):
        got = _run_all(spark, d, mode)
        assert len(got) == len(base)
        np.testing.assert_array_equal(got.query_id.to_numpy(), base.query_id.to_numpy())
        np.testing.assert_array_equal(got.doc_id.to_numpy(), base.doc_id.to_numpy())
        np.testing.assert_array_equal(
            got.score.to_numpy().astype(np.float32),
            base.score.to_numpy().astype(np.float32),
        )


def test_merge_preserves_global_stats(spark, merged_dirs):
    import os
    src, d2, _ = merged_dirs
    for tbl in ("stats", "term_stats"):
        a = spark.read.parquet(os.path.join(src, tbl)).toPandas()
        b = spark.read.parquet(os.path.join(d2, tbl)).toPandas()
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        b = b.sort_values(list(b.columns)).reset_index(drop=True)
        assert a.equals(b)


def test_merged_postings_df_consistency(spark, merged_dirs):
    """CheckIndex-style invariant: per-term df summed over merged segments
    equals the global term_stats df; blocks are docID-sorted with n<=128."""
    import os
    from pyspark.sql import functions as F

    src, d2, _ = merged_dirs
    posts = spark.read.parquet(os.path.join(d2, "postings"))
    got = posts.groupBy("term").agg(F.sum("df_part").alias("df")).toPandas()
    want = spark.read.parquet(os.path.join(src, "term_stats")).select("term", "df").toPandas()
    g = got.sort_values("term").reset_index(drop=True)
    w = want.sort_values("term").reset_index(drop=True)
    assert g.term.tolist() == w.term.tolist()
    np.testing.assert_array_equal(g.df.to_numpy(), w.df.to_numpy())

    sample = posts.limit(200).toPandas()
    for _, row in sample.iterrows():
        last = -1
        for blk in row.blocks:
            b = blk if isinstance(blk, dict) else blk.asDict()
            assert b["n"] <= 128
            assert b["first_doc"] > last, "blocks must be disjoint ascending"
            assert b["first_doc"] <= b["last_doc"]
            last = b["last_doc"]
