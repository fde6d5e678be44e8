"""Leading-wildcard via the reversed-dictionary sidecar
(``S/analysis/ReversedWildcardFilterFactory`` analog, SURVEY.md §2.C
MultiTerm row): ``*<suffix>`` is a PREFIX range on term_stats_rev, not a
full-dictionary LIKE scan."""

import os

import pytest

from lucene_solr_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    index_dir, _ = small_index
    return IndexSearcher(spark, index_dir)


def test_sidecar_written_by_finalize(small_index):
    index_dir, _ = small_index
    assert os.path.isdir(os.path.join(index_dir, "term_stats_rev"))


def test_expansion_matches_naive_like(spark, searcher, small_index):
    """Reversed-prefix expansion == LIKE '%suffix' over the same dictionary
    (order and content), for several suffixes incl. no-match."""
    index_dir, _ = small_index
    from lucene_solr_spark.index.build import KEYWORD_PREFIX

    ts = spark.read.parquet(os.path.join(index_dir, "term_stats"))
    for suffix in ("ing", "rk", "e", "zzzznope"):
        got = searcher.expand_terms("leading_wildcard", suffix)
        want = sorted(
            r.term
            for r in ts.filter(ts.term.like("%" + suffix)).collect()
            if not r.term.startswith(KEYWORD_PREFIX)
        )
        assert got == want[:1024]


def test_prefix_pushdown_on_reversed_column(spark, searcher, small_index):
    """The sidecar scan carries a pushed StartsWith on rterm — the whole
    point of the reversed dictionary (file pruning at dictionary scale)."""
    index_dir, _ = small_index
    from pyspark.sql import functions as F

    rev = spark.read.parquet(os.path.join(index_dir, "term_stats_rev"))
    plan = (
        rev.filter(F.col("rterm").startswith("gni"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "StartsWith(rterm" in plan


def test_search_equals_wildcard_path(searcher):
    """Ranked search through the leading_wildcard kind == the generic
    wildcard kind with LIKE '%ing' (same expansion ⇒ bitwise-same topk)."""
    import numpy as np

    a = searcher.search(
        searcher.multiterm_spec("leading_wildcard", "ing"), k=10
    ).toPandas()
    b = searcher.search(searcher.multiterm_spec("wildcard", "%ing"), k=10).toPandas()
    np.testing.assert_array_equal(a.doc_id.to_numpy(), b.doc_id.to_numpy())
    np.testing.assert_array_equal(
        a.score.to_numpy().astype(np.float32),
        b.score.to_numpy().astype(np.float32),
    )
