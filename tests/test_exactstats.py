"""ExactStatsCache distributed search (``S/search/stats/ExactStatsCache``):
merged global statistics restore single-collection ranking across a sharded
alias — the scatter-gather page must be BITWISE the plain engine's page,
at any shard count, which is precisely the invariant LocalStatsCache breaks
(see tests/test_localstats.py)."""

import pandas as pd
import pytest

from lucene_solr_spark.engine import exactstats_topk, get_engine, localstats_topk

SF = "/root/testdata/sf0.001"
TERMS = ["vector", "stream", "filter"]


@pytest.mark.parametrize("n_shards", [2, 4])
def test_alias_bitwise_equals_single_collection(spark, n_shards):
    """Shards partition the corpus and every weight binds to exact integer
    sums of the per-shard stats ⇒ scores are bitwise the single-index
    scores and the (score desc, key asc) merge reproduces the page."""
    alias = exactstats_topk(spark, SF, "or3", TERMS, k=10, n_shards=n_shards).toPandas()
    single = get_engine(spark, SF, "simple").topk("or3", TERMS, k=10).toPandas()
    pd.testing.assert_frame_equal(alias, single)


def test_exact_stats_differ_from_local_stats(spark):
    """The fixture corpus actually exercises the repair: with 4 shards the
    per-shard-stats page (LocalStatsCache) and the global-stats page must
    disagree somewhere (scores at minimum) — otherwise this query couldn't
    witness the ExactStatsCache fix at all."""
    local = localstats_topk(spark, SF, "or3", TERMS, k=10, n_shards=4).toPandas()
    exact = exactstats_topk(spark, SF, "or3", TERMS, k=10, n_shards=4).toPandas()
    assert not local["score"].equals(exact["score"])


def test_rare_term_absent_from_some_shards(spark):
    """A term that only some shards contain must still bind the exact
    global df (absent shards contribute 0, not a KeyError / skew) — page
    stays bitwise the single-collection page."""
    alias = exactstats_topk(spark, SF, "or3", ["dup", "vector", "stream"], k=10, n_shards=4).toPandas()
    single = get_engine(spark, SF, "simple").topk("or3", ["dup", "vector", "stream"], k=10).toPandas()
    pd.testing.assert_frame_equal(alias, single)
