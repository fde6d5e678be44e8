"""LocalStatsCache distributed search (``S/search/stats/LocalStatsCache``,
``S/handler/component/QueryComponent#mergeIds``): per-shard statistics
change rankings vs the single-collection (exact-stats) run, EXCEPT in the
one-shard degenerate case where they must coincide bitwise."""

import pandas as pd

from lucene_solr_spark.engine import get_engine, localstats_topk

SF = "/root/testdata/sf0.001"
TERMS = ["vector", "stream", "filter"]


def test_one_shard_equals_exact_stats(spark):
    """n_shards=1 ⇒ the 'shard' IS the collection: LocalStatsCache and
    ExactStatsCache see identical df/docCount/avgdl, so the distributed
    merge must reproduce the plain top-k bitwise (scores AND order)."""
    local = localstats_topk(spark, SF, "or3", TERMS, k=10, n_shards=1).toPandas()
    exact = get_engine(spark, SF, "simple").topk("or3", TERMS, k=10).toPandas()
    pd.testing.assert_frame_equal(local, exact)


def test_merge_order_and_shard_membership(spark):
    """The merged page is (score desc, doc_id asc)-ordered, rank is dense
    from 1, and every returned doc belongs to the shard its id hashes to
    (compositeId routing: doc_id % n_shards)."""
    out = localstats_topk(spark, SF, "or3", TERMS, k=10, n_shards=4).toPandas()
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    key = list(zip(-out["score"].astype(float), out["doc_id"]))
    assert key == sorted(key)
    # routing sanity: shards partition the id space — no doc appears twice
    assert out["doc_id"].is_unique
