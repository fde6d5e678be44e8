"""CCNet perplexity bucketing: per-language head/middle/tail terciles by
unigram-LM bits-per-token (Wenzek et al. 2020 §4.4) over the distributed
two-pass rank + closed-form ntile."""

from lucene_solr_spark.ops.pipeline import PPL_BUCKETS, mix_ppl_buckets

SF = "/root/testdata/sf0.001"


def test_buckets_are_ordered_terciles(spark):
    df = mix_ppl_buckets(spark, SF).toPandas()
    for lang, g in df.groupby("lang"):
        sizes = g["ppl_bucket"].value_counts()
        # SQL-standard ntile: bucket sizes differ by at most 1
        assert sizes.max() - sizes.min() <= 1
        assert set(sizes.index) <= {"head", "middle", "tail"}
        # head = lowest bits/token (cleanest), tail = highest; boundaries
        # may tie on equal f32 values, so compare with <=
        h = g[g.ppl_bucket == "head"]["bits_per_token"]
        m = g[g.ppl_bucket == "middle"]["bits_per_token"]
        t = g[g.ppl_bucket == "tail"]["bits_per_token"]
        if len(h) and len(m):
            assert h.max() <= m.min()
        if len(m) and len(t):
            assert m.max() <= t.min()


def test_every_doc_bucketed_once(spark):
    df = mix_ppl_buckets(spark, SF).toPandas()
    assert df["doc_id"].is_unique
    assert (df.groupby("lang").size() >= PPL_BUCKETS).all() or len(df) < PPL_BUCKETS
