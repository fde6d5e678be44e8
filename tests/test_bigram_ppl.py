"""Interpolated bigram LM perplexity: structural invariants tying the
bigram-event count to tokenization, and the JM mixture staying a proper
probability (positive bits)."""

from pyspark.sql import functions as F

from lucene_solr_spark.ops.textmetrics import TOKEN_RE, text_bigram_ppl

SF = "/root/testdata/sf0.001"


def test_bigram_counts_and_positive_bits(spark):
    out = text_bigram_ppl(spark, SF).toPandas()
    toks = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
            ).alias("n"),
        )
        .toPandas()
    )
    merged = out.merge(toks, on="doc_id")
    # every scored doc has exactly n_tokens - 1 adjacent bigram events
    assert (merged["n_bigrams"] == merged["n"] - 1).all()
    # docs with <2 tokens are absent, all others present
    assert set(out["doc_id"]) == set(toks[toks["n"] >= 2]["doc_id"])
    # the JM mixture is a sub-1 probability per event -> -log2 is positive
    assert (out["bits_per_bigram"] > 0).all()
