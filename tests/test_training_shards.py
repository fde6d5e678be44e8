"""Training-shard sink: token-budgeted output shards with an auditable
content manifest (the pipeline's OUTPUT stage — pack_sequences' placement
discipline applied to file layout)."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_write_matches_manifest_and_is_deterministic(spark, tmp_path):
    from pyspark.sql import functions as F

    from lucene_solr_spark.ops.pipeline import (
        shard_manifest, write_training_shards,
    )

    out1 = str(tmp_path / "shards1")
    man1 = write_training_shards(spark, SF, out1).toPandas()

    # the files on disk agree with the manifest row-for-row
    back = (
        spark.read.parquet(out1)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
        .toPandas()
    )
    assert len(back) == len(man1) >= 1
    for col in ("n_docs", "n_tokens", "min_doc", "max_doc"):
        assert (back[col].to_numpy() == man1[col].to_numpy()).all(), col

    # every doc lands in exactly one shard (docs never split)
    n_docs_total = spark.read.parquet(os.path.join(SF, "documents.parquet")).count()
    dup = spark.read.parquet(out1).groupBy("doc_id").count().filter("count > 1").count()
    assert dup == 0 and int(man1.n_docs.sum()) == n_docs_total

    # shards respect the budget up to one straddling doc's tail: every
    # shard except possibly the last STARTS a new budget window
    from lucene_solr_spark.ops.pipeline import SHARD_TOKENS

    starts = man1.n_tokens.cumsum().shift(fill_value=0) // SHARD_TOKENS
    assert (starts.to_numpy() == man1.shard.to_numpy()).all()

    # re-run → identical manifest (same shard membership + fingerprints)
    out2 = str(tmp_path / "shards2")
    man2 = write_training_shards(spark, SF, out2).toPandas()
    assert man1.equals(man2)
    # and the standalone manifest (no write) agrees too
    man3 = shard_manifest(spark, SF).toPandas()
    assert man1.equals(man3)


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_pack_loss_masks_invariants(spark):
    """Loss-mask spans tile exactly the masked docs' token ranges, clipped
    at sequence cuts: per-doc span lengths sum to n_tok, every span sits
    inside [0, CAPACITY), and a straddling doc's spans are boundary-exact."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.ops.pipeline import (
        PACK_CAPACITY, _MASK_SOURCES, _token_placement, pack_loss_masks,
    )

    spans = pack_loss_masks(spark, SF).toPandas()
    assert len(spans) > 0
    assert (spans.span_len > 0).all()
    assert (spans.span_start >= 0).all()
    assert (spans.span_start + spans.span_len <= PACK_CAPACITY).all()

    placed = (
        _token_placement(spark, SF)
        .join(
            spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .select("doc_id", "source"),
            "doc_id",
        )
        .filter(F.col("source").isin(list(_MASK_SOURCES)) & (F.col("n_tok") > 0))
        .toPandas()
        .set_index("doc_id")
    )
    # exactly the masked docs appear, and their spans sum to n_tok
    got = spans.groupby("doc_id").span_len.sum()
    assert sorted(got.index) == sorted(placed.index)
    assert (got.sort_index().to_numpy()
            == placed.n_tok.sort_index().to_numpy()).all()

    # straddling docs: consecutive spans chain across sequence boundaries
    # (end of one span at CAPACITY, next starts at 0 in seq_id+1)
    multi = spans[spans.duplicated("doc_id", keep=False)].sort_values(
        ["doc_id", "seq_id"])
    assert len(multi) > 0, "fixture must exercise a straddling doc"
    for _, g in multi.groupby("doc_id"):
        seqs = g.seq_id.to_numpy()
        assert (seqs[1:] == seqs[:-1] + 1).all()
        assert (g.span_start.to_numpy()[1:] == 0).all()
        assert (
            (g.span_start + g.span_len).to_numpy()[:-1] == PACK_CAPACITY
        ).all()
        # first span starts at the doc's in-sequence offset
        doc = g.doc_id.iloc[0]
        assert int(g.span_start.iloc[0]) == int(
            placed.loc[doc, "tok_start"] % PACK_CAPACITY)
