"""DiversifiedTopDocsCollector analog: the page carries at most
``max_per_key`` hits per key, and with an unbinding cap it degenerates to
the plain top-k (same docs, same scores, same order)."""

import pandas as pd

from lucene_solr_spark.engine import get_engine

SF = "/root/testdata/sf0.001"
TERMS = ["vector", "stream", "filter"]


def test_per_key_cap_binds(spark):
    eng = get_engine(spark, SF, "simple")
    out = eng.diversified_topk("or3", TERMS, k=10, max_per_key=1).toPandas()
    assert out.groupby("source").size().max() <= 1
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    key = list(zip(-out["score"].astype(float), out["doc_id"]))
    assert key == sorted(key)
    # the cap must actually bind on this fixture: the plain page holds >1
    # doc of some source, so the diversified page differs
    plain = eng.topk("or3", TERMS, k=10).toPandas()
    src = (
        eng.spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source").toPandas()
    )
    merged = plain.merge(src, on="doc_id")
    assert merged.groupby("source").size().max() > 1
    assert list(out["doc_id"]) != list(plain["doc_id"])


def test_unbinding_cap_equals_plain_topk(spark):
    eng = get_engine(spark, SF, "simple")
    div = eng.diversified_topk("or3", TERMS, k=10, max_per_key=1 << 20).toPandas()
    plain = eng.topk("or3", TERMS, k=10).toPandas()
    pd.testing.assert_frame_equal(
        div[["rank", "doc_id", "score"]], plain[["rank", "doc_id", "score"]]
    )
