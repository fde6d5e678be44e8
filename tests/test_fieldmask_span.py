"""FieldMaskingSpanQuery (``L/search/spans/FieldMaskingSpanQuery``): a
title-field span masked into the body position space, ordered-near a body
term. Certified against a brute-force recomputation from raw text (the
corpus is plain space-separated words, so title positions = 0..7)."""

import duckdb

from lucene_solr_spark.engine import field_masking_span_topk

SF = "/root/testdata/sf0.001"


def _expected_docs(tt: str, bt: str, slop: int) -> set[int]:
    df = duckdb.sql(f"select * from '{SF}/documents.parquet'").df()
    out = set()
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = text.lower().split()
        p0s = [i for i, t in enumerate(toks[:8]) if t == tt]
        p1s = [i for i, t in enumerate(toks) if t == bt]
        for p0 in p0s:
            later = [p1 for p1 in p1s if p1 > p0]
            if later and min(later) - p0 - 1 <= slop:
                out.add(int(doc_id))
                break
    return out


def test_masked_matches_brute_force(spark):
    """With k covering every match, the returned doc set is exactly the
    docs holding an ordered (title-term, body-term) pair within slop —
    cross-field pairing in one position space, the class's contract."""
    got = field_masking_span_topk(spark, SF, "table", "join", 6, k=1000).toPandas()
    assert set(got["doc_id"].astype(int)) == _expected_docs("table", "join", 6)
    assert len(got) > 0
    # page discipline: (score desc, doc_id asc), dense ranks
    key = list(zip(-got["score"].astype(float), got["doc_id"]))
    assert key == sorted(key)
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_mask_restricts_vs_body_span(spark):
    """The masked query is a strict subset of the same span-near run
    entirely in the body field: title occurrences are body occurrences
    (first 8 words), but not vice versa."""
    from lucene_solr_spark.engine import get_engine

    masked = set(
        field_masking_span_topk(spark, SF, "table", "join", 6, k=1000)
        .toPandas()["doc_id"].astype(int)
    )
    body = set(
        get_engine(spark, SF, "simple")
        .span_near_topk("table", "join", 6, k=1000)
        .toPandas()["doc_id"].astype(int)
    )
    assert masked <= body and masked != body
