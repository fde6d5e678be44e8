"""Payloads: DelimitedPayloadTokenFilter + PayloadScoreQuery.

Reference: ``LA/payloads/DelimitedPayloadTokenFilter.java`` (``token|2.5``
syntax, FloatEncoder), ``lucene/queries/.../payloads/PayloadScoreQuery.java``
with ``AveragePayloadFunction`` / Min / Max / Sum (Solr ``{!payload_score
f=field func=avg}``, ``S/search/PayloadScoreQParserPlugin``).

The payload-annotated field is CONSTRUCTED deterministically from
``documents.text`` — each token carries ``|payload`` with payload =
f32(1 + ((pos·31) mod 97)/10) — the spatial_geofilt precedent (derived
values standing in for real stored payloads; Lucene's own payload tests
feed explicit ``the|0.5 quick|2.0`` strings the same way). The round trip
is real: the annotated string is built, then PARSED back through the
DelimitedPayload split exactly as the filter would, and only the parsed
(term, pos, payload) stream feeds scoring.

Spark shape: posexplode over one JVM ``regexp_extract_all`` (no Python),
payload math in whole-stage codegen, ONE groupBy on doc_id with the
float32 ordered fold (payloads summed in position order at f32, the
``PayloadScoreQuery$PayloadSpans#collectLeaf`` float accumulation), top-k
via TakeOrdered. At 10^12 rows: one scan + one shuffle on the grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .registry import register
from .textmetrics import TOKEN_RE, TOKEN_RE_SQL

PAYLOAD_TERM = "merge"
PAYLOAD_K = 10


def payload_score_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k docs by PayloadScoreQuery(term, func=avg, includeSpanScore=
    false): score = AveragePayloadFunction over the term's occurrences —
    f32 payloads summed in position order (one f32 add per payload, the
    reference's float accumulation), divided by the match count (float
    division). Ties (score desc) break doc_id asc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("pos", "term"),
    )
    # DelimitedPayloadTokenFilter round trip: annotate, then parse back
    payload = (
        F.lit(1.0) + (F.col("pos") * 31 % 97) / F.lit(10.0)
    ).cast("float")
    annotated = toks.select(
        "doc_id", "pos",
        F.concat(F.col("term"), F.lit("|"),
                 F.format_string("%.6f", payload)).alias("annotated"),
    )
    parsed = annotated.select(
        "doc_id", "pos",
        F.substring_index("annotated", "|", 1).alias("term"),
        F.substring_index("annotated", "|", -1).cast("float").alias("payload"),
    )
    occ = parsed.filter(F.col("term") == F.lit(PAYLOAD_TERM))
    per_doc = occ.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("pos", "payload"))),
            F.lit(0.0).cast("float"),
            lambda acc, x: acc + x["payload"],
        ).alias("psum"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_doc.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            (F.col("psum") / F.col("n").cast("float"))
            .cast("float").alias("score"),
            F.col("n").cast("long").alias("n_payloads"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(PAYLOAD_K)
    )


PAYLOAD_SCORE_SQL = f"""
WITH toks AS (
    SELECT doc_id, lower(unnest(t)) AS term,
           generate_subscripts(t, 1) - 1 AS pos
    FROM (SELECT doc_id,
                 regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS t
          FROM documents)
),
annotated AS (
    SELECT doc_id, pos,
           term || '|' || format('{{:.6f}}',
               CAST(1.0 + (pos * 31 % 97) / 10.0 AS FLOAT)) AS annotated
    FROM toks
),
parsed AS (
    SELECT doc_id, pos,
           split_part(annotated, '|', 1) AS term,
           CAST(split_part(annotated, '|', 2) AS FLOAT) AS payload
    FROM annotated
),
per_doc AS (
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0.0 AS FLOAT),
                            list(payload ORDER BY pos)),
               (a, b) -> CAST(a + b AS FLOAT)) AS psum,
           count(*)::BIGINT AS n
    FROM parsed WHERE term = '{PAYLOAD_TERM}' GROUP BY doc_id
)
SELECT doc_id::BIGINT AS doc_id,
       CAST(psum / CAST(n AS FLOAT) AS FLOAT) AS score,
       n AS n_payloads
FROM per_doc
ORDER BY score DESC, doc_id ASC LIMIT {PAYLOAD_K}"""


register("ft_payload_topk", payload_score_topk, PAYLOAD_SCORE_SQL)


# --- SpanPayloadCheckQuery: span matches gated on the payload value ---------

PAYLOAD_CHECK_VALUE = "6.800000"  # f32 payload 6.8 ⇔ pos ≡ 5 (mod 97)


def payload_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpanPayloadCheckQuery (``lucene/queries/.../payloads/
    SpanPayloadCheckQuery.java``): wraps a SpanTermQuery and matches ONLY
    the occurrences whose payload EQUALS ``payloadToMatch`` — the payload
    acts as a filter on spans, not a score source. Output: docs with >=1
    qualifying span, with the qualifying-span count (the span freq a
    wrapping scorer would see), (n desc, doc asc) top-k.

    Same deterministic DelimitedPayload round trip as
    ``payload_score_topk``; the equality check runs on the PARSED payload
    string exactly as the upstream BytesRef comparison does (byte-equal
    payloads, not float-tolerant)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("pos", "term"),
    )
    payload = (
        F.lit(1.0) + (F.col("pos") * 31 % 97) / F.lit(10.0)
    ).cast("float")
    annotated = toks.select(
        "doc_id", "pos",
        F.concat(F.col("term"), F.lit("|"),
                 F.format_string("%.6f", payload)).alias("annotated"),
    )
    parsed = annotated.select(
        "doc_id",
        F.substring_index("annotated", "|", 1).alias("term"),
        F.substring_index("annotated", "|", -1).alias("payload"),
    )
    return (
        parsed.filter(
            (F.col("term") == F.lit(PAYLOAD_TERM))
            & (F.col("payload") == F.lit(PAYLOAD_CHECK_VALUE))
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_spans"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_spans").cast("long").alias("n_spans"),
        )
        .orderBy(F.desc("n_spans"), F.asc("doc_id"))
        .limit(PAYLOAD_K)
    )


PAYLOAD_CHECK_SQL = f"""
WITH toks AS (
    SELECT doc_id, lower(unnest(t)) AS term,
           generate_subscripts(t, 1) - 1 AS pos
    FROM (SELECT doc_id,
                 regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS t
          FROM documents)
),
annotated AS (
    SELECT doc_id,
           term || '|' || format('{{:.6f}}',
               CAST(1.0 + (pos * 31 % 97) / 10.0 AS FLOAT)) AS annotated
    FROM toks
),
parsed AS (
    SELECT doc_id,
           split_part(annotated, '|', 1) AS term,
           split_part(annotated, '|', 2) AS payload
    FROM annotated
)
SELECT doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_spans
FROM parsed
WHERE term = '{PAYLOAD_TERM}' AND payload = '{PAYLOAD_CHECK_VALUE}'
GROUP BY doc_id
ORDER BY n_spans DESC, doc_id ASC LIMIT {PAYLOAD_K}"""


register("ft_payload_check", payload_check, PAYLOAD_CHECK_SQL)
