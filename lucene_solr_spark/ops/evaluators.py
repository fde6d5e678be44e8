"""Stream evaluator tranche 2 — the next slice of Solr's math-expression
evaluator surface (``SJ/io/eval/*``, ~100 classes; tranche 1 lives in
ops/streams.py: select-arith, corr, describe, hist, regress, movingAvg,
ttest, anova, mannWhitney, cov, chi2/gTest dataset, ks).

This tranche picks the evaluators Solr's math-expression docs lean on most
for array/series work: ``percentile`` (PercentileEvaluator, commons-math
LEGACY estimation), ``scale`` (ScaleEvaluator min-max), ``rank``
(RankEvaluator — NaturalRanking, ties averaged), ``diff``
(TimeDifferencingEvaluator), the element-by-element quartet ``ebeAdd /
ebeSubtract / ebeMultiply / ebeDivide``, ``dotProduct`` +
``cosineSimilarity``, ``harmonicMean`` + ``geometricMean``, and
``movingMedian`` + ``delay``.

Float discipline (the ops/streams.py pattern): sufficient statistics
aggregate EXACTLY — ``value`` casts to DECIMAL(18,2) (two-decimal data),
order-sensitive double terms (1/y, ln y) quantize to DECIMAL(38,18) BEFORE
summing so the reduction is order-free — then closed forms run in doubles,
bit-deterministic under any partitioning, matching the DuckDB oracle
per-op. Series evaluators operate on the HOURLY aggregate of the events
stream (the ``timeseries`` source shape these evaluators consume in Solr),
so per-group state is O(buckets), never O(rows) — the 100 TB-safe shape;
``percentile``/``rank`` group per event_type and sort within the
aggregation, one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _y(col: str = "value"):
    return F.col(col).cast("decimal(18,2)")


# --- percentile (SJ/io/eval/PercentileEvaluator) -----------------------------
# commons-math Percentile, default (LEGACY) estimation: pos = p(n+1)/100 on
# the 1-indexed sorted sample; pos < 1 -> min, pos >= n -> max, else linear
# interpolation between floor(pos) and floor(pos)+1.

PCTS = (50, 90)


def _legacy_percentile(arr, n, p: int):
    pos = F.lit(p / 100.0) * (n.cast("double") + F.lit(1.0))
    lo = F.floor(pos).cast("int")

    def elem(i):
        return F.element_at(arr, i).cast("double")

    frac = pos - lo.cast("double")
    return (
        F.when(pos < F.lit(1.0), elem(F.lit(1)))
        .when(lo >= n, elem(n))
        .otherwise(elem(lo) + frac * (elem(lo + F.lit(1)) - elem(lo)))
    )


def stream_percentile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = (
        ev.select("event_type", _y().alias("y"))
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("y")).alias("arr"),
             F.count(F.lit(1)).cast("int").alias("n"))
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_obs"),
        _legacy_percentile(F.col("arr"), F.col("n"), 50).alias("p50"),
        _legacy_percentile(F.col("arr"), F.col("n"), 90).alias("p90"),
    ).orderBy("event_type")


def _legacy_percentile_sql(p: int) -> str:
    pos = f"({p / 100.0!r} * (CAST(n AS DOUBLE) + 1.0))"
    lo = f"CAST(floor({pos}) AS INT)"
    return (
        f"CASE WHEN {pos} < 1.0 THEN CAST(arr[1] AS DOUBLE)"
        f" WHEN {lo} >= n THEN CAST(arr[n] AS DOUBLE)"
        f" ELSE CAST(arr[{lo}] AS DOUBLE)"
        f" + ({pos} - CAST({lo} AS DOUBLE))"
        f" * (CAST(arr[{lo} + 1] AS DOUBLE) - CAST(arr[{lo}] AS DOUBLE)) END"
    )


STREAM_PERCENTILE_SQL = f"""
WITH g AS (
    SELECT event_type,
           list_sort(array_agg(CAST(value AS DECIMAL(18,2)))) AS arr,
           count(*)::INT AS n
    FROM events GROUP BY 1
)
SELECT event_type, n::BIGINT AS n_obs,
       {_legacy_percentile_sql(50)} AS p50,
       {_legacy_percentile_sql(90)} AS p90
FROM g ORDER BY event_type"""


# --- scale (SJ/io/eval/ScaleEvaluator): min-max normalize to [0, 1] ---------

def stream_scale_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("event_id").cast("long").alias("event_id"),
        _y().alias("y"),
    )
    mm = ev.groupBy("event_type").agg(
        F.min("y").alias("mn"), F.max("y").alias("mx")
    )
    w = Window.partitionBy("event_type").orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4)
        .join(F.broadcast(mm), "event_type")
        .select(
            "event_type", "event_id",
            F.col("y").cast("double").alias("v"),
            ((F.col("y") - F.col("mn")).cast("double")
             / (F.col("mx") - F.col("mn")).cast("double")).alias("scaled"),
        )
        .orderBy("event_type", "event_id")
    )


STREAM_SCALE_SQL = """
WITH mm AS (
    SELECT event_type, min(CAST(value AS DECIMAL(18,2))) AS mn,
           max(CAST(value AS DECIMAL(18,2))) AS mx
    FROM events GROUP BY 1
), firsts AS (
    SELECT event_type, event_id, CAST(value AS DECIMAL(18,2)) AS y,
           row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
    FROM events
)
SELECT f.event_type, f.event_id, CAST(f.y AS DOUBLE) AS v,
       CAST(f.y - mm.mn AS DOUBLE) / CAST(mm.mx - mm.mn AS DOUBLE) AS scaled
FROM firsts f JOIN mm USING (event_type)
WHERE rn <= 4 ORDER BY event_type, event_id"""


# --- rank (SJ/io/eval/RankEvaluator — NaturalRanking, ties averaged) --------

def stream_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("event_id").cast("long").alias("event_id"),
        _y().alias("y"),
    )
    wv = Window.partitionBy("event_type").orderBy("y")
    wt = Window.partitionBy("event_type", "y")
    wid = Window.partitionBy("event_type").orderBy("event_id")
    ranked = ev.select(
        "event_type", "event_id",
        F.col("y").cast("double").alias("v"),
        # average rank of a tie group = first_rank + (ties - 1) / 2
        (F.rank().over(wv).cast("double")
         + (F.count(F.lit(1)).over(wt).cast("double") - F.lit(1.0)) / F.lit(2.0)
         ).alias("avg_rank"),
        F.row_number().over(wid).alias("rn"),
    )
    return (
        ranked.filter(F.col("rn") <= 4)
        .select("event_type", "event_id", "v", "avg_rank")
        .orderBy("event_type", "event_id")
    )


STREAM_RANK_SQL = """
WITH r AS (
    SELECT event_type, event_id, CAST(value AS DECIMAL(18,2)) AS y,
           rank() OVER (PARTITION BY event_type
                        ORDER BY CAST(value AS DECIMAL(18,2))) AS rk,
           count(*) OVER (PARTITION BY event_type,
                          CAST(value AS DECIMAL(18,2))) AS ties,
           row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
    FROM events
)
SELECT event_type, event_id, CAST(y AS DOUBLE) AS v,
       CAST(rk AS DOUBLE) + (CAST(ties AS DOUBLE) - 1.0) / 2.0 AS avg_rank
FROM r WHERE rn <= 4 ORDER BY event_type, event_id"""


# --- diff (SJ/io/eval/TimeDifferencingEvaluator, lag 1) over the hourly
# sum-of-value series per event_type ------------------------------------------

def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select("event_type", F.hour("ts").cast("int").alias("h"), _y().alias("y"))
        .groupBy("event_type", "h")
        .agg(F.sum("y").alias("s"))
    )


def stream_diff_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("h")
    return hourly.select(
        "event_type", "h",
        F.col("s").cast("double").alias("v"),
        (F.col("s") - F.lag("s", 1).over(w)).cast("double").alias("diff1"),
    ).orderBy("event_type", "h")


_HOURLY_SQL = """
hourly AS (
    SELECT event_type, hour(ts)::INT AS h,
           sum(CAST(value AS DECIMAL(18,2))) AS s
    FROM events GROUP BY 1, 2
)"""

STREAM_DIFF_SQL = f"""
WITH {_HOURLY_SQL}
SELECT event_type, h, CAST(s AS DOUBLE) AS v,
       CAST(s - lag(s, 1) OVER (PARTITION BY event_type ORDER BY h)
            AS DOUBLE) AS diff1
FROM hourly ORDER BY event_type, h"""


# --- ebeAdd / ebeSubtract / ebeMultiply / ebeDivide (SJ/io/eval/
# EBEAddEvaluator ...) over two aligned hourly series (click vs view) ---------

def _two_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir)
    a = hourly.filter(F.col("event_type") == "click").select("h", F.col("s").alias("sa"))
    b = hourly.filter(F.col("event_type") == "view").select("h", F.col("s").alias("sb"))
    return a.join(b, "h")   # inner: aligned buckets only, ebe* length contract


def stream_ebe_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ab = _two_series(spark, sf_dir)
    sa, sb = F.col("sa"), F.col("sb")
    return ab.select(
        "h",
        (sa + sb).cast("double").alias("ebe_add"),
        (sa - sb).cast("double").alias("ebe_sub"),
        (sa.cast("double") * sb.cast("double")).alias("ebe_mul"),
        (sa.cast("double") / sb.cast("double")).alias("ebe_div"),
    ).orderBy("h")


_TWO_SERIES_SQL = f"""{_HOURLY_SQL},
ab AS (
    SELECT a.h, a.s AS sa, b.s AS sb
    FROM (SELECT h, s FROM hourly WHERE event_type = 'click') a
    JOIN (SELECT h, s FROM hourly WHERE event_type = 'view') b USING (h)
)"""

STREAM_EBE_SQL = f"""
WITH {_TWO_SERIES_SQL}
SELECT h, CAST(sa + sb AS DOUBLE) AS ebe_add,
       CAST(sa - sb AS DOUBLE) AS ebe_sub,
       CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) AS ebe_mul,
       CAST(sa AS DOUBLE) / CAST(sb AS DOUBLE) AS ebe_div
FROM ab ORDER BY h"""


# --- dotProduct + cosineSimilarity (SJ/io/eval/DotProductEvaluator,
# CosineSimilarityEvaluator) of the same two aligned series -------------------

def stream_dot_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ab = _two_series(spark, sf_dir)
    # per-term products are exact decimal×decimal -> decimal; the sums are
    # exact, so the final doubles are order-free
    s = ab.select(
        (F.col("sa") * F.col("sb")).alias("axb"),
        (F.col("sa") * F.col("sa")).alias("axa"),
        (F.col("sb") * F.col("sb")).alias("bxb"),
    ).agg(
        F.sum("axb").alias("dot"),
        F.sum("axa").alias("na"),
        F.sum("bxb").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    return s.select(
        "n_buckets",
        F.col("dot").cast("double").alias("dot_product"),
        (F.col("dot").cast("double")
         / (F.sqrt(F.col("na").cast("double"))
            * F.sqrt(F.col("nb").cast("double")))).alias("cosine"),
    )


STREAM_DOT_COSINE_SQL = f"""
WITH {_TWO_SERIES_SQL},
s AS (
    SELECT sum(sa * sb) AS dot, sum(sa * sa) AS na, sum(sb * sb) AS nb,
           count(*)::BIGINT AS n_buckets
    FROM ab
)
SELECT n_buckets, CAST(dot AS DOUBLE) AS dot_product,
       CAST(dot AS DOUBLE)
           / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
FROM s"""


# --- harmonicMean + geometricMean (SJ/io/eval/HarmonicMeanEvaluator,
# GeometricMeanEvaluator) -----------------------------------------------------
# 1/y and ln(y) are doubles (order-sensitive if summed raw): quantize each
# term to DECIMAL(38,18) first — both engines compute the identical IEEE
# double then round half-up to the same 18-decimal fixed point, so the sum
# is exact and the reduction order-free.

def stream_harmonic_geometric(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", _y().alias("y"))
    terms = ev.select(
        "event_type",
        (F.lit(1.0) / F.col("y").cast("double")).cast("decimal(38,18)").alias("inv"),
        F.log(F.col("y").cast("double")).cast("decimal(38,18)").alias("lny"),
    )
    s = terms.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("inv").alias("sinv"),
        F.sum("lny").alias("slny"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_obs"),
        (nd / F.col("sinv").cast("double")).alias("harmonic_mean"),
        F.exp(F.col("slny").cast("double") / nd).alias("geometric_mean"),
    ).orderBy("event_type")


STREAM_HARMONIC_GEOMETRIC_SQL = """
WITH terms AS (
    SELECT event_type,
           CAST(1.0 / CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)
                AS DECIMAL(38,18)) AS inv,
           CAST(ln(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE))
                AS DECIMAL(38,18)) AS lny
    FROM events
), s AS (
    SELECT event_type, count(*)::BIGINT AS n, sum(inv) AS sinv,
           sum(lny) AS slny
    FROM terms GROUP BY 1
)
SELECT event_type, n AS n_obs,
       CAST(n AS DOUBLE) / CAST(sinv AS DOUBLE) AS harmonic_mean,
       exp(CAST(slny AS DOUBLE) / CAST(n AS DOUBLE)) AS geometric_mean
FROM s ORDER BY event_type"""


# --- movingMedian + delay (SJ/io/eval/MovingMedianEvaluator,
# RecursiveEvaluator 'delay' lag) over the hourly click series ---------------

MED_WINDOW = 5


def stream_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly(spark, sf_dir).filter(F.col("event_type") == "click")
    # windows partition on the series key (single-valued after the filter,
    # O(buckets) rows per series — the general multi-series shape)
    w = (
        Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(-(MED_WINDOW - 1), 0)
    )
    wo = Window.partitionBy("event_type").orderBy("h")
    arr = F.sort_array(F.collect_list("s").over(w))
    return hourly.select(
        "h",
        F.col("s").cast("double").alias("v"),
        # full windows only (the evaluator emits len - window + 1 points)
        F.when(
            F.size(arr) == MED_WINDOW,
            F.element_at(arr, MED_WINDOW // 2 + 1).cast("double"),
        ).alias("moving_median"),
        F.lag("s", 2).over(wo).cast("double").alias("delay2"),
    ).orderBy("h")


STREAM_MOVING_MEDIAN_SQL = f"""
WITH {_HOURLY_SQL},
c AS (SELECT h, s FROM hourly WHERE event_type = 'click')
SELECT h, CAST(s AS DOUBLE) AS v,
       CASE WHEN count(*) OVER w = {MED_WINDOW}
            THEN CAST(median(s) OVER w AS DOUBLE) END AS moving_median,
       CAST(lag(s, 2) OVER (ORDER BY h) AS DOUBLE) AS delay2
FROM c
WINDOW w AS (ORDER BY h ROWS BETWEEN {MED_WINDOW - 1} PRECEDING AND CURRENT ROW)
ORDER BY h"""


register("stream_percentile_eval", stream_percentile_eval, STREAM_PERCENTILE_SQL)
register("stream_scale_eval", stream_scale_eval, STREAM_SCALE_SQL)
register("stream_rank_eval", stream_rank_eval, STREAM_RANK_SQL)
register("stream_diff_eval", stream_diff_eval, STREAM_DIFF_SQL)
register("stream_ebe_ops", stream_ebe_ops, STREAM_EBE_SQL)
register("stream_dot_cosine", stream_dot_cosine, STREAM_DOT_COSINE_SQL)
register(
    "stream_harmonic_geometric", stream_harmonic_geometric,
    STREAM_HARMONIC_GEOMETRIC_SQL,
)
register("stream_moving_median", stream_moving_median, STREAM_MOVING_MEDIAN_SQL)
