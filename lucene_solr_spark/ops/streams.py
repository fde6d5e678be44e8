"""Solr Streaming Expressions (SURVEY.md §2.F, ``SJ/io/stream/*``) as
DataFrame combinators.

Every tuple-at-a-time sorted-stream operator in solrj's io.stream package
maps to a declarative DataFrame op that Catalyst plans (sort-merge vs
broadcast-hash picked by stats/AQE — replacing the author-picks-the-join
model of ``InnerJoinStream`` vs ``HashJoinStream``). ``ParallelStream``'s
hash-partitioned workers are Spark's exchange itself.

Scale notes: the small dimension side (customer/nation) is explicitly
``broadcast()`` (HashJoinStream semantics — build side must fit in memory,
here executor memory); fact-fact joins shuffle on the join key once and
aggregate on the same key (no second shuffle: groupBy key ⊆ join key).
Timeseries buckets aggregate map-side first.

Float discipline for the oracles: sums over doubles go through DECIMAL
casts (order-independent exact arithmetic), like facets.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- innerJoin (sorted-stream equi-join, InnerJoinStream/BiJoinStream) ------

def stream_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders on orderkey, rollup revenue per orderpriority.
    Fact-fact equi-join → Catalyst sort-merge join (InnerJoinStream analog);
    the rollup aggregates on the broadcastable result."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("o_orderpriority")
    )


STREAM_INNER_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1"""


# --- hashJoin (build-side broadcast, HashJoinStream) ------------------------

def stream_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ broadcast(customer ⋈ nation): revenue per nation."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    dim = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("n_name")
    )


STREAM_HASH_JOIN_SQL = """
SELECT n_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       count(*)::BIGINT AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1"""


# --- leftOuterJoin + having (LeftOuterJoinStream, HavingStream) -------------

def stream_left_join_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers left-joined to their orders, HAVING n_orders >= 15."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
        .orderBy("c_custkey")
    )


STREAM_LEFT_JOIN_HAVING_SQL = """
SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY 1 HAVING count(o_orderkey) >= 15 ORDER BY 1"""


# --- fetch (batched lookup enrich, FetchStream) -----------------------------

def stream_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top-20 orders by price, enriched with customer fields (fetch = late
    broadcast lookup join AFTER the top-k, never before)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    top = orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(20)
    return (
        top.join(F.broadcast(cust), top.o_custkey == cust.c_custkey, "left")
        .select("o_orderkey", "o_totalprice", "c_name", "c_nationkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


STREAM_FETCH_SQL = """
SELECT o_orderkey, o_totalprice, c_name, c_nationkey
FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20) o
LEFT JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC"""


# --- unique / sort / top (UniqueStream, SortStream, RankStream) -------------

def stream_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct (user_id, event_type) pairs — dedupe on sorted key."""
    ev = _t(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates().orderBy("user_id", "event_type")


STREAM_UNIQUE_SQL = """
SELECT DISTINCT user_id, event_type FROM events ORDER BY 1, 2"""


def stream_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RankStream: top-50 events by value (desc, event_id asc tiebreak)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(50)
        .select("event_id", "user_id", "value")
    )


STREAM_TOP_SQL = """
SELECT event_id, user_id, value FROM events ORDER BY value DESC, event_id ASC LIMIT 50"""


# --- rollup / reduce (RollupStream + metrics) -------------------------------

def stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("user_id")
    )


STREAM_ROLLUP_SQL = """
SELECT user_id, count(*)::BIGINT AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1 ORDER BY 1"""


# --- intersect / complement (IntersectStream, ComplementStream) -------------

def stream_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """users who both clicked AND errored (left-semi ∘ left-semi)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    errors = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return clicks.intersect(errors).orderBy("user_id")


STREAM_INTERSECT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id"""


def stream_complement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """users who viewed but never purchased (anti-join)."""
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return views.join(buys, "user_id", "left_anti").orderBy("user_id")


STREAM_COMPLEMENT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id"""


# --- cartesianProduct (unnest multivalued field, CartesianProductStream) ----

def stream_cartesian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode the json props into (event_id, key, value) tuples."""
    ev = _t(spark, sf_dir, "events")
    kv = F.explode(F.from_json(F.col("props"), "map<string,string>"))
    return (
        ev.select("event_id", kv.alias("k", "v"))
        .orderBy("event_id", "k")
    )


STREAM_CARTESIAN_SQL = """
SELECT event_id,
       unnest(regexp_extract_all(props, '"([^"]+)" *:', 1)) AS k,
       unnest(regexp_extract_all(props, ': *"?([^",}}]+)"?', 1)) AS v
FROM events
ORDER BY event_id, k"""


# --- select/eval (SelectStream + SJ/io/eval evaluators) ---------------------

def stream_select_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """computed fields: date math, if/else, arithmetic (eval classes)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.dayofweek("ts").cast("int").alias("dow"),
        (F.col("value") * 2.0 + 1.0).alias("scaled"),
        F.when(F.col("value") > 10.0, F.lit("high")).otherwise(F.lit("low")).alias("band"),
    ).orderBy("event_id")


STREAM_SELECT_EVAL_SQL = """
SELECT event_id,
       date_trunc('day', ts) AS day,
       (dayofweek(ts) + 1)::INTEGER AS dow,
       value * 2.0 + 1.0 AS scaled,
       CASE WHEN value > 10.0 THEN 'high' ELSE 'low' END AS band
FROM events ORDER BY event_id"""


# --- timeseries (TimeSeriesStream = date-range facet) -----------------------

def stream_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec).cast("double").alias("sum_value"))
        .orderBy("day", "event_type")
    )


STREAM_TIMESERIES_SQL = """
SELECT date_trunc('day', ts) AS day, event_type,
       count(*)::BIGINT AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""


# --- Solr math expressions: movingAvg / regress (SJ/io/eval/*) --------------

MOVING_AVG_WINDOW = 7


def stream_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``movingAvg`` evaluator (``SJ/io/eval/MovingAverageEvaluator``) over
    the daily-count timeseries: a 7-row trailing mean per event_type.

    Day buckets first aggregate map-side (one shuffle on (day, type)); the
    moving window then runs over the tiny bucket table — at 10^12 rows the
    expensive pass is still the single bucket aggregation, and the window
    shuffles only one row per (day, type). The mean is emitted as exact
    BIGINT window-sum / window-count so both engines divide the same
    integers (no float accumulation order to diverge)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-(MOVING_AVG_WINDOW - 1), 0)
    )
    return (
        daily.select(
            "day", "event_type", "n",
            (F.sum("n").over(w).cast("double") / F.count("n").over(w))
            .alias("mavg"),
        )
        .orderBy("day", "event_type")
    )


STREAM_MOVING_AVG_SQL = f"""
WITH daily AS (
    SELECT date_trunc('day', ts) AS day, event_type, count(*)::BIGINT AS n
    FROM events GROUP BY 1, 2
)
SELECT day, event_type, n,
       CAST(sum(n) OVER w AS DOUBLE) / count(n) OVER w AS mavg
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN {MOVING_AVG_WINDOW - 1} PRECEDING AND CURRENT ROW)
ORDER BY day, event_type"""


def stream_regress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``regress`` evaluator (``SJ/io/eval/RegressionEvaluator``): ordinary
    least squares of event value against time, per event_type — slope,
    intercept, r².

    Float discipline: the five sufficient statistics (Σx, Σy, Σx², Σxy, Σy²)
    are EXACT — x is an integer day number, y a DECIMAL(18,2) — so both
    engines reduce to identical doubles before the closed-form OLS
    arithmetic, making slope/intercept/r² deterministic bit-for-bit
    regardless of row order or partitioning. One map-side-combined
    aggregate; no second pass."""
    ev = _t(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long")
    y = F.col("value").cast("decimal(18,2)")
    s = (
        ev.select(x.alias("x"), y.alias("y"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
            F.sum(F.col("y") * F.col("x")).cast("double").alias("sxy"),
            F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        )
    )
    vx = s.n * s.sxx - s.sx * s.sx
    vy = s.n * s.syy - s.sy * s.sy
    cov = s.n * s.sxy - s.sx * s.sy
    return (
        s.select(
            "event_type",
            s.n.cast("long").alias("n_obs"),
            (cov / vx).alias("slope"),
            ((s.sy - (cov / vx) * s.sx) / s.n).alias("intercept"),
            (cov * cov / (vx * vy)).alias("r2"),
        )
        .orderBy("event_type")
    )


STREAM_REGRESS_SQL = """
WITH s AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx,
           CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(x * x) AS DOUBLE) AS sxx,
           CAST(sum(y * x) AS DOUBLE) AS sxy,
           CAST(sum(y * y) AS DOUBLE) AS syy
    FROM (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', ts::DATE)::BIGINT AS x,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
    ) GROUP BY 1
)
SELECT event_type, n::BIGINT AS n_obs,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM s ORDER BY event_type"""


register("stream_inner_join", stream_inner_join, STREAM_INNER_JOIN_SQL)
register("stream_hash_join", stream_hash_join, STREAM_HASH_JOIN_SQL)
register("stream_left_join_having", stream_left_join_having, STREAM_LEFT_JOIN_HAVING_SQL)
register("stream_fetch", stream_fetch, STREAM_FETCH_SQL)
register("stream_unique", stream_unique, STREAM_UNIQUE_SQL)
register("stream_top", stream_top, STREAM_TOP_SQL)
register("stream_rollup", stream_rollup, STREAM_ROLLUP_SQL)
register("stream_intersect", stream_intersect, STREAM_INTERSECT_SQL)
register("stream_complement", stream_complement, STREAM_COMPLEMENT_SQL)
register("stream_cartesian", stream_cartesian, STREAM_CARTESIAN_SQL)
register("stream_select_eval", stream_select_eval, STREAM_SELECT_EVAL_SQL)
register("stream_timeseries", stream_timeseries, STREAM_TIMESERIES_SQL)
HIST_BINS = 10


def stream_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``hist`` evaluator (``SJ/io/eval/HistogramEvaluator``): fixed-width
    histogram of event value per event_type — ``HIST_BINS`` equal bins over
    the GLOBAL [min, max], bin = min(bins−1, floor((v−lo)/(hi−lo)·bins)).

    Scale shape: one min/max reduce (2 doubles to the driver side of the
    plan via a broadcast cross join, not a collect), then one map-side-
    combinable count on (event_type, bin). The bin index is the same f64
    expression on both engines, so assignment is bitwise-deterministic."""
    ev = _t(spark, sf_dir, "events")
    rng = ev.select(F.min("value").alias("lo"), F.max("value").alias("hi"))
    return (
        ev.crossJoin(F.broadcast(rng))
        .select(
            "event_type",
            F.least(
                F.lit(HIST_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo")) * HIST_BINS
                ),
            ).cast("int").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("event_type", "bin")
    )


STREAM_HIST_SQL = f"""
WITH rng AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
SELECT event_type,
       least({HIST_BINS - 1},
             floor((value - lo) / (hi - lo) * {HIST_BINS}))::INTEGER AS bin,
       count(*)::BIGINT AS n
FROM events, rng
GROUP BY 1, 2 ORDER BY 1, 2"""


register("stream_moving_avg", stream_moving_avg, STREAM_MOVING_AVG_SQL)
register("stream_hist", stream_hist, STREAM_HIST_SQL)
register("stream_regress", stream_regress, STREAM_REGRESS_SQL)


# --- significantTerms (SignificantTermsStream: distinctive-terms mining) ----

SIGTERMS_FG_SOURCE = "src1"
SIGTERMS_MIN_BG_DF = 5
SIGTERMS_K = 15


def stream_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms over-represented in a foreground doc set vs the whole corpus
    (``SJ/io/stream/SignificantTermsStream``): score = lift of the term's
    foreground doc-rate over its (+1-smoothed) background doc-rate.

    One tokenize pass → distinct (doc, term) → two hash-aggregates and a
    broadcast-joined ratio; everything stays map-side-combinable, so at
    10^12 docs the cost is the token scan plus one term-keyed shuffle."""
    from .textmetrics import TOKEN_RE

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dt = docs.select(
        "doc_id", "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    ).distinct()
    counts = dt.groupBy("term").agg(
        F.count(F.lit(1)).alias("bg_df"),
        F.sum((F.col("source") == SIGTERMS_FG_SOURCE).cast("long")).alias("fg_df"),
    )
    totals = docs.agg(
        F.count(F.lit(1)).alias("n_bg"),
        F.sum((F.col("source") == SIGTERMS_FG_SOURCE).cast("long")).alias("n_fg"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter((F.col("bg_df") >= SIGTERMS_MIN_BG_DF) & (F.col("fg_df") > 0))
        .select(
            "term", "fg_df", "bg_df",
            ((F.col("fg_df").cast("double") / F.col("n_fg"))
             / ((F.col("bg_df").cast("double") + 1.0) / F.col("n_bg"))).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(SIGTERMS_K)
    )


def _sigterms_sql() -> str:
    from .textmetrics import TOKEN_RE_SQL

    return f"""
WITH dt AS (
    SELECT DISTINCT doc_id, source,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
    FROM documents
),
counts AS (
    SELECT term, count(*)::BIGINT AS bg_df,
           sum(CASE WHEN source = '{SIGTERMS_FG_SOURCE}' THEN 1 ELSE 0 END)::BIGINT AS fg_df
    FROM dt GROUP BY 1
),
totals AS (
    SELECT count(*)::BIGINT AS n_bg,
           sum(CASE WHEN source = '{SIGTERMS_FG_SOURCE}' THEN 1 ELSE 0 END)::BIGINT AS n_fg
    FROM documents
)
SELECT term, fg_df, bg_df,
       (fg_df::DOUBLE / n_fg) / ((bg_df::DOUBLE + 1.0) / n_bg) AS score
FROM counts, totals
WHERE bg_df >= {SIGTERMS_MIN_BG_DF} AND fg_df > 0
ORDER BY score DESC, term ASC LIMIT {SIGTERMS_K}"""


# --- reduce (ReducerStream: generic grouped reduce) --------------------------

def stream_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer imperative reduce over date-sorted orders
    (``SJ/io/stream/ReducerStream``): order count, exact total, and the
    maximum day-gap between consecutive orders — an applyInPandas grouped
    kernel demonstrating the ReducerStream escape hatch. (THIS reduce is
    also expressible natively — lag() window + aggregate, which is exactly
    what the oracle SQL does; the applyInPandas form is kept deliberately
    as the registered example of the generic per-group imperative path.)
    Shuffled once on the group key."""
    import numpy as np
    import pandas as pd

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", F.col("o_totalprice").cast("decimal(18,2)").alias("p")
    )

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o_orderdate")
        d = pd.to_datetime(pdf["o_orderdate"]).to_numpy()
        gaps = np.diff(d).astype("timedelta64[D]").astype(np.int64)
        return pd.DataFrame({
            "c_custkey": [int(pdf["o_custkey"].iloc[0])],
            "n_orders": [len(pdf)],
            "total_price": [float(pdf["p"].sum())],
            "max_gap_days": [int(gaps.max()) if len(gaps) else -1],
        })

    out = (
        orders.groupBy("o_custkey")
        .applyInPandas(reduce_group,
                       "c_custkey long, n_orders long, total_price double, max_gap_days long")
        .filter(F.col("n_orders") >= 2)
        .orderBy("c_custkey")
    )
    return out


STREAM_REDUCE_SQL = """
WITH g AS (
    SELECT o_custkey AS c_custkey,
           count(*)::BIGINT AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           max(gap)::BIGINT AS max_gap_days
    FROM (
        SELECT o_custkey, o_totalprice,
               date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate),
                         o_orderdate) AS gap
        FROM orders
    )
    GROUP BY 1
)
SELECT * FROM g WHERE n_orders >= 2 ORDER BY c_custkey"""


register("stream_significant_terms", stream_significant_terms, _sigterms_sql())
register("stream_reduce", stream_reduce, STREAM_REDUCE_SQL)


# --- jdbc source (SJ/io/stream/JDBCStream.java) ------------------------------

JDBC_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"  # ships in Spark's jars


def jdbc_read(spark: SparkSession, url: str, table: str) -> DataFrame:
    """``JDBCStream`` analog: stream a relational table through Spark's JDBC
    source (partitionable reads, predicate pushdown into the remote SQL).
    At scale pass ``partitionColumn/lowerBound/upperBound/numPartitions`` so
    executors read disjoint key ranges in parallel instead of one cursor."""
    return spark.read.jdbc(url, table, properties={"driver": JDBC_DRIVER})


def stream_jdbc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip fixture certifying the JDBC source end-to-end: the nation
    table is loaded ONCE into an embedded Derby database (content-addressed
    under /tmp; Derby's embedded JDBC driver is bundled with Spark), then
    read back via ``spark.read.jdbc`` and aggregated. The oracle runs the
    identical aggregation on the parquet table — equal results prove the
    JDBC path returns exactly the relational contents."""
    import hashlib
    import os
    import tempfile

    # derby.log goes to derby.system.home; pin it to /tmp so the engine
    # works regardless of the driver process's (possibly read-only) cwd
    try:
        spark._jvm.System.setProperty("derby.system.home", tempfile.gettempdir())
    except AttributeError:  # Spark Connect session: no JVM gateway — Derby
        pass                # then falls back to derby.log in cwd
    src = os.path.join(sf_dir, "nation.parquet")
    tag = hashlib.md5(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}|v1".encode()
    ).hexdigest()[:12]
    db = os.path.join(tempfile.gettempdir(), f"lss_derby_{tag}")
    url = f"jdbc:derby:{db};create=true"
    marker = db + "_loaded"
    if not os.path.exists(marker):
        spark.read.parquet(src).write.mode("overwrite").jdbc(
            url, "nation", properties={"driver": JDBC_DRIVER}
        )
        with open(marker, "w") as f:
            f.write("ok")
    n = jdbc_read(spark, url, "nation")
    return (
        n.groupBy(F.col("n_regionkey").cast("long").alias("n_regionkey"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_name"),
            F.max("n_name").alias("last_name"),
        )
        .orderBy("n_regionkey")
    )


STREAM_JDBC_SQL = """
SELECT n_regionkey::BIGINT AS n_regionkey, count(*)::BIGINT AS n_nations,
       min(n_name) AS first_name, max(n_name) AS last_name
FROM nation GROUP BY 1 ORDER BY 1"""


register("stream_jdbc_source", stream_jdbc_source, STREAM_JDBC_SQL)


# --- loaders (S/handler/loader/*: CSV/JSON ingest) ---------------------------
# The driver tables are parquet; these fixtures materialize a CSV and a
# JSON-lines copy ONCE (content-addressed under /tmp), read them back with
# spark.read.csv / spark.read.json (schema pinned — never inferSchema at
# scale), and aggregate. Oracles run on the parquet `nation` view, so equal
# results certify the loader path end-to-end (parse + types), not just "it
# didn't crash".


def _loader_fixture_dir(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "nation.parquet")
    tag = hashlib.md5(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}|v2".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"lss_loader_{tag}")


def _ensure_loader_fixtures(spark: SparkSession, sf_dir: str) -> str:
    import os

    base = _loader_fixture_dir(sf_dir)
    marker = os.path.join(base, "_done")
    if not os.path.exists(marker):
        n = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        n.coalesce(1).write.mode("overwrite").option("header", True).csv(
            os.path.join(base, "csv")
        )
        n.coalesce(1).write.mode("overwrite").json(os.path.join(base, "json"))
        # Solr XML update format (`S/handler/loader/XMLLoader`):
        # <add><doc><field name="...">value</field>...</doc></add>.
        # Fixture generation only (25-row dim): the READ side is the operator.
        from xml.sax.saxutils import escape

        xml_dir = os.path.join(base, "xml")
        os.makedirs(xml_dir, exist_ok=True)
        cols = n.columns
        with open(os.path.join(xml_dir, "add.xml"), "w") as f:
            f.write("<add>")
            for r in n.collect():
                f.write("<doc>")
                for c in cols:
                    f.write(f'<field name="{c}">{escape(str(r[c]))}</field>')
                f.write("</doc>")
            f.write("</add>")
        with open(marker, "w") as f:
            f.write("ok")
    return base


_NATION_DDL = "n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string"


def source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSVLoader analog (`S/handler/loader/CSVLoader`)."""
    import os

    base = _ensure_loader_fixtures(spark, sf_dir)
    df = spark.read.schema(_NATION_DDL).option("header", True).csv(
        os.path.join(base, "csv")
    )
    return (
        df.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.min("n_nationkey").alias("min_key"))
        .orderBy("n_regionkey")
    )


def source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON loader analog (`S/handler/loader/JsonLoader`), JSON-lines form."""
    import os

    base = _ensure_loader_fixtures(spark, sf_dir)
    df = spark.read.schema(_NATION_DDL).json(os.path.join(base, "json"))
    return (
        df.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.max("n_nationkey").alias("max_key"))
        .orderBy("n_regionkey")
    )


SOURCE_CSV_SQL = """
SELECT n_regionkey, count(*)::BIGINT AS n_nations, min(n_nationkey) AS min_key
FROM nation GROUP BY 1 ORDER BY 1"""

SOURCE_JSON_SQL = """
SELECT n_regionkey, count(*)::BIGINT AS n_nations, max(n_nationkey) AS max_key
FROM nation GROUP BY 1 ORDER BY 1"""


def source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr XML update-format loader (`S/handler/loader/XMLLoader`): reads
    ``<add><doc><field name="..">value</field>…</doc></add>`` documents with
    Spark 4's NATIVE XML source (rowTag=doc — distributed parse, no UDFs),
    then pivots the name/value field entries into typed columns via
    ``map_from_entries`` — one projection, no shuffle before the aggregate.
    The oracle runs on the parquet ``nation`` view, so equal results certify
    parse + field pivot + type casts end-to-end."""
    import os

    base = _ensure_loader_fixtures(spark, sf_dir)
    df = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("field ARRAY<STRUCT<`_VALUE` STRING, `_name` STRING>>")
        .load(os.path.join(base, "xml"))
    )
    m = F.map_from_entries(F.expr("transform(field, x -> struct(x._name, x._VALUE))"))
    docs = df.select(
        m.getItem("n_nationkey").cast("bigint").alias("n_nationkey"),
        m.getItem("n_regionkey").cast("bigint").alias("n_regionkey"),
        m.getItem("n_name").alias("n_name"),
    )
    return (
        docs.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name"))
        .orderBy("n_regionkey")
    )


SOURCE_XML_SQL = """
SELECT n_regionkey, count(*)::BIGINT AS n_nations, min(n_name) AS first_name
FROM nation GROUP BY 1 ORDER BY 1"""


# --- Solr SQL (Calcite) analog: spark.sql over registered views --------------

def sql_over_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr Parallel SQL (`SJ/io/sql` / Calcite over collections): the ANSI
    SQL surface. Catalyst replaces Calcite — views registered, one SQL string
    planned/optimized/distributed by Spark itself."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("v_orders")
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView("v_customer")
    return spark.sql("""
        SELECT c.c_mktsegment AS segment,
               count(*) AS n_orders,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY segment
    """)


SQL_OVER_TABLES_SQL = """
SELECT c.c_mktsegment AS segment, count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1"""


register("source_csv", source_csv, SOURCE_CSV_SQL)
register("source_json", source_json, SOURCE_JSON_SQL)
register("source_xml", source_xml, SOURCE_XML_SQL)
register("sql_over_tables", sql_over_tables, SQL_OVER_TABLES_SQL)


# --- /export handler: sorted full-result streaming export -------------------

def stream_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/export handler analog (``S/handler/export/ExportWriter``): the FULL
    sorted result set of a filtered query — selected fields only, total
    order, no row limit (Solr streams this via docValues iterators; here
    the whole sorted projection streams out of one Spark sort).

    Scale shape: filter + column pruning push to the parquet scan; the
    global sort is one range-partitioned shuffle (Spark's TeraSort shape) —
    at 100 TB the export parallelizes across executors writing
    range-disjoint sorted chunks, exactly how ExportWriter shards by
    replica."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 49.0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy(
            F.desc("l_quantity"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
    )


STREAM_EXPORT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem WHERE l_quantity >= 49.0
ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC"""


register("stream_export", stream_export, STREAM_EXPORT_SQL)

# --- index-sort early termination: two-pass cutoff-pushdown top-k ----------

EARLY_TOPK_K = 25


def stream_export_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-sort early termination, re-expressed for a columnar scan —
    the Lucene analog is ``IndexWriterConfig#setIndexSort`` +
    ``TopFieldCollector`` early exit (a segment sorted by the sort field
    stops after k docs). A distributed scan can't "stop early", but it can
    do the equivalent work reduction in two passes:

    1. pass 1 reads ONLY the sort column (column pruning ⇒ one thin column
       scan) and TakeOrders the k-th value — a scalar;
    2. pass 2 re-scans with ``sort_col >= kth`` PUSHED to the parquet scan
       (``PushedFilters: GreaterThanOrEqual``) — on an index-sorted layout
       (row groups clustered by the sort key, min/max footers) every
       non-competitive row group is skipped without decoding, which is
       exactly what early termination saves — then fetches the remaining
       fields for survivors only (fetch-late).

    Ties at the k-th value all survive the filter; the final TakeOrdered
    re-applies the total order. Audited by ``tools/plan_audit.py``
    (pushdown present in pass 2's plan)."""
    li = _t(spark, sf_dir, "lineitem")
    kth_rows = (
        li.select("l_extendedprice")
        .orderBy(F.desc("l_extendedprice"))
        .limit(EARLY_TOPK_K)
        .collect()
    )
    kth = kth_rows[-1].l_extendedprice
    return (
        li.filter(F.col("l_extendedprice") >= F.lit(kth))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(EARLY_TOPK_K)
    )


STREAM_EXPORT_PRUNED_SQL = f"""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT {EARLY_TOPK_K}"""


register("stream_export_pruned", stream_export_pruned, STREAM_EXPORT_PRUNED_SQL)



# --- spatial: geofilt + geodist sort (LatLonPoint / SpatialFilterQParser) ---

# fixed query point + radius (km) for the geo entries
GEO_LAT, GEO_LON, GEO_RADIUS_KM = 37.7749, -122.4194, 6000.0


def spatial_geofilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo distance filter + sort (``{!geofilt pt=.. d=..}`` —
    ``S/search/SpatialFilterQParser``, ``L/document/LatLonPoint#
    newDistanceQuery``; sort = Solr's ``geodist()`` Haversine km): events
    within ``GEO_RADIUS_KM`` of the query point, nearest first.

    Coordinates are DERIVED deterministically from the stored event_id
    (two coprime multipliers bucket it onto the lat/lon grids) — the
    engine and the oracle
    compute the identical mapping, standing in for real lat/lon docvalues.
    Distances are double Haversine with one float32 cast (absorbing
    JVM-vs-libm ulp drift), ties broken by event_id.

    Scale shape: the distance is a JVM column expression (whole-stage
    codegen) over one pruned scan; at scale the bounding-box prefilter
    (lat/lon BETWEEN) pushes to the parquet scan BEFORE the trig — the
    BKD-tree two-phase shape (box approximation, exact verify)."""
    ev = _t(spark, sf_dir, "events")
    lat = (F.col("event_id") * 57 % 18000) / 100.0 - 90.0
    lon = (F.col("event_id") * 101 % 36000) / 100.0 - 180.0
    qlat, qlon = F.lit(GEO_LAT), F.lit(GEO_LON)
    dphi = F.radians(lat - qlat)
    dlam = F.radians(lon - qlon)
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(F.radians(qlat)) * F.cos(F.radians(lat))
        * F.pow(F.sin(dlam / 2), 2)
    )
    dist = (F.lit(2.0 * 6371.0087714) * F.asin(F.sqrt(a))).cast("float")
    return (
        ev.withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= F.lit(float(GEO_RADIUS_KM)))
        .orderBy(F.asc("dist_km"), F.asc("event_id"))
        .limit(20)
        .select("event_id", "user_id", "dist_km")
    )


SPATIAL_GEOFILT_SQL = f"""
SELECT event_id, user_id, dist_km FROM (
    SELECT event_id, user_id,
           CAST(2.0 * 6371.0087714 * asin(sqrt(
               pow(sin(radians(((event_id * 57 % 18000) / 100.0 - 90.0) - {GEO_LAT}) / 2), 2)
               + cos(radians({GEO_LAT}))
                 * cos(radians((event_id * 57 % 18000) / 100.0 - 90.0))
                 * pow(sin(radians(((event_id * 101 % 36000) / 100.0 - 180.0) - {GEO_LON}) / 2), 2)
           )) AS FLOAT) AS dist_km
    FROM events
) WHERE dist_km <= {GEO_RADIUS_KM}
ORDER BY dist_km ASC, event_id ASC LIMIT 20"""


register("spatial_geofilt", spatial_geofilt, SPATIAL_GEOFILT_SQL)


# fixed box for the bbox entry — a plain [lo, hi] box (LatLonPoint#
# newBoxQuery's simple case; the antimeridian-crossing box upstream
# rewrites into an OR of two such boxes, which composes here the same way)
BBOX_LAT_LO, BBOX_LAT_HI = -30.0, 45.0
BBOX_LON_LO, BBOX_LON_HI = -60.0, 90.0


def spatial_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box query (``L/document/LatLonPoint#newBoxQuery``; Solr
    ``&fq={!bbox}`` / RptWithGeometry rectangle): events whose derived
    lat/lon fall inside [lat_lo, lat_hi] × [lon_lo, lon_hi], in event order.

    Same deterministic event_id → lat/lon mapping as ``spatial_geofilt``.

    Scale shape: the box is TWO range predicates on JVM columns — exactly
    what the BKD tree evaluates, and what parquet min/max pruning + zone
    maps would skip-scan at 100 TB (with real materialized lat/lon columns
    the predicates push down to the scan; here they run post-derive in
    whole-stage codegen). No trig, no distance — the box is the cheap
    first phase of every geo query."""
    ev = _t(spark, sf_dir, "events")
    lat = (F.col("event_id") * 57 % 18000) / 100.0 - 90.0
    lon = (F.col("event_id") * 101 % 36000) / 100.0 - 180.0
    return (
        ev.withColumn("lat", lat.cast("double"))
        .withColumn("lon", lon.cast("double"))
        .filter(
            (F.col("lat") >= F.lit(BBOX_LAT_LO)) & (F.col("lat") <= F.lit(BBOX_LAT_HI))
            & (F.col("lon") >= F.lit(BBOX_LON_LO)) & (F.col("lon") <= F.lit(BBOX_LON_HI))
        )
        .orderBy(F.asc("event_id"))
        .limit(25)
        .select("event_id", "user_id", "lat", "lon")
    )


SPATIAL_BBOX_SQL = f"""
SELECT event_id, user_id, lat, lon FROM (
    SELECT event_id, user_id,
           CAST((event_id * 57 % 18000) / 100.0 - 90.0 AS DOUBLE) AS lat,
           CAST((event_id * 101 % 36000) / 100.0 - 180.0 AS DOUBLE) AS lon
    FROM events
) WHERE lat BETWEEN {BBOX_LAT_LO} AND {BBOX_LAT_HI}
  AND lon BETWEEN {BBOX_LON_LO} AND {BBOX_LON_HI}
ORDER BY event_id ASC LIMIT 25"""


register("spatial_bbox", spatial_bbox, SPATIAL_BBOX_SQL)


# --- update stream: push tuples into a destination collection ---------------

def stream_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UpdateStream (``SJ/io/stream/UpdateStream`` — the ``update(dest,
    ...)`` decorator): tuples from an inner stream are indexed INTO a
    destination collection, then the destination is read back — certifying
    the full write path, not just the transformation.

    The destination is a content-addressed parquet dataset (the engine's
    collection store shape); the read-back result must equal the inner
    stream exactly.

    Scale shape: the write is a distributed parquet sink (one file per
    partition, no driver collect); Solr's per-batch indexing round-trips
    through DocumentsWriter, ours through a columnar commit — both make the
    batch visible atomically (here: directory rename by Spark's committer)."""
    import hashlib
    import os
    import tempfile

    ev = _t(spark, sf_dir, "events")
    inner = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("sum_value"),
        )
    )
    tag = hashlib.md5(f"stream_update|{sf_dir}".encode()).hexdigest()[:16]
    dest = os.path.join(tempfile.gettempdir(), f"lss_update_stream_{tag}")
    inner.write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest).orderBy("user_id")


STREAM_UPDATE_SQL = """
SELECT user_id, count(*)::BIGINT AS n_clicks,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events WHERE event_type = 'click'
GROUP BY user_id ORDER BY user_id"""


register("stream_update", stream_update, STREAM_UPDATE_SQL)


def stream_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RandomStream (``S/client/solrj/io/stream/RandomStream`` — the
    `random()` streaming expression): a pseudo-random sample of matching
    docs. Solr's is nondeterministic per request; a data engine that must
    be resumable and oracle-checkable derives the "random" order from a
    SEEDED hash of the doc key instead (md5(seed || doc_id)) — same
    statistical behavior, stable across runs/engines/partitionings (the
    sample_split discipline). Returns the 20 sampled rows for seed=42.

    Scale shape: one narrow projection + TakeOrdered over the hash — no
    rand(), no global sort of the full table."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "source", h.alias("h"))
        .orderBy("h")
        .limit(20)
        .select("doc_id", "source", "h")
    )


STREAM_RANDOM_SQL = """
SELECT doc_id, source, md5('seed42:' || doc_id::VARCHAR) AS h
FROM documents ORDER BY h LIMIT 20"""


register("stream_random", stream_random, STREAM_RANDOM_SQL)


def stream_facet2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet2D streaming expression (``SJ/io/stream/Facet2DStream`` —
    `facet2D(collection, x=..., y=..., dimensions="a,b", count(*))`): a
    two-dimension facet keeping the top-2 y buckets per x bucket, with
    count and an exact-decimal sum metric.

    Scale shape: ONE (x, y) hash-aggregate (partial+final, map-side
    combined), then a window rank over the tiny bucket table partitioned
    by x — the full-table pass is the single aggregate; the window never
    sees raw rows. Sum is DECIMAL so combine order can't change it."""
    ev = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    buckets = (
        ev.groupBy(
            F.col("event_type").alias("x"),
            F.dayofweek("ts").cast("int").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(dec).cast("double").alias("sum_value"))
    )
    w = Window.partitionBy("x").orderBy(F.desc("n"), F.asc("y"))
    return (
        buckets.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 2)
        .select("x", "y", "n", "sum_value")
        .orderBy("x", F.desc("n"), "y")
    )


STREAM_FACET2D_SQL = """
WITH buckets AS (
    SELECT event_type AS x, dayofweek(ts)::INTEGER + 1 AS y,
           count(*)::BIGINT AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT x, y, n, sum_value,
           row_number() OVER (PARTITION BY x ORDER BY n DESC, y ASC) AS r
    FROM buckets
)
SELECT x, y, n, sum_value FROM ranked WHERE r <= 2
ORDER BY x, n DESC, y"""


register("stream_facet2d", stream_facet2d, STREAM_FACET2D_SQL)


def stream_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``corr`` evaluator (``SJ/io/eval/CorrelationEvaluator``, Pearson):
    correlation of event value against hour-of-day, per event_type.

    Float discipline (the stream_regress pattern): the five sufficient
    statistics are EXACT — x is an integer hour, y a DECIMAL(18,2) — so
    both engines reduce to identical doubles before the closed-form
    r = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²)), bit-deterministic
    regardless of row order. One map-side-combined aggregate."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.select(
            "event_type",
            F.hour("ts").cast("long").alias("x"),
            F.col("value").cast("decimal(18,2)").alias("y"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
            F.sum(F.col("y") * F.col("x")).cast("double").alias("sxy"),
            F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        )
    )
    cov = s.n * s.sxy - s.sx * s.sy
    vx = s.n * s.sxx - s.sx * s.sx
    vy = s.n * s.syy - s.sy * s.sy
    return s.select(
        "event_type",
        s.n.cast("long").alias("n_obs"),
        (cov / F.sqrt(vx * vy)).alias("corr"),
    ).orderBy("event_type")


STREAM_CORR_SQL = """
WITH s AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx,
           CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(x * x) AS DOUBLE) AS sxx,
           CAST(sum(y * x) AS DOUBLE) AS sxy,
           CAST(sum(y * y) AS DOUBLE) AS syy
    FROM (
        SELECT event_type, hour(ts)::BIGINT AS x,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
    ) GROUP BY 1
)
SELECT event_type, n::BIGINT AS n_obs,
       (n * sxy - sx * sy)
           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr
FROM s ORDER BY event_type"""


def stream_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``describe`` evaluator (``SJ/io/eval/DescribeEvaluator`` backed by
    commons-math DescriptiveStatistics): N, min, max, sum, mean, sample
    stddev of event value, per event_type.

    min/max/sum/count aggregate on DECIMAL(18,2) — exact, order-free;
    mean and the (n−1)-denominator sample variance derive from the exact
    sums in closed form, so every double is bit-deterministic under any
    partitioning. One map-side-combined aggregate pass."""
    ev = _t(spark, sf_dir, "events")
    y = F.col("value").cast("decimal(18,2)")
    s = (
        ev.select("event_type", y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("y").alias("mn"),
            F.max("y").alias("mx"),
            F.sum("y").alias("sm"),
            F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        )
    )
    nd = s.n.cast("double")
    sd = s.sm.cast("double")
    var = (s.syy - sd * sd / nd) / (nd - F.lit(1.0))
    return s.select(
        "event_type",
        s.n.cast("long").alias("n_obs"),
        s.mn.cast("double").alias("min_v"),
        s.mx.cast("double").alias("max_v"),
        sd.alias("sum_v"),
        (sd / nd).alias("mean_v"),
        F.sqrt(var).alias("stddev_v"),
    ).orderBy("event_type")


STREAM_DESCRIBE_SQL = """
WITH s AS (
    SELECT event_type, count(*)::BIGINT AS n,
           min(y) AS mn, max(y) AS mx, sum(y) AS sm,
           CAST(sum(y * y) AS DOUBLE) AS syy
    FROM (SELECT event_type, CAST(value AS DECIMAL(18,2)) AS y FROM events)
    GROUP BY 1
)
SELECT event_type, n AS n_obs,
       CAST(mn AS DOUBLE) AS min_v, CAST(mx AS DOUBLE) AS max_v,
       CAST(sm AS DOUBLE) AS sum_v,
       CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v,
       sqrt((syy - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(n AS DOUBLE) - 1.0)) AS stddev_v
FROM s ORDER BY event_type"""


register("stream_corr", stream_corr, STREAM_CORR_SQL)
register("stream_describe", stream_describe, STREAM_DESCRIBE_SQL)


# --- RangeField queries (L/document/DoubleRange: intersects / contains /
# within — overlapping-interval search, the calendar/price-band shape) ------

RANGE_Q_LO, RANGE_Q_HI = 40.0, 55.0   # the query interval
RANGE_WIDTH = 10.0                    # doc interval = [value, value + 10)


def range_field_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RangeField queries (``L/document/DoubleRange`` —
    ``newIntersectsQuery`` / ``newContainsQuery`` / ``newWithinQuery``):
    each event carries the derived interval [value, value + RANGE_WIDTH);
    the entry returns every doc whose interval INTERSECTS the query
    interval, labelled with the strongest relation that holds — WITHIN
    (doc interval inside the query), CONTAINS (doc interval covers the
    query), else INTERSECTS — certifying all three query semantics off one
    scan.

    Scale shape: two range predicates on JVM columns (the BKD encoding of
    RangeField evaluates exactly these bounds); with materialized lo/hi
    columns both push to parquet min/max pruning. No trig, no UDF."""
    ev = _t(spark, sf_dir, "events")
    lo = F.col("value").cast("double")
    hi = (F.col("value") + F.lit(RANGE_WIDTH)).cast("double")
    qlo, qhi = F.lit(RANGE_Q_LO), F.lit(RANGE_Q_HI)
    rel = (
        F.when((lo >= qlo) & (hi <= qhi), "WITHIN")
        .when((lo <= qlo) & (hi >= qhi), "CONTAINS")
        .otherwise("INTERSECTS")
    )
    return (
        ev.withColumn("lo", lo).withColumn("hi", hi)
        .filter((F.col("lo") <= qhi) & (F.col("hi") >= qlo))
        .withColumn("relation", rel)
        .orderBy(F.asc("event_id"))
        .limit(25)
        .select("event_id", "lo", "hi", "relation")
    )


RANGE_FIELD_SQL = f"""
SELECT event_id, lo, hi,
       CASE WHEN lo >= {RANGE_Q_LO} AND hi <= {RANGE_Q_HI} THEN 'WITHIN'
            WHEN lo <= {RANGE_Q_LO} AND hi >= {RANGE_Q_HI} THEN 'CONTAINS'
            ELSE 'INTERSECTS' END AS relation
FROM (
    SELECT event_id, value::DOUBLE AS lo, (value + {RANGE_WIDTH})::DOUBLE AS hi
    FROM events
) WHERE lo <= {RANGE_Q_HI} AND hi >= {RANGE_Q_LO}
ORDER BY event_id ASC LIMIT 25"""


register("range_field_query", range_field_query, RANGE_FIELD_SQL)


# --- JSON field extraction (ingest-side semi-structured parse: Solr's
# ParseLongFieldUpdateProcessor + JsonRecordReader path-mapping shape;
# Spark-first this is a JVM from_json/get_json_object — no UDF) -------------

def stream_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the semi-structured ``props`` JSON column into a typed field
    at query time and aggregate on it (``S/update/processor/
    ParseLongFieldUpdateProcessorFactory`` + ``S/handler/loader/
    JsonRecordReader`` split-path mapping — the ingest step that turns a
    JSON payload into typed index fields): k = $.k as BIGINT, rolled up
    per event_type with exact integer stats.

    Scale shape: ``get_json_object`` is a JVM expression inside
    whole-stage codegen (no Python, no schema inference pass); the rollup
    is one map-side-combined hash-agg. At 100 TB the parse would move to
    ingest (materialized typed column + parquet stats); the query-time
    form here proves the identical expression semantics."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


STREAM_JSON_EXTRACT_SQL = """
SELECT event_type, count(*)::BIGINT AS n,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS max_k
FROM events GROUP BY 1 ORDER BY 1"""


register("stream_json_extract", stream_json_extract, STREAM_JSON_EXTRACT_SQL)


# --- sessionization: gap-based session windows over the event stream --------

SESSION_GAP_MIN = 240  # inactivity gap (minutes) that closes a session


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: group each user's events into sessions
    that close after ``SESSION_GAP_MIN`` minutes of inactivity, then rank
    the busiest sessions. The canonical transcript/clickstream rollup —
    Solr's nearest analog is a ``reduce(sort(...), by=...)`` stream with a
    session-breaking reducer (``SJ/io/stream/ReducerStream``); Spark has a
    NATIVE operator for it, so the engine uses ``F.session_window`` (the
    same operator Structured Streaming runs stateful — this exact groupBy
    works unchanged over ``readStream`` with a watermark, which is the
    100 TB/continuous path).

    Session identity: Spark merges an event into the open session when its
    window TOUCHES the session's — i.e. membership is the closed interval
    [first_ts, last_ts + gap], an event at exactly last_ts + gap still
    merges (pinned by ``tests/test_sessionize_spans.py``); the oracle
    reproduces that with the classic islands construction (new session iff
    ts > lag(ts) + gap, strictly). The session start is the raw min timestamp (the
    same NTZ-vs-naive equivalence every date_trunc entry already relies
    on); the duration is an exact BIGINT microsecond difference (epoch
    diffs cancel the session-tz offset — this box pins Etc/UTC).

    Scale shape: ONE hash-partition shuffle on user_id (session_window
    aggregation is a partial+final agg keyed by (user_id, merged window));
    no global window function anywhere — the oracle's lag/cumsum islands
    would need a per-user sort, which session_window's merge avoids. The
    top-20 is a TakeOrdered, not a global sort."""
    ev = _t(spark, sf_dir, "events")
    sess = (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
            F.count_distinct("event_type").cast("long").alias("n_types"),
        )
    )
    us = lambda c: F.unix_micros(F.to_timestamp(F.col(c)))  # noqa: E731
    return (
        sess.select(
            "user_id",
            F.col("t0").alias("session_start"),
            (us("t1") - us("t0")).cast("long").alias("duration_us"),
            "n_events",
            "n_types",
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"), F.asc("session_start"))
        .limit(20)
    )


STREAM_SESSIONIZE_SQL = f"""
WITH o AS (
    SELECT user_id, ts, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
    SELECT user_id, ts, event_type,
           sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
           ) AS sess
    FROM o
)
SELECT user_id,
       min(ts) AS session_start,
       (epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT AS duration_us,
       count(*)::BIGINT AS n_events,
       count(DISTINCT event_type)::BIGINT AS n_types
FROM s GROUP BY user_id, sess
ORDER BY n_events DESC, user_id ASC, session_start ASC
LIMIT 20"""


register("stream_sessionize", stream_sessionize, STREAM_SESSIONIZE_SQL)


# convex query polygon for the polygon entry (CCW order, closed implicitly)
GEO_POLY = ((-60.0, -170.0), (-60.0, 20.0), (40.0, 60.0), (70.0, -120.0))


def spatial_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon containment filter (``L/document/LatLonPoint#newPolygonQuery``
    / ``LatLonGeometry`` component2D containment; Solr ``{!field f=geo}
    Intersects(POLYGON(...))`` via spatial-extras RPT): events whose
    derived point lies inside a CONVEX query polygon, by the half-plane
    rule — for a CCW polygon the point is inside iff every edge's cross
    product (edge × point) is >= 0 (boundary inclusive, matching
    Polygon2D's contains). Same deterministic event_id → lat/lon mapping
    as ``spatial_geofilt``.

    Scale shape: the containment test is one JVM expression per edge
    (whole-stage codegen, no UDF) over a single pruned scan; at scale the
    polygon's bounding box pushes to the parquet scan BEFORE the edge
    tests — exactly the BKD two-phase shape (box approximation, exact
    verify) upstream's polygon query compiles to. Convexity keeps the
    test branch-free; upstream's general polygons decompose into a
    triangle/edge tree whose leaves are this same half-plane primitive."""
    ev = _t(spark, sf_dir, "events")
    lat = (F.col("event_id") * 57 % 18000) / 100.0 - 90.0
    lon = (F.col("event_id") * 101 % 36000) / 100.0 - 180.0
    inside = F.lit(True)
    n = len(GEO_POLY)
    min_lat = min(p[0] for p in GEO_POLY)
    max_lat = max(p[0] for p in GEO_POLY)
    min_lon = min(p[1] for p in GEO_POLY)
    max_lon = max(p[1] for p in GEO_POLY)
    # bounding-box prefilter: pushes/short-circuits before the edge tests
    inside = (
        (lat >= min_lat) & (lat <= max_lat) & (lon >= min_lon) & (lon <= max_lon)
    )
    for i in range(n):
        (alat, alon), (blat, blon) = GEO_POLY[i], GEO_POLY[(i + 1) % n]
        cross = (F.lit(blon - alon) * (lat - F.lit(alat))
                 - F.lit(blat - alat) * (lon - F.lit(alon)))
        inside = inside & (cross >= 0)
    return (
        ev.filter(inside)
        .orderBy(F.asc("event_id"))
        .limit(25)
        .select("event_id", "user_id", "event_type")
    )


def _poly_edges_sql() -> str:
    n = len(GEO_POLY)
    conds = []
    lat = "((event_id * 57 % 18000) / 100.0 - 90.0)"
    lon = "((event_id * 101 % 36000) / 100.0 - 180.0)"
    for i in range(n):
        (alat, alon), (blat, blon) = GEO_POLY[i], GEO_POLY[(i + 1) % n]
        conds.append(
            f"(({blon - alon!r}) * ({lat} - ({alat!r}))"
            f" - ({blat - alat!r}) * ({lon} - ({alon!r}))) >= 0"
        )
    box = (
        f"{lat} >= {min(p[0] for p in GEO_POLY)!r} AND {lat} <= {max(p[0] for p in GEO_POLY)!r}"
        f" AND {lon} >= {min(p[1] for p in GEO_POLY)!r} AND {lon} <= {max(p[1] for p in GEO_POLY)!r}"
    )
    return box + " AND " + " AND ".join(conds)


SPATIAL_POLYGON_SQL = f"""
SELECT event_id, user_id, event_type FROM events
WHERE {_poly_edges_sql()}
ORDER BY event_id ASC LIMIT 25"""


register("spatial_polygon", spatial_polygon, SPATIAL_POLYGON_SQL)


def stream_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ttest`` evaluator (``SJ/io/eval/TTestEvaluator``, commons-math
    TTest#tTest two-sample Welch form): per event_type, compare value
    between the AM (hour < 12) and PM samples — t statistic and the
    Welch–Satterthwaite degrees of freedom.

    Float discipline (the stream_corr pattern): per-sample sufficient
    statistics (n, Σy, Σy²) are EXACT (y is DECIMAL(18,2)), reduced to
    doubles once, then both engines evaluate the IDENTICAL closed-form
    expression tree — bit-deterministic regardless of row order. One
    map-side-combined aggregate, conditional sums, no second scan."""
    ev = _t(spark, sf_dir, "events")
    am = (F.hour("ts") < 12).cast("long")
    y = F.col("value").cast("decimal(18,2)")
    s = (
        ev.select("event_type", am.alias("g"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.sum("g").cast("double").alias("n1"),
            F.sum(F.when(F.col("g") == 1, F.col("y"))).cast("double").alias("s1"),
            F.sum(F.when(F.col("g") == 1, F.col("y") * F.col("y"))).cast("double").alias("q1"),
            F.sum(1 - F.col("g")).cast("double").alias("n2"),
            F.sum(F.when(F.col("g") == 0, F.col("y"))).cast("double").alias("s2"),
            F.sum(F.when(F.col("g") == 0, F.col("y") * F.col("y"))).cast("double").alias("q2"),
        )
    )
    m1, m2 = s.s1 / s.n1, s.s2 / s.n2
    v1 = (s.q1 - s.s1 * s.s1 / s.n1) / (s.n1 - 1)
    v2 = (s.q2 - s.s2 * s.s2 / s.n2) / (s.n2 - 1)
    se1, se2 = v1 / s.n1, v2 / s.n2
    t = (m1 - m2) / F.sqrt(se1 + se2)
    df = (
        (se1 + se2) * (se1 + se2)
        / (se1 * se1 / (s.n1 - 1) + se2 * se2 / (s.n2 - 1))
    )
    return s.select(
        "event_type",
        s.n1.cast("long").alias("n_am"),
        s.n2.cast("long").alias("n_pm"),
        t.alias("t_stat"),
        df.alias("welch_df"),
    ).orderBy("event_type")


STREAM_TTEST_SQL = """
WITH s AS (
    SELECT event_type,
           CAST(sum(g) AS DOUBLE) AS n1,
           CAST(sum(CASE WHEN g = 1 THEN y END) AS DOUBLE) AS s1,
           CAST(sum(CASE WHEN g = 1 THEN y * y END) AS DOUBLE) AS q1,
           CAST(sum(1 - g) AS DOUBLE) AS n2,
           CAST(sum(CASE WHEN g = 0 THEN y END) AS DOUBLE) AS s2,
           CAST(sum(CASE WHEN g = 0 THEN y * y END) AS DOUBLE) AS q2
    FROM (
        SELECT event_type,
               CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END::BIGINT AS g,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
    ) GROUP BY 1
)
SELECT event_type, n1::BIGINT AS n_am, n2::BIGINT AS n_pm,
       ((s1 / n1) - (s2 / n2))
           / sqrt(((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
                  + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2) AS t_stat,
       (((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2)
           * (((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 + ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2)
           / ((((q1 - s1 * s1 / n1) / (n1 - 1)) / n1) * (((q1 - s1 * s1 / n1) / (n1 - 1)) / n1) / (n1 - 1)
              + (((q2 - s2 * s2 / n2) / (n2 - 1)) / n2) * (((q2 - s2 * s2 / n2) / (n2 - 1)) / n2) / (n2 - 1)) AS welch_df
FROM s ORDER BY event_type"""


register("stream_ttest", stream_ttest, STREAM_TTEST_SQL)


def stream_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``anova`` evaluator (``SJ/io/eval/AnovaEvaluator``, commons-math
    OneWayAnova): one-way F over event value grouped by event_type —
    F = (SSB/(k−1)) / (SSW/(N−k)) with between/within sums of squares.

    Float discipline: per-group (n, Σy, Σy²) are EXACT (DECIMAL y), the
    tiny per-group table reduces on the driver-free second-level agg in a
    DETERMINISTIC group-ordered fold (sort_array over collect_list — the
    same discipline as text_unigram_ppl's term-ordered sum), then one
    closed-form expression both engines share. Two-level hash-agg, no
    second scan of events."""
    ev = _t(spark, sf_dir, "events")
    y = F.col("value").cast("decimal(18,2)")
    g = (
        ev.select("event_type", y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("y").cast("double").alias("s"),
            F.sum(F.col("y") * F.col("y")).cast("double").alias("q"),
        )
    )
    folded = g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "n"))),
            F.lit(0.0), lambda a, x: a + x["n"],
        ).alias("bign"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "s"))),
            F.lit(0.0), lambda a, x: a + x["s"],
        ).alias("bigs"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "q"))),
            F.lit(0.0), lambda a, x: a + x["q"],
        ).alias("bigq"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "n", "s"))),
            F.lit(0.0), lambda a, x: a + (x["s"] * x["s"]) / x["n"],
        ).alias("ssg"),
    )
    ssb = folded.ssg - folded.bigs * folded.bigs / folded.bign
    ssw = folded.bigq - folded.ssg
    fstat = (ssb / (folded.k - 1)) / (ssw / (folded.bign - folded.k))
    return folded.select(
        folded.k.cast("long").alias("k_groups"),
        folded.bign.cast("long").alias("n_obs"),
        fstat.alias("f_stat"),
    )


STREAM_ANOVA_SQL = """
WITH g AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(y) AS DOUBLE) AS s,
           CAST(sum(y * y) AS DOUBLE) AS q
    FROM (SELECT event_type, CAST(value AS DECIMAL(18,2)) AS y FROM events)
    GROUP BY 1
),
f AS (
    SELECT CAST(count(*) AS DOUBLE) AS k,
           list_reduce(list(n ORDER BY event_type), (a, b) -> a + b) AS bign,
           list_reduce(list(s ORDER BY event_type), (a, b) -> a + b) AS bigs,
           list_reduce(list(q ORDER BY event_type), (a, b) -> a + b) AS bigq,
           list_reduce(list(s * s / n ORDER BY event_type), (a, b) -> a + b) AS ssg
    FROM g
)
SELECT k::BIGINT AS k_groups, bign::BIGINT AS n_obs,
       ((ssg - bigs * bigs / bign) / (k - 1))
           / ((bigq - ssg) / (bign - k)) AS f_stat
FROM f"""


register("stream_anova", stream_anova, STREAM_ANOVA_SQL)


def stream_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mannWhitney`` evaluator (``SJ/io/eval/MannWhitneyUEvaluator``,
    commons-math MannWhitneyUTest): rank-sum U comparing event value
    between the AM (hour < 12) and PM samples, tie-corrected with average
    ranks. U1 = R1 − n1(n1+1)/2 where R1 sums the AM values' mid-ranks.

    Scale shape: ranks come from VALUE-LEVEL aggregation, not row ranking —
    one (value) hash-agg to per-value (AM, PM) counts, then a window over
    DISTINCT values only (bounded by the value domain, here DECIMAL(18,2)
    prices — never the row count): mid-rank = cum_before + (c+1)/2. Exact
    integer counts and exact DECIMAL keys make every mid-rank and the U
    statistic bit-deterministic on both engines."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    am = (F.hour("ts") < 12).cast("long")
    vals = (
        ev.select(F.col("value").cast("decimal(18,2)").alias("v"), am.alias("g"))
        .groupBy("v")
        .agg(F.sum("g").alias("c1"), F.sum(1 - F.col("g")).alias("c2"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "cum", F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(w), F.lit(0))
    ).withColumn(
        "midrank",
        F.col("cum").cast("double")
        + (F.col("c1") + F.col("c2") + 1).cast("double") / 2.0,
    )
    out = ranked.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
        F.sum(F.col("c1").cast("double") * F.col("midrank")).alias("r1"),
    )
    u1 = out.r1 - out.n1 * (out.n1 + 1) / 2
    return out.select(
        out.n1.cast("long").alias("n_am"),
        out.n2.cast("long").alias("n_pm"),
        u1.alias("u_stat"),
    )


STREAM_MANN_WHITNEY_SQL = """
WITH vals AS (
    SELECT CAST(value AS DECIMAL(18,2)) AS v,
           sum(CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END)::BIGINT AS c1,
           sum(CASE WHEN hour(ts) < 12 THEN 0 ELSE 1 END)::BIGINT AS c2
    FROM events GROUP BY 1
),
ranked AS (
    SELECT c1, c2,
           CAST(coalesce(sum(c1 + c2) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS DOUBLE)
           + CAST(c1 + c2 + 1 AS DOUBLE) / 2.0 AS midrank
    FROM vals
)
SELECT CAST(sum(CAST(c1 AS DOUBLE)) AS BIGINT) AS n_am,
       CAST(sum(CAST(c2 AS DOUBLE)) AS BIGINT) AS n_pm,
       sum(CAST(c1 AS DOUBLE) * midrank)
           - sum(CAST(c1 AS DOUBLE)) * (sum(CAST(c1 AS DOUBLE)) + 1) / 2 AS u_stat
FROM ranked"""


register("stream_mann_whitney", stream_mann_whitney, STREAM_MANN_WHITNEY_SQL)


def stream_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cov`` evaluator (``SJ/io/eval/CovarianceEvaluator``, commons-math
    Covariance — sample covariance): cov of event value against
    hour-of-day per event_type, from the same exact sufficient statistics
    as ``stream_corr`` (one map-side-combined aggregate):
    cov = (Σxy − Σx·Σy/n) / (n − 1)."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.select(
            "event_type",
            F.hour("ts").cast("long").alias("x"),
            F.col("value").cast("decimal(18,2)").alias("y"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("y") * F.col("x")).cast("double").alias("sxy"),
        )
    )
    return s.select(
        "event_type",
        s.n.cast("long").alias("n_obs"),
        ((s.sxy - s.sx * s.sy / s.n) / (s.n - 1)).alias("cov"),
    ).orderBy("event_type")


STREAM_COV_SQL = """
WITH s AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x) AS DOUBLE) AS sx,
           CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(y * x) AS DOUBLE) AS sxy
    FROM (
        SELECT event_type, hour(ts)::BIGINT AS x,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
    ) GROUP BY 1
)
SELECT event_type, n::BIGINT AS n_obs,
       (sxy - sx * sy / n) / (n - 1) AS cov
FROM s ORDER BY event_type"""


register("stream_cov", stream_cov, STREAM_COV_SQL)


def _dataset_counts(spark: SparkSession, sf_dir: str):
    """Shared front for the dataset-comparison evaluators: per-term exact
    counts in two sub-corpora (source src1 vs src2), full-join aligned
    (absent term → 0). One tokenize pass, ONE (term, side) hash-agg."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src1", "src2")
    )
    toks = docs.select(
        (F.col("source") == "src1").cast("long").alias("a"),
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[0-9a-z_]+', 0)")
        ).alias("term"),
    )
    return (
        toks.groupBy("term")
        .agg(
            F.sum("a").cast("double").alias("o1"),
            F.sum(1 - F.col("a")).cast("double").alias("o2"),
        )
    )


def stream_chisq_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``chiSquareDataSet`` evaluator (``SJ/io/eval/
    ChiSquareDataSetEvaluator``, commons-math ChiSquareTest
    #chiSquareDataSetsComparison): χ² between two term-count vectors —
    here the src1 vs src2 sub-corpora term distributions, the
    corpus-drift monitor a training pipeline runs between snapshots.
    χ² = Σ_t (√(N2/N1)·o1 − √(N1/N2)·o2)² / (o1 + o2) over terms present
    in either dataset (commons-math's unequal-length form).

    Float discipline: counts are exact; the per-term contributions are
    f32-rounded then summed in a DETERMINISTIC term-ordered double fold
    (the text_unigram_ppl discipline)."""
    c = _dataset_counts(spark, sf_dir)
    tot = c.agg(
        F.sum("o1").alias("n1"), F.sum("o2").alias("n2"),
        F.count(F.lit(1)).alias("k"),
    )
    j = c.crossJoin(F.broadcast(tot))
    contrib = j.select(
        "term",
        (
            (F.sqrt(F.col("n2") / F.col("n1")) * F.col("o1")
             - F.sqrt(F.col("n1") / F.col("n2")) * F.col("o2"))
            * (F.sqrt(F.col("n2") / F.col("n1")) * F.col("o1")
               - F.sqrt(F.col("n1") / F.col("n2")) * F.col("o2"))
            / (F.col("o1") + F.col("o2"))
        ).cast("float").alias("c32"),
        "k",
    )
    return contrib.groupBy("k").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", F.col("c32").cast("double").alias("c")))),
            F.lit(0.0), lambda a, x: a + x["c"],
        ).alias("chisq"),
    ).select(
        F.col("k").cast("long").alias("n_terms"),
        "chisq",
    )


STREAM_CHISQ_SQL = """
WITH c AS (
    SELECT term,
           CAST(sum(a) AS DOUBLE) AS o1,
           CAST(sum(1 - a) AS DOUBLE) AS o2
    FROM (
        SELECT CASE WHEN source = 'src1' THEN 1 ELSE 0 END::BIGINT AS a,
               unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS term
        FROM documents WHERE source IN ('src1', 'src2')
    ) GROUP BY 1
),
tot AS (SELECT sum(o1) AS n1, sum(o2) AS n2, count(*)::BIGINT AS k FROM c),
contrib AS (
    SELECT term,
           CAST((sqrt(n2 / n1) * o1 - sqrt(n1 / n2) * o2)
                * (sqrt(n2 / n1) * o1 - sqrt(n1 / n2) * o2)
                / (o1 + o2) AS FLOAT) AS c32,
           k
    FROM c, tot
)
SELECT k AS n_terms,
       list_reduce(list(CAST(c32 AS DOUBLE) ORDER BY term), (a, b) -> a + b) AS chisq
FROM contrib GROUP BY k"""


register("stream_chisq_dataset", stream_chisq_dataset, STREAM_CHISQ_SQL)


def stream_gtest_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``gTestDataSet`` evaluator (``SJ/io/eval/GTestDataSetEvaluator``,
    commons-math GTest#gDataSetsComparison): G statistic between the same
    two term-count vectors — G = 2·Σ o·ln(o/e), expected from the pooled
    margins e1 = (o1+o2)·N1/(N1+N2); a 0 cell contributes 0 (o·ln o → 0).
    Same exact-count front and term-ordered f32-contribution fold as the
    χ² evaluator."""
    c = _dataset_counts(spark, sf_dir)
    tot = c.agg(
        F.sum("o1").alias("n1"), F.sum("o2").alias("n2"),
        F.count(F.lit(1)).alias("k"),
    )
    j = c.crossJoin(F.broadcast(tot))
    rowsum = F.col("o1") + F.col("o2")
    e1 = rowsum * F.col("n1") / (F.col("n1") + F.col("n2"))
    e2 = rowsum * F.col("n2") / (F.col("n1") + F.col("n2"))
    g1 = F.when(F.col("o1") > 0, F.col("o1") * F.log(F.col("o1") / e1)).otherwise(F.lit(0.0))
    g2 = F.when(F.col("o2") > 0, F.col("o2") * F.log(F.col("o2") / e2)).otherwise(F.lit(0.0))
    contrib = j.select(
        "term", (2.0 * (g1 + g2)).cast("float").alias("c32"), "k",
    )
    return contrib.groupBy("k").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", F.col("c32").cast("double").alias("c")))),
            F.lit(0.0), lambda a, x: a + x["c"],
        ).alias("gstat"),
    ).select(F.col("k").cast("long").alias("n_terms"), "gstat")


STREAM_GTEST_SQL = """
WITH c AS (
    SELECT term,
           CAST(sum(a) AS DOUBLE) AS o1,
           CAST(sum(1 - a) AS DOUBLE) AS o2
    FROM (
        SELECT CASE WHEN source = 'src1' THEN 1 ELSE 0 END::BIGINT AS a,
               unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS term
        FROM documents WHERE source IN ('src1', 'src2')
    ) GROUP BY 1
),
tot AS (SELECT sum(o1) AS n1, sum(o2) AS n2, count(*)::BIGINT AS k FROM c),
contrib AS (
    SELECT term,
           CAST(2.0 * (
               CASE WHEN o1 > 0
                    THEN o1 * ln(o1 / ((o1 + o2) * n1 / (n1 + n2)))
                    ELSE 0.0 END
             + CASE WHEN o2 > 0
                    THEN o2 * ln(o2 / ((o1 + o2) * n2 / (n1 + n2)))
                    ELSE 0.0 END
           ) AS FLOAT) AS c32,
           k
    FROM c, tot
)
SELECT k AS n_terms,
       list_reduce(list(CAST(c32 AS DOUBLE) ORDER BY term), (a, b) -> a + b) AS gstat
FROM contrib GROUP BY k"""


register("stream_gtest_dataset", stream_gtest_dataset, STREAM_GTEST_SQL)


def stream_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ks`` evaluator (commons-math KolmogorovSmirnovTest
    #kolmogorovSmirnovStatistic, two-sample): D = max_v |F1(v) − F2(v)|
    between the AM and PM value ECDFs — the distribution-shift detector.

    Scale shape (the Mann–Whitney recipe): ECDFs from VALUE-LEVEL
    aggregation — one (value) hash-agg, a window over DISTINCT values for
    the running cumulatives, one max. Exact integer cumulative counts
    divide by exact totals in double, so D is bit-deterministic."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    am = (F.hour("ts") < 12).cast("long")
    vals = (
        ev.select(F.col("value").cast("decimal(18,2)").alias("v"), am.alias("g"))
        .groupBy("v")
        .agg(F.sum("g").alias("c1"), F.sum(1 - F.col("g")).alias("c2"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "v",
        F.sum("c1").over(w).alias("k1"),
        F.sum("c2").over(w).alias("k2"),
    )
    tot = vals.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
    )
    out = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(F.col("n1")).alias("n1"),
        F.max(F.col("n2")).alias("n2"),
        F.max(
            F.abs(
                F.col("k1").cast("double") / F.col("n1")
                - F.col("k2").cast("double") / F.col("n2")
            )
        ).alias("d_stat"),
    )
    return out.select(
        F.col("n1").cast("long").alias("n_am"),
        F.col("n2").cast("long").alias("n_pm"),
        "d_stat",
    )


STREAM_KS_SQL = """
WITH vals AS (
    SELECT CAST(value AS DECIMAL(18,2)) AS v,
           sum(CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END)::BIGINT AS c1,
           sum(CASE WHEN hour(ts) < 12 THEN 0 ELSE 1 END)::BIGINT AS c2
    FROM events GROUP BY 1
),
cum AS (
    SELECT v,
           sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k1,
           sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k2
    FROM vals
),
tot AS (SELECT max(k1) AS n1, max(k2) AS n2 FROM cum)
SELECT n1::BIGINT AS n_am, n2::BIGINT AS n_pm,
       (SELECT max(abs(CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2)) FROM cum) AS d_stat
FROM tot"""


register("stream_ks_test", stream_ks_test, STREAM_KS_SQL)
