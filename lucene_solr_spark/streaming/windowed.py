"""Event-time windowed aggregation with watermarked late-data handling —
the Structured-Streaming operator a transcript/event pipeline runs next to
the index maintenance stream (SURVEY.md §2.H; brief: "watermarks + windowed
aggs for late data").

The reference's nearest survey row is the timeseries facet
(``SJ/io/stream/TimeSeriesStream``) / daemon re-execution — both recompute
over committed data and have no event-time model. This operator is the
Spark-native upgrade of that surface: tumbling event-time windows whose
results FINALIZE once the watermark passes the window end, with rows
arriving later than the allowed lateness dropped instead of silently
mutating already-emitted buckets.

Scale shape: the windowed count is a streaming hash-aggregate partitioned
by window — state size is O(open windows), bounded because the watermark
expires window state as event time advances (without the watermark, state
grows without bound at 10^12 events). Each micro-batch shuffles only the
batch's rows on the window key; finalized windows are emitted exactly once
(append mode), which is what makes the sink idempotent-by-construction for
downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

EVENT_SCHEMA = "event_id long, ts timestamp, value double"


def windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain all available source files through a watermarked tumbling
    window count into a parquet sink (append mode: only FINALIZED windows
    are written). Call again after new files land — the checkpoint carries
    the watermark across invocations, so rows older than
    (max event time seen − ``watermark``) are dropped as late."""
    sdf = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    agg = (
        sdf.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n", "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
