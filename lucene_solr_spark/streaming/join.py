"""Stream-stream inner join with watermarks and an event-time range
condition — the Structured-Streaming analog of Solr's query-time join run
between two LIVE feeds (SURVEY.md §2.H; reference surface:
``SJ/io/stream/InnerJoinStream`` joins two finished stream iterators — it
has no event-time model, so this is the Spark-native upgrade, exactly like
``streaming/windowed.py`` is for the timeseries facet).

The canonical pipeline shape: an ``impressions`` feed joined to a
``clicks`` feed on the shared key, where a click only matches an
impression seen within the preceding hour. Both sides carry watermarks and
the join predicate carries the time-range bound — together they let Spark
EXPIRE buffered state: an impression older than (click watermark − 1h) can
never match a future click and is evicted. Without both constraints a
stream-stream join must buffer one side forever (unbounded state at 10^12
events); with them state is O(events inside the lateness+range horizon).

Each micro-batch shuffles only its own rows on the join key (the buffered
state is already key-partitioned); matched pairs emit exactly once in
append mode, and the checkpoint carries both watermarks across restarts.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

IMPRESSION_SCHEMA = "imp_id long, user_id long, imp_ts timestamp"
CLICK_SCHEMA = "click_id long, user_id long, click_ts timestamp"


def join_impressions_clicks(
    spark: SparkSession,
    imp_dir: str,
    click_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    watermark: str = "2 hours",
    max_gap_minutes: int = 60,
) -> None:
    """Drain all available files on both feeds through the watermarked
    stream-stream inner join into a parquet sink. A (user_id) click joins
    a (user_id) impression iff 0 ≤ click_ts − imp_ts ≤ ``max_gap_minutes``.
    Call again after new files land — the checkpoint resumes both sides'
    watermarks, so each matched pair is emitted exactly once across
    restarts."""
    imps = (
        spark.readStream.schema(IMPRESSION_SCHEMA).parquet(imp_dir)
        .withWatermark("imp_ts", watermark)
    )
    clicks = (
        spark.readStream.schema(CLICK_SCHEMA).parquet(click_dir)
        .withWatermark("click_ts", watermark)
    )
    joined = imps.join(
        clicks,
        (imps.user_id == clicks.user_id)
        & (clicks.click_ts >= imps.imp_ts)
        & (
            clicks.click_ts
            <= imps.imp_ts + F.expr(f"interval {int(max_gap_minutes)} minutes")
        ),
        "inner",
    ).select(
        imps.imp_id, clicks.click_id,
        imps.user_id.alias("user_id"), imps.imp_ts, clicks.click_ts,
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
