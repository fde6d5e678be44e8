"""Structured-Streaming incremental index maintenance — the Spark-native
analog of the reference's NRT/streaming surface (SURVEY.md §2.H):

- Solr ``TopicStream`` (checkpointed incremental pulls of new docs by
  ``_version_``)  →  a file/table stream source + Spark's streaming
  checkpoint directory (exactly the persisted topic checkpoint).
- ``DaemonStream`` periodic re-execution  →  ``Trigger.AvailableNow`` /
  processingTime triggers.
- Lucene NRT soft-commit (``DirectoryReader#openIfChanged``)  →  each
  micro-batch appends fresh segments via ``append_batch`` and refreshes
  global stats; a new ``IndexSearcher`` over the index dir IS the reopened
  reader.

The reference has no watermark/event-time model (docs become visible at
commit, ordered by version) — so no watermarks here either; late data is
simply the next batch's segments. Scale note: each micro-batch is one
range-shuffle + one mapInPandas pass over ONLY the new rows; cost is
O(batch), never O(index). Background ``merge_segments`` (index/merge.py)
plays TieredMergePolicy when small streaming segments accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.build import append_batch


def incremental_index_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str,
    *,
    n_segments_per_batch: int = 4,
    available_now: bool = True,
):
    """Start (and with ``available_now`` drain) a streaming append pipeline:
    new parquet files in ``source_dir`` → analyzed, inverted, committed as
    new segments of ``index_dir``. Returns the StreamingQuery."""

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch(spark, batch_df, index_dir, n_segments=n_segments_per_batch)

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
