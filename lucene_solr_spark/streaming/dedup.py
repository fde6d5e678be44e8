"""Streaming exact dedup with watermark-bounded state — the continuous-
ingest form of the exact-dedup pipeline op (SURVEY.md §2.H; reference
surface: Solr's ``SignatureUpdateProcessorFactory``, which computes a
content signature per incoming doc and overwrites/drops dupes at update
time — `S/update/processor/SignatureUpdateProcessorFactory.java`).

The batch entry (``dedup_exact``) hash-aggregates the whole corpus; a
continuous feed can't, because "have I seen this signature?" is unbounded
state at 10^12 turns. The Spark-native answer is
``dropDuplicatesWithinWatermark``: the signature store is keyed state in
the state store, and an entry is evicted once the event-time watermark
passes its timestamp + delay — so state is O(docs inside the lateness
horizon), never O(corpus). The contract (pinned by
``tests/test_stream_dedup.py``):

- within the horizon, a re-sent signature is dropped — across micro-batches
  AND across query restarts (the checkpoint carries the state store);
- after the watermark passes an entry, the same signature emits again —
  that is the price of bounded state, and exactly the semantics Spark
  documents for the operator (re-dedup of the archive is the batch op's
  job, run periodically over the landed files).

Each micro-batch shuffles only its own rows on the signature (state is
already key-partitioned); output is append-mode, exactly-once into the
parquet sink.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

DOC_SCHEMA = "doc_id long, text string, ts timestamp"


def dedup_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    watermark: str = "1 hour",
) -> None:
    """Drain all available files through the watermarked streaming dedup
    into a parquet sink: one row per distinct md5(text) signature within
    the watermark horizon. Call again after new files land — the
    checkpoint resumes the watermark and the signature state."""
    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .parquet(in_dir)
        .withColumn("sig", F.md5(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["sig"])
    )
    q = (
        docs.select("doc_id", "text", "ts", "sig")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
