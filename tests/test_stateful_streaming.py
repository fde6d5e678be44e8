"""applyInPandasWithState custom stateful operator: per-conversation state
must accumulate across micro-batches AND survive a stream restart (state in
the checkpoint), converging to the batch-computed truth."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_spark.datagen import generate_transcripts

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _write(pdf, path, name):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(path, name))


def test_state_accumulates_across_restarts(spark, tmp_path):
    from lucene_solr_spark.streaming.stateful import conversation_state_stream

    full = generate_transcripts(40)
    half1 = full[full.turn_idx % 2 == 0]
    half2 = full[full.turn_idx % 2 == 1]
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    _write(half1, src, "batch-0.parquet")
    conversation_state_stream(spark, src, ckpt, SCHEMA, out)

    # restart with MORE data: the second run resumes per-key state from the
    # checkpoint — final totals must cover both halves
    _write(half2, src, "batch-1.parquet")
    conversation_state_stream(spark, src, ckpt, SCHEMA, out)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("epoch")
        .groupby("conv_id")
        .last()  # latest epoch per conv = current state
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = (
        full.groupby("conv_id")
        .agg(
            n_turns=("turn_idx", "size"),
            n_chars=("text", lambda s: s.str.len().sum()),
            max_turn_idx=("turn_idx", "max"),
        )
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    merged = got.merge(want, on="conv_id", suffixes=("_got", "_want"))
    assert (merged.n_turns_got == merged.n_turns_want).all()
    assert (merged.n_chars_got == merged.n_chars_want).all()
    assert (merged.max_turn_idx_got == merged.max_turn_idx_want).all()
