"""Watermarked streaming dedup (streaming/dedup.py): duplicate signatures
are dropped across micro-batches and checkpointed restarts while inside
the watermark horizon, and re-emit once the watermark has expired their
state — the bounded-state contract."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")


def _write(d: str, name: str, rows: list[tuple]) -> None:
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
        pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()), ("ts", pa.timestamp("us"))]
        )
    )
    pq.write_table(table, f"{d}/{name}.parquet")


def _drain(spark, dirs):
    from lucene_solr_spark.streaming.dedup import dedup_stream

    src, out, ckpt = dirs
    dedup_stream(spark, src, out, ckpt)
    try:
        return spark.read.parquet(out).toPandas().sort_values("doc_id")
    except Exception:
        return pd.DataFrame(columns=["doc_id", "text", "ts", "sig"])


def test_dedup_within_horizon_and_reemit_after_expiry(spark, dirs):
    src, _, _ = dirs
    # batch 1: two distinct docs + one in-batch duplicate of doc 1
    _write(src, "b1", [
        (1, "alpha beta", "2024-01-01 10:00:00"),
        (2, "gamma delta", "2024-01-01 10:05:00"),
        (3, "alpha beta", "2024-01-01 10:10:00"),
    ])
    out = _drain(spark, dirs)
    assert sorted(out.doc_id) == [1, 2]

    # batch 2 (restart from checkpoint): duplicate inside the 1h horizon is
    # still suppressed; a new doc passes
    _write(src, "b2", [
        (4, "alpha beta", "2024-01-01 10:20:00"),
        (5, "epsilon zeta", "2024-01-01 10:25:00"),
    ])
    out = _drain(spark, dirs)
    assert sorted(out.doc_id) == [1, 2, 5]

    # batch 3: advance event time far past the horizon (evicts old state
    # at batch end); batch 4 re-sends the duplicate text -> re-emitted,
    # which is the watermark-bounded-state contract
    _write(src, "b3", [(6, "eta theta", "2024-01-01 20:00:00")])
    out = _drain(spark, dirs)
    assert sorted(out.doc_id) == [1, 2, 5, 6]
    _write(src, "b4", [(7, "alpha beta", "2024-01-01 20:05:00")])
    out = _drain(spark, dirs)
    assert sorted(out.doc_id) == [1, 2, 5, 6, 7]
