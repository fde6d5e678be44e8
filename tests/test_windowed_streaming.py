"""Watermarked windowed-aggregation semantics (streaming/windowed.py):
finalized windows emit exactly once, and rows later than the allowed
lateness are DROPPED — they never mutate an already-finalized bucket."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")


def _write(src: str, name: str, rows: list[tuple[int, str, float]]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    table = pa.Table.from_pandas(pdf, preserve_index=False).cast(pa.schema([
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),   # Spark TimestampType (µs, not ns)
        ("value", pa.float64()),
    ]))
    pq.write_table(table, f"{src}/{name}.parquet")


def test_late_rows_dropped_finalized_windows_stable(spark, dirs):
    from lucene_solr_spark.streaming.windowed import windowed_event_counts

    src, out, ckpt = dirs

    # batch 1: three 10:xx rows + a 13:59 row → watermark after this batch
    # is 13:59 − 2h = 11:59, which EXPIRES the 10:00–11:00 window's state
    _write(src, "b1", [
        (1, "2024-01-01 10:05:00", 1.0),
        (2, "2024-01-01 10:30:00", 2.0),
        (3, "2024-01-01 10:55:00", 3.0),
        (4, "2024-01-01 13:59:00", 4.0),
    ])
    windowed_event_counts(spark, src, out, ckpt)

    # batch 2: a LATE 10:31 row — its window end (11:00) is behind the
    # 11:59 watermark carried in the checkpoint → dropped, the finalized
    # bucket must NOT change; the 16:00 row just advances event time
    _write(src, "b2", [
        (5, "2024-01-01 16:00:00", 10.0),
        (6, "2024-01-01 10:31:00", 100.0),   # late → dropped
    ])
    windowed_event_counts(spark, src, out, ckpt)

    got = {
        r.win_start.strftime("%H:%M"): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # 10:00 window finalized WITHOUT the late row (n=3, sum=6 — not 106)
    assert got["10:00"] == (3, 6.0)
    assert got["13:00"] == (1, 4.0)
    # 16:00 window not finalized yet (watermark 14:00 < 17:00) → absent
    assert "16:00" not in got


def test_on_time_rows_within_lateness_are_counted(spark, dirs):
    from lucene_solr_spark.streaming.windowed import windowed_event_counts

    src, out, ckpt = dirs
    _write(src, "b1", [
        (1, "2024-01-01 10:05:00", 1.0),
        (2, "2024-01-01 12:00:00", 2.0),
    ])
    windowed_event_counts(spark, src, out, ckpt)
    # watermark = 10:00 → a 10:30 arrival is within lateness → counted;
    # then 14:30 advances the watermark to 12:30, finalizing 10:00
    _write(src, "b2", [
        (3, "2024-01-01 10:30:00", 5.0),
        (4, "2024-01-01 14:30:00", 1.0),
    ])
    windowed_event_counts(spark, src, out, ckpt)
    got = {
        r.win_start.strftime("%H:%M"): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    assert got["10:00"] == (2, 6.0)
