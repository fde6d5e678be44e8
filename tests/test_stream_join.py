"""Stream-stream watermarked join (streaming/join.py): matches the batch
join on the same data, emits each pair exactly once across checkpointed
restarts, and joins only within the event-time range bound."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture()
def dirs(tmp_path):
    imp = tmp_path / "imp"
    clk = tmp_path / "clk"
    imp.mkdir()
    clk.mkdir()
    return str(imp), str(clk), str(tmp_path / "out"), str(tmp_path / "ckpt")


def _write(d: str, name: str, cols: list[str], rows: list[tuple]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=cols)
    ts_col = cols[-1]
    pdf[ts_col] = pd.to_datetime(pdf[ts_col])
    table = pa.Table.from_pandas(pdf, preserve_index=False).cast(pa.schema([
        (cols[0], pa.int64()),
        (cols[1], pa.int64()),
        (ts_col, pa.timestamp("us")),
    ]))
    pq.write_table(table, f"{d}/{name}.parquet")


IMP_COLS = ["imp_id", "user_id", "imp_ts"]
CLK_COLS = ["click_id", "user_id", "click_ts"]


def _run(spark, dirs):
    from lucene_solr_spark.streaming.join import join_impressions_clicks

    imp, clk, out, ckpt = dirs
    join_impressions_clicks(spark, imp, clk, out, ckpt)
    try:
        return (
            spark.read.parquet(out)
            .toPandas()
            .sort_values(["imp_id", "click_id"])
            .reset_index(drop=True)
        )
    except Exception:
        return pd.DataFrame(columns=["imp_id", "click_id"])


def test_matches_only_within_range(spark, dirs):
    imp, clk, _, _ = dirs
    _write(imp, "b1", IMP_COLS, [
        (1, 100, "2024-01-01 10:00:00"),
        (2, 100, "2024-01-01 12:00:00"),
        (3, 200, "2024-01-01 10:00:00"),
    ])
    _write(clk, "b1", CLK_COLS, [
        (10, 100, "2024-01-01 10:30:00"),  # matches imp 1 (30 min gap)
        (11, 100, "2024-01-01 11:30:00"),  # matches nothing (gap 90m/ -30m)
        (12, 200, "2024-01-01 09:30:00"),  # click BEFORE impression: no match
    ])
    got = _run(spark, dirs)
    assert list(map(tuple, got[["imp_id", "click_id"]].values)) == [(1, 10)]


def test_restart_emits_each_pair_once(spark, dirs):
    imp, clk, _, _ = dirs
    _write(imp, "b1", IMP_COLS, [(1, 100, "2024-01-01 10:00:00")])
    _write(clk, "b1", CLK_COLS, [(10, 100, "2024-01-01 10:10:00")])
    first = _run(spark, dirs)
    assert len(first) == 1

    # new click for the same buffered impression arrives after a restart
    _write(clk, "b2", CLK_COLS, [(11, 100, "2024-01-01 10:20:00")])
    second = _run(spark, dirs)
    # pair (1,10) is NOT re-emitted; (1,11) joins against buffered state
    assert list(map(tuple, second[["imp_id", "click_id"]].values)) == [
        (1, 10), (1, 11),
    ]


def test_agrees_with_batch_join(spark, dirs):
    import random

    rnd = random.Random(7)
    imps = [
        (i, rnd.randint(1, 5), f"2024-01-01 {10 + rnd.randint(0, 5):02d}:{rnd.randint(0, 59):02d}:00")
        for i in range(30)
    ]
    clks = [
        (100 + i, rnd.randint(1, 5), f"2024-01-01 {10 + rnd.randint(0, 5):02d}:{rnd.randint(0, 59):02d}:00")
        for i in range(30)
    ]
    imp, clk, _, _ = dirs
    _write(imp, "b1", IMP_COLS, imps)
    _write(clk, "b1", CLK_COLS, clks)
    got = _run(spark, dirs)

    ip = pd.DataFrame(imps, columns=IMP_COLS)
    cp = pd.DataFrame(clks, columns=CLK_COLS)
    ip["imp_ts"] = pd.to_datetime(ip["imp_ts"])
    cp["click_ts"] = pd.to_datetime(cp["click_ts"])
    m = ip.merge(cp, on="user_id")
    gap = (m.click_ts - m.imp_ts).dt.total_seconds()
    want = m[(gap >= 0) & (gap <= 3600)].sort_values(
        ["imp_id", "click_id"]
    ).reset_index(drop=True)
    assert list(map(tuple, got[["imp_id", "click_id"]].values)) == list(
        map(tuple, want[["imp_id", "click_id"]].values)
    )
