"""Pipeline-op invariants: connected components, deterministic splits,
decontamination, and the math-stream evaluators (movingAvg / regress).

The driver-gate equivalence vs DuckDB is covered by tools/check_entry.py;
these tests pin the algorithmic invariants that the SQL hash can't express
(component well-formedness, split stability, OLS closed form).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_connected_components_well_formed(spark):
    """Labels are component minima: every node's label is reachable and no
    edge crosses two labels."""
    from lucene_solr_spark.ops.pipeline import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20), (30, 31)],
        "src long, dst long",
    )
    cc = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert cc == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_connected_components_long_chain(spark):
    """A path graph longer than one superstep's reach still converges
    (propagation is iterated to fixpoint, not a single round)."""
    from lucene_solr_spark.ops.pipeline import connected_components

    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = connected_components(edges).collect()
    assert {r.cluster_id for r in got} == {0}
    assert {r.doc_id for r in got} == set(range(n + 1))


def test_split_assignment_deterministic_and_total(spark):
    """Same doc -> same split on every evaluation; buckets cover [0, 100)."""
    from lucene_solr_spark.ops.pipeline import split_assignment

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: (r.bucket, r.split) for r in split_assignment(docs).collect()}
    b = {r.doc_id: (r.bucket, r.split) for r in split_assignment(docs).collect()}
    assert a == b
    assert all(0 <= v[0] < 100 for v in a.values())
    assert {v[1] for v in a.values()} == {"train", "valid", "test"}
    n_train = sum(1 for v in a.values() if v[1] == "train")
    assert 400 <= n_train <= 480  # ~90% of 500, hash-uniform


def test_decontaminate_flags_planted_overlap(spark):
    """A corpus doc sharing a probe doc's exact text is flagged with
    frac == 1.0; an unrelated doc is not flagged."""
    import pandas as pd

    from lucene_solr_spark.ops import pipeline as P

    probe_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, probe_text),                      # probe (0 % PROBE_MOD == 0)
        (1, probe_text),                      # contaminated copy
        (2, "one two three four five six seven eight nine"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = "/tmp/lss_decon_test"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    got = P.decontaminate(spark, path).collect()
    assert [(r.doc_id, r.probe_doc, r.frac) for r in got] == [(1, 0, 1.0)]


def test_regress_matches_closed_form(spark):
    """stream_regress reproduces numpy's OLS on the same aggregates."""
    import numpy as np

    from lucene_solr_spark.ops.streams import stream_regress

    rows = stream_regress(spark, SF).collect()
    assert len(rows) > 0
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long").alias("x"),
        F.col("value").cast("decimal(18,2)").cast("double").alias("y"),
    ).toPandas()
    for r in rows:
        g = ev[ev.event_type == r.event_type]
        slope, intercept = np.polyfit(g.x, g.y, 1)
        assert r.slope == pytest.approx(slope, rel=1e-9)
        assert r.intercept == pytest.approx(intercept, rel=1e-9)
        cc = np.corrcoef(g.x, g.y)[0, 1]
        assert r.r2 == pytest.approx(cc * cc, rel=1e-9)


def test_moving_avg_window_semantics(spark):
    """mavg equals the mean of the last <=7 daily counts per event_type."""
    from lucene_solr_spark.ops.streams import MOVING_AVG_WINDOW, stream_moving_avg

    rows = stream_moving_avg(spark, SF).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        hist = by_type.setdefault(r.event_type, [])
        hist.append(r.n)
        win = hist[-MOVING_AVG_WINDOW:]
        assert r.mavg == pytest.approx(sum(win) / len(win), rel=1e-12)
