"""Semantic invariants for stream_sessionize and dedup_spans.

The driver-gate equivalence vs DuckDB is covered by tools/check_entry.py;
these tests pin behavior on CRAFTED corpora where the expected sessions /
span verdicts are known by construction — including the exact-gap boundary
(a new session starts when the inactivity equals the gap) and verbatim
duplicate documents (dup_frac == 1.0, rejected).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

SF = "/root/testdata/sf0.001"

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_sessionize_gap_boundary_and_merge(spark, tmp_path):
    """Events gap-1s apart merge; an inactivity of EXACTLY the gap still
    merges (Spark session_window merges TOUCHING windows — membership is
    the closed interval [first, last + gap]); one microsecond beyond the
    gap opens a new session; two users never share a session."""
    from lucene_solr_spark.ops.streams import SESSION_GAP_MIN, stream_sessionize

    gap = dt.timedelta(minutes=SESSION_GAP_MIN)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: two events gap-1s apart, then one at EXACTLY +gap —
        # all three merge into one session ...
        (1, T0, 1, "a", 0.0, "{}"),
        (2, T0 + gap - dt.timedelta(seconds=1), 1, "b", 0.0, "{}"),
        (3, T0 + 2 * gap - dt.timedelta(seconds=1), 1, "a", 0.0, "{}"),
        # ... then gap + 1us of silence -> a new 1-event session
        (4, T0 + 3 * gap - dt.timedelta(seconds=1) + us, 1, "c", 0.0, "{}"),
        # user 2: single event at the same wall time as user 1's first
        (5, T0, 2, "a", 0.0, "{}"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        (r.user_id, r.session_start, r.n_events, r.n_types, r.duration_us)
        for r in stream_sessionize(spark, sf).collect()
    }
    assert got == {
        (1, T0, 3, 2, int((2 * gap - dt.timedelta(seconds=1)).total_seconds() * 1e6)),
        (1, T0 + 3 * gap - dt.timedelta(seconds=1) + us, 1, 1, 0),
        (2, T0, 1, 1, 0),
    }


def test_sessionize_counts_cover_all_events(spark):
    """On the real sf0.001 events: sessions partition each user's events —
    the per-user sum of session sizes equals the user's event count (checked
    without the top-20 limit by re-grouping the un-limited aggregate)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.ops.streams import SESSION_GAP_MIN, _t

    ev = _t(spark, SF, "events")
    sess = ev.groupBy(
        "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
    ).agg(F.count(F.lit(1)).alias("n"))
    per_user = {
        r.user_id: r.total
        for r in sess.groupBy("user_id").agg(F.sum("n").alias("total")).collect()
    }
    truth = {
        r.user_id: r.total
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("total")).collect()
    }
    assert per_user == truth


def _write_docs(tmp_path, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src1"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_dedup_spans_verbatim_copy_rejected(spark, tmp_path):
    """A verbatim duplicate pair scores dup_frac 1.0 on both copies and is
    rejected; a unique doc of the same length keeps dup_frac 0.0; a doc
    shorter than the gram width reports 0 grams and is kept."""
    from lucene_solr_spark.ops.pipeline import SPAN_N, dedup_spans

    dup = " ".join(f"w{i}" for i in range(3 * SPAN_N))
    uniq = " ".join(f"u{i}" for i in range(3 * SPAN_N))
    short = " ".join(f"s{i}" for i in range(SPAN_N - 1))
    sf = _write_docs(tmp_path, [dup, dup, uniq, short])
    rows = {r.doc_id: r for r in dedup_spans(spark, sf).collect()}
    n_expect = 3 * SPAN_N - SPAN_N + 1
    for d in (0, 1):
        assert rows[d].n_grams == n_expect
        assert rows[d].n_dup == n_expect
        assert rows[d].dup_frac == 1.0 and not rows[d].keep
    assert rows[2].n_grams == n_expect and rows[2].n_dup == 0
    assert rows[2].dup_frac == 0.0 and rows[2].keep
    assert rows[3].n_grams == 0 and rows[3].n_dup == 0 and rows[3].keep


def test_dedup_spans_partial_overlap_fraction(spark, tmp_path):
    """A doc sharing exactly one SPAN_N-token run with another doc counts
    exactly one duplicated gram position on each side."""
    from lucene_solr_spark.ops.pipeline import SPAN_N, dedup_spans

    shared = " ".join(f"c{i}" for i in range(SPAN_N))
    a = shared + " " + " ".join(f"a{i}" for i in range(2 * SPAN_N))
    b = " ".join(f"b{i}" for i in range(2 * SPAN_N)) + " " + shared
    sf = _write_docs(tmp_path, [a, b])
    rows = {r.doc_id: r for r in dedup_spans(spark, sf).collect()}
    n_expect = 3 * SPAN_N - SPAN_N + 1
    for d in (0, 1):
        assert rows[d].n_grams == n_expect
        assert rows[d].n_dup == 1
        assert rows[d].keep  # 1/21 < 0.2
