"""Deterministic index OPEN (VERDICT r4 'Next round' #1).

Lucene opens an index by reading ``segments_N`` (``L/index/SegmentInfos``)
in milliseconds — it never re-runs the indexing plan to open a committed
index. Our manifest directory + ``finalize_done.json`` sentinel is that
segments_N: these tests pin that

- a fully-committed index OPENs with ZERO Spark jobs (no pass over the
  source, no ``_finalize`` recompute),
- a MUTATED index (expunge physically rewrote segments) opens from its
  manifest instead of being re-validated against the pristine source —
  the exact mechanism behind round 4's ``ft_after_expunge_topk``
  cross-session flake,
- any un-stamped mutation invalidates the sentinel and falls back to the
  resumable build path (fingerprint mismatch → no silent staleness).
"""

import os

import pandas as pd
import pytest

from lucene_solr_spark.index.build import (
    _SENTINEL,
    build_index,
    open_committed_index,
    stamp_finalize_done,
)


@pytest.fixture(scope="module")
def committed(spark, small_corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("open") / "idx")
    sdf = spark.createDataFrame(small_corpus)
    manifest = build_index(spark, sdf, index_dir, n_segments=4)
    return index_dir, sdf, manifest.toPandas().sort_values("seg").reset_index(drop=True)


def test_build_stamps_sentinel(committed):
    index_dir, _sdf, _m = committed
    assert os.path.exists(os.path.join(index_dir, _SENTINEL))


def test_open_committed_runs_zero_jobs(spark, committed):
    index_dir, sdf, built = committed
    sc = spark.sparkContext
    sc.setJobGroup("open-test", "deterministic open must not launch jobs")
    try:
        reopened = build_index(spark, sdf, index_dir, n_segments=4)
    finally:
        sc.setJobGroup("", "")
    # collecting the returned local-relation manifest is the TEST's job,
    # not the open path's — do it outside the group
    opened_pdf = reopened.toPandas().sort_values("seg").reset_index(drop=True)
    jobs = sc.statusTracker().getJobIdsForGroup("open-test")
    assert list(jobs) == [], (
        f"opening a committed index launched Spark jobs {list(jobs)} — "
        "the manifest fast path must be metadata-only"
    )
    assert set(opened_pdf["status"]) == {"opened"}
    for col in ("seg", "base", "n_docs", "doc_count", "n_terms", "sum_len"):
        assert list(opened_pdf[col]) == list(built[col]), col


def test_open_returns_none_without_sentinel(spark, committed):
    index_dir, _sdf, _m = committed
    sent = os.path.join(index_dir, _SENTINEL)
    bak = sent + ".bak"
    os.rename(sent, bak)
    try:
        assert open_committed_index(spark, index_dir) is None
    finally:
        os.rename(bak, sent)


def test_unstamped_mutation_invalidates_sentinel(spark, committed):
    index_dir, _sdf, _m = committed
    # simulate a mutation that forgot to re-stamp: bump a manifest mtime
    seg0 = os.path.join(index_dir, "manifest", "seg=0.parquet")
    st = os.stat(seg0)
    os.utime(seg0, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    try:
        assert open_committed_index(spark, index_dir) is None, (
            "a manifest change without a re-stamp must not open"
        )
    finally:
        stamp_finalize_done(index_dir)  # restore a consistent stamp
    assert open_committed_index(spark, index_dir) is not None


def test_mutated_index_opens_without_source_revalidation(
    spark, small_corpus, tmp_path_factory
):
    """The r4 flake scenario: expunge physically rewrites segments (live
    counts shrink), then a 'second session' calls build_index over the
    ORIGINAL source. Before: the resume validation refused, recovery wiped
    the dir and silently rebuilt PRISTINE (losing the expunge). Now: the
    sentinel opens the mutated tree as-is — no wipe, no source pass."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.updates import expunge_deletes, update_docs

    index_dir = str(tmp_path_factory.mktemp("open_mut") / "idx")
    sdf = spark.createDataFrame(small_corpus)
    build_index(spark, sdf, index_dir, n_segments=4)

    upd = sdf.filter(F.col("turn_idx") % 7 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" updated"))
    )
    update_docs(spark, upd, index_dir, n_segments=2)
    report = expunge_deletes(spark, index_dir)
    assert report["expunged_docs"] > 0

    canary = os.path.join(index_dir, "_canary")
    with open(canary, "w") as f:
        f.write("must survive the reopen")
    mutated = open_committed_index(spark, index_dir).toPandas()
    assert mutated is not None

    # "second session" reopen over the pristine source
    reopened = build_index(spark, sdf, index_dir, n_segments=4).toPandas()
    assert os.path.exists(canary), "reopen wiped the mutated index dir"
    ro = reopened.sort_values("seg").reset_index(drop=True)
    mu = mutated.sort_values("seg").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        ro[["seg", "base", "n_docs"]], mu[["seg", "base", "n_docs"]]
    )
    # the expunge is preserved: total live == corpus (delete+re-add), but the
    # ORIGINAL segments physically shrank (tombstoned docs rewritten out)
    assert ro["n_docs"].sum() == len(small_corpus)
    orig = ro[ro["seg"] < 4]["n_docs"].sum()
    assert orig < len(small_corpus), "original segments were not compacted"
    assert report["rewritten_segs"]
