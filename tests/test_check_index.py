"""CheckIndex analog (``L/index/CheckIndex.java``): a clean build passes
with zero violations; targeted corruptions (impact metadata, stated df,
norm table) are each detected."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_spark.index.check import check_index


def _report(spark, idx):
    return check_index(spark, idx).toPandas().sort_values("seg")


def test_clean_index_has_no_violations(spark, small_index):
    idx, manifest = small_index
    rep = _report(spark, idx)
    assert int(rep["n_violations"].sum()) == 0
    assert int(rep["n_docs"].sum()) == int(manifest["n_docs"].sum())
    assert (rep["n_terms"] > 0).all()


@pytest.fixture()
def corruptible_index(spark, small_index, tmp_path):
    idx, _ = small_index
    dst = str(tmp_path / "idx")
    shutil.copytree(idx, dst)
    return dst


def _postings_file(idx):
    return sorted(glob.glob(os.path.join(idx, "postings", "seg=*", "*.parquet")))[0]


def test_detects_wrong_impact_max_tf(spark, corruptible_index):
    p = _postings_file(corruptible_index)
    t = pq.read_table(p).to_pylist()
    t[0]["blocks"][0]["max_tf"] += 7  # impact bound no longer matches tfs
    pq.write_table(pa.Table.from_pylist(t), p)
    rep = _report(spark, corruptible_index)
    assert int(rep["n_violations"].sum()) >= 1
    assert any("max_tf" in v for vs in rep["violations"] for v in vs)


def test_detects_wrong_stated_df(spark, corruptible_index):
    p = _postings_file(corruptible_index)
    t = pq.read_table(p).to_pylist()
    t[1]["df_part"] += 1
    pq.write_table(pa.Table.from_pylist(t), p)
    rep = _report(spark, corruptible_index)
    assert any("stated df" in v for vs in rep["violations"] for v in vs)


def test_survives_out_of_range_docids(spark, corruptible_index):
    """A segment whose postings reference docIDs beyond the docs table must
    be REPORTED, not crash the job: the min_norm impact check indexes the
    norm table by docID and would IndexError on such a segment if it ran
    unguarded (CheckIndex's contract is to survive corrupt input)."""
    p = sorted(glob.glob(os.path.join(
        corruptible_index, "docs", "seg=*", "*.parquet")))[0]
    t = pq.read_table(p)
    pq.write_table(t.slice(0, max(1, len(t) // 2)), p)  # truncate the seg
    rep = _report(spark, corruptible_index)  # must not raise
    assert any(
        "out of segment range" in v for vs in rep["violations"] for v in vs
    )


def test_detects_lying_bloom_sidecar(spark, corruptible_index):
    """A bloom sidecar that rejects stored terms (false negative) would make
    the searcher silently prune a segment that holds real hits — CheckIndex
    must flag it. Zeroing the bitset rejects every term."""
    p = sorted(glob.glob(os.path.join(
        corruptible_index, "bloom", "seg=*", "*.parquet")))[0]
    t = pq.read_table(p).to_pylist()
    t[0]["bits"] = bytes(len(t[0]["bits"]))  # all-zero: admits nothing
    pq.write_table(pa.Table.from_pylist(t), p)
    rep = _report(spark, corruptible_index)
    assert any(
        "bloom" in v and "rejected" in v for vs in rep["violations"] for v in vs
    )


def test_detects_bloom_bit_length_mismatch(spark, corruptible_index):
    p = sorted(glob.glob(os.path.join(
        corruptible_index, "bloom", "seg=*", "*.parquet")))[0]
    t = pq.read_table(p).to_pylist()
    t[0]["bits"] = t[0]["bits"][:-8]  # truncated bitset vs stated m
    pq.write_table(pa.Table.from_pylist(t), p)
    rep = _report(spark, corruptible_index)
    assert any(
        "bloom" in v and "bit-length" in v
        for vs in rep["violations"] for v in vs
    )


def test_detects_norm_table_mismatch(spark, corruptible_index):
    p = sorted(glob.glob(os.path.join(
        corruptible_index, "seg_norms", "seg=*", "*.parquet")))[0]
    t = pq.read_table(p).to_pylist()
    b = bytearray(t[0]["norms"])
    b[0] ^= 0xFF
    t[0]["norms"] = bytes(b)
    pq.write_table(pa.Table.from_pylist(t), p)
    rep = _report(spark, corruptible_index)
    assert any("norm" in v.lower() for vs in rep["violations"] for v in vs)
