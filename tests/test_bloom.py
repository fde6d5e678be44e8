"""Per-segment term bloom sidecar (BloomFilteringPostingsFormat analog —
``lucene/codecs/bloom/BloomFilteringPostingsFormat.java``): the build kernel
writes a bloom over each segment's dictionary; the searcher prunes whole
segments whose blooms reject every scoring term. Pruning must NEVER change
results (false negatives impossible), only skip provably-empty kernels."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.index.bloom import bloom_admits, bloom_build
from lucene_solr_spark.search.searcher import IndexSearcher

SENTINEL = "zzzuniquemarker"


def test_no_false_negatives_and_low_fp():
    terms = [f"t{i:05d}" for i in range(20000)]
    m, bits = bloom_build(terms)
    assert bloom_admits(bits, m, terms).all()  # membership is guaranteed
    fp = bloom_admits(bits, m, [f"absent{i}" for i in range(10000)]).mean()
    assert fp < 0.02  # ~10 bits/key, k=7 → ≈0.8% expected


def test_sidecar_written_per_segment(small_index):
    index_dir, manifest = small_index
    for seg in manifest["seg"]:
        assert os.path.isdir(os.path.join(index_dir, "bloom", f"seg={int(seg)}"))


def test_segment_blooms_admit_their_whole_dictionary(spark, small_index):
    """Exhaustive: every indexed term must be admitted by its own segment's
    bloom — the invariant that makes pruning result-safe."""
    index_dir, _ = small_index
    import pyarrow.parquet as pq

    posts = spark.read.parquet(os.path.join(index_dir, "postings"))
    for row in posts.groupBy("seg").agg({"term": "collect_set"}).collect():
        seg, terms = int(row[0]), sorted(row[1])
        t = pq.read_table(os.path.join(index_dir, "bloom", f"seg={seg}", "part-0.parquet"))
        m, bits = int(t["m"][0].as_py()), t["bits"][0].as_py()
        assert bloom_admits(bits, m, terms).all(), f"false negative in seg {seg}"


@pytest.fixture(scope="module")
def sentinel_index(spark, tmp_path_factory):
    """4-segment index where SENTINEL occurs in exactly one conversation —
    so exactly one segment's dictionary contains it."""
    from lucene_solr_spark.datagen import generate_transcripts
    from lucene_solr_spark.index.build import build_index

    pdf = generate_transcripts(120)
    pdf = pdf.copy()
    first = pdf.index[pdf.conv_id == pdf.conv_id.iloc[0]][0]
    pdf.loc[first, "text"] = pdf.loc[first, "text"] + f" {SENTINEL}"
    index_dir = str(tmp_path_factory.mktemp("bloomidx") / "idx")
    build_index(spark, spark.createDataFrame(pdf), index_dir, n_segments=4)
    return index_dir


def _searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


def test_prunes_to_containing_segments(spark, sentinel_index):
    s = _searcher(spark, sentinel_index)
    term = s.analyzer.analyze(SENTINEL)[0][0]
    live = s.bloom_live_segs([term])
    posts = spark.read.parquet(os.path.join(sentinel_index, "postings"))
    true_segs = {
        int(r.seg) for r in posts.filter(posts.term == term).select("seg").distinct().collect()
    }
    assert live is not None and true_segs <= set(live)  # never prunes a real hit
    assert len(live) < 4  # and actually prunes something for a 1-segment term


def test_search_identical_with_and_without_sidecar(spark, sentinel_index, tmp_path):
    """Bitwise top-k identity: bloom pruning on vs sidecar removed."""
    s1 = _searcher(spark, sentinel_index)
    term = s1.analyzer.analyze(SENTINEL)[0][0]
    spec = s1.parse("or2", [SENTINEL, "merge batch"])
    a = s1.search(spec, k=10).toPandas()
    # copy the index without the bloom dir → the fallback (admit-all) path
    clone = str(tmp_path / "noBloom")
    shutil.copytree(sentinel_index, clone)
    shutil.rmtree(os.path.join(clone, "bloom"))
    s2 = _searcher(spark, clone)
    assert s2.bloom_live_segs([term]) is None
    b = s2.search(spec, k=10).toPandas()
    np.testing.assert_array_equal(a.doc_id.to_numpy(), b.doc_id.to_numpy())
    np.testing.assert_array_equal(
        a.score.to_numpy().astype(np.float32), b.score.to_numpy().astype(np.float32)
    )


def test_distributed_probe_path_agrees(spark, sentinel_index, monkeypatch):
    """Above the driver budget the admit test runs as a mapInPandas job —
    same live set, bits never collected."""
    import lucene_solr_spark.search.searcher as searcher_mod

    s_drv = _searcher(spark, sentinel_index)
    term = s_drv.analyzer.analyze(SENTINEL)[0][0]
    want = s_drv.bloom_live_segs([term])
    monkeypatch.setattr(searcher_mod, "BLOOM_DRIVER_BUDGET", 0)
    s_dist = _searcher(spark, sentinel_index)
    assert s_dist._bloom_driver is None
    assert s_dist.bloom_live_segs([term]) == want


def test_absent_term_prunes_everything_and_returns_empty(spark, sentinel_index):
    s = _searcher(spark, sentinel_index)
    live = s.bloom_live_segs(["qqqneverindexedzz"])
    assert live == []  # deterministic for this corpus (verified fp-free)
    out = s.search(s.parse("term", ["qqqneverindexedzz"]), k=10).toPandas()
    assert len(out) == 0


def test_merge_rebuilds_blooms(spark, sentinel_index, tmp_path):
    """Merged segments get fresh blooms over their UNION dictionaries, and
    search stays identical (rank + f32 score) across the merge."""
    from lucene_solr_spark.index.merge import merge_segments

    dst = str(tmp_path / "merged")
    merge_segments(spark, sentinel_index, dst, n_out=2)
    s0 = _searcher(spark, sentinel_index)
    s1 = _searcher(spark, dst)
    term = s1.analyzer.analyze(SENTINEL)[0][0]
    assert os.path.isdir(os.path.join(dst, "bloom"))
    live = s1.bloom_live_segs([term])
    assert live is not None and len(live) >= 1
    spec0 = s0.parse("or2", [SENTINEL, "merge batch"])
    a = s0.search(spec0, k=10).toPandas()
    b = s1.search(s1.parse("or2", [SENTINEL, "merge batch"]), k=10).toPandas()
    pd.testing.assert_frame_equal(
        a[["score"]].astype("float32"), b[["score"]].astype("float32")
    )


def test_partition_pruning_in_plan(spark, sentinel_index):
    """The live-seg filter reaches the scan as a partition filter on the
    seg= directory layout — files of pruned segments are never opened."""
    from pyspark.sql import functions as F

    s = _searcher(spark, sentinel_index)
    term = s.analyzer.analyze(SENTINEL)[0][0]
    live = s.bloom_live_segs([term])
    pruned = (
        s.postings.filter(F.col("term").isin([term]))
        .filter(F.col("seg").isin(live))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "seg" in plan.split("PartitionFilters")[1][:200]
