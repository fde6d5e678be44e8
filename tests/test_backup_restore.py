"""Backup/restore (Solr's replication/backup handler analog, simplified by
this engine's storage model): a committed index is IMMUTABLE FILES plus a
manifest commit marker, so backup = file-level copy and restore = point the
searcher at the copy — no hot-copy protocol, no tlog replay. The test pins
the property that makes that true: a copied index passes CheckIndex clean
and answers every query byte-identically, and mutating the ORIGINAL after
the backup (delete-by-query) never leaks into the backup."""

import shutil

import pandas as pd

from lucene_solr_spark.datagen import generate_queries, generate_transcripts
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.check import check_index
from lucene_solr_spark.search.searcher import IndexSearcher


def _results(spark, index_dir, n_queries=8):
    s = IndexSearcher(spark, index_dir)
    qs = generate_queries()[:n_queries]
    compiled = s.compile_many({
        f"q{q['query_id']:02d}": (s.parse(q["qtype"], q["terms"], q["min_should"]), 20)
        for q in qs
    })
    return (
        s.search_many(compiled, mode="wand")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_backup_is_restorable_and_isolated(spark, tmp_path):
    corpus = generate_transcripts(80)
    src = str(tmp_path / "live")
    bak = str(tmp_path / "backup")
    build_index(spark, spark.createDataFrame(corpus), src, n_segments=4)

    before = _results(spark, src)
    shutil.copytree(src, bak)

    # the backup is a valid, clean index answering identically
    report = check_index(spark, bak).toPandas()
    assert (report["n_violations"] == 0).all()
    pd.testing.assert_frame_equal(_results(spark, bak), before, check_exact=True)

    # mutate the LIVE index after the backup — the backup must not change
    from lucene_solr_spark.index.updates import delete_by_query_hits

    s = IndexSearcher(spark, src)
    q = s.compile(s.parse("term", ["merge"]), k=1 << 30)
    n_del = delete_by_query_hits(spark, src, s.hits(q, mode="exact"))
    assert n_del > 0
    after_live = _results(spark, src)
    assert not after_live.equals(before)  # the live index really changed
    pd.testing.assert_frame_equal(_results(spark, bak), before, check_exact=True)
