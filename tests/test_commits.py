"""Commit points (``L/index/SegmentInfos`` generations retained
SnapshotDeletionPolicy-style; reader side ``DirectoryReader.open(IndexCommit)``):
a searcher opened at a retained generation returns BITWISE the answers the
live index gave at capture time, across later updates, deletes and appends —
segments pruned to the commit's list, only its tombstone files loaded,
scoring stats bound from the retained tables."""

import pandas as pd
import pytest

from lucene_solr_spark.datagen import generate_queries, generate_transcripts
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.commits import commit_point, list_commits, load_commit
from lucene_solr_spark.index.updates import delete_docs, update_docs
from lucene_solr_spark.search.searcher import IndexSearcher


def _results(spark, index_dir, commit=None, n_queries=12):
    """Full hit sets (keys + f32 scores) for the WAND query suite — k
    unbounded so internal-id tiebreaks can't mask a real difference."""
    s = IndexSearcher(spark, index_dir, commit=commit)
    qs = generate_queries()[:n_queries]
    compiled = s.compile_many({
        f"q{q['query_id']:02d}": (s.parse(q["qtype"], q["terms"], q["min_should"]), 100000)
        for q in qs
    })
    out = s.search_many(compiled, mode="wand")
    return (
        out.join(s.docs.select("doc_id", "conv_id", "turn_idx"), "doc_id")
        .toPandas()[["query_id", "conv_id", "turn_idx", "score"]]
        .sort_values(["query_id", "conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(100)


@pytest.fixture()
def built(spark, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(corpus), idx, n_segments=4)
    return idx


def test_asof_survives_update(spark, corpus, built):
    before = _results(spark, built)
    gen = commit_point(built)

    changed = corpus[corpus.turn_idx == 0].copy()
    changed["text"] = changed["text"] + " merge merge vector refresh"
    update_docs(spark, spark.createDataFrame(changed), built, n_segments=2)

    live = _results(spark, built)
    asof = _results(spark, built, commit=gen)
    # the update genuinely moved the live answers...
    with pytest.raises(AssertionError):
        pd.testing.assert_frame_equal(live, before, check_exact=True)
    # ...while the commit-point view is bitwise the pre-update state
    pd.testing.assert_frame_equal(asof, before, check_exact=True)


def test_asof_survives_delete(spark, corpus, built):
    before = _results(spark, built)
    gen = commit_point(built)

    victims = corpus[corpus.conv_id.isin(corpus.conv_id.unique()[:10])]
    n = delete_docs(
        spark, built, spark.createDataFrame(victims[["conv_id", "turn_idx"]])
    )
    assert n > 0

    asof = _results(spark, built, commit=gen)
    pd.testing.assert_frame_equal(asof, before, check_exact=True)
    # live view lost the victims
    live_keys = set(map(tuple, _results(spark, built)[["conv_id", "turn_idx"]].values))
    assert not live_keys & set(map(tuple, victims[["conv_id", "turn_idx"]].values))


def test_two_generations_are_independent(spark, corpus, built):
    gen1 = commit_point(built)

    changed = corpus[corpus.turn_idx == 1].copy()
    changed["text"] = changed["text"] + " vector vector stream"
    update_docs(spark, spark.createDataFrame(changed), built, n_segments=2)
    mid = _results(spark, built)
    gen2 = commit_point(built)

    victims = corpus[corpus.conv_id.isin(corpus.conv_id.unique()[:5])]
    delete_docs(spark, built, spark.createDataFrame(victims[["conv_id", "turn_idx"]]))

    assert list_commits(built) == [gen1, gen2]
    # gen2 pins the between-mutations state: sees the update, not the delete
    pd.testing.assert_frame_equal(
        _results(spark, built, commit=gen2), mid, check_exact=True
    )
    # gen2 records MORE live segments than gen1 (the update appended some)
    assert set(load_commit(built, gen1).segs) < set(load_commit(built, gen2).segs)


def test_missing_generation_raises(spark, built):
    with pytest.raises(FileNotFoundError):
        IndexSearcher(spark, built, commit=99)


def test_crashed_commit_is_invisible(spark, corpus, built):
    """The info row is the LAST write — a capture that dies after copying
    stats but before writing it must leave no visible generation, and the
    next commit_point simply claims the next number (2-phase-commit
    contract of segments_N)."""
    import os

    gen = commit_point(built)
    # simulate a crash mid-capture: gen+1 dir with retained stats but no info
    crashed = os.path.join(built, "commits", f"gen={gen + 1}")
    os.makedirs(os.path.join(crashed, "stats"), exist_ok=True)
    assert list_commits(built) == [gen]
    before = _results(spark, built, commit=gen)
    gen2 = commit_point(built)
    assert gen2 == gen + 1  # the orphan dir is claimed, not skipped forever
    pd.testing.assert_frame_equal(
        _results(spark, built, commit=gen2), before, check_exact=True
    )


def test_asof_frozen_under_streaming_appends(spark, corpus, built):
    """NRT composition: a commit point captured between incremental
    ``append_batch`` micro-batches stays bitwise frozen while the live
    reader sees each batch — stats refresh rewrites docCount/avgdl/df in
    place, so only the retained stats tables can answer this correctly."""
    from lucene_solr_spark.index.build import append_batch

    more = generate_transcripts(40)
    more = more.assign(conv_id="app-" + more.conv_id)
    halves = [more[more.turn_idx % 2 == 0], more[more.turn_idx % 2 == 1]]

    append_batch(spark, spark.createDataFrame(halves[0]), built, n_segments=2)
    mid = _results(spark, built)
    gen = commit_point(built)
    append_batch(spark, spark.createDataFrame(halves[1]), built, n_segments=2)

    live = _results(spark, built)
    assert len(live) > len(mid)  # the second batch genuinely landed
    pd.testing.assert_frame_equal(
        _results(spark, built, commit=gen), mid, check_exact=True
    )


def _apply_update(spark, corpus, idx):
    changed = corpus[corpus.turn_idx == 0].copy()
    changed["text"] = changed["text"] + " merge merge vector refresh"
    update_docs(spark, spark.createDataFrame(changed), idx, n_segments=2)


def test_rollback_then_replay_is_bitwise(spark, corpus, built):
    """rollback_to restores the LIVE index to the generation bitwise
    (IndexWriter#rollback + IndexFileDeleter), and the freed segment ids
    are genuinely reusable: replaying the SAME update after the rollback
    reproduces the pre-rollback post-update answers exactly."""
    from lucene_solr_spark.index.commits import rollback_to

    before = _results(spark, built)
    gen = commit_point(built)
    _apply_update(spark, corpus, built)
    after_update = _results(spark, built)

    rollback_to(built, gen)
    pd.testing.assert_frame_equal(_results(spark, built), before, check_exact=True)
    assert list_commits(built) == [gen]

    _apply_update(spark, corpus, built)  # replay over the reused seg ids
    pd.testing.assert_frame_equal(
        _results(spark, built), after_update, check_exact=True
    )
