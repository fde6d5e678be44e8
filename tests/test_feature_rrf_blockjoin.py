"""FeatureField saturation query, ToParentBlockJoin score modes, and
Reciprocal Rank Fusion (``lucene/document/FeatureField.java``,
``lucene/join/.../ToParentBlockJoinQuery.java`` ScoreMode, Solr 9.8
combiner=rrf). The driver gate (tools/check_entry.py) certifies bitwise
oracle parity at sf0.01; these tests pin the cross-operator invariants
the SQL cannot see: leg membership, deterministic fold consistency, and
the saturation bound."""

import math

import pytest

from lucene_solr_spark.engine import get_engine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    return get_engine(spark, SF, "simple")


def test_blockjoin_score_modes_consistent(eng):
    rows = eng.blockjoin_scores("or2", ["dup", "vector"], n_groups=5).collect()
    assert rows, "child query must match at sf0.001"
    for r in rows:
        # Avg * n == Total (both derived from the same double fold)
        assert r.score_avg == pytest.approx(r.score_total / r.n_children, rel=1e-6)
        # max of positive child scores can't exceed their sum
        assert r.score_max <= r.score_total + 1e-6
        assert r.n_children >= 1
    # Max mode agrees with the long-standing ScoreMode.Max entry
    legacy = {
        r.source: (r.parent_score, r.n_children)
        for r in eng.blockjoin_by_source("or2", ["dup", "vector"], n_groups=100).collect()
    }
    for r in rows:
        assert legacy[r.source][0] == r.score_max
        assert legacy[r.source][1] == r.n_children


def test_feature_saturation_bounded_and_additive(eng):
    base = {r.doc_id: r.score for r in eng.topk("or3", ["vector", "stream", "filter"], k=1000, mode="exact").collect()}
    feat = eng.feature_topk("or3", ["vector", "stream", "filter"], pivot=200.0, boost=1.8, k=10).collect()
    assert len(feat) == 10
    for r in feat:
        assert r.doc_id in base
        bump = r.score - base[r.doc_id]
        # saturation term lies in (0, boost): x/(x+pivot) < 1
        assert 0.0 < bump < 1.8 + 1e-5


def test_rrf_membership_and_scores(eng):
    n, k0 = 40, 60
    r1 = {r.doc_id: r.rank for r in eng.topk("or3", ["vector", "stream", "filter"], k=n).collect()}
    r2 = {r.doc_id: r.rank for r in eng.topk("and2", ["merge", "batch"], k=n).collect()}
    fused = eng.rrf_topk("or3", ["vector", "stream", "filter"], "and2", ["merge", "batch"], n=n, k0=k0, k=10).collect()
    assert fused and fused[0].rank == 1
    prev = math.inf
    for r in fused:
        assert r.doc_id in r1 or r.doc_id in r2
        want = (1.0 / (k0 + r1[r.doc_id]) if r.doc_id in r1 else 0.0) + (
            1.0 / (k0 + r2[r.doc_id]) if r.doc_id in r2 else 0.0
        )
        assert r.score == want  # integer ranks: bitwise-exact doubles
        assert r.score <= prev + 1e-18
        prev = r.score
