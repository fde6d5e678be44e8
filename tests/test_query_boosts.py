"""boostByQuery (``L/queries/function/FunctionScoreQuery#boostByQuery``)
and ExternalFileField (``S/schema/ExternalFileField``) boost semantics."""

from __future__ import annotations

import pytest

from lucene_solr_spark.engine import get_engine

SF = "/root/testdata/sf0.001"
MAIN = ("or3", ["vector", "stream", "filter"])


@pytest.fixture(scope="module")
def engine(spark):
    return get_engine(spark, SF, "simple")


def test_boost_one_is_identity(engine):
    """b=1 multiplies every score by exactly 1 — bitwise-identical top-k."""
    plain = engine.topk(*MAIN, k=10).collect()
    b1 = engine.boost_by_query_topk(*MAIN, "term", ["spark"], 1.0, k=10).collect()
    assert [(r.rank, r.doc_id, r.score) for r in plain] == [
        (r.rank, r.doc_id, r.score) for r in b1
    ]


def test_boost_query_adds_no_matches(engine):
    """The boost query reorders but never introduces new docs (k=corpus)."""
    plain = {r.doc_id for r in engine.topk(*MAIN, k=10_000).collect()}
    boosted = {
        r.doc_id
        for r in engine.boost_by_query_topk(
            *MAIN, "term", ["spark"], 5.0, k=10_000
        ).collect()
    }
    assert boosted == plain


def test_extfile_changes_order_but_not_matchset(engine):
    q = ("and2", ["merge", "batch"])
    plain = engine.topk(*q, k=10_000).collect()
    ext = engine.external_file_boost_topk(*q, k=10_000).collect()
    assert {r.doc_id for r in plain} == {r.doc_id for r in ext}
    assert [r.doc_id for r in plain] != [r.doc_id for r in ext], (
        "external floats must actually perturb the ranking on this corpus"
    )
