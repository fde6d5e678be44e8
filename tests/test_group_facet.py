"""group.facet semantics (``S/search/Grouping.java`` grouped faceting):
each bucket counts DISTINCT groups with >=1 matching doc — a group with
many matching docs contributes exactly 1 per bucket."""

from __future__ import annotations

import duckdb
import pytest

from lucene_solr_spark.engine import get_engine

SF = "/root/testdata/sf0.001"
Q = ("and2", ["merge", "batch"])


@pytest.fixture(scope="module")
def engine(spark):
    return get_engine(spark, SF, "simple")


def test_group_counts_bounded_and_distinct(engine):
    gf = {r.bucket: r.cnt for r in
          engine.group_facet(*Q, "source", "lang", limit=100).collect()}
    df = {r.bucket: r.cnt for r in
          engine.facet_on_query(*Q, "lang", limit=100).collect()}
    assert gf, "fixture query must match at sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    n_groups = con.execute(
        "SELECT count(DISTINCT source) FROM documents"
    ).fetchone()[0]
    for bucket, cnt in gf.items():
        # grouped count never exceeds the doc count or the group universe
        assert cnt <= df[bucket]
        assert cnt <= n_groups
    # on this corpus some bucket MUST collapse (docs > groups somewhere),
    # otherwise the test exercises nothing
    assert any(gf[b] < df[b] for b in gf)
