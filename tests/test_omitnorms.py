"""omitNorms scoring (``L/document/FieldType#setOmitNorms``): with the
norms producer absent, every doc scores through the constant norm-cache
entry for decoded length 1, so a single-term ranking depends on tf ONLY —
doc length must not matter."""

from __future__ import annotations

import duckdb
import pytest

from lucene_solr_spark.engine import get_engine
from lucene_solr_spark.oracles import base_ctes

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark):
    return get_engine(spark, SF, "simple")


def test_single_term_ranking_is_tf_only(engine):
    rows = engine.omitnorms_topk("term", ["merge"], k=10).collect()
    assert rows
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(
        f"""WITH {base_ctes('simple')}
        SELECT doc_id FROM kept WHERE term = 'merge'
        GROUP BY doc_id ORDER BY count(*) DESC, doc_id ASC LIMIT 10"""
    ).fetchall()
    assert [r.doc_id for r in rows] == [w[0] for w in want]
    # equal tf ⇒ bitwise-equal score (no length term left in the formula)
    tf = dict(con.execute(
        f"""WITH {base_ctes('simple')}
        SELECT doc_id, count(*) FROM kept WHERE term = 'merge' GROUP BY 1"""
    ).fetchall())
    by_tf: dict[int, set[float]] = {}
    for r in rows:
        by_tf.setdefault(tf[r.doc_id], set()).add(r.score)
    for scores in by_tf.values():
        assert len(scores) == 1


def test_differs_from_normed_bm25(engine):
    om = [r.doc_id for r in engine.omitnorms_topk("or3", ["vector", "stream", "filter"], k=10).collect()]
    bm = [r.doc_id for r in engine.topk("or3", ["vector", "stream", "filter"], k=10).collect()]
    assert om != bm, "length norm must change the ranking on this corpus"
