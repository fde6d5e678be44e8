"""Query-time join (``lucene/join/.../JoinUtil.java`` / Solr JoinQParser).

ScoreMode.None: the gathered from-values become ONE weight-0 disjunctive
FILTER clause (or_group) over keyword-field posting lists — matching must
equal a post-hoc restriction to the value set, scores must be unchanged
(non-scoring invariant), and WAND must stay rank-identical to exact.
ScoreMode.Max: every doc in a join-key group scores the group's max inner
score (f32 max — order-independent, bitwise-checkable against pandas).
"""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.datagen import generate_transcripts
from lucene_solr_spark.index.build import build_index, keyword_term
from lucene_solr_spark.search.query import OrGroupClause
from lucene_solr_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def kw_index(spark, tmp_path_factory):
    pdf = generate_transcripts(80)
    idx = str(tmp_path_factory.mktemp("joinidx") / "idx")
    build_index(
        spark, spark.createDataFrame(pdf), idx, n_segments=3,
        keyword_cols=("role",),
    )
    return idx, pdf


def _or_filter_spec(s, roles):
    spec = s.parse("or3", ["merge", "batch", "stream"], 0)
    spec.filter.append(OrGroupClause(
        tuple(keyword_term("role", r) for r in roles)
    ))
    return spec


def test_or_group_filter_matches_posthoc_restriction(spark, kw_index):
    idx, _ = kw_index
    s = IndexSearcher(spark, idx)
    base = s.parse("or3", ["merge", "batch", "stream"], 0)
    all_hits = (
        s.search(base, k=10**6, with_keys=True)
        .join(s.docs.select("doc_id", "role"), "doc_id")
        .toPandas()
    )
    roles = ("user", "assistant")
    want = (
        all_hits[all_hits.role.isin(roles)]
        .sort_values(["score", "doc_id"], ascending=[False, True],
                     kind="mergesort")
        .head(15)[["doc_id", "score"]]
        .reset_index(drop=True)
    )
    got = s.search(_or_filter_spec(s, roles), k=15).toPandas()[["doc_id", "score"]]
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_or_group_filter_wand_equals_exact(spark, kw_index):
    idx, _ = kw_index
    s = IndexSearcher(spark, idx)
    spec = _or_filter_spec(s, ("user", "assistant"))
    w = s.search(spec, k=15, mode="wand").toPandas()
    e = s.search(spec, k=15, mode="exact").toPandas()
    np.testing.assert_array_equal(w.doc_id.to_numpy(), e.doc_id.to_numpy())
    np.testing.assert_array_equal(
        w.score.to_numpy().astype(np.float32),
        e.score.to_numpy().astype(np.float32),
    )


def test_empty_join_set_matches_nothing(spark, kw_index):
    # JoinUtil returns a no-match query for an empty from-term set: an
    # OrGroup filter with no live members compiles to the impossible query
    idx, _ = kw_index
    s = IndexSearcher(spark, idx)
    spec = s.parse("or3", ["merge", "batch", "stream"], 0)
    spec.filter.append(OrGroupClause(()))
    assert s.search(spec, k=15).count() == 0
    spec2 = s.parse("or3", ["merge", "batch", "stream"], 0)
    spec2.filter.append(OrGroupClause((keyword_term("role", "nosuchrole"),)))
    assert s.search(spec2, k=15).count() == 0


def test_join_filter_engine_matches_pandas_reference(spark):
    from lucene_solr_spark.engine import get_engine

    eng = get_engine(spark, "/root/testdata/sf0.001", "simple")
    s = eng.searcher
    # reference: outer all-hits restricted to sources of inner matches
    inner_hits = s.hits(s.compile(s.parse("and2", ["dup", "merge"], 0),
                                  k=1 << 30), mode="exact")
    src = (
        inner_hits.join(s.docs.select("doc_id", "source"), "doc_id")
        .select("source").distinct().toPandas()["source"]
    )
    outer = (
        s.search(s.parse("or3", ["vector", "stream", "filter"], 0),
                 k=10**6, with_keys=True)
        .join(s.docs.select("doc_id", "source"), "doc_id")
        .toPandas()
    )
    want = (
        outer[outer.source.isin(set(src))]
        .sort_values(["score", "doc_key"], ascending=[False, True],
                     kind="mergesort")
        .head(10)["doc_key"].to_numpy()
    )
    got = eng.join_filter_topk(
        "or3", ["vector", "stream", "filter"], "and2", ["dup", "merge"], k=10
    ).toPandas()
    np.testing.assert_array_equal(got.doc_id.to_numpy(), want)


def test_join_score_engine_matches_pandas_reference(spark):
    from lucene_solr_spark.engine import get_engine

    eng = get_engine(spark, "/root/testdata/sf0.001", "simple")
    s = eng.searcher
    inner_hits = (
        s.hits(s.compile(s.parse("and2", ["dup", "merge"], 0), k=1 << 30),
               mode="exact")
        .join(s.docs.select("doc_id", "source"), "doc_id")
        .toPandas()
    )
    key_max = inner_hits.groupby("source")["score"].max()
    docs = s.docs.select("doc_key", "source").toPandas()
    joined = docs[docs.source.isin(key_max.index)].copy()
    joined["score"] = joined.source.map(key_max).astype(np.float32)
    want = (
        joined.sort_values(["score", "doc_key"], ascending=[False, True],
                           kind="mergesort")
        .head(10)[["doc_key", "score"]].reset_index(drop=True)
    )
    got = eng.join_score_topk("and2", ["dup", "merge"], k=10).toPandas()
    np.testing.assert_array_equal(got.doc_id.to_numpy(), want.doc_key.to_numpy())
    np.testing.assert_array_equal(
        got.score.to_numpy().astype(np.float32), want.score.to_numpy()
    )
