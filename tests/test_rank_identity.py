"""THE rank-identity gate (BASELINE.md): on the 50-query reference set, the
engine (WAND path AND exact path) must return top-k docIDs and float32 scores
identical to the spec-exact brute-force oracle. Pruning must never change
results vs brute force (TestWANDScorer-style equality)."""

import numpy as np
import pytest

from lucene_solr_spark.datagen import generate_queries
from lucene_solr_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    index_dir, _ = small_index
    return IndexSearcher(spark, index_dir)


@pytest.fixture(scope="module")
def compiled_set(searcher):
    qs = generate_queries()
    out = {}
    for q in qs:
        spec = searcher.parse(q["qtype"], q["terms"], q["min_should"])
        out[f"q{q['query_id']:02d}"] = (q, searcher.compile(spec, q["k"]))
    return out


def _golden(oracle, searcher, q):
    spec = searcher.parse(q["qtype"], q["terms"], q["min_should"])
    return oracle.search(spec, q["k"])


@pytest.mark.parametrize("mode", ["wand", "exact"])
def test_rank_identity_all_queries(spark, searcher, oracle, compiled_set, mode):
    compiled = {qid: cq for qid, (_, cq) in compiled_set.items()}
    got = searcher.search_many(compiled, mode=mode).toPandas()
    n_nonempty = 0
    for qid, (q, _) in compiled_set.items():
        golden = _golden(oracle, searcher, q)
        sub = got[got.query_id == qid].sort_values("rank").reset_index(drop=True)
        assert len(sub) == len(golden), f"{qid} ({q['qtype']} {q['terms']}): {len(sub)} vs {len(golden)}"
        if len(golden) == 0:
            continue
        n_nonempty += 1
        np.testing.assert_array_equal(
            sub.doc_id.to_numpy(), golden.doc_id.to_numpy(),
            err_msg=f"{qid} ({q['qtype']} {q['terms']}) docIDs differ [{mode}]",
        )
        np.testing.assert_array_equal(
            sub.score.to_numpy().astype(np.float32),
            golden.score.to_numpy().astype(np.float32),
            err_msg=f"{qid} scores differ [{mode}]",
        )
    assert n_nonempty >= 35, "fixture should produce mostly non-empty queries"


def test_single_query_api_with_keys(searcher, oracle):
    spec = searcher.parse("or2", ["error", "spark"])
    got = searcher.search(spec, k=5, with_keys=True).toPandas()
    golden = _golden(oracle, searcher, {"qtype": "or2", "terms": ["error", "spark"], "min_should": 0, "k": 5})
    np.testing.assert_array_equal(got.doc_id.to_numpy(), golden.doc_id.to_numpy())
    assert list(got.columns) == ["doc_id", "score", "conv_id", "turn_idx", "rank"]
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]


def test_empty_after_analysis(searcher):
    spec = searcher.parse("term", ["the"])  # stopword-only
    assert searcher.search(spec, k=10).count() == 0


def test_absent_term(searcher):
    spec = searcher.parse("term", ["zzzabsentterm"])
    assert searcher.search(spec, k=10).count() == 0


def test_must_with_absent_term_matches_nothing(searcher):
    spec = searcher.parse("and2", ["error", "zzzabsentterm"])
    assert searcher.search(spec, k=10).count() == 0
