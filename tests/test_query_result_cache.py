"""queryResultCache (S/search/SolrIndexSearcher#getDocListC +
queryResultWindowSize): ordered result pages memoized per searcher; a miss
caches the ceil-to-window superset so smaller-k re-asks are pure hits."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_query_result_cache_window_semantics(spark):
    from lucene_solr_spark.engine import get_engine

    s = get_engine(spark, SF, "simple").searcher
    s._query_result_cache.clear()
    s.query_result_cache_stats.update(hits=0, misses=0, evictions=0)

    spec = s.parse("or3", ["vector", "stream", "filter"], 0)
    a = s.cached_topk(spec, k=10)
    assert s.query_result_cache_stats == {"hits": 0, "misses": 1, "evictions": 0}
    assert len(a) == 10

    # same query, smaller AND equal k: served from the cached window
    b = s.cached_topk(spec, k=3)
    c = s.cached_topk(spec, k=10)
    assert s.query_result_cache_stats["hits"] == 2
    assert b == a[:3] and c == a

    # k beyond the cached window: a genuine miss, window re-rounds up
    d = s.cached_topk(spec, k=s.QUERY_RESULT_WINDOW + 1)
    assert s.query_result_cache_stats["misses"] == 2
    assert d[:10] == a

    # the page agrees with the uncached search bitwise
    direct = [
        (int(r.doc_id), r.score)
        for r in s.search(spec, k=10).collect()
    ]
    assert a == direct

    # eviction under the entry budget
    old = s.QUERY_RESULT_CACHE_MAX
    try:
        s.QUERY_RESULT_CACHE_MAX = 1
        s.cached_topk(s.parse("term", ["merge"], 0), k=5)
        assert len(s._query_result_cache) == 1
        assert s.query_result_cache_stats["evictions"] >= 1
    finally:
        s.QUERY_RESULT_CACHE_MAX = old


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_document_cache_hits_and_eviction(spark):
    from lucene_solr_spark.engine import get_engine

    eng = get_engine(spark, SF, "simple")
    if hasattr(eng, "_document_cache"):
        eng._document_cache.clear()
        eng.document_cache_stats.update(hits=0, misses=0, evictions=0)

    a = eng.fetch_stored([1, 2, 3])
    assert set(a) == {1, 2, 3}
    assert eng.document_cache_stats["misses"] == 3
    # repeat + one new key: 3 hits, 1 miss, stored fields stable
    b = eng.fetch_stored([1, 2, 3, 4])
    assert eng.document_cache_stats["hits"] == 3
    assert eng.document_cache_stats["misses"] == 4
    assert all(a[k] == b[k] for k in a)

    # eviction under a tiny budget
    old = eng.DOCUMENT_CACHE_MAX
    try:
        eng.DOCUMENT_CACHE_MAX = 2
        eng.fetch_stored([10, 11, 12])
        assert len(eng._document_cache) <= 2
        assert eng.document_cache_stats["evictions"] >= 1
    finally:
        eng.DOCUMENT_CACHE_MAX = old

    # the decorated page agrees with the source table
    page = eng.topk_fetch("or2", ["window", "batch"], k=5).toPandas()
    import duckdb

    src = duckdb.sql(
        f"SELECT doc_id, source, lang FROM '{os.path.join(SF, 'documents.parquet')}'"
    ).df().set_index("doc_id")
    for r in page.itertuples():
        assert r.source == src.loc[int(r.doc_id), "source"]
        assert r.lang == src.loc[int(r.doc_id), "lang"]
