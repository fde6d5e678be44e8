"""filterCache (S/search/SolrIndexSearcher#getDocSet): fq DocSets are
memoized per searcher under an LRU entry+id budget; a repeated fq is a
cache hit; restriction semantics match the posting-list FILTER path."""

import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_fq_cache_hit_and_semantics(spark):
    from lucene_solr_spark.engine import get_engine

    eng = get_engine(spark, SF, "simple")
    s = eng.searcher
    s._filter_cache.clear()
    s._filter_cache_ids = 0
    s.filter_cache_stats.update(hits=0, misses=0, evictions=0)

    a = eng.fq_topk("or3", ["vector", "stream", "filter"],
                    "or2", ["merge", "dup"], k=10).toPandas()
    assert s.filter_cache_stats == {"hits": 0, "misses": 1, "evictions": 0}
    b = eng.fq_topk("or3", ["vector", "stream", "filter"],
                    "or2", ["merge", "dup"], k=10).toPandas()
    assert s.filter_cache_stats["hits"] == 1
    assert a.equals(b)

    # every returned doc matches the fq (restriction), scores unchanged
    # vs the unfiltered query for the surviving docs
    fq_docs = {
        int(r.doc_id)
        for r in s.hits(
            s.compile(s.parse("or2", ["merge", "dup"], 0), k=1 << 30),
            mode="exact",
        ).collect()
    }
    keymap = {int(r.doc_key): int(r.doc_id)
              for r in s.docs.select("doc_key", "doc_id").collect()}
    assert all(keymap[int(d)] in fq_docs for d in a.doc_id)
    full = eng.topk("or3", ["vector", "stream", "filter"], k=1000).toPandas()
    fmap = {int(r.doc_id): np.float32(r.score) for r in full.itertuples()}
    assert all(np.float32(r.score) == fmap[int(r.doc_id)] for r in a.itertuples())

    # eviction: shrink the budget and push entries through
    old = s.FILTER_CACHE_MAX_ENTRIES
    try:
        s.FILTER_CACHE_MAX_ENTRIES = 2
        for t in ("merge", "dup", "batch"):
            s.filter_docset(s.parse("term", [t], 0))
        assert len(s._filter_cache) <= 2
        assert s.filter_cache_stats["evictions"] >= 1
        # total-id accounting stays consistent with what's retained
        assert s._filter_cache_ids == sum(
            sum(len(v) for v in e.values()) for e in s._filter_cache.values()
        )
    finally:
        s.FILTER_CACHE_MAX_ENTRIES = old
