"""BM25 unit cases — TestBM25Similarity-style (SURVEY.md §5.2-3, FIXTURES §4):
hand-computed idf/score, Lucene-8 semantics (NO (k1+1) numerator), float32
discipline, norm decode through the SmallFloat table."""

import math

import numpy as np

from lucene_solr_spark.search.bm25 import (
    CollectionStats,
    block_max_score,
    idf,
    norm_cache,
    score_postings,
    sum_scores_f32,
)
from lucene_solr_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4


def ref_score(tf, norm_byte, doc_freq, doc_count, sum_ttf, k1=1.2, b=0.75, boost=1.0):
    """Straight-line float32 re-derivation used as the hand-check."""
    w = np.float32(boost) * np.float32(math.log(1 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))
    avgdl = np.float32(sum_ttf / float(doc_count))
    dl = np.float32(LENGTH_TABLE[norm_byte])
    cache = np.float32(k1) * ((np.float32(1) - np.float32(b)) + np.float32(b) * dl / avgdl)
    return np.float32(w * np.float32(float(tf) / (float(tf) + float(cache))))


def test_idf_values():
    # n == N → idf = ln(1 + 0.5/(N+0.5)) small but positive
    assert idf(10, 10) == np.float32(math.log(1 + 0.5 / 10.5))
    assert idf(1, 1000) == np.float32(math.log(1 + 999.5 / 1.5))
    assert idf(1, 1) > 0


def test_score_matches_hand_computation():
    cases = [
        # (tf, length, df, N, sum_ttf)
        (1, 4, 3, 100, 1200),
        (5, 10, 50, 100, 1200),
        (2, 23, 1, 100, 1200),    # max exact length
        (7, 1000, 99, 100, 120000),  # bucketed length
        (1, 0, 100, 100, 500),    # n == N edge
        (100, 3, 2, 7, 50),
    ]
    stats_cache = {}
    for tf, length, df, N, sttf in cases:
        nb = int_to_byte4(length)
        key = (N, sttf)
        if key not in stats_cache:
            stats_cache[key] = norm_cache(CollectionStats(N, sttf).avgdl)
        cache = stats_cache[key]
        w = idf(df, N)
        got = score_postings(np.array([tf]), np.array([nb]), w, cache)[0]
        assert got == ref_score(tf, nb, df, N, sttf), (tf, length, df, N, sttf)
        assert got.dtype == np.float32
        assert np.isfinite(got) and got >= 0


def test_monotonicity():
    cache = norm_cache(CollectionStats(1000, 12000).avgdl)
    w = idf(10, 1000)
    tfs = np.arange(1, 50)
    s = score_postings(tfs, np.full(len(tfs), 20), w, cache)
    assert np.all(np.diff(s) >= 0)  # ↑ tf
    norms = np.arange(0, 256)
    s2 = score_postings(np.full(256, 3), norms, w, cache)
    assert np.all(np.diff(s2) <= 0)  # ↓ length


def test_no_k1_plus_1_factor():
    # Lucene 8: score → idf * tf/(tf+cache), NOT idf*(k1+1)*...
    # With tf→∞ score saturates at weight (not weight*(k1+1)).
    cache = norm_cache(CollectionStats(100, 1000).avgdl)
    w = idf(5, 100)
    s = score_postings(np.array([10**9]), np.array([10]), w, cache)[0]
    assert abs(float(s) - float(w)) < 1e-6 * float(w)


def test_block_max_dominates():
    cache = norm_cache(CollectionStats(500, 9000).avgdl)
    w = idf(25, 500)
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 30, 200)
    norms = rng.integers(0, 256, 200)
    bound = block_max_score(int(tfs.max()), int(norms.min()), w, cache)
    scores = score_postings(tfs, norms, w, cache)
    assert float(scores.max()) <= float(bound) + 1e-7


def test_sum_scores_float32_cast():
    a = np.array([0.1, 0.2], dtype=np.float32)
    b = np.array([0.3, 0.4], dtype=np.float32)
    out = sum_scores_f32([a, b])
    assert out.dtype == np.float32
    np.testing.assert_array_equal(
        out, (a.astype(np.float64) + b.astype(np.float64)).astype(np.float32)
    )
