"""Unit gates for the SimilarityBase family (DFR IN/L/H2, IB LL/DF/H2,
LMJelinekMercer λ=0.7): hand-computed reference scores, monotonicity, WAND
block-bound dominance, and clamp-at-zero — mirroring the published formulas
(``L/search/similarities/DFRSimilarity.java``, ``IBSimilarity.java``,
``LMJelinekMercerSimilarity.java``; SimilarityBase double-math discipline)."""

import math

import numpy as np
import pytest

from lucene_solr_spark.search.bm25 import (
    block_max_score_docsonly,
    score_postings_docsonly,
    norm_cache,
    F2EXP_K,
    F2EXP_S,
    LMJM_LAMBDA,
    block_max_score_dfi,
    block_max_score_dfr,
    block_max_score_f2exp,
    block_max_score_ib,
    block_max_score_lmjm,
    dfr_h2_cache,
    f2exp_norm_cache,
    lmjm_norm_cache,
    score_postings_dfi,
    score_postings_dfr,
    score_postings_f2exp,
    score_postings_ib,
    score_postings_lmjm,
)
from lucene_solr_spark.util.smallfloat import LENGTH_TABLE

AVGDL = 11.37
N_DOCS = 1000


def _tfn(tf, b, c=1.0):
    dl = float(LENGTH_TABLE[b])
    return float(tf) * math.log2(1.0 + (c * float(np.float32(AVGDL))) / dl)


def test_dfr_hand_computed():
    cache = dfr_h2_cache(AVGDL)
    df = 37
    aux = math.log2((N_DOCS + 1.0) / (df + 0.5))
    for tf, b in [(1, 40), (3, 100), (17, 200)]:
        tfn = _tfn(tf, b)
        want = np.float32(max(1.0 * aux * (tfn / (1.0 + tfn)), 0.0))
        got = score_postings_dfr(
            np.array([tf]), np.array([b]), np.float32(1.0), cache, aux
        )[0]
        assert got == want


def test_ib_hand_computed():
    cache = dfr_h2_cache(AVGDL)
    df = 37
    lam = (df + 1.0) / (N_DOCS + 1.0)
    for tf, b in [(1, 40), (3, 100), (17, 200)]:
        tfn = _tfn(tf, b)
        want = np.float32(max(1.0 * math.log((tfn + lam) / lam), 0.0))
        got = score_postings_ib(
            np.array([tf]), np.array([b]), np.float32(1.0), cache, lam
        )[0]
        assert got == want


def test_lmjm_hand_computed():
    cache = lmjm_norm_cache()
    cp = np.float32((123.0 + 1.0) / (50_000.0 + 1.0))
    aux = LMJM_LAMBDA * float(cp)
    for tf, b in [(1, 40), (3, 100), (17, 200)]:
        dl = float(LENGTH_TABLE[b])
        want = np.float32(
            max(1.0 * math.log(1.0 + ((1.0 - LMJM_LAMBDA) * tf / dl) / aux), 0.0)
        )
        got = score_postings_lmjm(
            np.array([tf]), np.array([b]), np.float32(1.0), cache, aux
        )[0]
        assert got == want


def test_f2exp_hand_computed():
    """AxiomaticF2EXP (Fang & Zhai 2005; L/search/similarities/
    AxiomaticF2EXP.java): score = ((N+1)/df)^0.35 · tf/(tf + s + s·dl/avgdl),
    s = 0.5 — hand-recomputed from the published formula."""
    cache = f2exp_norm_cache(AVGDL)
    df = 37
    aux = ((N_DOCS + 1.0) / df) ** F2EXP_K
    for tf, b in [(1, 40), (3, 100), (17, 200)]:
        dl = float(LENGTH_TABLE[b])
        addend = F2EXP_S + (F2EXP_S * dl) / float(np.float32(AVGDL))
        want = np.float32(max(1.0 * aux * (tf / (tf + addend)), 0.0))
        got = score_postings_f2exp(
            np.array([tf]), np.array([b]), np.float32(1.0), cache, aux
        )[0]
        assert got == want


def test_dfi_hand_computed_and_gate():
    """DFISimilarity / IndependenceStandardized (L/search/similarities/
    DFISimilarity.java): expected = ((ttf+1)/(sumTtf+1))·dl; freq at or
    below expected carries no information (score exactly 0); above it,
    score = boost · log2((freq−expected)/sqrt(expected) + 1)."""
    cache = lmjm_norm_cache()  # decoded-length table, shared with LMJM
    aux = (123.0 + 1.0) / (50_000.0 + 1.0)
    for tf, b in [(1, 40), (3, 100), (17, 200)]:
        dl = float(LENGTH_TABLE[b])
        expected = aux * dl
        if tf <= expected:
            want = np.float32(0.0)
        else:
            want = np.float32(
                1.0 * math.log2((tf - expected) / math.sqrt(expected) + 1.0)
            )
        got = score_postings_dfi(
            np.array([tf]), np.array([b]), np.float32(1.0), cache, aux
        )[0]
        assert got == want
    # the gate: a huge collection ratio makes every freq sub-expected → 0
    gated = score_postings_dfi(
        np.array([1, 2, 3]), np.array([250] * 3), np.float32(1.0), cache, 0.9
    )
    assert (gated == np.float32(0.0)).all()
    assert block_max_score_dfi(3, 250, np.float32(1.0), cache, 0.9) == np.float32(0.0)


@pytest.mark.parametrize(
    "score_fn,bound_fn,cache_fn,aux",
    [
        (score_postings_dfr, block_max_score_dfr, lambda: dfr_h2_cache(AVGDL), 3.1),
        (score_postings_dfi, block_max_score_dfi, lmjm_norm_cache, 0.002),
        (score_postings_ib, block_max_score_ib, lambda: dfr_h2_cache(AVGDL), 0.038),
        (score_postings_lmjm, block_max_score_lmjm, lmjm_norm_cache, 0.7 * 0.002),
        (score_postings_f2exp, block_max_score_f2exp,
         lambda: f2exp_norm_cache(AVGDL), 11.2 ** 0.35),
        (score_postings_docsonly, block_max_score_docsonly,
         lambda: norm_cache(AVGDL), 0.0),
    ],
)
def test_block_bound_dominates(score_fn, bound_fn, cache_fn, aux):
    """The (max_tf, min_norm) block bound must upper-bound EVERY (tf, norm)
    combination in the block — the WAND safety invariant."""
    rng = np.random.default_rng(7)
    cache = cache_fn()
    for _ in range(50):
        tfs = rng.integers(1, 30, size=16)
        bs = rng.integers(1, 255, size=16)
        scores = score_fn(tfs, bs, np.float32(1.0), cache, aux)
        bound = bound_fn(int(tfs.max()), int(bs.min()), np.float32(1.0), cache, aux)
        assert (scores <= bound + np.float32(0)).all(), (tfs, bs)


def test_sweetspot_hand_computed_and_bound():
    """SweetSpotSimilarity (L/misc SweetSpotSimilarity.java, config
    [3,20]/0.5 + tf(min=2, base=1.5)): plateau lengthNorm == 1 inside the
    sweet spot, baseline tf flat below min; the block bound uses the TABLE
    MAX because the plateau breaks min-norm monotonicity — it must
    dominate scores at EVERY norm byte, not just the block minimum."""
    import math

    from lucene_solr_spark.search.bm25 import (
        SWEET_TF_BASE,
        block_max_score_sweetspot,
        score_postings_sweetspot,
        sweetspot_norm_cache,
    )

    cache = sweetspot_norm_cache()
    # plateau: any decoded length in [3, 20] has norm exactly 1.0
    for b in range(256):
        dl = float(LENGTH_TABLE[b])
        if 3 <= dl <= 20:
            assert cache[b] == np.float32(1.0), (b, dl)
    # baseline tf: freq 1 and 2 score identically (flat), 3 breaks out
    w = np.float32(1.7)
    s = score_postings_sweetspot(np.array([1, 2, 3]), np.array([10] * 3), w, cache)
    assert s[0] == s[1] == np.float32(np.float32(SWEET_TF_BASE) * w) * cache[10]
    assert s[2] > s[1]
    # hand-recomputed off-plateau norm (dl = 128 via its norm byte)
    b128 = int(np.argmax(LENGTH_TABLE == 128))
    want_norm = np.float32(1.0 / math.sqrt(0.5 * (125 + 108 - 17) + 1.0))
    assert cache[b128] == want_norm
    # bound dominates at EVERY norm byte (not only the block min)
    rng = np.random.default_rng(11)
    for _ in range(50):
        tfs = rng.integers(1, 30, size=16)
        bs = rng.integers(1, 255, size=16)
        scores = score_postings_sweetspot(tfs, bs, w, cache)
        bound = block_max_score_sweetspot(int(tfs.max()), int(bs.min()), w, cache)
        assert (scores <= bound + np.float32(0)).all(), (tfs, bs)


def test_monotone_in_tf_and_doclen():
    cache = dfr_h2_cache(AVGDL)
    aux = 2.0
    s1 = score_postings_dfr(np.array([1, 2, 5, 20]), np.array([50] * 4), np.float32(1.0), cache, aux)
    assert (np.diff(s1) > 0).all()
    s2 = score_postings_dfr(np.array([3] * 3), np.array([40, 120, 250]), np.float32(1.0), cache, aux)
    assert (np.diff(s2) < 0).all()
    s3 = score_postings_lmjm(np.array([3] * 3), np.array([40, 120, 250]), np.float32(1.0), lmjm_norm_cache(), 0.001)
    assert (np.diff(s3) < 0).all()
    s6 = score_postings_dfi(np.array([1, 2, 5, 20]), np.array([50] * 4), np.float32(1.0), lmjm_norm_cache(), 0.002)
    assert (np.diff(s6) > 0).all()
    s7 = score_postings_dfi(np.array([5] * 3), np.array([40, 50, 60]), np.float32(1.0), lmjm_norm_cache(), 0.002)
    assert (np.diff(s7) < 0).all()
    s4 = score_postings_f2exp(np.array([1, 2, 5, 20]), np.array([50] * 4), np.float32(1.0), f2exp_norm_cache(AVGDL), 2.0)
    assert (np.diff(s4) > 0).all()
    s5 = score_postings_f2exp(np.array([3] * 3), np.array([40, 120, 250]), np.float32(1.0), f2exp_norm_cache(AVGDL), 2.0)
    assert (np.diff(s5) < 0).all()


def test_docsonly_ignores_tf():
    """IndexOptions.DOCS: stored tf must not move the score — freq() == 1
    for every posting; norms still differentiate docs."""
    cache = norm_cache(AVGDL)
    a = score_postings_docsonly(np.array([1, 5, 30]), np.array([200] * 3), np.float32(2.0), cache)
    assert a[0] == a[1] == a[2]
    b = score_postings_docsonly(np.array([1, 1]), np.array([100, 250]), np.float32(2.0), cache)
    assert b[0] != b[1]
