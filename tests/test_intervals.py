"""Unordered-interval matcher parity (``lucene/queries/.../intervals/
Intervals.java#unordered`` + ``#maxgaps``): the packed-key vectorized kernel
against a brute-force reference. For two distinct terms the minimal
intervals are exactly the adjacent opposite-term pairs of the merged
position stream; match when gaps <= maxgaps; freq = Σ f32 1/(1+gaps)."""

import numpy as np

from lucene_solr_spark.search.kernels import (
    _interval_unordered_freqs,
    _interval_unordered_slow,
)


def _parts(per_doc: dict[int, list[int]]) -> tuple:
    docs = np.array(sorted(per_doc), dtype=np.int64)
    tfs = np.array([len(per_doc[d]) for d in docs], dtype=np.int64)
    pos = np.concatenate(
        [np.sort(np.asarray(per_doc[d], dtype=np.int64)) for d in docs]
    ) if len(docs) else np.empty(0, dtype=np.int64)
    return docs, tfs, pos


def _brute(a: dict, b: dict, maxgaps: int) -> dict[int, float]:
    out = {}
    for d in sorted(set(a) & set(b)):
        merged = sorted(
            [(p, 0) for p in a[d]] + [(p, 1) for p in b[d]]
        )
        total = np.float64(0.0)
        for (p0, f0), (p1, f1) in zip(merged, merged[1:]):
            gaps = p1 - p0 - 1
            if f0 != f1 and gaps <= maxgaps:
                total += np.float64(
                    np.float32(1.0) / (np.float32(1.0) + np.float32(gaps))
                )
        if total > 0:
            out[d] = float(np.float32(total))
    return out


def test_hand_case_both_orders():
    # a=[1, 9], b=[3, 7]: merged 1a 3b 7b 9a → pairs (1a,3b) gaps 1 and
    # (7b,9a) gaps 1 — the b-before-a pair matches too (unordered)
    docs, tfs = _interval_unordered_freqs(
        _parts({5: [1, 9]}), _parts({5: [3, 7]}), maxgaps=1
    )
    assert docs.tolist() == [5]
    np.testing.assert_allclose(tfs, [np.float32(1.0)])  # 0.5 + 0.5


def test_minimality():
    # a=[0], b=[2, 10]: only (0,2) is minimal/adjacent; (0,10) contains it
    docs, tfs = _interval_unordered_freqs(
        _parts({1: [0]}), _parts({1: [2, 10]}), maxgaps=100
    )
    assert docs.tolist() == [1]
    # pairs: (0a,2b) gaps 1 → 0.5; (2b,10b) same term — not an interval
    np.testing.assert_allclose(tfs, [np.float32(0.5)])


def test_maxgaps_filters():
    docs, _ = _interval_unordered_freqs(
        _parts({1: [0]}), _parts({1: [5]}), maxgaps=3
    )
    assert docs.size == 0
    docs, tfs = _interval_unordered_freqs(
        _parts({1: [0]}), _parts({1: [5]}), maxgaps=4
    )
    assert docs.tolist() == [1]
    np.testing.assert_allclose(tfs, [np.float32(0.2)])


def test_random_parity_vs_brute_and_fallback():
    rng = np.random.default_rng(11)
    for trial in range(40):
        n_docs = int(rng.integers(1, 10))
        a, b = {}, {}
        for d in range(n_docs):
            L = int(rng.integers(6, 50))
            for tgt, p in ((a, 0.3), (b, 0.3)):
                ps = np.nonzero(rng.random(L) < p)[0]
                if ps.size:
                    tgt[d] = ps.tolist()
        common = sorted(set(a) & set(b))
        if not common:
            continue
        maxgaps = int(rng.integers(0, 5))
        want = _brute(a, b, maxgaps)
        docs, tfs = _interval_unordered_freqs(
            _parts(a), _parts(b), maxgaps
        )
        got = dict(zip(docs.tolist(), tfs.tolist()))
        assert set(got) == set(want), trial
        for d in want:
            np.testing.assert_allclose(got[d], want[d], rtol=1e-6)
        sdocs, stfs = _interval_unordered_slow(
            _parts(a), _parts(b), maxgaps, np.array(common, dtype=np.int64)
        )
        np.testing.assert_array_equal(docs, sdocs)
        np.testing.assert_array_equal(tfs, stfs)


def test_ordered_intervals():
    """Intervals.ordered: only (first → second) adjacent pairs match."""
    # a=[1, 9], b=[3, 7]: ordered pairs (1a,3b); (7b,9a) is b-before-a
    docs, tfs = _interval_unordered_freqs(
        _parts({5: [1, 9]}), _parts({5: [3, 7]}), 1, ordered=True
    )
    assert docs.tolist() == [5]
    np.testing.assert_allclose(tfs, [np.float32(0.5)])
    # only reversed order present → no match
    docs, _ = _interval_unordered_freqs(
        _parts({1: [10]}), _parts({1: [2]}), 100, ordered=True
    )
    assert docs.size == 0
    # slow path agrees
    sdocs, stfs = _interval_unordered_slow(
        _parts({5: [1, 9]}), _parts({5: [3, 7]}), 1,
        np.array([5], dtype=np.int64), ordered=True,
    )
    assert sdocs.tolist() == [5]
    np.testing.assert_allclose(stfs, [np.float32(0.5)])
