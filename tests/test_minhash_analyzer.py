"""MinHashFilter LSH-fingerprint chain (``LA/minhash/MinHashFilter.java``):
5-shingle → 60-bit hash → min per bucket → rotation fill → B signature
tokens. Deviations from upstream (md5 for murmur3, decimal token text,
norm = B) are documented in the analyzer docstring; engine/oracle share
every choice."""

import pandas as pd

from lucene_solr_spark.analysis.analyzer import (
    MINHASH_BUCKETS,
    MinHashAnalyzer,
    _minhash_sig,
)


def test_signature_shape_and_positions():
    out = MinHashAnalyzer().analyze("key agg row scan slow fast table value")
    assert len(out) == MINHASH_BUCKETS
    assert [p for _, p in out] == list(range(MINHASH_BUCKETS))
    assert all(t.startswith(f"mh:{p}:") for t, p in out)


def test_short_doc_emits_nothing():
    # fewer tokens than the shingle width → no shingles → empty signature
    assert MinHashAnalyzer().analyze("too few words here") == []


def test_rotation_fills_every_bucket():
    # one single shingle fills exactly one bucket; rotation must propagate
    # its value into ALL B buckets
    sig = _minhash_sig(["a", "b", "c", "d", "e"])
    vals = {t.split(":")[2] for t, _ in sig}
    assert len(sig) == MINHASH_BUCKETS and len(vals) == 1


def test_identical_docs_share_all_buckets_disjoint_share_none():
    a = MinHashAnalyzer()
    d1 = "key agg row scan slow fast table value part hash merge batch"
    d2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    s1 = {t for t, _ in a.analyze(d1)}
    s1b = {t for t, _ in a.analyze(d1)}
    s2 = {t for t, _ in a.analyze(d2)}
    assert s1 == s1b
    assert not (s1 & s2)


def test_batch_matches_per_row():
    a = MinHashAnalyzer()
    texts = [
        "key agg row scan slow fast table value part hash",
        "short one",
        "",
        "alpha beta gamma delta epsilon zeta eta theta",
        "key agg row scan slow fast table value part hash extra tail words",
    ]
    frame = a.analyze_batch(pd.Series(texts))
    expect = []
    for i, t in enumerate(texts):
        expect.extend((i, term, pos) for term, pos in a.analyze(t))
    got = list(zip(frame["row"].tolist(),
                   [str(t) for t in frame["term"]],
                   frame["pos"].tolist()))
    assert sorted(got) == sorted(expect)
    assert list(frame.attrs["doc_len"]) == [
        MINHASH_BUCKETS if len(t.split()) >= 5 else 0 for t in texts
    ]


def test_near_dup_shares_buckets():
    # shared shingle runs pull shared bucket minima — the LSH resemblance
    # signal the index entry (ft_minhash_sim_topk) ranks by
    a = MinHashAnalyzer()
    base = "key agg row scan slow fast table value part hash merge batch sort"
    edited = base + " appended suffix words"
    s1 = {t for t, _ in a.analyze(base)}
    s2 = {t for t, _ in a.analyze(edited)}
    # short docs rotate a few differing minima into many buckets, so the
    # overlap is partial — but it must be clearly above the disjoint-doc
    # baseline of 0 (measured: 5/16 for this pair)
    assert len(s1 & s2) >= 3
