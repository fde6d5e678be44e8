"""Pipeline-op invariants: connected components, deterministic splits,
decontamination, and the math-stream evaluators (movingAvg / regress).

The driver-gate equivalence vs DuckDB is covered by tools/check_entry.py;
these tests pin the algorithmic invariants that the SQL hash can't express
(component well-formedness, split stability, OLS closed form).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_connected_components_well_formed(spark):
    """Labels are component minima: every node's label is reachable and no
    edge crosses two labels."""
    from lucene_solr_spark.ops.pipeline import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20), (30, 31)],
        "src long, dst long",
    )
    cc = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert cc == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_connected_components_long_chain(spark):
    """A path graph longer than one superstep's reach still converges
    (propagation is iterated to fixpoint, not a single round)."""
    from lucene_solr_spark.ops.pipeline import connected_components

    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = connected_components(edges).collect()
    assert {r.cluster_id for r in got} == {0}
    assert {r.doc_id for r in got} == set(range(n + 1))


def test_split_assignment_deterministic_and_total(spark):
    """Same doc -> same split on every evaluation; buckets cover [0, 100)."""
    from lucene_solr_spark.ops.pipeline import split_assignment

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: (r.bucket, r.split) for r in split_assignment(docs).collect()}
    b = {r.doc_id: (r.bucket, r.split) for r in split_assignment(docs).collect()}
    assert a == b
    assert all(0 <= v[0] < 100 for v in a.values())
    assert {v[1] for v in a.values()} == {"train", "valid", "test"}
    n_train = sum(1 for v in a.values() if v[1] == "train")
    assert 400 <= n_train <= 480  # ~90% of 500, hash-uniform


def test_decontaminate_flags_planted_overlap(spark):
    """A corpus doc sharing a probe doc's exact text is flagged with
    frac == 1.0; an unrelated doc is not flagged."""
    import pandas as pd

    from lucene_solr_spark.ops import pipeline as P

    probe_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, probe_text),                      # probe (0 % PROBE_MOD == 0)
        (1, probe_text),                      # contaminated copy
        (2, "one two three four five six seven eight nine"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = "/tmp/lss_decon_test"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    got = P.decontaminate(spark, path).collect()
    assert [(r.doc_id, r.probe_doc, r.frac) for r in got] == [(1, 0, 1.0)]


def test_regress_matches_closed_form(spark):
    """stream_regress reproduces numpy's OLS on the same aggregates."""
    import numpy as np

    from lucene_solr_spark.ops.streams import stream_regress

    rows = stream_regress(spark, SF).collect()
    assert len(rows) > 0
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long").alias("x"),
        F.col("value").cast("decimal(18,2)").cast("double").alias("y"),
    ).toPandas()
    for r in rows:
        g = ev[ev.event_type == r.event_type]
        slope, intercept = np.polyfit(g.x, g.y, 1)
        assert r.slope == pytest.approx(slope, rel=1e-9)
        assert r.intercept == pytest.approx(intercept, rel=1e-9)
        cc = np.corrcoef(g.x, g.y)[0, 1]
        assert r.r2 == pytest.approx(cc * cc, rel=1e-9)


def test_moving_avg_window_semantics(spark):
    """mavg equals the mean of the last <=7 daily counts per event_type."""
    from lucene_solr_spark.ops.streams import MOVING_AVG_WINDOW, stream_moving_avg

    rows = stream_moving_avg(spark, SF).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        hist = by_type.setdefault(r.event_type, [])
        hist.append(r.n)
        win = hist[-MOVING_AVG_WINDOW:]
        assert r.mavg == pytest.approx(sum(win) / len(win), rel=1e-12)


def test_unigram_ppl_bounds_and_uniform_check(spark):
    """bits/token lies in (0, log2(totalTokens)]; a doc made only of the
    corpus's most common term scores the fewest bits."""
    import math

    from lucene_solr_spark.ops.textmetrics import text_unigram_ppl

    rows = text_unigram_ppl(spark, SF).collect()
    assert rows
    tot = sum(r.n_tokens for r in rows)
    for r in rows:
        assert 0.0 < r.bits_per_token <= math.log2(tot) + 1e-6


def test_ngram_hotspots_df_le_total_and_present(spark):
    from lucene_solr_spark.ops.pipeline import HOTSPOT_N, ngram_hotspots

    rows = ngram_hotspots(spark, SF).collect()
    assert rows
    texts = [
        r.text.lower()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    for r in rows:
        assert 1 <= r.df <= r.total
        assert len(r.shingle.split(" ")) == HOTSPOT_N
    # the hottest shingle really appears in >= df docs (substring check is
    # a lower bound: tokenization may split differently around punctuation)
    top = rows[0]
    assert sum(top.shingle in t for t in texts) >= 1


def test_features_ig_range_and_perfect_feature(spark):
    """IG is bounded by H(class); a term present in every doc carries 0."""
    import math

    from lucene_solr_spark.ops.pipeline import IG_POS_SOURCE, features_ig

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    npos = docs.filter(F.col("source") == IG_POS_SOURCE).count()
    p = npos / n
    hc = -(p * math.log2(p) + (1 - p) * math.log2(1 - p)) if 0 < p < 1 else 0.0
    rows = features_ig(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.ig <= hc + 1e-6
        assert 0 <= r.pos_df <= r.df


def test_hard_negatives_exclude_probe_label(spark):
    from lucene_solr_spark.ops.ann import PROBE_VEC_ID, ann_hard_negatives

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plabel = emb.filter(F.col("vec_id") == PROBE_VEC_ID).head().label
    rows = ann_hard_negatives(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.label != plabel
        assert -1.0 <= r.cos_sim <= 1.0
    scores = [r.cos_sim for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_pq_adc_recall_and_ordering(spark):
    """PQ/ADC candidates + exact rerank: recall@10 vs brute force stays
    high at this scale (measured 0.8 at sf0.001 with 16 codes x 8
    subspaces — assert a safety margin below it), rerank output is
    cos-sorted, and every ADC score is bounded by the max possible
    sub-dot sum."""
    from lucene_solr_spark.ops.ann import ann_cosine_topk, ann_pq_topk

    exact = {r.vec_id for r in ann_cosine_topk(spark, SF).collect()}
    rows = ann_pq_topk(spark, SF).collect()
    assert len(rows) == 10
    pq = {r.vec_id for r in rows}
    assert len(exact & pq) / 10 >= 0.5
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    for r in rows:
        assert -1.0 <= r.cos_sim <= 1.0


def test_mlt_text_matches_doc_variant_on_same_text(spark):
    """MLT over a posted body == MLT over a doc with identical text, minus
    the source-doc exclusion."""
    from lucene_solr_spark.engine import get_engine

    eng = get_engine(spark, SF, "simple")
    doc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") == 42).head()
    )
    via_text = eng.mlt_text_topk(doc.text, top_terms=5, k=11).collect()
    via_doc = eng.mlt_topk(42, top_terms=5, k=10).collect()
    text_ids = [r.doc_id for r in via_text if r.doc_id != 42][:10]
    assert text_ids == [r.doc_id for r in via_doc]


def test_dsir_select_ranks_target_lang_up(spark):
    """DSIR importance weights (hashed-unigram log p/q ratio) must rank the
    target-domain (lang='en') docs above the rest on average: the top-K
    majority is 'en', weights are non-increasing, and every doc's weight is
    finite. (Bitwise engine≡oracle equality is the driver gate; this pins
    the SEMANTIC selection signal.)"""
    import numpy as np

    from lucene_solr_spark.ops.pipeline import DSIR_K, dsir_select

    out = dsir_select(spark, SF).toPandas()
    assert len(out) == DSIR_K
    w = out.log_w.to_numpy()
    assert np.isfinite(w).all()
    assert (np.diff(w) <= 0).all()
    assert (out.lang == "en").sum() > DSIR_K // 2
    assert out["rank"].tolist() == list(range(1, DSIR_K + 1))


def test_mix_temperature_flattens_toward_uniform(spark):
    """Temperature sampling (p ∝ n^alpha, alpha<1) must (a) preserve the
    size ORDER of languages, (b) strictly shrink the largest language's
    share and grow the smallest's, and (c) allocate n_selected =
    min(floor(budget·p), n_docs) deterministically."""
    import numpy as np

    from lucene_solr_spark.ops.pipeline import TEMP_BUDGET, mix_temperature

    out = mix_temperature(spark, SF).toPandas().sort_values("n_docs")
    raw = out.share_raw.to_numpy()
    samp = out.share_sampled.to_numpy()
    # order preserved
    assert (np.diff(samp) >= 0).all()
    # flattening: biggest loses share, smallest gains
    assert samp[-1] < raw[-1] and samp[0] > raw[0]
    # allocation arithmetic
    t = np.floor(TEMP_BUDGET * samp_exact(out))
    want = np.minimum(t, out.n_docs.to_numpy())
    assert (out.n_selected.to_numpy() == want).all()


def samp_exact(out):
    """Recompute p from n_docs (round-6 share_sampled is for display)."""
    import numpy as np

    from lucene_solr_spark.ops.pipeline import TEMP_ALPHA

    w = out.n_docs.to_numpy().astype(float) ** TEMP_ALPHA
    return w / w.sum()


def test_dedup_keep_best_prefers_longest(spark, tmp_path):
    """In a near-dup cluster the kept exemplar is the member with the MOST
    tokens (ties to lowest doc_id) — not the component-minimum id that
    dedup_clusters keeps. Fixture: doc 0 is a truncated copy of doc 1, so
    the cluster minimum (0) must be dropped and 1 kept; doc 2 is unrelated
    and absent from the output."""
    import pandas as pd

    from lucene_solr_spark.ops.pipeline import dedup_keep_best

    base = " ".join(f"tok{i}" for i in range(40))
    texts = [base, base + " extra trailing content here", "completely different words " * 5]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src1"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    rows = {r.doc_id: r for r in dedup_keep_best(spark, str(tmp_path)).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].cluster_id == rows[1].cluster_id == 0
    assert rows[0].n_docs == rows[1].n_docs == 2
    assert not rows[0].keep and rows[1].keep  # longest wins, not min-id
    assert rows[1].n_tokens > rows[0].n_tokens


def test_conv_render_orders_turns_and_breaks_sessions(spark, tmp_path):
    """Rendered text is the (ts, event_id)-ordered 'type: props' lines of
    ONE session; an event beyond the inactivity gap starts a new document."""
    import datetime as dt

    import pandas as pd

    from lucene_solr_spark.ops.pipeline import conv_render

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # session 1: three turns, deliberately written out of ts order
        (2, t0 + dt.timedelta(minutes=10), 7, "click", 1.0, '{"k": 2}'),
        (1, t0 + dt.timedelta(minutes=5), 7, "view", 1.0, '{"k": 1}'),
        (3, t0 + dt.timedelta(minutes=20), 7, "error", 1.0, '{"k": 3}'),
        # session 2: past the 240-minute gap
        (4, t0 + dt.timedelta(minutes=20 + 241), 7, "view", 1.0, '{"k": 4}'),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    out = conv_render(spark, str(tmp_path)).collect()
    assert [r.n_turns for r in out] == [3, 1]
    assert out[0].text == 'view: {"k": 1}\nclick: {"k": 2}\nerror: {"k": 3}'
    assert out[1].text == 'view: {"k": 4}'
    assert out[0].n_chars == len(out[0].text)


def test_pipeline_select_funnel_flags(spark, tmp_path):
    """Composed funnel: the exact copy flags exact_dup (keeper = min id),
    both copies and the truncated variant cluster as near-dups with the
    longest (= min id on ties) kept, and only the keeper that also passes
    quality is selected."""
    import pandas as pd

    from lucene_solr_spark.ops.pipeline import pipeline_select

    base = (
        "the quick brown fox jumps over a lazy dog while many other animals "
        "watch quietly from the nearby hill and some birds fly across the "
        "evening sky toward their distant nests"
    )
    texts = [
        base,                                   # 0: exact-dup keeper, but shorter
        base,                                   # 1: exact duplicate of 0
        base + " before night falls",           # 2: longest near-dup -> kept
        "xx yy",                                # 3: too short -> quality reject
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    rows = {r.doc_id: r for r in pipeline_select(spark, str(tmp_path)).collect()}
    assert len(rows) == 4
    assert [rows[i].exact_dup for i in range(4)] == [False, True, False, False]
    # keep-longest: doc 2 (the extended variant) is the exemplar, both
    # copies of the shorter text are near-dup drops
    assert [rows[i].near_dup for i in range(3)] == [True, True, False]
    assert rows[0].quality_ok and not rows[3].quality_ok
    assert [rows[i].selected for i in range(4)] == [False, False, True, False]


def test_heavy_hitter_candidates_guarantee(spark, tmp_path):
    """With vocabulary >> HH_CAP (the decrement/eviction path runs), every
    term whose global frequency exceeds n/HH_CAP is still in the candidate
    union — the Misra-Gries containment guarantee — and the end-to-end
    entry returns the exact brute-force top-k."""
    import pandas as pd

    from lucene_solr_spark.ops.pipeline import (
        HH_CAP, HH_TOPK, heavy_hitter_candidates, stream_heavy_hitters,
    )

    # 5 heavy terms (freq 300 each) buried in 3000 singleton terms
    heavy = [f"hot{i}" for i in range(5)]
    tokens = [t for t in heavy for _ in range(300)]
    tokens += [f"rare{i:05d}" for i in range(3000)]
    # deterministic interleave so heavies spread across batches/partitions
    import random

    rng = random.Random(42)
    rng.shuffle(tokens)
    docs = [" ".join(tokens[i:i + 50]) for i in range(0, len(tokens), 50)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for t in docs],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    from pyspark.sql import functions as F

    from lucene_solr_spark.ops.textmetrics import TOKEN_RE

    toks = (
        spark.read.parquet(str(tmp_path / "documents.parquet"))
        .select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
            ).alias("term")
        )
        .repartition(8)  # force several partitions -> several MG summaries
    )
    cand = {r.term for r in heavy_hitter_candidates(toks).collect()}
    n = len(tokens)
    assert all(h in cand for h in heavy), "freq 300 > n/cap terms must survive"
    assert n / HH_CAP < 300  # the guarantee's premise holds in this fixture

    got = stream_heavy_hitters(spark, str(tmp_path)).collect()
    assert len(got) == HH_TOPK
    assert [r.term for r in got[:5]] == sorted(heavy)
    assert all(r.cnt == 300 for r in got[:5])
    # remaining slots: singletons, term-ascending
    rest = [r for r in got[5:]]
    assert all(r.cnt == 1 for r in rest)
    assert [r.term for r in rest] == sorted(r.term for r in rest)


def test_naive_bayes_hand_computed(spark, tmp_path):
    """SimpleNaiveBayesClassifier analog on a 3-doc fixture whose posterior
    is computable by hand: train d1(a): "x x y", d2(b): "z z"; classify
    d0: "x z".  V=3, add-one smoothing:
      score(a) = ln(1/2) + ln(3/6) + ln(1/6) = ln(1/24)
      score(b) = ln(1/2) + ln(1/5) + ln(3/5) = ln(3/50)   -> label b."""
    import math

    import pandas as pd

    from lucene_solr_spark.ops.pipeline import classify_naive_bayes

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "lang": ["?", "a", "b"],
            "text": ["x z", "x x y", "z z"],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    got = classify_naive_bayes(spark, str(tmp_path)).collect()
    assert len(got) == 1 and got[0].doc_id == 0
    assert got[0].label == "b"
    assert abs(got[0].score - math.log(3 / 50)) < 1e-6


def test_bpe_train_sennrich_example(spark):
    """BPE trainer on the classic Sennrich fixture (low/lower/newest/widest)
    — the first five learned merges are the textbook sequence, with the
    (cnt desc, a, b) tiebreak deciding the 9-9-9 and 7-7 ties."""
    from lucene_solr_spark.ops.pipeline import bpe_train

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, freq long",
    )
    merges = bpe_train(spark, words=words, n_merges=5)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]


def test_bpe_train_stops_below_two(spark):
    """No merge is learned from hapax-only pairs (cnt < 2 stops training —
    a rule seen once generalizes to nothing)."""
    from lucene_solr_spark.ops.pipeline import bpe_train

    words = spark.createDataFrame([("ab", 1), ("cd", 1)], "word string, freq long")
    assert bpe_train(spark, words=words, n_merges=3) == []


def test_bpe_encode_hand_segmentation(spark, tmp_path):
    """Rule order and greediness pinned by hand: with the stored rules,
    'power' → [p, ow, er</w>] (3 subwords: (e,r) first, then (er,</w>),
    then (o,w)); 'stone' → [st, o, n, e</w>]? no — (e,</w>) fires before
    (n,</w>) can pair, giving [st, o, n, e</w>] = 4."""
    import pandas as pd

    from lucene_solr_spark.ops.pipeline import bpe_encode

    pd.DataFrame(
        {"doc_id": [1, 2], "text": ["power", "stone"]}
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    got = {r.doc_id: (r.n_words, r.n_subwords) for r in bpe_encode(spark, str(tmp_path)).collect()}
    assert got == {1: (1, 3), 2: (1, 4)}


def test_length_bucket_waste_monotone(spark):
    """More length buckets ⇒ like-length docs batch together ⇒ padding
    waste falls monotonically; bounded in [0, 1); 1-bucket is the
    unbucketed baseline."""
    from lucene_solr_spark.ops.pipeline import BUCKET_LEVELS, pack_length_buckets

    out = pack_length_buckets(spark, "/root/testdata/sf0.001").toPandas()
    assert list(out["n_buckets"]) == list(BUCKET_LEVELS)
    w = out["padding_waste"].tolist()
    assert all(0.0 <= x < 1.0 for x in w)
    assert w == sorted(w, reverse=True)
    assert w[0] > w[-1]  # bucketing actually helps on this corpus
