"""Nested-BooleanQuery (or_group) kernel parity: the single-clause inner
disjunction must equal "score each member as a TermQuery, per-doc float64
sum in member order, one f32 cast" — and a MUST or_group must behave as a
required ≥1-member predicate."""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.index.codec import encode_posting_blocks
from lucene_solr_spark.search.bm25 import idf as bm25_idf, norm_cache, score_postings
from lucene_solr_spark.search.kernels import score_segment_exact
from lucene_solr_spark.search.query import (
    BooleanSpec, OrGroupClause, TermClause, compile_query,
)

N_DOCS = 40


def _mk_corpus(seed: int = 7):
    rng = np.random.default_rng(seed)
    norms = rng.integers(20, 40, N_DOCS).astype(np.int64)
    term_blocks = {}
    postings = {}
    for t, p in (("a", 0.6), ("b", 0.4), ("c", 0.25)):
        mask = rng.random(N_DOCS) < p
        docs = np.flatnonzero(mask).astype(np.int64)
        tfs = rng.integers(1, 5, len(docs)).astype(np.int64)
        term_blocks[t] = encode_posting_blocks(docs, tfs, norms[docs])
        postings[t] = (docs, tfs)
    return term_blocks, norms, postings


def test_or_group_equals_member_sum():
    term_blocks, norms, postings = _mk_corpus()
    df = {t: len(d) for t, (d, _) in postings.items()}
    cache = norm_cache(np.float32(25.0))
    spec = BooleanSpec(must=[
        TermClause("a"), OrGroupClause(("b", "c")),
    ])
    q = compile_query(spec, df, N_DOCS, cache, k=N_DOCS)
    docs, scores = score_segment_exact(term_blocks, norms, 0, q)

    # reference: TermQuery member scores, f64 sum in member order, f32 cast
    exp = {}
    for d in postings["a"][0]:
        exp[int(d)] = None
    member = {}
    for t in ("b", "c"):
        md, mtf = postings[t]
        w = np.float32(1.0) * bm25_idf(df[t], N_DOCS)
        s = score_postings(mtf, norms[md], w, cache, 0.0)
        for d_, s_ in zip(md, s):
            member.setdefault(int(d_), []).append(np.float64(s_))
    wa = np.float32(1.0) * bm25_idf(df["a"], N_DOCS)
    sa = score_postings(postings["a"][1], norms[postings["a"][0]], wa, cache, 0.0)
    a_score = dict(zip(postings["a"][0].tolist(), sa))
    want = {}
    for d in sorted(exp):
        if d not in member:
            continue  # MUST or_group unmatched → excluded
        g = np.float32(sum(member[d], np.float64(0.0)))
        want[d] = np.float32(np.float64(a_score[d]) + np.float64(g))
    got = dict(zip(docs.tolist(), scores.tolist()))
    assert set(got) == set(want)
    for d in want:
        assert got[d] == want[d], (d, got[d], want[d])


def test_or_group_dead_members_and_compile():
    term_blocks, norms, postings = _mk_corpus()
    df = {t: len(d) for t, (d, _) in postings.items()}
    cache = norm_cache(np.float32(25.0))

    # dead member dropped, live kept
    spec = BooleanSpec(must=[OrGroupClause(("b", "zz"))])
    q = compile_query(spec, df, N_DOCS, cache, k=N_DOCS)
    (c,) = q.clauses
    assert c.kind == "or_group" and c.terms == ("b",)
    assert len(c.member_weights) == 1
    # or_group rides WAND (member-folded bounds) — no exact-path routing
    assert not q.needs_exact and not q.needs_positions

    # all-dead MUST group → matches nothing
    q2 = compile_query(
        BooleanSpec(must=[TermClause("a"), OrGroupClause(("zz", "yy"))]),
        df, N_DOCS, cache, k=N_DOCS,
    )
    assert q2.clauses == []


def test_or_group_wand_equals_exact_randomized():
    """Block-max WAND with or_group clauses is bitwise-identical to the
    exact kernel (docs AND f32 scores) across random corpora, block splits,
    and query shapes — the identity invariant that lets or_group ride the
    pruned path instead of brute force."""
    from lucene_solr_spark.search.bm25 import norm_cache
    from lucene_solr_spark.search.kernels import score_segment_wand
    from lucene_solr_spark.search.query import BooleanSpec

    cache = norm_cache(np.float32(27.0))
    for seed in range(25):
        rng = np.random.default_rng(seed)
        n_docs = int(rng.integers(30, 300))
        norms = rng.integers(18, 45, n_docs).astype(np.int64)
        block_size = int(rng.choice([4, 16, 128]))
        term_blocks, df = {}, {}
        terms = [f"t{i}" for i in range(5)]
        for t in terms:
            docs = np.flatnonzero(rng.random(n_docs) < rng.uniform(0.05, 0.7))
            if docs.size == 0:
                continue
            tfs = rng.integers(1, 6, len(docs)).astype(np.int64)
            term_blocks[t] = encode_posting_blocks(
                docs.astype(np.int64), tfs, norms[docs], block_size=block_size
            )
            df[t] = len(docs)
        present = [t for t in terms if t in df]
        if len(present) < 3:
            continue
        for qi in range(6):
            qrng = np.random.default_rng(seed * 100 + qi)
            g = tuple(qrng.choice(present, size=2, replace=False))
            rest = [t for t in present if t not in g]
            spec = BooleanSpec()
            grp = OrGroupClause(g)
            if qi % 3 == 0:
                spec.must = [TermClause(rest[0]), grp]
            elif qi % 3 == 1:
                spec.should = [TermClause(rest[0]), grp]
            else:
                spec.must = [grp]
                spec.must_not = [TermClause(rest[0])]
            k = int(qrng.integers(1, 12))
            q = compile_query(spec, df, n_docs, cache, k=k)
            ed, es = score_segment_exact(term_blocks, norms, 0, q)
            wd, ws = score_segment_wand(term_blocks, norms, 0, q)
            assert ed.tolist() == wd.tolist(), (seed, qi)
            assert es.tolist() == ws.tolist(), (seed, qi)
