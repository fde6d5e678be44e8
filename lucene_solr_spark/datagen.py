"""Deterministic synthetic transcripts + reference query set (FIXTURES.md §1-2).

Seed 42 throughout; no wall-clock, no external data. The corpus exercises
every analyzer stage (stopwords → holes, Porter inflection families, case
mangling, glued punctuation), skew handling (hot terms in ~30% of turns),
and codec tail paths (rare terms, <10 turns each).

Schema (BASELINE.json input_hint):
  conv_id string, turn_idx int32, role string, text string,
  tool string (nullable), ts timestamp
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
EPOCH = np.datetime64("2026-01-01T00:00:00")

_STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()

_FAMILIES = [
    "run", "running", "runs", "ran",
    "connect", "connected", "connecting", "connection",
    "caresses", "ponies", "relational", "generalization",
    "query", "queries", "queried", "querying",
    "index", "indexes", "indexing", "indexed",
    "merge", "merged", "merging", "merges",
    "score", "scored", "scoring", "scores",
    "partition", "partitions", "partitioned", "partitioning",
]

_BASE = [
    "agent", "answer", "api", "apply", "array", "assert", "batch", "block",
    "branch", "buffer", "build", "cache", "call", "check", "client", "code",
    "column", "command", "commit", "compress", "compute", "config", "context",
    "count", "cost", "data", "debug", "decode", "delta", "deploy", "disk",
    "doc", "document", "driver", "encode", "engine", "event", "executor",
    "fail", "fast", "fetch", "field", "file", "filter", "flush", "frame",
    "function", "graph", "group", "hash", "heap", "help", "host", "input",
    "join", "json", "kernel", "key", "label", "latency", "length", "limit",
    "line", "list", "load", "log", "loop", "machine", "map", "memory",
    "message", "metric", "model", "network", "node", "norm", "null", "number",
    "offset", "output", "page", "parse", "patch", "path", "plan", "point",
    "pool", "port", "posting", "print", "process", "prompt", "python", "queue",
    "range", "rank", "read", "record", "reduce", "remote", "request", "response",
    "result", "retry", "row", "rule", "sample", "scan", "schema", "search",
    "segment", "server", "session", "shard", "shell", "shuffle", "size",
    "slow", "sort", "source", "stage", "state", "stream", "string", "struct",
    "system", "table", "task", "term", "test", "text", "thread", "time",
    "trace", "train", "turn", "type", "user", "value", "vector", "window",
    "worker", "write", "zone",
]

HOT_TERMS = ["error", "token", "spark"]


def build_vocab() -> tuple[list[str], list[str]]:
    """Returns (zipf_vocab ~500 terms incl. stopwords/families, tail_terms 100)."""
    vocab = list(dict.fromkeys(_STOPWORDS + _FAMILIES + _BASE))
    i = 0
    while len(vocab) < 500:
        vocab.append(f"synthword{i:03d}")
        i += 1
    tail = [f"rareterm{i:03d}" for i in range(100)]
    return vocab, tail


def generate_transcripts(n_conv: int, seed: int = SEED) -> pd.DataFrame:
    """Deterministic transcripts frame (pandas; wrap with spark.createDataFrame)."""
    rng = np.random.default_rng(seed)
    vocab, tail = build_vocab()
    vocab_arr = np.array(vocab, dtype=object)

    # Zipf(s=1.07) over the vocab
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = ranks ** -1.07
    probs /= probs.sum()

    turns_per_conv = np.minimum(1 + rng.geometric(0.15, size=n_conv), 64)
    n_turns = int(turns_per_conv.sum())

    conv_ids = np.repeat(
        np.array([f"conv{i:08d}" for i in range(n_conv)], dtype=object), turns_per_conv
    )
    turn_idx = (
        np.arange(n_turns, dtype=np.int64)
        - np.repeat(np.cumsum(turns_per_conv) - turns_per_conv, turns_per_conv)
    ).astype(np.int32)

    roles = rng.choice(
        np.array(["user", "assistant", "tool", "system"], dtype=object),
        size=n_turns, p=[0.40, 0.40, 0.15, 0.05],
    )
    tools = np.where(
        roles == "tool",
        rng.choice(np.array(["search", "bash", "browser", "python"], dtype=object), size=n_turns),
        None,
    )

    tok_counts = np.clip(
        np.round(rng.lognormal(3.0, 0.8, size=n_turns)).astype(np.int64), 3, 250
    )
    total_tokens = int(tok_counts.sum())
    toks = rng.choice(vocab_arr, size=total_tokens, p=probs)

    # ~10% of tokens case-mangled (half Title-Case, half UPPER)
    mangle = rng.random(total_tokens) < 0.10
    upper = mangle & (rng.random(total_tokens) < 0.5)
    title = mangle & ~upper
    if title.any():
        toks[title] = [t.capitalize() for t in toks[title]]
    if upper.any():
        toks[upper] = [t.upper() for t in toks[upper]]
    # occasional glued trailing punctuation
    punct_sel = rng.random(total_tokens) < 0.08
    puncts = rng.choice(np.array([".", ",", "!", "?"], dtype=object), size=total_tokens)
    if punct_sel.any():
        toks[punct_sel] = [t + p for t, p in zip(toks[punct_sel], puncts[punct_sel])]

    ends = np.cumsum(tok_counts)
    starts = ends - tok_counts
    texts = np.empty(n_turns, dtype=object)
    joined = toks  # avoid building a python list of lists; join per slice
    for i in range(n_turns):
        texts[i] = " ".join(joined[starts[i]:ends[i]])

    # hot terms in ~30% of turns (skew fixture)
    for hot in HOT_TERMS:
        sel = np.flatnonzero(rng.random(n_turns) < 0.30)
        for i in sel:
            texts[i] = texts[i] + " " + hot
    # rare tail terms: each in <10 turns
    for t in tail:
        for i in rng.choice(n_turns, size=int(rng.integers(1, 10)), replace=False):
            texts[i] = texts[i] + " " + t

    ts = EPOCH + np.arange(n_turns).astype("timedelta64[s]") * 37

    return pd.DataFrame({
        "conv_id": conv_ids,
        "turn_idx": turn_idx,
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts.astype("datetime64[us]"),
    })


def generate_queries(seed: int = SEED) -> list[dict]:
    """The 50-query reference set (FIXTURES.md §2). Surface forms are raw
    (pre-analysis); the engine analyzes them with the indexing chain."""
    rng = np.random.default_rng(seed + 1)
    vocab, tail = build_vocab()
    non_stop = [w for w in vocab if w not in set(_STOPWORDS)]
    common = non_stop[:80]

    def pick(n):
        return [common[i] for i in rng.choice(len(common), size=n, replace=False)]

    queries: list[dict] = []
    qid = 0

    def add(qtype, terms, min_should=0):
        nonlocal qid
        queries.append({
            "query_id": qid, "qtype": qtype, "terms": terms,
            "min_should": int(min_should), "k": 10,
        })
        qid += 1

    # term (10): mix of hot, inflected, rare-tail, absent, plain
    add("term", ["error"])                  # hot
    add("term", ["spark"])                  # hot
    add("term", ["running"])                # inflected → stem 'run'
    add("term", ["connection"])             # inflected → 'connect'
    add("term", ["queries"])                # → 'queri'
    add("term", [tail[3]])                  # rare tail
    add("term", ["zzzabsentterm"])          # absent from corpus → 0 hits
    add("term", ["the"])                    # stopword-only → empty after analysis
    for _ in range(2):
        add("term", pick(1))
    # and2/and3 (12)
    add("and2", ["error", "token"])         # hot∧hot (WAND stress)
    add("and2", ["Spark", "filter."])       # case + punctuation in surface form
    for _ in range(4):
        add("and2", pick(2))
    add("and3", ["error", "spark", "token"])
    for _ in range(5):
        add("and3", pick(3))
    # or2/or3 (12)
    add("or2", ["error", "spark"])          # hot disjunction (pruning stress)
    add("or2", [tail[0], tail[1]])          # rare disjunction
    for _ in range(4):
        add("or2", pick(2))
    add("or3", ["error", "zzzabsentterm", "merge"])  # one clause absent
    for _ in range(5):
        add("or3", pick(3))
    # or_minshould (6)
    add("or_minshould", ["error", "token", "spark"], min_should=2)
    for _ in range(5):
        t = pick(3)
        add("or_minshould", t, min_should=2)
    # phrase2 (6)
    add("phrase2", ["error", "token"])
    add("phrase2", ["merge", "the", "segment"])  # spans a stopword hole
    for _ in range(4):
        add("phrase2", pick(2))
    # and_not (4)
    add("and_not", ["error", "spark"])      # error AND NOT spark
    for _ in range(3):
        add("and_not", pick(2))
    assert len(queries) == 50
    return queries
