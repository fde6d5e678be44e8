"""Text analysis for training-data pipelines: quality scoring, language ID,
token counting, document fingerprinting.

These are the per-document hygiene passes a 100 TB corpus pipeline runs
before dedup/training. All are single-pass, shuffle-free column expressions
(whole-stage codegen; the only wide op is the explode+groupBy in language ID
which is a map-side-combinable count) — at scale they run at parquet scan
speed.

Fingerprint follows Solr's ``TextProfileSignature``/``Lookup3Signature``
idea (``S/update/processor/SignatureUpdateProcessorFactory``): a stable
digest of the normalized token multiset, here md5 over the sorted distinct
token set (SQL-checkable; md5 is identical across Spark/DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .registry import register

TOKEN_RE = "[0-9A-Za-z_](?:['’]?[0-9A-Za-z_]){0,254}"
TOKEN_RE_SQL = TOKEN_RE.replace("'", "''")
# BPE-ish subword chunking: short letter runs, digit runs, single punct marks.
BPE_RE = "[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]"

_STOP33 = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks(df: DataFrame) -> DataFrame:
    return df.withColumn("toks", F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0))


# --- quality scoring --------------------------------------------------------

def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features: token/char counts, stopword ratio, mean
    token length — the length/punct/stopword heuristics of C4/Gopher-style
    filters, all from integer counts so the SQL oracle matches bitwise."""
    d = _toks(_docs(spark, sf_dir))
    stop_arr = F.array(*[F.lit(w) for w in _STOP33])
    n_tokens = F.size("toks")
    n_stop = F.size(F.array_intersect(F.col("toks"), stop_arr))  # distinct-stop hits
    sum_len = F.aggregate(
        F.transform(F.col("toks"), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_unique"),
        n_stop.cast("long").alias("n_stop_distinct"),
        (sum_len.cast("double") / n_tokens).alias("mean_token_len"),
        (F.size(F.array_distinct("toks")).cast("double") / n_tokens).alias("ttr"),
    ).orderBy("doc_id")


_STOP_IN = ", ".join(f"'{w}'" for w in _STOP33)

TEXT_QUALITY_SQL = f"""
WITH t AS (
    SELECT doc_id, length(text)::BIGINT AS n_chars,
           regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
    FROM documents
)
SELECT doc_id, n_chars,
       len(toks)::BIGINT AS n_tokens,
       len(list_distinct(toks))::BIGINT AS n_unique,
       len(list_intersect(list_distinct(toks), [{_STOP_IN}]))::BIGINT AS n_stop_distinct,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mean_token_len,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
FROM t ORDER BY doc_id"""


# --- language ID (n-gram/stopword heuristic) --------------------------------

_LEXICONS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "pour"],
}


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-lexicon language ID: argmax over per-language hit counts
    (ties → lexicographically first; zero hits → 'und'). Broadcast lexicon
    join + map-side-combined count — one shuffle on (doc, lang)."""
    from pyspark.sql import Window

    d = _toks(_docs(spark, sf_dir))
    tok = d.select("doc_id", F.explode("toks").alias("term"))
    lex = spark.createDataFrame(
        [(lang, w) for lang, ws in _LEXICONS.items() for w in ws], "lang string, term string"
    )
    hits = (
        tok.join(F.broadcast(lex), "term")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("lang"))
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("best_lang"), "hits")
    )
    return (
        _docs(spark, sf_dir)
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("best_lang"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("lex_hits"),
        )
        .orderBy("doc_id")
    )


_LEX_ROWS = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in _LEXICONS.items() for w in ws
)

TEXT_LANGID_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
    FROM documents
),
lex(lang, term) AS (VALUES {_LEX_ROWS}),
hits AS (
    SELECT doc_id, lang, count(*)::BIGINT AS hits
    FROM tok JOIN lex USING (term) GROUP BY 1, 2
),
best AS (
    SELECT doc_id, lang, hits,
           row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
    FROM hits
)
SELECT d.doc_id,
       coalesce(b.lang, 'und') AS pred_lang,
       coalesce(b.hits, 0)::BIGINT AS lex_hits
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
ORDER BY d.doc_id"""


# --- token counting (whitespace + BPE-ish regex) ----------------------------

def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)).cast("long").alias("n_std"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).cast("long").alias("n_bpe"),
    ).orderBy("doc_id")


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_ws,
       len(regexp_extract_all(text, '{TOKEN_RE_SQL}'))::BIGINT AS n_std,
       len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe
FROM documents ORDER BY doc_id"""


def token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility stats per (source, lang) stratum — the budgeting
    numbers a pretraining run needs before committing a mix: bytes per
    BPE-ish token and subword tokens per whitespace word (high fertility =
    the tokenizer fragments this stratum; a mix weighted by documents
    silently over/under-weights its TOKEN contribution). Ratios are exact
    BIGINT sums divided once in double, so both engines agree bitwise.

    Scale shape: one narrow projection computing per-row counts (JVM
    regex), ONE (source, lang) hash-aggregate, map-side combined — output
    is stratum-bounded."""
    d = _docs(spark, sf_dir)
    per = d.select(
        "source", "lang",
        F.length("text").cast("long").alias("nb"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("nw"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
        .cast("long").alias("nt"),
    )
    agg = per.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nb").alias("bytes"),
        F.sum("nw").alias("words"),
        F.sum("nt").alias("tokens"),
    )
    return agg.select(
        "source", "lang", "n_docs", "bytes", "tokens",
        (F.col("bytes").cast("double") / F.col("tokens").cast("double"))
        .alias("bytes_per_token"),
        (F.col("tokens").cast("double") / F.col("words").cast("double"))
        .alias("fertility"),
    ).orderBy("source", "lang")


TOKEN_FERTILITY_SQL = f"""
WITH per AS (
    SELECT source, lang, length(text)::BIGINT AS nb,
           len(string_split(text, ' '))::BIGINT AS nw,
           len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS nt
    FROM documents
),
agg AS (
    SELECT source, lang, count(*)::BIGINT AS n_docs,
           sum(nb)::BIGINT AS bytes, sum(nw)::BIGINT AS words,
           sum(nt)::BIGINT AS tokens
    FROM per GROUP BY 1, 2
)
SELECT source, lang, n_docs, bytes, tokens,
       bytes::DOUBLE / tokens::DOUBLE AS bytes_per_token,
       tokens::DOUBLE / words::DOUBLE AS fertility
FROM agg ORDER BY source, lang"""


# --- composite quality-filter decision ---------------------------------------

QF_MIN_TOKENS = 20
QF_MAX_TOKENS = 100000
QF_MIN_MEAN_LEN = 2.0
QF_MAX_MEAN_LEN = 12.0
QF_MIN_STOP = 1
QF_MAX_DUP2 = 0.30


def quality_filter_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed C4/Gopher accept/reject DECISION — the step a cleaning
    pipeline actually ships after computing signals: per doc, boolean flags
    for each failure mode (too short/long, degenerate mean token length,
    no stopwords, repetitious bigrams) and the final ``accept``. One
    tokenize pass computes the length/stopword signals as array
    expressions; the bigram-duplication signal reuses the repetition
    zip_with (one (doc, gram) hash-agg). Every signal is a ratio of exact
    BIGINT counts, so the flag comparisons are deterministic on both
    engines.

    Scale shape: two narrow passes (per-row expressions + ONE gram
    hash-agg), one broadcast-free join on doc_id, no UDF — at 100 TB this
    is the same cost class as text_quality + text_repetition fused."""
    d = _toks(_docs(spark, sf_dir))
    n = F.size("toks")
    stop_arr = F.array(*[F.lit(w) for w in _STOP33])
    sum_len = F.aggregate(
        F.transform(F.col("toks"), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    base = d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (sum_len.cast("double") / n).alias("mean_len"),
        F.size(F.array_intersect(F.col("toks"), stop_arr)).cast("long")
        .alias("n_stop"),
    )
    g2 = F.zip_with(
        F.slice("toks", 1, n - 1), F.slice("toks", 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dup2 = (
        d.select("doc_id", F.explode(g2).alias("g"))
        .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("t2"), F.count(F.lit(1)).alias("d2"))
        .select(
            "doc_id",
            ((F.col("t2") - F.col("d2")).cast("double") / F.col("t2"))
            .alias("dup2_frac"),
        )
    )
    j = base.join(dup2, "doc_id", "left").select(
        "doc_id", "n_tokens", "mean_len", "n_stop",
        F.coalesce("dup2_frac", F.lit(0.0)).alias("dup2_frac"),
    )
    too_short = F.col("n_tokens") < QF_MIN_TOKENS
    too_long = F.col("n_tokens") > QF_MAX_TOKENS
    bad_len = (F.col("mean_len") < QF_MIN_MEAN_LEN) | (
        F.col("mean_len") > QF_MAX_MEAN_LEN
    )
    no_stop = F.col("n_stop") < QF_MIN_STOP
    repetitive = F.col("dup2_frac") > QF_MAX_DUP2
    return j.select(
        "doc_id",
        too_short.alias("too_short"), too_long.alias("too_long"),
        bad_len.alias("bad_mean_len"), no_stop.alias("no_stopwords"),
        repetitive.alias("repetitive"),
        (~(too_short | too_long | bad_len | no_stop | repetitive))
        .alias("accept"),
    ).orderBy("doc_id")


QUALITY_FILTER_SQL = f"""
WITH t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
    FROM documents
),
base AS (
    SELECT doc_id, len(toks)::BIGINT AS n_tokens,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / len(toks) AS mean_len,
           len(list_intersect(list_distinct(toks), [{_STOP_IN}]))::BIGINT AS n_stop
    FROM t
),
g AS (
    SELECT doc_id, a.term || ' ' || b.term AS gram FROM (
        SELECT doc_id, unnest(toks) AS term,
               generate_subscripts(toks, 1) AS i FROM t
    ) a JOIN (
        SELECT doc_id, unnest(toks) AS term,
               generate_subscripts(toks, 1) AS i FROM t
    ) b USING (doc_id) WHERE b.i = a.i + 1
),
dup AS (
    SELECT doc_id, CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup2_frac
    FROM (SELECT doc_id, gram, count(*)::BIGINT AS c FROM g GROUP BY 1, 2)
    GROUP BY doc_id
),
j AS (
    SELECT b.doc_id, b.n_tokens, b.mean_len, b.n_stop,
           COALESCE(d.dup2_frac, 0.0) AS dup2_frac
    FROM base b LEFT JOIN dup d USING (doc_id)
)
SELECT doc_id,
       n_tokens < {QF_MIN_TOKENS} AS too_short,
       n_tokens > {QF_MAX_TOKENS} AS too_long,
       (mean_len < {QF_MIN_MEAN_LEN!r} OR mean_len > {QF_MAX_MEAN_LEN!r}) AS bad_mean_len,
       n_stop < {QF_MIN_STOP} AS no_stopwords,
       dup2_frac > {QF_MAX_DUP2!r} AS repetitive,
       NOT (n_tokens < {QF_MIN_TOKENS} OR n_tokens > {QF_MAX_TOKENS}
            OR mean_len < {QF_MIN_MEAN_LEN!r} OR mean_len > {QF_MAX_MEAN_LEN!r}
            OR n_stop < {QF_MIN_STOP} OR dup2_frac > {QF_MAX_DUP2!r}) AS accept
FROM j ORDER BY doc_id"""


register("quality_filter_flags", quality_filter_flags, QUALITY_FILTER_SQL)
register("token_fertility", token_fertility, TOKEN_FERTILITY_SQL)


# --- document fingerprint ---------------------------------------------------

def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable content digest over the sorted distinct token set
    (SignatureUpdateProcessor analog; rolling-hash-free so it is
    order-insensitive and SQL-checkable)."""
    d = _toks(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct("toks")), " ")).alias("fingerprint"),
    ).orderBy("doc_id")


DOC_FINGERPRINT_SQL = f"""
WITH t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks FROM documents
)
SELECT doc_id, md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
FROM t ORDER BY doc_id"""


# --- repetition signals (Gopher-style) --------------------------------------

def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram repetition signals — the Gopher/MassiveText
    "repetitious document" filters (fraction of duplicate n-grams, fraction
    of n-grams taken by the single most frequent one) for n = 2 and 3.

    Scale shape: token n-grams explode once, then ONE map-side-combinable
    count on (doc_id, n, gram) and one tiny per-doc rollup — no per-doc
    quadratic distinct loops, no Python. All signals are ratios of exact
    BIGINT counts, so the double division is deterministic on both engines.
    Docs with fewer than n tokens report 0 n-grams and 0 fractions (left
    join back to the full doc list)."""
    d = _toks(_docs(spark, sf_dir))
    n = F.size("toks")
    g2 = F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    g3 = F.zip_with(
        F.zip_with(
            F.slice("toks", 1, n - 2),
            F.slice("toks", 2, n - 2),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        F.slice("toks", 3, n - 2),
        lambda ab, c: F.concat_ws(" ", ab, c),
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.concat(
                F.transform(g2, lambda g: F.struct(F.lit(2).alias("n"), g.alias("g"))),
                F.transform(g3, lambda g: F.struct(F.lit(3).alias("n"), g.alias("g"))),
            )
        ).alias("ng"),
    ).select("doc_id", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    per = (
        grams.groupBy("doc_id", "n", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n")
        .agg(
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("distinct_g"),
            F.max("c").alias("top"),
        )
    )
    def frac(num, den):
        return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))
    wide = (
        per.groupBy("doc_id")
        .pivot("n", [2, 3])
        .agg(
            F.first("total").alias("total"),
            F.first("distinct_g").alias("distinct"),
            F.first("top").alias("top"),
        )
    )
    return (
        _docs(spark, sf_dir).select("doc_id").join(wide, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("2_total", F.lit(0)).cast("long").alias("n_2grams"),
            frac(
                F.coalesce("2_total", F.lit(0)) - F.coalesce("2_distinct", F.lit(0)),
                F.coalesce("2_total", F.lit(0)),
            ).alias("dup2_frac"),
            frac(F.coalesce("2_top", F.lit(0)), F.coalesce("2_total", F.lit(0))).alias("top2_frac"),
            frac(
                F.coalesce("3_total", F.lit(0)) - F.coalesce("3_distinct", F.lit(0)),
                F.coalesce("3_total", F.lit(0)),
            ).alias("dup3_frac"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_SQL = f"""
WITH t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks FROM documents
),
g AS (
    SELECT doc_id, 2 AS n, toks[i] || ' ' || toks[i + 1] AS g
    FROM t, UNNEST(range(1, len(toks))) AS u(i)
    UNION ALL
    SELECT doc_id, 3 AS n, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
    FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)
),
per AS (
    SELECT doc_id, n, sum(c)::BIGINT AS total, count(*)::BIGINT AS dst, max(c)::BIGINT AS top
    FROM (SELECT doc_id, n, g, count(*)::BIGINT AS c FROM g GROUP BY 1, 2, 3)
    GROUP BY 1, 2
),
wide AS (
    SELECT d.doc_id,
           coalesce(max(CASE WHEN p.n = 2 THEN p.total END), 0) AS t2,
           coalesce(max(CASE WHEN p.n = 2 THEN p.dst END), 0) AS d2,
           coalesce(max(CASE WHEN p.n = 2 THEN p.top END), 0) AS m2,
           coalesce(max(CASE WHEN p.n = 3 THEN p.total END), 0) AS t3,
           coalesce(max(CASE WHEN p.n = 3 THEN p.dst END), 0) AS d3
    FROM documents d LEFT JOIN per p USING (doc_id) GROUP BY 1
)
SELECT doc_id, t2::BIGINT AS n_2grams,
       CASE WHEN t2 > 0 THEN (t2 - d2)::DOUBLE / t2::DOUBLE ELSE 0.0 END AS dup2_frac,
       CASE WHEN t2 > 0 THEN m2::DOUBLE / t2::DOUBLE ELSE 0.0 END AS top2_frac,
       CASE WHEN t3 > 0 THEN (t3 - d3)::DOUBLE / t3::DOUBLE ELSE 0.0 END AS dup3_frac
FROM wide ORDER BY doc_id"""


# --- unigram-LM perplexity quality score -------------------------------------

def text_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bits-per-token under the corpus unigram language model —
    the CCNet-style LM-perplexity quality signal (docs whose token
    distribution diverges from the corpus score high and get filtered):
    H(d) = −(1/|d|) Σ_term tf·log2(count(term)/totalTokens).

    Float discipline: each term's contribution tf·log2(p) is computed in
    double and ROUNDED TO f32 (absorbing libm log2 ULP differences between
    engines), then summed in a DETERMINISTIC term-ordered double fold
    (``F.aggregate`` over a sorted collect_list — same discipline as the
    block-join Total mode); final bits/token takes one more f32 cast.

    Scale shape: one tokenize pass → ONE (doc,term) hash-agg for tfs, ONE
    term hash-agg for the LM (vocab-bounded, broadcast back), ONE per-doc
    fold. No UDF, no driver-side text."""
    d = _toks(_docs(spark, sf_dir))
    dt = d.select("doc_id", F.explode("toks").alias("term")).groupBy(
        "doc_id", "term"
    ).agg(F.count(F.lit(1)).alias("tf"))
    uni = dt.groupBy("term").agg(F.sum("tf").alias("cnt"))
    tot = uni.agg(F.sum("cnt").alias("tot"))
    contrib = (
        dt.join(F.broadcast(uni), "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id", "term", "tf",
            (
                F.col("tf").cast("double")
                * F.log2(F.col("cnt").cast("double") / F.col("tot").cast("double"))
            ).cast("float").alias("c32"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("term", F.col("c32").cast("double").alias("c")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("sum_d"),
        )
        .select(
            "doc_id", "n_tokens",
            (-F.col("sum_d") / F.col("n_tokens").cast("double"))
            .cast("float").alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


TEXT_UNIGRAM_PPL_SQL = f"""
WITH t AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
    FROM documents
),
dt AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t GROUP BY 1, 2),
uni AS (SELECT term, sum(tf)::BIGINT AS cnt FROM dt GROUP BY 1),
tot AS (SELECT sum(cnt)::BIGINT AS tot FROM uni),
contrib AS (
    SELECT dt.doc_id, dt.term, dt.tf,
           CAST(dt.tf::DOUBLE * log2(u.cnt::DOUBLE / tot.tot::DOUBLE) AS FLOAT) AS c32
    FROM dt JOIN uni u USING (term), tot
),
agg AS (
    SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
           list_reduce(list(CAST(c32 AS DOUBLE) ORDER BY term), (a, b) -> a + b) AS sum_d
    FROM contrib GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       CAST(-sum_d / n_tokens::DOUBLE AS FLOAT) AS bits_per_token
FROM agg ORDER BY doc_id"""


def text_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bits-per-bigram under a Jelinek-Mercer interpolated corpus
    BIGRAM language model — the next step up from ``text_unigram_ppl``
    toward the KenLM n-gram scorer CCNet actually runs:
    p(w2|w1) = λ·c(w1,w2)/c(w1·) + (1−λ)·c(w2)/N with λ = 0.9, where
    c(w1·) is w1's left-context total (Σ bigrams starting w1), c(w2) the
    unigram count, N total tokens. H(d) = −(1/nb) Σ_bigram tf·log2(p).
    Docs with fewer than two tokens have no bigram events and are absent
    (the same rows the SQL pos+1 self-join drops).

    Float discipline mirrors the unigram entry: each distinct (w1,w2)'s
    contribution tf·log2(p) is double math ROUNDED TO f32 (absorbing libm
    log2 ULP drift between engines), then a DETERMINISTIC (w1,w2)-ordered
    double fold; bits-per-bigram takes one final f32 cast.

    Scale shape: bigrams come from ONE zero-shuffle array zip over the
    tokenize pass (no positions join); then ONE (doc,w1,w2) hash-agg, two
    vocab-bounded model aggs broadcast back, ONE per-doc fold. No UDF. At
    100 TB the bigram vocabulary is the only state that grows — it stays
    a (terms²-bounded, in practice Zipf-thin) broadcast table; a hashed
    bucket LM (the DSIR entry's trick) is the documented fallback."""
    lam = 0.9
    d = _toks(_docs(spark, sf_dir))
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "arrays_zip(slice(toks, 1, greatest(size(toks)-1, 0)),"
                " slice(toks, 2, greatest(size(toks)-1, 0)))"
            )
        ).alias("z"),
    ).select(
        "doc_id",
        F.col("z").getField("0").alias("w1"),
        F.col("z").getField("1").alias("w2"),
    )
    dt = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    bmodel = dt.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    ctx = bmodel.groupBy("w1").agg(F.sum("cb").alias("c1"))
    uni = (
        _toks(_docs(spark, sf_dir))
        .select(F.explode("toks").alias("w2"))
        .groupBy("w2").agg(F.count(F.lit(1)).alias("cu"))
    )
    tot = uni.agg(F.sum("cu").alias("tot"))
    p = (
        F.lit(lam) * F.col("cb").cast("double") / F.col("c1").cast("double")
        + (F.lit(1.0) - F.lit(lam))
        * F.col("cu").cast("double") / F.col("tot").cast("double")
    )
    contrib = (
        dt.join(F.broadcast(bmodel), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(uni), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id", "w1", "w2", "tf",
            (F.col("tf").cast("double") * F.log2(p)).cast("float").alias("c32"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.aggregate(
                F.sort_array(
                    F.collect_list(
                        F.struct("w1", "w2", F.col("c32").cast("double").alias("c"))
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("sum_d"),
        )
        .select(
            "doc_id", "n_bigrams",
            (-F.col("sum_d") / F.col("n_bigrams").cast("double"))
            .cast("float").alias("bits_per_bigram"),
        )
        .orderBy("doc_id")
    )


TEXT_BIGRAM_PPL_SQL = f"""
WITH t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks
    FROM documents
),
rt AS (
    SELECT doc_id, unnest(toks) AS term,
           generate_subscripts(toks, 1) AS pos
    FROM t
),
bgr AS (
    SELECT a.doc_id, a.term AS w1, b.term AS w2
    FROM rt a JOIN rt b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
dt AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS tf FROM bgr GROUP BY 1, 2, 3),
bmodel AS (SELECT w1, w2, sum(tf)::BIGINT AS cb FROM dt GROUP BY 1, 2),
ctx AS (SELECT w1, sum(cb)::BIGINT AS c1 FROM bmodel GROUP BY 1),
uni AS (SELECT term AS w2, count(*)::BIGINT AS cu FROM rt GROUP BY 1),
tot AS (SELECT sum(cu)::BIGINT AS tot FROM uni),
contrib AS (
    SELECT dt.doc_id, dt.w1, dt.w2, dt.tf,
           CAST(dt.tf::DOUBLE * log2(
               CAST(0.9 AS DOUBLE) * bm.cb::DOUBLE / cx.c1::DOUBLE
               + (CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
                 * u.cu::DOUBLE / tot.tot::DOUBLE
           ) AS FLOAT) AS c32
    FROM dt JOIN bmodel bm USING (w1, w2) JOIN ctx cx USING (w1)
         JOIN uni u USING (w2), tot
),
agg AS (
    SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
           list_reduce(
               list(CAST(c32 AS DOUBLE) ORDER BY w1, w2), (a, b) -> a + b
           ) AS sum_d
    FROM contrib GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       CAST(-sum_d / n_bigrams::DOUBLE AS FLOAT) AS bits_per_bigram
FROM agg ORDER BY doc_id"""


register("text_unigram_ppl", text_unigram_ppl, TEXT_UNIGRAM_PPL_SQL)
register("text_bigram_ppl", text_bigram_ppl, TEXT_BIGRAM_PPL_SQL)
register("text_repetition", text_repetition, TEXT_REPETITION_SQL)
register("text_quality", text_quality, TEXT_QUALITY_SQL)
register("text_langid", text_langid, TEXT_LANGID_SQL)
register("token_counts", token_counts, TOKEN_COUNTS_SQL)
register("doc_fingerprint", doc_fingerprint, DOC_FINGERPRINT_SQL)
