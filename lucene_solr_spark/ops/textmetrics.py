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


register("text_quality", text_quality, TEXT_QUALITY_SQL)
register("text_langid", text_langid, TEXT_LANGID_SQL)
register("token_counts", token_counts, TOKEN_COUNTS_SQL)
register("doc_fingerprint", doc_fingerprint, DOC_FINGERPRINT_SQL)
