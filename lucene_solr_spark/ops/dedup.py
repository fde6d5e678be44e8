"""Deduplication operators for training-data pipelines: exact hash dedup,
n-gram (shingle) Jaccard near-dup, MinHash + LSH banding, SimHash.

Scale design (the point of these ops at 100 TB):
- **Exact**: one hash-groupBy on md5(text) — map-side combine, one shuffle.
- **Shingle Jaccard**: the candidate generator is a self-equi-join on the
  shingle column. Hot shingles are the skew hazard: ``max_shingle_df``
  drops shingles present in more than that many docs (boilerplate removal —
  standard practice; they carry no near-dup signal and quadratically blow
  up the join). The verified jaccard is exact set arithmetic.
- **MinHash LSH**: linear passes only — per-(doc, seed) min over md5-hashed
  shingles (16 signatures), banded into 4 buckets of 4; candidate pairs are
  an equi-join on (band, band_hash), i.e. only colliding docs ever meet.
  This is THE sub-quadratic near-dup path for 10^9+ docs; the pairwise
  verify join runs on the tiny candidate set.

All hashing is md5-over-utf8 (identical in Spark and DuckDB) so every stage
is SQL-cross-checkable — no engine-private hash functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .registry import register
from .textmetrics import TOKEN_RE, TOKEN_RE_SQL

N_SEEDS = 16
BAND_SIZE = 4
N_BANDS = N_SEEDS // BAND_SIZE


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def shingles(docs: DataFrame, n: int = 3, max_shingle_df: int | None = None) -> DataFrame:
    """Distinct token n-gram shingles per doc → (doc_id, shingle)."""
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("pos", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    cols = [F.col("term")] + [F.lead("term", i).over(w).alias(f"t{i}") for i in range(1, n)]
    sh = (
        tok.select("doc_id", *cols)
        .filter(F.col(f"t{n-1}").isNotNull())
        .select("doc_id", F.concat_ws(" ", "term", *[f"t{i}" for i in range(1, n)]).alias("shingle"))
        .distinct()
    )
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    return sh


def jaccard_pairs(sh: DataFrame, threshold: float, cand: DataFrame | None = None) -> DataFrame:
    """Exact pairwise Jaccard → pairs ≥ threshold.

    Without ``cand``: over ALL doc pairs sharing ≥1 shingle (the quadratic
    generator — only for small corpora / the SQL oracle's semantics). With
    ``cand`` (doc_a, doc_b): intersections are computed ONLY for candidate
    pairs — the shingle self-join is pre-restricted on both sides, so the
    verify cost is O(candidates), not O(all co-shingled pairs). This is what
    makes LSH sub-quadratic end-to-end at 10^9 docs."""
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    if cand is None:
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        inter = (
            cand.join(a, F.col("a.doc_id") == F.col("doc_a"))
            .join(b, (F.col("b.doc_id") == F.col("doc_b")) & (F.col("a.shingle") == F.col("b.shingle")))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sza = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    szb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sza, "doc_a").join(szb, "doc_b")
        .withColumn("jaccard", F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "na", "nb", "jaccard")
    )


# --- exact dedup ------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash (hash-groupBy, one shuffle)."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("content_hash")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, count(*)::BIGINT AS n_docs, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1"""


# --- shingle jaccard near-dup ----------------------------------------------

SHINGLE_MAX_DF = 50  # boilerplate guard: a shingle in >50 docs carries no
                     # near-dup signal and costs O(df^2) candidate pairs in
                     # the co-shingle join — dropping it bounds every
                     # shingle's join fan-out (the skew fix that makes the
                     # generator survive hot boilerplate at scale)


def dedup_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.8 with the hot-shingle
    guard APPLIED (max_shingle_df): candidate pairs come from the co-shingle
    equi-join over the filtered shingle table, so per-shingle fan-out is
    bounded by SHINGLE_MAX_DF². The oracle applies the identical filter."""
    sh = shingles(_docs(spark, sf_dir), n=3, max_shingle_df=SHINGLE_MAX_DF)
    return jaccard_pairs(sh, 0.8).orderBy("doc_a", "doc_b")


DEDUP_SHINGLE_SQL = f"""
WITH tl AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks FROM documents
),
t AS (
    SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tl
),
sh0 AS (
    SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
    FROM t a
    JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
hot AS (
    SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) > {SHINGLE_MAX_DF}
),
sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
pairs AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*)::BIGINT AS inter
    FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, sa.n AS na, sb.n AS nb,
       inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
FROM pairs JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.8
ORDER BY doc_a, doc_b"""


# --- MinHash + LSH banding --------------------------------------------------

def lsh_bands(sh: DataFrame, n_seeds: int = N_SEEDS, band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band, band_hash) straight from the shingle table.

    All 16 per-seed minhashes are computed as 16 ``min`` aggregates in ONE
    groupBy(doc_id) — map-side combine, one shuffle of one row per doc —
    instead of a 16× row-explode (seed crossJoin) that would multiply the
    shuffled shingle volume by the seed count. Band hashes are md5 over the
    seed-ordered minhashes (identical bytes to the SQL oracle's
    ``string_agg(mh, ':' ORDER BY seed)``)."""
    sig = sh.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(n_seeds)
    ])
    band_hashes = [
        F.md5(F.concat_ws(":", *[f"mh{b * band_size + i}" for i in range(band_size)]))
        for b in range(n_seeds // band_size)
    ]
    return sig.select(
        "doc_id", F.posexplode(F.array(*band_hashes)).alias("band", "band_hash")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidates from LSH band collisions, verified with exact Jaccard ≥ 0.7
    computed ONLY on the candidate pairs (sub-quadratic end-to-end)."""
    sh = shingles(_docs(spark, sf_dir), n=3)
    bands = lsh_bands(sh)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = jaccard_pairs(sh, 0.7, cand=cand)
    return verified.select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")


DEDUP_MINHASH_SQL = f"""
WITH tl AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks FROM documents
),
t AS (
    SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tl
),
sh AS (
    SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
    FROM t a
    JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
seeds AS (SELECT unnest(generate_series(0, {N_SEEDS - 1})) AS seed),
mh AS (
    SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || shingle)) AS mh
    FROM sh, seeds GROUP BY 1, 2
),
bands AS (
    SELECT doc_id, (seed // {BAND_SIZE})::INTEGER AS band,
           md5(string_agg(mh, ':' ORDER BY seed)) AS band_hash
    FROM mh GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
pairs AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*)::BIGINT AS inter
    FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT doc_a, doc_b, inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
    FROM pairs JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
    WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.7
)
SELECT j.doc_a, j.doc_b, j.jaccard
FROM jac j JOIN cand c ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
ORDER BY 1, 2"""


# --- SimHash ------------------------------------------------------------------

SIMHASH_BITS = 32
SIMHASH_BAND_BITS = 8
SIMHASH_MAX_HAMMING = 3  # 4 bands of 8 bits: any pair within distance 3
                         # shares >=1 unchanged band (pigeonhole), so the
                         # band join is a LOSSLESS candidate generator.
# SCALE NOTE: 32-bit fingerprints / 8-bit bands are sized for the
# oracle-checked test corpus (band domain = 256 values). At 10^9-doc scale
# the same pipeline runs with SIMHASH_BITS=64 / SIMHASH_BAND_BITS=16 (still
# 4 bands, still lossless at Hamming<=3, 65536-value band domain); beyond
# that, cap per-(band, band_val) bucket sizes before the self-join exactly
# like max_shingle_df does for shingles — a bucket holding k docs costs
# k^2/2 candidate pairs, and near-saturated buckets are boilerplate-driven,
# not near-dup signal (Manku et al., WWW'07 use the same drop).


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): tf-weighted 32-bit SimHash per doc.

    All JVM-side built-ins, two shuffles total (both keyed on doc_id, and
    the second reuses the first's partitioning): tokenize → tf per
    (doc, term) → explode 32 bit positions of md5-derived term hashes →
    signed vote per (doc, bit) folded into the same aggregation → sign →
    fingerprint. The 32× bit explode happens AFTER tf aggregation, so it
    multiplies the (doc, distinct-term) table, not the raw token stream.
    """
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long"))
    )
    votes = (
        tf.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
            "h",
            "tf",
        )
        .groupBy("doc_id", "bit")
        .agg(
            F.sum(
                F.when(F.expr("(h >> bit) & 1") == 1, F.col("tf")).otherwise(-F.col("tf"))
            ).alias("s")
        )
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0))
        ).alias("fp")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= 3.

    Candidates come from an equi-join on 8-bit bands (sub-quadratic: only
    docs colliding on a band ever meet — the 10^9-doc path); the exact
    bit_count(xor) verify runs on that small candidate set only, and is
    lossless for the distance-3 threshold.
    """
    fp = simhash_fingerprints(_docs(spark, sf_dir))
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    bands = fp.select(
        "doc_id",
        "fp",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_val", F.expr(f"(fp >> (band * {SIMHASH_BAND_BITS})) & 255")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "fp_a", "fp_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# Oracle is the brute-force pairwise scan — it deliberately does NOT band, so
# an exact match also certifies the band generator lossless at threshold 3.
DEDUP_SIMHASH_SQL = f"""
WITH t AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf,
           ('0x' || substr(md5(term), 1, 8))::UBIGINT::BIGINT AS h
    FROM t GROUP BY 1, 2
),
votes AS (
    SELECT doc_id, bit,
           sum(CASE WHEN (h >> bit) & 1 = 1 THEN tf ELSE -tf END) AS s
    FROM tf, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit)
    GROUP BY 1, 2
),
fp AS (
    SELECT doc_id,
           sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS fp
    FROM votes GROUP BY 1
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fp AS fp_a, b.fp AS fp_b,
       bit_count(xor(a.fp, b.fp))::INTEGER AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {SIMHASH_MAX_HAMMING}
ORDER BY 1, 2"""


register("dedup_exact", dedup_exact, DEDUP_EXACT_SQL)
register("dedup_shingle_jaccard", dedup_shingle_jaccard, DEDUP_SHINGLE_SQL)
register("dedup_minhash_lsh", dedup_minhash_lsh, DEDUP_MINHASH_SQL)
register("dedup_simhash", dedup_simhash, DEDUP_SIMHASH_SQL)
