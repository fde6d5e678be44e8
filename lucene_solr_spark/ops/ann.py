"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k (the exact baseline) and a random-hyperplane LSH-bucketed
variant (the sub-linear scale path).

Scale design:
- **Brute force** is one narrow pass: dot/norm are ``zip_with`` +
  ``aggregate`` fold expressions (JVM codegen, no Python), then a global
  TakeOrdered(k). At 100 TB this is the per-partition scoring baseline and
  the verifier for approximate paths.
- **LSH**: 8 deterministic random hyperplanes (derived from md5, embedded as
  literals — engine-independent), signature banded into 2×4 bits; only
  vectors sharing a band bucket with the probe are scored. At scale the
  bucket join replaces the full scan with an equi-join on (band, bits) —
  the same banding trick as MinHash dedup (ops/dedup.py).

Float discipline: all similarity math in float64; final cosine rounded to
6 decimals on BOTH engines (summation-order differences are ~1e-15, six
orders below the rounding quantum).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .registry import register

DIM = 64
N_PLANES = 8
BAND_BITS = 4
PROBE_VEC_ID = 0


def _hp_value(j: int, d: int) -> float:
    """Deterministic hyperplane component in [-1, 1): md5('hp:j:d') → u32."""
    h = hashlib.md5(f"hp:{j}:{d}".encode()).hexdigest()
    return int(h[:8], 16) / 2147483648.0 - 1.0


HYPERPLANES = [[_hp_value(j, d) for d in range(DIM)] for j in range(N_PLANES)]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(emb: DataFrame, probe: list[float], k: int, exclude_id: int | None = None) -> DataFrame:
    """Exact cosine top-k against a probe vector → (vec_id, cos_sim)."""
    pv = F.array(*[F.lit(float(x)) for x in probe])
    d = emb
    if exclude_id is not None:
        d = d.filter(F.col("vec_id") != exclude_id)
    return (
        d.select(
            "vec_id",
            F.round(_dot(F.col("embedding"), pv) / (_norm(F.col("embedding")) * _norm(pv)), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def _probe_vector(spark: SparkSession, sf_dir: str, vec_id: int) -> list[float]:
    """One probe vector — a PRUNED Spark read (vec_id predicate pushed to the
    parquet scan, embedding column only): exactly one row crosses to the
    driver regardless of table size."""
    row = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") == F.lit(vec_id))
        .select("embedding")
        .head()
    )
    return [float(x) for x in row.embedding]


# --- brute-force knn --------------------------------------------------------

def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    probe = _probe_vector(spark, sf_dir, PROBE_VEC_ID)
    return cosine_topk(_emb(spark, sf_dir), probe, k=10, exclude_id=PROBE_VEC_ID)


ANN_COSINE_SQL = f"""
WITH probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
pe AS (SELECT unnest(pv) AS p, generate_subscripts(pv, 1) AS i FROM probe),
ex AS (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
    FROM embeddings WHERE vec_id != {PROBE_VEC_ID}
),
np AS (SELECT sqrt(sum(p::DOUBLE * p::DOUBLE)) AS npv FROM pe),
dots AS (
    SELECT vec_id, sum(x::DOUBLE * p::DOUBLE) AS dot,
           sqrt(sum(x::DOUBLE * x::DOUBLE)) AS na
    FROM ex JOIN pe USING (i) GROUP BY 1
)
SELECT vec_id, round(dot / (na * npv), 6) AS cos_sim
FROM dots, np
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10"""


# --- embedding-cosine near-dup: top similar pairs over LSH candidates -------

def embed_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar embedding pairs among LSH band-bucket candidates —
    embedding-cosine near-dup with the SCALE-PATH generator registered: only
    pairs colliding on ≥1 random-hyperplane band are ever scored (an
    equi-join on (band, bits) — same banding discipline as MinHash dedup),
    never the all-pairs crossJoin. The exact cosine verify runs on that
    candidate set only. The oracle reproduces the identical
    generator+verify, so the driver certifies both stages."""
    banded = lsh_bands_df(_emb(spark, sf_dir))
    a = banded.select("vec_id", "band", "bits").alias("a")
    b = banded.select("vec_id", "band", "bits").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        .distinct()
    )
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    ea = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    return (
        cand.join(ea, "va").join(eb, "vb")
        .select(
            "va", "vb",
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("va"), F.asc("vb"))
        .limit(20)
    )


def _embed_top_pairs_sql() -> str:
    return f"""
WITH hp(j, i, v) AS (VALUES {_hp_sql_rows()}),
ex AS (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
proj AS (
    SELECT e.vec_id, h.j, sum(e.x::DOUBLE * h.v) AS p
    FROM ex e JOIN hp h USING (i) GROUP BY 1, 2
),
bits AS (
    SELECT vec_id, (j // {BAND_BITS})::INTEGER AS band,
           sum(CASE WHEN p >= 0 THEN (2 ** (j % {BAND_BITS}))::INTEGER ELSE 0 END)::INTEGER AS bits
    FROM proj GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
    FROM bits a JOIN bits b
      ON a.band = b.band AND a.bits = b.bits AND a.vec_id < b.vec_id
),
norms AS (SELECT vec_id, sqrt(sum(x::DOUBLE * x::DOUBLE)) AS nrm FROM ex GROUP BY 1),
dots AS (
    SELECT c.va, c.vb, sum(a.x::DOUBLE * b.x::DOUBLE) AS dot
    FROM cand c
    JOIN ex a ON a.vec_id = c.va
    JOIN ex b ON b.vec_id = c.vb AND b.i = a.i
    GROUP BY 1, 2
)
SELECT va, vb, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
FROM dots JOIN norms na ON na.vec_id = va JOIN norms nb ON nb.vec_id = vb
ORDER BY cos_sim DESC, va ASC, vb ASC LIMIT 20"""


# --- LSH-bucketed ANN -------------------------------------------------------

def _signature_bits(emb_col: Column) -> list[Column]:
    return [
        F.when(_dot(emb_col, F.array(*[F.lit(v) for v in plane])) >= 0, 1).otherwise(0)
        for plane in HYPERPLANES
    ]


def lsh_bands_df(emb: DataFrame) -> DataFrame:
    """(vec_id, band, bits): banded random-hyperplane signature."""
    bits = _signature_bits(F.col("embedding"))
    out = emb.select("vec_id", "embedding", *[bits[j].alias(f"bit{j}") for j in range(N_PLANES)])
    bands = []
    for band in range(N_PLANES // BAND_BITS):
        expr = F.lit(0)
        for j in range(BAND_BITS):
            expr = expr + (F.col(f"bit{band * BAND_BITS + j}") * (2 ** j))
        bands.append(
            out.select("vec_id", "embedding", F.lit(band).alias("band"), expr.cast("int").alias("bits"))
        )
    res = bands[0]
    for b in bands[1:]:
        res = res.unionAll(b)
    return res


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: score only vectors sharing ≥1 LSH band bucket with the probe."""
    emb = _emb(spark, sf_dir)
    banded = lsh_bands_df(emb)
    probe_bands = banded.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("band").alias("pband"), F.col("bits").alias("pbits")
    )
    cand = (
        banded.filter(F.col("vec_id") != PROBE_VEC_ID)
        .join(
            F.broadcast(probe_bands),
            (F.col("band") == F.col("pband")) & (F.col("bits") == F.col("pbits")),
        )
        .select("vec_id")
        .distinct()
    )
    probe = _probe_vector(spark, sf_dir, PROBE_VEC_ID)
    pv = F.array(*[F.lit(float(x)) for x in probe])
    return (
        emb.join(cand, "vec_id")
        .select(
            "vec_id",
            F.round(_dot(F.col("embedding"), pv) / (_norm(F.col("embedding")) * _norm(pv)), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


def _hp_sql_rows() -> str:
    return ", ".join(
        f"({j}, {d + 1}, {HYPERPLANES[j][d]!r})" for j in range(N_PLANES) for d in range(DIM)
    )


ANN_LSH_SQL = f"""
WITH hp(j, i, v) AS (VALUES {_hp_sql_rows()}),
ex AS (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
proj AS (
    SELECT e.vec_id, h.j, sum(e.x::DOUBLE * h.v) AS p
    FROM ex e JOIN hp h USING (i) GROUP BY 1, 2
),
bits AS (
    SELECT vec_id, (j // {BAND_BITS})::INTEGER AS band,
           sum(CASE WHEN p >= 0 THEN (2 ** (j % {BAND_BITS}))::INTEGER ELSE 0 END)::INTEGER AS bits
    FROM proj GROUP BY 1, 2
),
pband AS (SELECT band, bits FROM bits WHERE vec_id = {PROBE_VEC_ID}),
cand AS (
    SELECT DISTINCT b.vec_id
    FROM bits b JOIN pband p ON b.band = p.band AND b.bits = p.bits
    WHERE b.vec_id != {PROBE_VEC_ID}
),
pe AS (
    SELECT unnest(embedding) AS p, generate_subscripts(embedding, 1) AS i
    FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
),
np AS (SELECT sqrt(sum(p::DOUBLE * p::DOUBLE)) AS npv FROM pe),
dots AS (
    SELECT e.vec_id, sum(e.x::DOUBLE * pe.p::DOUBLE) AS dot,
           sqrt(sum(e.x::DOUBLE * e.x::DOUBLE)) AS na
    FROM ex e JOIN pe USING (i) JOIN cand c ON c.vec_id = e.vec_id
    GROUP BY 1
)
SELECT vec_id, round(dot / (na * npv), 6) AS cos_sim
FROM dots, np
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10"""


# --- IVF-Flat ANN ------------------------------------------------------------
# Inverted-file index: partition vectors into cells by nearest centroid, probe
# only the NPROBE cells closest to the query. Centroids here are a
# deterministic sample (vec_id < N_CENTROIDS) rather than k-means iterations —
# the index/query structure is identical, and determinism keeps it
# SQL-cross-checkable. At scale: centroids broadcast (tiny), assignment is one
# narrow pass, and `cell` becomes the partition key of the IVF table so a
# probe reads only nprobe/ncells of the data (partition pruning does the
# "inverted file" part).

N_CENTROIDS = 16
NPROBE = 4


def _assign_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell): nearest centroid by cosine (ties → lower
    centroid id). Cosine rounded to 9 dp before the argmax so summation-order
    noise (~1e-15) can never flip the assignment between engines."""
    from pyspark.sql import Window

    c = F.broadcast(centroids.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    ))
    scored = emb.crossJoin(c).select(
        "vec_id", "embedding", "cid",
        F.round(
            _dot(F.col("embedding"), F.col("ce"))
            / (_norm(F.col("embedding")) * _norm(F.col("ce"))), 9
        ).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cid").alias("cell"))
    )


def kmeans_centroids(emb: DataFrame, n_centroids: int = N_CENTROIDS, iters: int = 2) -> DataFrame:
    """Deterministic Lloyd iterations, DataFrame-only: init = the sample
    centroids (vec_id < n), assign by rounded cosine (broadcast centroids,
    one narrow pass), new centroid = per-cell per-dimension mean
    (posexplode → one hash-agg → collect_list re-assembly, all JVM-side).
    Returns (vec_id=cell id, embedding=centroid vector). Deterministic:
    init is data-derived, assignment ties break on cell id, means are
    order-independent up to float summation noise (assignments use 9-dp
    rounded cosine, far above that noise floor).

    Scale shape: per iteration = one crossJoin vs n broadcast centroids
    (linear in N·n), one shuffle keyed on (cell, dim). n_centroids at 10^9+
    vectors would be ~sqrt(N) with a sampled training subset — same plan,
    sampled input."""
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("ce")
    )
    for _ in range(iters):
        assigned = _assign_cells(emb, cents.select(
            F.col("cell").alias("vec_id"), F.col("ce").alias("embedding")
        ))
        dims = assigned.select(
            "cell", F.posexplode("embedding").alias("dim", "x")
        )
        means = (
            dims.groupBy("cell", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                "cell",
                F.transform("dm", lambda s: s.m.cast("float")).alias("ce"),
            )
        )
        # empty cells keep their previous centroid
        cents = (
            cents.alias("old")
            .join(means.alias("new"), "cell", "left")
            .select(
                "cell",
                F.coalesce(F.col("new.ce"), F.col("old.ce")).alias("ce"),
            )
        )
    return cents.select(F.col("cell").alias("vec_id"), F.col("ce").alias("embedding"))


def ivf_topk_with_centroids(
    spark: SparkSession, sf_dir: str, centroids: DataFrame, k: int = 10
) -> DataFrame:
    """IVF query path against an arbitrary centroid set (shared by the
    sample-centroid oracle entry and the k-means-trained variant)."""
    emb = _emb(spark, sf_dir)
    assigned = _assign_cells(emb, centroids)
    probe = _probe_vector(spark, sf_dir, PROBE_VEC_ID)
    pv = F.array(*[F.lit(float(x)) for x in probe])
    probe_cells = (
        centroids.select(
            F.col("vec_id").alias("cell"),
            F.round(
                _dot(F.col("embedding"), pv) / (_norm(F.col("embedding")) * _norm(pv)), 9
            ).alias("pcos"),
        )
        .orderBy(F.desc("pcos"), F.asc("cell"))
        .limit(NPROBE)
        .select("cell")
    )
    return (
        assigned.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("vec_id") != PROBE_VEC_ID)
        .select(
            "vec_id",
            F.round(_dot(F.col("embedding"), pv) / (_norm(F.col("embedding")) * _norm(pv)), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """IVF with k-means-trained cells (2 Lloyd iterations from the sample
    init). Pytest-gated (tests/test_ann_ivf.py: determinism + recall ≥ the
    sample-centroid variant); the driver-oracled entry stays the
    deterministic-sample one, whose SQL oracle has no iterative float
    accumulation to chase."""
    emb = _emb(spark, sf_dir)
    return ivf_topk_with_centroids(spark, sf_dir, kmeans_centroids(emb), k)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS)
    assigned = _assign_cells(emb, centroids)
    probe = _probe_vector(spark, sf_dir, PROBE_VEC_ID)
    pv = F.array(*[F.lit(float(x)) for x in probe])
    probe_cells = (
        centroids.select(
            F.col("vec_id").alias("cell"),
            F.round(
                _dot(F.col("embedding"), pv) / (_norm(F.col("embedding")) * _norm(pv)), 9
            ).alias("pcos"),
        )
        .orderBy(F.desc("pcos"), F.asc("cell"))
        .limit(NPROBE)
        .select("cell")
    )
    return (
        assigned.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("vec_id") != PROBE_VEC_ID)
        .select(
            "vec_id",
            F.round(_dot(F.col("embedding"), pv) / (_norm(F.col("embedding")) * _norm(pv)), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


ANN_IVF_SQL = f"""
WITH ex AS (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(x::DOUBLE * x::DOUBLE)) AS nrm FROM ex GROUP BY 1),
ccos AS (
    SELECT v.vec_id, c.vec_id AS cid,
           round(sum(v.x::DOUBLE * c.x::DOUBLE) / (nv.nrm * nc.nrm), 9) AS ccos
    FROM ex v JOIN ex c USING (i)
    JOIN norms nv ON nv.vec_id = v.vec_id JOIN norms nc ON nc.vec_id = c.vec_id
    WHERE c.vec_id < {N_CENTROIDS}
    GROUP BY 1, 2, nv.nrm, nc.nrm
),
assigned AS (
    SELECT vec_id, cid AS cell
    FROM (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
          FROM ccos)
    WHERE rn = 1
),
probe_cells AS (
    SELECT cid AS cell FROM ccos WHERE vec_id = {PROBE_VEC_ID}
    ORDER BY ccos DESC, cid ASC LIMIT {NPROBE}
),
pe AS (
    SELECT unnest(embedding) AS p, generate_subscripts(embedding, 1) AS i
    FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
),
np AS (SELECT sqrt(sum(p::DOUBLE * p::DOUBLE)) AS npv FROM pe),
dots AS (
    SELECT e.vec_id, sum(e.x::DOUBLE * pe.p::DOUBLE) AS dot, nv.nrm AS na
    FROM ex e JOIN pe USING (i)
    JOIN assigned a ON a.vec_id = e.vec_id
    JOIN probe_cells pc ON pc.cell = a.cell
    JOIN norms nv ON nv.vec_id = e.vec_id
    WHERE e.vec_id != {PROBE_VEC_ID}
    GROUP BY 1, nv.nrm
)
SELECT vec_id, round(dot / (na * npv), 6) AS cos_sim
FROM dots, np
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10"""


# --- int8 scalar-quantized ANN ----------------------------------------------

SQ_CAND = 50  # candidates kept from the quantized pass before exact rerank


def ann_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized ANN (the Lucene 9.x
    ``Lucene99ScalarQuantizedVectorsFormat`` idea): components quantize to
    int8 against the corpus-wide max-|x| scale, the candidate pass ranks by
    the EXACT INTEGER quantized dot product (4× less memory traffic than
    f32 at scale, SIMD-friendly), and only the top ``SQ_CAND`` survivors
    get the exact f32 cosine rerank.

    Float discipline: the quantized pass is pure integers (floor(x·127/s +
    0.5) — explicit half-up so numpy/JVM/DuckDB agree); the only floats are
    the final reranked cosines, rounded to 6dp like every ANN entry.
    Scale shape: one global max-reduce for the scale, one JVM-expression
    projection per row, ONE TakeOrdered for candidates, rerank on 50 rows."""
    emb = _emb(spark, sf_dir)
    scale_df = emb.select(
        F.max(F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))).alias("s")
    )
    probe = _probe_vector(spark, sf_dir, PROBE_VEC_ID)
    pv = F.array(*[F.lit(float(x)) for x in probe])

    def quant(col):
        return F.transform(
            col,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x.cast("double") * 127.0 / F.col("s") + 0.5).cast("int"),
                ),
            ),
        )

    qd = (
        emb.filter(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(scale_df))
        .select(
            "vec_id", "embedding",
            F.aggregate(
                F.zip_with(
                    quant(F.col("embedding")), quant(pv),
                    lambda a, b: (a * b).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    cand = qd.orderBy(F.desc("qdot"), F.asc("vec_id")).limit(SQ_CAND)
    return (
        cand.select(
            "vec_id", "qdot",
            F.round(
                _dot(F.col("embedding"), pv) / (_norm(F.col("embedding")) * _norm(pv)), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


ANN_SQ_SQL = f"""
WITH scale AS (
    SELECT max(m) AS s FROM (
        SELECT list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
        FROM embeddings
    )
),
probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
qp AS (
    SELECT list_transform(
        pv, x -> greatest(-127, least(127, floor(x::DOUBLE * 127.0 / s + 0.5)))::BIGINT
    ) AS q FROM probe, scale
),
qe AS (
    SELECT vec_id, embedding,
           list_transform(
               embedding,
               x -> greatest(-127, least(127, floor(x::DOUBLE * 127.0 / s + 0.5)))::BIGINT
           ) AS q
    FROM embeddings, scale WHERE vec_id != {PROBE_VEC_ID}
),
qdots AS (
    SELECT vec_id, embedding,
           (SELECT sum(a * b)::BIGINT
            FROM (SELECT unnest(qe.q) AS a, unnest(qp.q) AS b)) AS qdot
    FROM qe, qp
),
cand AS (
    SELECT * FROM qdots ORDER BY qdot DESC, vec_id ASC LIMIT {SQ_CAND}
),
pe AS (SELECT unnest(pv) AS p, generate_subscripts(pv, 1) AS i FROM probe),
ce AS (
    SELECT vec_id, qdot, unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM cand
),
np AS (SELECT sqrt(sum(p::DOUBLE * p::DOUBLE)) AS npv FROM pe),
rer AS (
    SELECT vec_id, any_value(qdot) AS qdot,
           sum(x::DOUBLE * p::DOUBLE) AS dot, sqrt(sum(x::DOUBLE * x::DOUBLE)) AS na
    FROM ce JOIN pe USING (i) GROUP BY vec_id
)
SELECT vec_id, qdot::BIGINT AS qdot, round(dot / (na * npv), 6) AS cos_sim
FROM rer, np ORDER BY cos_sim DESC, vec_id ASC LIMIT 10"""


# --- IVF-PQ-style product quantization ---------------------------------------

PQ_M = 8          # subspaces (64 dims → 8 per subspace)
PQ_K = 16         # codes per subspace; codebook donors = vec_id < PQ_K
PQ_SUB = 8        # dims per subspace
PQ_CAND = 50      # ADC candidates surviving to the exact rerank


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou/Douze/Schmid PAMI 2011 — the PQ/ADC
    path of FAISS IVF-PQ, and the idea behind Lucene 9.x vector-format
    compression work): each vector's 64 dims split into ``PQ_M``=8
    subspaces; per subspace the vector is replaced by the id of its nearest
    codebook entry (4 bits here: ``PQ_K``=16 codes) — 64 f32 → 8 nibbles,
    a 32× memory-traffic cut on the candidate pass. Query time builds one
    Asymmetric Distance Computation (ADC) lookup table — dot(query_sub,
    code) per (subspace, code) — and candidate score = Σ_m LUT[m][code_m],
    pure table lookups. Top ``PQ_CAND`` ADC candidates get the exact f32
    cosine rerank. Codebooks here are the deterministic donor discipline
    the IVF entry already uses (subvectors of vec_id < PQ_K); the
    k-means-trained upgrade is `kmeans_centroids` run per subspace.

    Float discipline: every dot/L2 fold is an IN-ORDER left fold
    (``F.aggregate`` over array order ≡ DuckDB ``list_reduce`` over
    ``ORDER BY`` lists) so encodings, ADC scores, and ties are bitwise
    identical on both engines; ties in the argmin take the FIRST minimal
    code (array_position/list_position agree). Scale shape: codebook +
    probe are bounded driver reads (16+1 rows); encode + ADC are JVM
    column expressions per row (no UDF, no shuffle); ONE TakeOrdered for
    candidates; rerank on ``PQ_CAND`` rows."""
    emb = _emb(spark, sf_dir)
    donors = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < PQ_K).collect()
    }
    probe = _probe_vector(spark, sf_dir, PROBE_VEC_ID)

    def lit_arr(vals):
        return F.array(*[F.lit(float(v)) for v in vals])

    def fold_dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v,
        )

    def fold_l2(a, b):
        return F.aggregate(
            F.zip_with(
                a, b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0), lambda acc, v: acc + v,
        )

    adc_terms = []
    for m in range(PQ_M):
        lo = m * PQ_SUB
        sub = F.slice(F.col("embedding"), lo + 1, PQ_SUB)
        dists = F.array(*[
            fold_l2(sub, lit_arr(donors[j][lo:lo + PQ_SUB])) for j in range(PQ_K)
        ])
        code = F.array_position(dists, F.array_min(dists))  # 1-based, first min
        lut = F.array(*[
            fold_dot(lit_arr(probe[lo:lo + PQ_SUB]),
                     lit_arr(donors[j][lo:lo + PQ_SUB]))
            for j in range(PQ_K)
        ])
        adc_terms.append(F.element_at(lut, code.cast("int")))
    adc = adc_terms[0]
    for t in adc_terms[1:]:
        adc = adc + t

    pv = lit_arr(probe)
    cands = (
        emb.filter(F.col("vec_id") != PROBE_VEC_ID)
        .select("vec_id", "embedding", adc.alias("adc"))
        .orderBy(F.desc("adc"), F.asc("vec_id"))
        .limit(PQ_CAND)
    )
    return (
        cands.select(
            "vec_id",
            F.round("adc", 9).alias("adc"),
            F.round(
                _dot(F.col("embedding"), pv)
                / (_norm(F.col("embedding")) * _norm(pv)),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


ANN_PQ_SQL = f"""
WITH ex AS (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
dims AS (
    SELECT vec_id, x, i, (i - 1) // {PQ_SUB} AS m, (i - 1) % {PQ_SUB} AS k
    FROM ex
),
donor AS (SELECT vec_id AS j, x AS c, m, k FROM dims WHERE vec_id < {PQ_K}),
-- per (vector, subspace, code): IN-ORDER L2 fold (bitwise = engine's
-- F.aggregate left fold over array order)
dist AS (
    SELECT d.vec_id, d.m, dn.j,
           list_reduce(
               list((d.x::DOUBLE - dn.c::DOUBLE) * (d.x::DOUBLE - dn.c::DOUBLE)
                    ORDER BY d.k),
               (a, b) -> a + b) AS l2
    FROM dims d JOIN donor dn ON dn.m = d.m AND dn.k = d.k
    GROUP BY d.vec_id, d.m, dn.j
),
codes AS (
    SELECT vec_id, m, j AS code FROM (
        SELECT vec_id, m, j,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY l2 ASC, j ASC) AS rn
        FROM dist
    ) WHERE rn = 1
),
pdims AS (SELECT x AS p, m, k FROM dims WHERE vec_id = {PROBE_VEC_ID}),
lut AS (
    SELECT dn.m, dn.j,
           list_reduce(list(pd.p::DOUBLE * dn.c::DOUBLE ORDER BY dn.k),
                       (a, b) -> a + b) AS dot
    FROM donor dn JOIN pdims pd ON pd.m = dn.m AND pd.k = dn.k
    GROUP BY dn.m, dn.j
),
adcs AS (
    SELECT c.vec_id,
           list_reduce(list(l.dot ORDER BY c.m), (a, b) -> a + b) AS adc
    FROM codes c JOIN lut l ON l.m = c.m AND l.j = c.code
    WHERE c.vec_id != {PROBE_VEC_ID}
    GROUP BY c.vec_id
),
cands AS (
    SELECT vec_id, adc FROM adcs ORDER BY adc DESC, vec_id ASC LIMIT {PQ_CAND}
),
pe AS (
    SELECT unnest(embedding) AS p, generate_subscripts(embedding, 1) AS i
    FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
),
np AS (SELECT sqrt(sum(p::DOUBLE * p::DOUBLE)) AS npv FROM pe),
rer AS (
    SELECT e.vec_id, any_value(c.adc) AS adc,
           sum(e.x::DOUBLE * pe.p::DOUBLE) AS dot,
           sqrt(sum(e.x::DOUBLE * e.x::DOUBLE)) AS na
    FROM ex e JOIN cands c USING (vec_id) JOIN pe USING (i)
    GROUP BY e.vec_id
)
SELECT vec_id, round(adc, 9) AS adc, round(dot / (na * npv), 6) AS cos_sim
FROM rer, np ORDER BY cos_sim DESC, vec_id ASC LIMIT 10"""


register("ann_pq_topk", ann_pq_topk, ANN_PQ_SQL)


# --- hard-negative mining ----------------------------------------------------

def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: the top-k
    most-similar vectors that carry a DIFFERENT label than the probe — the
    negatives closest to the decision boundary, the ones a trainer actually
    wants in the batch (the in-batch-negatives upgrade every retrieval
    recipe documents). Exactly the brute cosine kernel plus one pushed
    label-inequality predicate.

    Scale shape: identical to ``ann_cosine_topk`` — JVM ``zip_with`` dot
    products, probe broadcast as a literal array, label filter pushed to
    the parquet scan, ONE TakeOrdered. The LSH/IVF variants compose the
    same way (filter the candidate set) when brute force stops fitting."""
    emb = _emb(spark, sf_dir)
    row = emb.filter(F.col("vec_id") == PROBE_VEC_ID).select("embedding", "label").head()
    probe, plabel = [float(x) for x in row.embedding], int(row.label)
    pv = F.array(*[F.lit(float(x)) for x in probe])
    return (
        emb.filter(F.col("label") != plabel)
        .select(
            "vec_id",
            F.col("label").cast("int").alias("label"),
            F.round(
                _dot(F.col("embedding"), pv)
                / (_norm(F.col("embedding")) * _norm(pv)),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


ANN_HARD_NEG_SQL = f"""
WITH probe AS (
    SELECT embedding AS pv, label AS plabel FROM embeddings
    WHERE vec_id = {PROBE_VEC_ID}
),
pe AS (SELECT unnest(pv) AS p, generate_subscripts(pv, 1) AS i FROM probe),
ex AS (
    SELECT e.vec_id, e.label, unnest(e.embedding) AS x,
           generate_subscripts(e.embedding, 1) AS i
    FROM embeddings e, probe WHERE e.label != probe.plabel
),
np AS (SELECT sqrt(sum(p::DOUBLE * p::DOUBLE)) AS npv FROM pe),
dots AS (
    SELECT vec_id, any_value(label) AS label, sum(x::DOUBLE * p::DOUBLE) AS dot,
           sqrt(sum(x::DOUBLE * x::DOUBLE)) AS na
    FROM ex JOIN pe USING (i) GROUP BY vec_id
)
SELECT vec_id, label::INTEGER AS label, round(dot / (na * npv), 6) AS cos_sim
FROM dots, np
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10"""


register("ann_hard_negatives", ann_hard_negatives, ANN_HARD_NEG_SQL)
register("ann_sq_topk", ann_sq_topk, ANN_SQ_SQL)
register("ann_cosine_topk", ann_cosine_topk, ANN_COSINE_SQL)
register("ann_ivf_topk", ann_ivf_topk, ANN_IVF_SQL)
register("embed_top_pairs", embed_top_pairs, _embed_top_pairs_sql())
register("ann_lsh_topk", ann_lsh_topk, ANN_LSH_SQL)


# --- SemDeDup: semantic dedup via cluster-then-compare -----------------------

# tau is corpus-calibrated: the synthetic embeddings' max pairwise cosine is
# ~0.51 (no planted near-dups), so 0.45 exercises the drop path; production
# embedding spaces use 0.95+ (the SemDeDup paper's regime)
SEMDEDUP_TAU = 0.45


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding space,
    then WITHIN each cluster drop every vector whose cosine to a lower-id
    cluster member reaches tau — the kept representative is the smallest id
    (the paper keeps one exemplar per semantic-duplicate group; lowest id is
    the deterministic choice). Returns (vec_id, dup_of, n_near): the dropped
    vector, its smallest qualifying lower-id representative, and how many
    lower-id near-members it had.

    Cells are the deterministic sample centroids (same structure the IVF
    index uses; swap in ``kmeans_centroids`` for trained cells — the paper
    uses k-means over a sample). Scale shape: assignment = broadcast
    centroids + ONE narrow pass; candidate pairs are WITHIN-CELL only (the
    SemDeDup trick — pairwise cost collapses from O(N²) to Σ|cell|², and
    ``cell`` is the self-join's shuffle key so each task compares one
    cell); one hash-agg groups the drops."""
    emb = _emb(spark, sf_dir)
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS)
    assigned = _assign_cells(emb, centroids)
    a = assigned.select(
        "cell", F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea")
    )
    b = assigned.select(
        "cell", F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb")
    )
    sims = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.round(
                _dot(F.col("ea"), F.col("eb"))
                / (_norm(F.col("ea")) * _norm(F.col("eb"))), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= SEMDEDUP_TAU)
    )
    return (
        sims.groupBy(F.col("b_id").alias("vec_id"))
        .agg(
            F.min("a_id").cast("long").alias("dup_of"),
            F.count(F.lit(1)).cast("long").alias("n_near"),
        )
        .orderBy("vec_id")
    )


DEDUP_SEMANTIC_SQL = f"""
WITH ex AS (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(x::DOUBLE * x::DOUBLE)) AS nrm FROM ex GROUP BY 1),
ccos AS (
    SELECT v.vec_id, c.vec_id AS cid,
           round(sum(v.x::DOUBLE * c.x::DOUBLE) / (nv.nrm * nc.nrm), 9) AS ccos
    FROM ex v JOIN ex c USING (i)
    JOIN norms nv ON nv.vec_id = v.vec_id JOIN norms nc ON nc.vec_id = c.vec_id
    WHERE c.vec_id < {N_CENTROIDS}
    GROUP BY 1, 2, nv.nrm, nc.nrm
),
assigned AS (
    SELECT vec_id, cid AS cell
    FROM (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
          FROM ccos)
    WHERE rn = 1
),
dots AS (
    SELECT xa.vec_id AS a_id, xb.vec_id AS b_id,
           sum(xa.x::DOUBLE * xb.x::DOUBLE) AS d
    FROM ex xa JOIN ex xb USING (i)
    JOIN assigned sa ON sa.vec_id = xa.vec_id
    JOIN assigned sb ON sb.vec_id = xb.vec_id AND sb.cell = sa.cell
    WHERE xa.vec_id < xb.vec_id
    GROUP BY 1, 2
),
sims AS (
    SELECT a_id, b_id, round(d / (na.nrm * nb.nrm), 6) AS cos_sim
    FROM dots JOIN norms na ON na.vec_id = a_id JOIN norms nb ON nb.vec_id = b_id
)
SELECT b_id::BIGINT AS vec_id, min(a_id)::BIGINT AS dup_of, count(*)::BIGINT AS n_near
FROM sims WHERE cos_sim >= {SEMDEDUP_TAU}
GROUP BY b_id ORDER BY vec_id"""


register("dedup_semantic", dedup_semantic, DEDUP_SEMANTIC_SQL)


# --- similarity-threshold vector search (radius search) ---------------------

SIM_THRESHOLD = 0.6


def ann_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-threshold (radius) vector search — every vector whose
    Lucene COSINE score ``(1 + cos) / 2`` meets ``SIM_THRESHOLD`` against
    the probe, ranked by score. The Lucene analog is
    ``FloatVectorSimilarityQuery`` (``VectorSimilarityFunction.COSINE``
    score scaling) — the "all results at least this similar" surface that
    top-k knn cannot express (dedup radii, recall-bounded retrieval).

    Scale shape: the registered path is the EXACT one-pass scan — the
    score is a JVM ``zip_with``/``aggregate`` fold per row, the threshold
    a plain filter, the final order a TakeOrdered over survivors; NO
    shuffle of the embedding table at all, so the scan parallelizes
    perfectly at 100 TB. (Lucene's graph walk is an approximation with an
    exact-fallback guard; a threshold query's oracle demands guaranteed
    recall, so the exact scan is the certified path and the LSH-band
    prefilter of ``embed_top_pairs`` is the documented recall<1 shortcut.)"""
    probe = _probe_vector(spark, sf_dir, PROBE_VEC_ID)
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") != F.lit(PROBE_VEC_ID))
    p = F.array(*[F.lit(float(x)) for x in probe])
    score = (F.lit(1.0) + _dot(F.col("embedding"), p)
             / (_norm(F.col("embedding")) * F.lit(sum(x * x for x in probe) ** 0.5))
             ) / F.lit(2.0)
    return (
        emb.select("vec_id", F.round(score, 6).alias("score"))
        .filter(F.col("score") >= F.lit(SIM_THRESHOLD))
        .orderBy(F.desc("score"), F.asc("vec_id"))
    )


ANN_THRESHOLD_SQL = f"""
WITH probe AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
pe AS (SELECT unnest(pv) AS p, generate_subscripts(pv, 1) AS i FROM probe),
ex AS (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
    FROM embeddings WHERE vec_id != {PROBE_VEC_ID}
),
np AS (SELECT sqrt(sum(p::DOUBLE * p::DOUBLE)) AS npv FROM pe),
dots AS (
    SELECT vec_id, sum(x::DOUBLE * p::DOUBLE) AS dot,
           sqrt(sum(x::DOUBLE * x::DOUBLE)) AS na
    FROM ex JOIN pe USING (i) GROUP BY 1
)
SELECT vec_id, round((1 + dot / (na * npv)) / 2, 6) AS score
FROM dots, np
WHERE round((1 + dot / (na * npv)) / 2, 6) >= {SIM_THRESHOLD}
ORDER BY score DESC, vec_id ASC"""


register("ann_threshold", ann_threshold, ANN_THRESHOLD_SQL)


# --- IVF recall harness -----------------------------------------------------

RECALL_NPROBES = (1, 2, 4)


def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall@10 sweep — the self-measuring eval every ANN deployment
    runs before picking ``nprobe`` (FAISS's recall-vs-probes curve;
    Lucene's KnnGraphTester does the same for HNSW): for each nprobe in
    ``RECALL_NPROBES``, the fraction of the brute-force top-10 the IVF
    probe recovers. Output (nprobe, recall), nprobe ascending — recall is
    non-decreasing by construction (probe sets are nested), which the
    pytest pins.

    Scale shape: ONE cell-assignment pass shared across the sweep (the
    expensive part — a broadcast-centroid argmax per vector); each probe
    level is then a broadcast semi-join + 10-row TakeOrdered; recall
    joins two 10-row sides. Nothing rescans the corpus per level beyond
    the cell-pruned candidates, exactly the IVF economics being measured."""
    emb = _emb(spark, sf_dir)
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS)
    assigned = _assign_cells(emb, centroids)
    probe = _probe_vector(spark, sf_dir, PROBE_VEC_ID)
    pv = F.array(*[F.lit(float(x)) for x in probe])
    exact_ids = (
        cosine_topk(emb, probe, k=10, exclude_id=PROBE_VEC_ID)
        .select("vec_id", F.lit(1).alias("hit"))
    )
    cell_rank = (
        centroids.select(
            F.col("vec_id").alias("cell"),
            F.round(
                _dot(F.col("embedding"), pv) / (_norm(F.col("embedding")) * _norm(pv)), 9
            ).alias("pcos"),
        )
        .orderBy(F.desc("pcos"), F.asc("cell"))
    )
    legs = []
    for nprobe in RECALL_NPROBES:
        cells = cell_rank.limit(nprobe).select("cell")
        ivf10 = (
            assigned.join(F.broadcast(cells), "cell")
            .filter(F.col("vec_id") != PROBE_VEC_ID)
            .select(
                "vec_id",
                F.round(
                    _dot(F.col("embedding"), pv) / (_norm(F.col("embedding")) * _norm(pv)), 6
                ).alias("cos_sim"),
            )
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(10)
        )
        legs.append(ivf10.select(F.lit(nprobe).alias("nprobe"), "vec_id"))
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    return (
        u.join(F.broadcast(exact_ids), "vec_id", "left")
        .groupBy("nprobe")
        .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(10.0)).alias("recall"))
        .select(F.col("nprobe").cast("int"), F.col("recall").cast("double"))
        .orderBy("nprobe")
    )


def _ann_recall_sql() -> str:
    legs = []
    for nprobe in RECALL_NPROBES:
        legs.append(f"""
SELECT {nprobe} AS nprobe, vec_id FROM (
    SELECT e.vec_id AS vec_id, round(sum(e.x::DOUBLE * pe.p::DOUBLE) / (nv.nrm * np.npv), 6) AS cos_sim
    FROM ex e JOIN pe USING (i)
    JOIN assigned a ON a.vec_id = e.vec_id
    JOIN (SELECT cid AS cell FROM ccos WHERE vec_id = {PROBE_VEC_ID}
          ORDER BY ccos DESC, cid ASC LIMIT {nprobe}) pc ON pc.cell = a.cell
    JOIN norms nv ON nv.vec_id = e.vec_id, np
    WHERE e.vec_id != {PROBE_VEC_ID}
    GROUP BY e.vec_id, nv.nrm, np.npv
    ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10
)""")
    union = " UNION ALL ".join(legs)
    return f"""
WITH ex AS (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(x::DOUBLE * x::DOUBLE)) AS nrm FROM ex GROUP BY 1),
ccos AS (
    SELECT v.vec_id, c.vec_id AS cid,
           round(sum(v.x::DOUBLE * c.x::DOUBLE) / (nv.nrm * nc.nrm), 9) AS ccos
    FROM ex v JOIN ex c USING (i)
    JOIN norms nv ON nv.vec_id = v.vec_id JOIN norms nc ON nc.vec_id = c.vec_id
    WHERE c.vec_id < {N_CENTROIDS}
    GROUP BY 1, 2, nv.nrm, nc.nrm
),
assigned AS (
    SELECT vec_id, cid AS cell
    FROM (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
          FROM ccos)
    WHERE rn = 1
),
pe AS (
    SELECT unnest(embedding) AS p, generate_subscripts(embedding, 1) AS i
    FROM embeddings WHERE vec_id = {PROBE_VEC_ID}
),
np AS (SELECT sqrt(sum(p::DOUBLE * p::DOUBLE)) AS npv FROM pe),
exact10 AS (
    SELECT e.vec_id, 1 AS hit FROM (
        SELECT e.vec_id, round(sum(e.x::DOUBLE * pe.p::DOUBLE) / (nv.nrm * np.npv), 6) AS cos_sim
        FROM ex e JOIN pe USING (i)
        JOIN norms nv ON nv.vec_id = e.vec_id, np
        WHERE e.vec_id != {PROBE_VEC_ID}
        GROUP BY e.vec_id, nv.nrm, np.npv
        ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10
    ) e
),
ivf AS ({union})
SELECT i.nprobe::INTEGER AS nprobe,
       (sum(COALESCE(x.hit, 0)) / 10.0)::DOUBLE AS recall
FROM ivf i LEFT JOIN exact10 x USING (vec_id)
GROUP BY 1 ORDER BY 1"""


register("ann_recall", ann_recall, _ann_recall_sql())
