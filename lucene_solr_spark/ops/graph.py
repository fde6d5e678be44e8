"""Graph streaming expressions — Solr's ``gatherNodes`` (breadth-first node
expansion) and ``shortestPath`` (BFS distance), reference
``S/client/solrj/io/graph/GatherNodesStream.java`` / ``ShortestPathStream.java``.

Spark-first shape: BFS as Pregel-style supersteps — each hop is ONE
distributed join of the current frontier against the edge table, with a
left-anti join against the visited set for dedup (exactly the "unique
nodes per level" semantics GatherNodesStream implements with its in-memory
visited hash). The driver loop only counts supersteps (graph diameter);
all data movement is joins.

Scale design:
- The edge table is built once and cached; at 10^12-event scale it would be
  a bucketed Iceberg table keyed on src.
- Frontiers are typically tiny vs the edge table → Spark broadcasts the
  frontier side of each hop join (AQE does this automatically under the
  10 MB default; the explicit ``F.broadcast`` pins it).
- Hot co-occurrence keys are the skew hazard when DERIVING edges (a (k,day)
  bucket with n users yields n^2 edges) — same mitigation as
  ``dedup.shingles``: drop saturated buckets, they carry no graph signal.

Fixture graph: users are nodes; an edge joins two users who made a
``purchase`` with the same ``props.k`` on the same day (sparse, diameter ≈4
on the test corpus). Oracles: DuckDB ``WITH RECURSIVE`` BFS over the same
edge derivation — engine results match exactly (min-distance per node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .registry import register

SEED_USER = 0
MAX_DEPTH = 6
GATHER_HOPS = 2


def _purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edges (u, v): same props.k, same day."""
    uk = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.regexp_extract("props", "[0-9]+", 0).alias("k"),
            F.date_trunc("day", F.col("ts")).alias("d"),
        )
        .distinct()
    )
    a, b = uk.alias("a"), uk.alias("b")
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.d") == F.col("b.d"))
               & (F.col("a.user_id") != F.col("b.user_id")))
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )


def bfs_distances(
    spark: SparkSession, edges: DataFrame, seed: int, max_depth: int
) -> DataFrame:
    """(user_id, dist): minimum hop count from ``seed``, BFS supersteps.

    Each superstep: frontier ⋈ edges → next nodes, minus already-visited
    (left-anti). Frontier is broadcast (small vs edges). Stops at
    ``max_depth`` or when the frontier empties — the driver-side loop runs
    O(diameter) times; every step is a distributed join, nothing is
    collected but the emptiness check.
    """
    edges = edges.persist()
    dist = spark.createDataFrame([(seed, 0)], "user_id long, dist int").persist()
    frontier = dist.select("user_id")
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(F.broadcast(frontier), edges.u == frontier.user_id)
            .select(F.col("v").alias("user_id"))
            .distinct()
            .join(F.broadcast(dist.select("user_id")), "user_id", "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
            .persist()
        )
        if nxt.limit(1).count() == 0:
            break
        dist = dist.union(nxt).persist()
        frontier = nxt.select("user_id")
    return dist


def _bfs_sql(max_depth: int, out_cols: str) -> str:
    return f"""
WITH RECURSIVE uk AS (
    SELECT DISTINCT user_id, regexp_extract(props, '[0-9]+') AS k,
           date_trunc('day', ts) AS d
    FROM events WHERE event_type = 'purchase'
),
edges AS (
    SELECT DISTINCT a.user_id AS u, b.user_id AS v
    FROM uk a JOIN uk b ON a.k = b.k AND a.d = b.d AND a.user_id <> b.user_id
),
bfs AS (
    SELECT {SEED_USER}::BIGINT AS user_id, 0 AS dist
    UNION
    SELECT e.v, bfs.dist + 1 FROM bfs JOIN edges e ON e.u = bfs.user_id
    WHERE bfs.dist < {max_depth}
)
SELECT user_id, min(dist)::INTEGER AS {out_cols} FROM bfs GROUP BY user_id
ORDER BY user_id"""


def graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shortestPath(seed → *): min BFS distance to every reachable user."""
    edges = _purchase_edges(spark, sf_dir)
    return bfs_distances(spark, edges, SEED_USER, MAX_DEPTH).orderBy("user_id")


GRAPH_SHORTEST_PATH_SQL = _bfs_sql(MAX_DEPTH, "dist")


def graph_gather_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gatherNodes: unique nodes within GATHER_HOPS hops of the seed, each
    tagged with the level it first appears at (GatherNodesStream emits each
    node once, at its first-discovery level)."""
    edges = _purchase_edges(spark, sf_dir)
    out = bfs_distances(spark, edges, SEED_USER, GATHER_HOPS)
    return out.select("user_id", F.col("dist").alias("level")).orderBy("user_id")


GRAPH_GATHER_NODES_SQL = _bfs_sql(GATHER_HOPS, "level")


def graph_score_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scoreNodes (``SJ/io/graph/ScoreNodesStream``): rank gathered
    neighbors by tf·idf — tf = how often the traversal reached the node
    (here: distinct co-purchase buckets shared with the seed), idf =
    ln(collection size / node docFreq), so globally common nodes are
    demoted exactly like common terms in text relevance.

    One aggregation per side over the same deduped (user, bucket) scan; the
    seed's bucket set is tiny → broadcast; the docFreq join keys on the
    aggregated (small) node set. Scores are f32(double ln) for
    cross-engine bit parity."""
    uk = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.regexp_extract("props", "[0-9]+", 0).alias("k"),
            F.date_trunc("day", F.col("ts")).alias("d"),
        )
        .distinct()
    )
    n_docs = uk.count()
    seed_buckets = uk.filter(F.col("user_id") == SEED_USER).select("k", "d")
    reach = (
        uk.filter(F.col("user_id") != SEED_USER)
        .join(F.broadcast(seed_buckets), ["k", "d"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    df_tbl = uk.groupBy("user_id").agg(F.count(F.lit(1)).alias("df"))
    return (
        reach.join(df_tbl, "user_id")
        .select(
            "user_id", "cnt", "df",
            (F.col("cnt") * F.log(F.lit(float(n_docs)) / F.col("df")))
            .cast("float").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("user_id"))
        .limit(20)
    )


GRAPH_SCORE_NODES_SQL = f"""
WITH uk AS (
    SELECT DISTINCT user_id, regexp_extract(props, '[0-9]+') AS k,
           date_trunc('day', ts) AS d
    FROM events WHERE event_type = 'purchase'
),
nd AS (SELECT count(*)::DOUBLE AS n_docs FROM uk),
sb AS (SELECT k, d FROM uk WHERE user_id = {SEED_USER}),
reach AS (
    SELECT u.user_id, count(*)::BIGINT AS cnt
    FROM uk u JOIN sb ON u.k = sb.k AND u.d = sb.d
    WHERE u.user_id <> {SEED_USER}
    GROUP BY 1
),
dfx AS (SELECT user_id, count(*)::BIGINT AS df FROM uk GROUP BY 1)
SELECT r.user_id, r.cnt, dfx.df,
       CAST(r.cnt * ln(nd.n_docs / dfx.df) AS FLOAT) AS score
FROM reach r JOIN dfx USING (user_id), nd
ORDER BY score DESC, r.user_id ASC LIMIT 20"""


register("graph_shortest_path", graph_shortest_path, GRAPH_SHORTEST_PATH_SQL)
register("graph_gather_nodes", graph_gather_nodes, GRAPH_GATHER_NODES_SQL)
register("graph_score_nodes", graph_score_nodes, GRAPH_SCORE_NODES_SQL)
