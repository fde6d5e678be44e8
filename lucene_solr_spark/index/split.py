"""Index / shard splitting — ``S/update/SolrIndexSplitter`` (SPLITSHARD) and
``lucene/misc`` ``PKIndexSplitter`` re-expressed on the tombstone machinery.

Upstream semantics: splitting a core does NOT re-tokenize or re-score
anything — each child is the parent's segments opened through a liveDocs
mask that keeps only the docs in the child's hash range (SolrIndexSplitter
builds a per-child FixedBitSet and writes the segments through
``addIndexes(FilterCodecReader)``; PKIndexSplitter is the same with a
primary-key range predicate). Physical compaction happens later, when
ordinary merging rewrites the masked segments.

Spark shape (this module):

- A child index = the parent's IMMUTABLE segment files (hard-linked, not
  copied — postings/docs/norms/bloom are write-once, exactly the property
  the backup/restore test pins) + a child-local ``tombstones/`` table
  marking every doc OUTSIDE the child's hash bucket + child-local
  ``term_stats``/``stats`` refreshed by the same ``_finalize`` that owns
  them for updates (so each child scores like a fresh build over its
  slice). At cluster scale the hard-link step is an Iceberg metadata
  operation: a child snapshot references the same data files plus a
  position-delete file — no data movement at all; the ONLY distributed
  work is one scan of the docs sidecar (bucket assignment) and the
  seg-pruned stats delta pass, both O(corpus metadata), not O(postings).
- Routing is the deterministic md5 bucket the pipeline ops already use
  (``ops/pipeline.sample_split``): bucket = first-8-hex-chars of
  md5(key) mod n — stable across runs/engines, reproducible in DuckDB,
  and uniform enough that children are balanced (the compositeId hash
  router's property).
- Because local doc ids, norms, positions and global-stats refresh are
  all preserved, a scatter-gather search over the children with merged
  exact stats (``engine.exactstats`` machinery) returns BITWISE the
  parent's page — the invariant SolrIndexSplitter maintains so a live
  collection can split under traffic without ranking movement.

Cost note: each child's stats refresh decodes the postings doc-id streams
once (every segment carries child tombstones, so the removals pass is not
seg-prunable here) — n_children passes total. That is still strictly less
work than upstream SPLITSHARD, which REWRITES every posting byte per child
through addIndexes; the single-scan refinement (one pass emitting
per-child removal deltas keyed (child, term)) is the further optimization
if n_children grows large.

Scope notes: children start as fresh cores — retained commit generations
(``commits/``) and docvalues-update sidecars are NOT carried (upstream
SPLITSHARD children likewise begin a fresh update log); split a parent at
its current live state. Parent tombstones ARE carried (unioned into each
child's mask) so splitting an updated index stays correct.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

from .build import IndexMeta
from .updates import refresh_stats, tombstones_path

# Subtrees whose files are write-once in this storage model and therefore
# safe to hard-link into children. term_stats/term_stats_rev/stats are ALSO
# linked: the child's refresh rewrites them with mode("overwrite"), which
# unlinks the child's directory entries without touching the parent's inodes.
_LINKED = (
    "postings", "docs", "seg_norms", "bloom", "manifest",
    "term_stats", "term_stats_rev", "stats",
)


def _link_tree(src: str, dst: str) -> None:
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(out, f)
            if os.path.exists(d):
                os.remove(d)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def split_bucket_col(key_col: str, n_children: int):
    """The hash-router bucket: first 8 md5 hex chars of the stringified
    key, mod n — the ops/pipeline.sample_split idiom (identical in DuckDB:
    ``('0x' || substr(md5(key::VARCHAR), 1, 8))::BIGINT % n``)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(n_children),
    )


def split_index(
    spark: SparkSession, index_dir: str, n_children: int, out_root: str
) -> list[str]:
    """Split a committed index into ``n_children`` hash-routed child
    indexes under ``out_root``; returns the child dirs. The parent is not
    modified. Each child is immediately searchable by ``IndexSearcher``
    (same segments, child tombstones, refreshed stats)."""
    meta = IndexMeta.load(index_dir)
    key = meta.key_cols[0]
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    bucket = split_bucket_col(key, n_children)
    parent_tomb = None
    if os.path.isdir(tombstones_path(index_dir)):
        parent_tomb = spark.read.parquet(tombstones_path(index_dir)).select(
            F.col("seg").cast("int").alias("seg"),
            F.col("doc_local").cast("long").alias("doc_local"),
        )
    out: list[str] = []
    for c in range(n_children):
        cdir = os.path.join(out_root, f"shard{c}")
        for sub in _LINKED:
            s = os.path.join(index_dir, sub)
            if os.path.isdir(s):
                _link_tree(s, os.path.join(cdir, sub))
        shutil.copy2(
            os.path.join(index_dir, "meta.json"), os.path.join(cdir, "meta.json")
        )
        non_members = docs.filter(bucket != c).select(
            F.col("seg").cast("int").alias("seg"),
            F.col("doc_local").cast("long").alias("doc_local"),
        )
        if parent_tomb is not None:
            non_members = non_members.unionByName(parent_tomb).distinct()
        # overwrite is safe on the linked copy: the child directory entries
        # are replaced, the parent's inodes are untouched
        non_members.write.mode("overwrite").parquet(tombstones_path(cdir))
        refresh_stats(spark, cdir)
        out.append(cdir)
    return out
