"""Cluster SPLITSHARD job — split a committed index into hash-routed child
shards via ``spark-submit --py-files`` (the SolrCloud ``SPLITSHARD``
collection-API analog; see ``lucene_solr_spark/index/split.py``).

    python tools/make_pyfiles.py
    spark-submit --py-files dist/lucene_solr_spark.zip \
        tools/submit_split_job.py \
        --index    /mnt/shared/index/v1/ \
        --out-root /mnt/shared/index/v1-children/ \
        --children 4 [--stats-mode scan|per_child]

Like the build job, cluster topology comes entirely from spark-submit.
Children hard-link the parent's immutable segment files when the output
root shares a filesystem with the index (falls back to copy otherwise);
each child gets its own tombstone mask and refreshed statistics and is
immediately searchable. ``--stats-mode scan`` (default) computes every
child's statistics in ONE distributed postings pass — the shape that holds
at 10^12 docs.

Prints one JSON line: child dirs, per-child live doc counts, wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True, help="committed parent index dir")
    ap.add_argument("--out-root", required=True, help="directory for child shards")
    ap.add_argument("--children", type=int, required=True, help="number of children")
    ap.add_argument("--stats-mode", default="scan", choices=["scan", "per_child"])
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("lss-splitshard")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    from lucene_solr_spark.index.split import split_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    t0 = time.monotonic()
    children = split_index(
        spark, args.index, args.children, args.out_root, stats_mode=args.stats_mode
    )
    counts = {
        os.path.basename(c): IndexSearcher(spark, c).stats.doc_count
        for c in children
    }
    print(json.dumps({
        "children": children,
        "live_docs": counts,
        "wall_secs": round(time.monotonic() - t0, 3),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
