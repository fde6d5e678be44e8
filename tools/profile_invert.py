"""Micro-profile of the invert kernel on one segment of real testdata.

Runs `_invert_partition` on ~N rows of the sf0.1 transcripts (no Spark —
the kernel is plain pyarrow/numpy) under cProfile, printing cumulative
hotspots. Use to validate that a codec/invert change moves the needle
before paying for a full scaling_bench run.
"""
import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.index.build import _invert_partition, IndexMeta  # noqa: E402
import pyarrow as pa  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ROWS = int(os.environ.get("PROF_ROWS", "250000"))


def run(meta, table, reps=1):
    with tempfile.TemporaryDirectory() as d:
        key_types = {c: table.schema.field(c).type for c in meta.key_cols}
        t0 = time.monotonic()
        prof = cProfile.Profile()
        prof.enable()
        for _ in range(reps):
            out = _invert_partition([table], 0, meta, d, key_types)
        prof.disable()
        dt = time.monotonic() - t0
        n = table.num_rows * reps
        print(f"rows={n} secs={dt:.3f} rows/sec={n/dt:,.0f}")
        s = io.StringIO()
        pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
        print(s.getvalue())
        return out


if __name__ == "__main__":
    # Build the same deterministic transcript corpus bench.py uses, one segment.
    from lucene_solr_spark.datagen import generate_transcripts

    n_conv = max(1, N_ROWS // 8)  # ~7.6 turns/conv mean
    pdf = generate_transcripts(n_conv).sort_values(["conv_id", "turn_idx"])
    pdf = pdf.head(N_ROWS)
    pdf["tool"] = pdf["tool"].astype(object).where(pdf["tool"].notna(), "")
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    meta = IndexMeta(
        analyzer="lucene",
        key_cols=("conv_id", "turn_idx"),
        text_col="text",
        positions=True,
        n_segments=1,
        keyword_cols=("role", "tool"),
    )
    run(meta, table)
