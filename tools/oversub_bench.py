"""Oversubscription study (VERDICT r4 'Next round' #8): why the 8→32-core
scaling pair measures ~0.22 efficiency on this box, and whether capping
concurrent tasks at local[32] recovers throughput.

Mechanism under test: a local[32] run co-schedules 32 JVM executor threads,
32 Python/Arrow UDF workers, and G1 GC threads on 32 physical cores — every
build task runs an Arrow-batched Python kernel, so the box executes ~64
compute-hungry threads plus GC on 32 cores, and the memory-bandwidth-bound
analyzer loses more to thrash than it gains from cores. ``spark.task.cpus=2``
keeps local[32] scheduling but caps concurrent tasks at 16 (16 Python
workers + 32 JVM threads mostly idle) — if the mechanism is right, 16-task
local[32] should land near the local[16]-equivalent throughput instead of
collapsing.

Runs the scaling_bench presorted build (1 trial each) at:
  A. local[8]                    (baseline, unconstrained)
  B. local[32]                   (oversubscribed)
  C. local[32], spark.task.cpus=2  (capped: 16 concurrent tasks)

Writes BENCH/oversub.json; the analysis paragraph goes to BENCH/BASELINE.md
by hand (tools/scaling_bench.py owns that file's generation).

Usage: python tools/oversub_bench.py  (box must be otherwise idle)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONV = int(os.environ.get("LSS_SCALING_NCONV", "1040000"))
CORPUS = f"/tmp/lss_scaling_corpus_{N_CONV}"


def measured(cpus: int, task_cpus: int) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"oversub-{cpus}-{task_cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.task.cpus", str(task_cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from lucene_solr_spark.index.build import build_index_presorted

    idx = f"/tmp/lss_oversub_idx_{cpus}_{task_cpus}"
    # best-of-N with a warm page cache (trial 1 after a drop_caches is
    # DISK-bound — it measures corpus re-read, not compute; the scaling
    # bench's best-of-N convention)
    trials = int(os.environ.get("LSS_TRIALS", "3"))
    best = float("inf")
    n_turns = 0
    for _ in range(trials):
        shutil.rmtree(idx, ignore_errors=True)
        os.sync()
        time.sleep(2)
        t0 = time.monotonic()
        manifest = build_index_presorted(
            spark, CORPUS, idx,
            key_cols=("conv_id", "turn_idx"), analyzer="lucene",
            positions=True, files_per_segment=1,
        )
        secs = time.monotonic() - t0
        n_turns = sum(r.n_docs for r in manifest.collect())
        best = min(best, secs)
    shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps({
        "cpus": cpus, "task_cpus": task_cpus,
        "concurrent_tasks": cpus // task_cpus,
        "build_secs": round(best, 3),
        "build_turns_per_sec": round(n_turns / best, 1),
        "n_turns": n_turns,
    }))


def orchestrate() -> None:
    if not os.path.exists(os.path.join(CORPUS, "_done")):
        raise SystemExit(f"corpus missing — run tools/scaling_bench.py first ({CORPUS})")
    configs = [(8, 1), (32, 1), (32, 2)]
    results = []
    for cpus, tc in configs:
        os.sync()
        for knob in ("drop_caches", "compact_memory"):
            try:
                with open(f"/proc/sys/vm/{knob}", "w") as f:
                    f.write("1")
            except OSError:
                pass
        time.sleep(5)
        out = subprocess.run(
            [sys.executable, __file__, "--run", str(cpus), str(tc)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if out.returncode != 0:
            print(out.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"run {cpus}/{tc} failed")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, file=sys.stderr)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/oversub.json", "w") as f:
        json.dump({"runs": results}, f, indent=2)
    print(json.dumps({"runs": results}))


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--run":
        measured(int(sys.argv[2]), int(sys.argv[3]))
    else:
        orchestrate()
