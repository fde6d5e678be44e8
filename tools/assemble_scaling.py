"""Assemble a BENCH/BASELINE.md + scaling.json from per-level measured-run
JSON lines (tools/scaling_bench.py --run N output), taking the best (min
seconds) per phase across multiple runs of the same level — the same
best-of-N statistic scaling_bench uses within a run, extended across runs
when one level's runs had to be split over several invocations.

Usage: python tools/assemble_scaling.py out_lo.json [out_lo2.json ...] --hi out_hi.json
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def _best(recs: list[dict]) -> dict:
    out = dict(recs[0])
    for r in recs[1:]:
        for sec_key, thr_key, n_key in (
            ("build_secs", "build_turns_per_sec", "n_turns"),
            ("merge_secs", "merge_turns_per_sec", "n_turns"),
            ("query_secs", "qps", None),
        ):
            if r[sec_key] < out[sec_key]:
                out[sec_key] = r[sec_key]
                out[thr_key] = r[thr_key]
        if "rank_identity" in r:
            out["rank_identity"] = r["rank_identity"]
            out["n_queries"] = r["n_queries"]
    return out


def main() -> None:
    argv = sys.argv[1:]
    split = argv.index("--hi")
    lo_files, hi_files = argv[:split], argv[split + 1:]
    lo = _best([json.load(open(f)) for f in lo_files])
    hi = _best([json.load(open(f)) for f in hi_files])

    from tools.scaling_bench import _write_baseline_md

    ratio = hi["cpus"] / lo["cpus"]
    summary = {
        "levels": [lo["cpus"], hi["cpus"]],
        "runs": {lo["cpus"]: lo, hi["cpus"]: hi},
        "build_scaling_efficiency": round(
            (hi["build_turns_per_sec"] / lo["build_turns_per_sec"]) / ratio, 3
        ),
        "merge_scaling_efficiency": round(
            (hi["merge_turns_per_sec"] / lo["merge_turns_per_sec"]) / ratio, 3
        ),
        "query_scaling_efficiency": round((hi["qps"] / lo["qps"]) / ratio, 3),
    }
    import os

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)
    with open(f"BENCH/scaling_{lo['cpus']}_{hi['cpus']}.json", "w") as f:
        json.dump(summary, f, indent=2)
    _write_baseline_md(summary)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
