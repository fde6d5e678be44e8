"""Cross-SESSION reopen of mutated indexes (VERDICT r4 'Next round' #1 Done
criterion): the updated / expunged / as-of / docvalues engines must answer
bitwise-identically from a SECOND SparkSession — a fresh process with a
SHIFTED defaultParallelism — because the committed (and mutated) index now
OPENs from its manifest sentinel instead of re-running the build plan, whose
RangePartitioner boundaries are session-history-dependent (the r4
``ft_after_expunge_topk`` driver flake).

One subprocess hosts the second session (JVM startup is the cost; all four
entries share it).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"
ENTRIES = [
    "ft_after_update_topk",
    "ft_after_expunge_topk",
    "ft_asof_topk",
    "ft_dv_boost_topk",
]

_CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from lucene_solr_spark.session import get_spark
import __spark_entry__ as entry

spark = get_spark("xsession-open", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
out = {{}}
for name in {entries!r}:
    pdf = entry.queries()[name](spark, {sf_dir!r}).toPandas()
    out[name] = {{c: [repr(v) for v in pdf[c]] for c in pdf.columns}}
print("XSESSION_RESULT " + json.dumps(out))
"""


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_mutated_engines_bitwise_across_sessions(spark):
    import __spark_entry__ as entry

    # session A (this pytest session, local[4]): build + mutate + answer
    mine = {}
    for name in ENTRIES:
        pdf = entry.queries()[name](spark, SF_DIR).toPandas()
        mine[name] = {c: [repr(v) for v in pdf[c]] for c in pdf.columns}

    # session B: fresh process, local[7] (shifted parallelism shifts any
    # session-history-dependent partitioner state — the open path must not care)
    env = dict(os.environ, SPARK_GRAFT_CPUS="7")
    script = _CHILD.format(repo=REPO, entries=ENTRIES, sf_dir=SF_DIR)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, f"second session failed:\n{proc.stderr[-4000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("XSESSION_RESULT ")]
    assert line, f"no result line in child stdout:\n{proc.stdout[-2000:]}"
    theirs = json.loads(line[-1][len("XSESSION_RESULT "):])

    for name in ENTRIES:
        assert sorted(mine[name]) == sorted(theirs[name]), name
        for c in mine[name]:
            a, b = np.array(mine[name][c]), np.array(theirs[name][c])
            assert (a == b).all(), (
                f"{name}.{c}: cross-session divergence at rows "
                f"{np.flatnonzero(a != b)[:5].tolist()}"
            )
