"""Capture explain('formatted') before/after plans for the round-15
touched queries into plans/r15/.

'before' comes from the round-14-close git worktree (/tmp/repo_head —
the true pre-round code, not a kill-switch approximation); 'after' is
the working tree. Streaming queries are excluded (building their
DataFrame executes the stream); the ingest's action-count change is
evidenced by the profiled job counts in OPTIMIZATION_r15.md instead.

Usage: python tools_capture_plans_r15.py [--root DIR] [--suffix S]
           [--sf DIR] [NAME ...]
"""

import os
import sys

args = sys.argv[1:]


def _opt(flag, default):
    if flag in args:
        i = args.index(flag)
        v = args[i + 1]
        del args[i : i + 2]
        return v
    return default


ROOT = _opt("--root", "/root/repo")
SUFFIX = _opt("--suffix", "after")
SF = _opt("--sf", "/root/testdata/sf0.1")

sys.path.insert(0, ROOT)
os.chdir(ROOT)

OUT = "/root/repo/plans/r15"
os.makedirs(OUT, exist_ok=True)

NAMES = args or [
    "dedup_minhash_survivors_portable",
    "dedup_simhash_portable",
    "events_anomaly_mad",
    "sketch_quantile_sampled",
]

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
q = e.queries()

for name in NAMES:
    df = q[name](spark, SF)
    path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as fh:
        fh.write(
            spark._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
    print("wrote", path)
