"""Round-15 fresh-session interleaved A/B (the wave-4 doctrine from
OPTIMIZATION_r14.md): time NAMED queries noop-sink in a FRESH Spark
session per side, alternating NEW (/root/repo) and OLD (/tmp/repo_head,
a git worktree pinned at the round-14 close) so host weather hits both
sides of every pair equally.

Usage:
  python tools_ab_r15.py NAME [NAME...] [--sf DIR] [--pairs N] [--reps N]
      [--mode head|spread|ckpt]

--mode head (default): NEW=/root/repo vs OLD=/tmp/repo_head worktree.
--mode spread: both sides /root/repo; OLD runs with
  BOSQL_SPREAD_DISABLE=1 — settles a query's spread_scan sites
  (VERDICT item 3).
--mode ckpt: both sides /root/repo; OLD runs with BOSQL_CKPT_DISABLE=1.

Each side runs in a subprocess (fresh JVM); within a session the query
is warmed once and the best of --reps timed runs is reported. Output:
per-pair new/old walls and the per-query median ratio.
"""

import json
import os
import statistics
import subprocess
import sys

NEW = "/root/repo"
OLD = "/tmp/repo_head"

args = sys.argv[1:]


def _opt(flag, default):
    if flag in args:
        i = args.index(flag)
        v = args[i + 1]
        del args[i : i + 2]
        return v
    return default


SF = _opt("--sf", "/root/testdata/sf0.1")
PAIRS = int(_opt("--pairs", "3"))
REPS = int(_opt("--reps", "2"))
MODE = _opt("--mode", "head")
names = args

if MODE == "spread":
    OLD = NEW
    OLD_ENV = {"BOSQL_SPREAD_DISABLE": "1"}
elif MODE == "ckpt":
    OLD = NEW
    OLD_ENV = {"BOSQL_CKPT_DISABLE": "1"}
else:
    OLD_ENV = {}

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
names = sys.argv[3].split(",")
SF = sys.argv[2]
REPS = int(sys.argv[4])
from pyspark.sql import SparkSession
import __spark_entry__ as e
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
q = e.queries()
out = {}
for name in names:
    def run():
        d = q[name](spark, SF)
        d.write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(f"ab:{name} warm")
    run()
    best = float("inf")
    for i in range(REPS):
        spark.sparkContext.setJobDescription(f"ab:{name} rep{i}")
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 4)
print("ABRESULT " + json.dumps(out))
"""


def run_side(root: str, extra_env: dict | None = None) -> dict:
    env = dict(os.environ, **(extra_env or {}))
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, root, SF, ",".join(names), str(REPS)],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"side {root} produced no result; stderr tail: {proc.stderr[-2000:]}"
    )


ratios: dict[str, list[float]] = {n: [] for n in names}
for p in range(PAIRS):
    new = run_side(NEW)
    old = run_side(OLD, OLD_ENV)
    for n in names:
        ratios[n].append(old[n] / new[n])
        print(
            f"pair {p}: {n} new={new[n]:.3f}s old={old[n]:.3f}s "
            f"speedup={old[n] / new[n]:.2f}x",
            flush=True,
        )
print("---")
for n in names:
    med = statistics.median(ratios[n])
    print(f"{n}: median speedup {med:.2f}x over {PAIRS} pairs {ratios[n]}")
