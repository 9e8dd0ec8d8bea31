#!/usr/bin/env python3
"""A/B attribution for the r7->r8 similarity-tier bench drift.

Round-8 shipped `_ship_package_to_workers` (catalog.py): an addPyFile
zip of the package on every session so Python workers can import
module-level functions referenced by cloudpickle. The r8 driver bench
then showed +15-33% on the similarity/pipeline tier with NO code change
to those operators. This tool measures whether the zip shipping is the
cause: run the regressed queries in TWO child processes — one with the
shipping active (shipped mode), one with it stubbed to a no-op
(stubbed mode) — N warm runs each, and print mean +/- spread per query.

The stubbed mode is safe here because the measured queries' Python
boundaries either reference no module-level package functions, or run
in local mode where the driver's sys.path already resolves the package
for forked workers.

Usage:
  python tools_ab_shipzip.py            # orchestrate both modes, compare
  python tools_ab_shipzip.py --child shipped|stubbed   # internal
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("AB_RUNS", "5"))

# The queries the r8 driver bench flagged as regressed >10% r7->r8.
QUERIES = [
    "similarity_ivf_multiprobe",
    "similarity_sq8_topk",
    "similarity_rp_rerank",
    "asof_join_purchases",
    "training_pipeline_e2e",
    "text_bpe_train",
]


def child(mode: str) -> None:
    from bo_sql_spark import catalog

    if mode == "stubbed":
        catalog._ship_package_to_workers = lambda spark: None  # type: ignore

    import bench
    from bo_sql_spark.queries import load_all
    from bo_sql_spark.session import get_session

    reg = load_all()
    spark = get_session(app_name=f"ab-shipzip-{mode}")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, list[float]] = {}
    for name in QUERIES:
        builder = reg[name].builder
        bench._run(builder(spark, SF_DIR), name)  # warm
        samples = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            bench._run(builder(spark, SF_DIR), name)
            samples.append(round(time.perf_counter() - t0, 4))
        out[name] = samples
    print("AB_RESULT " + json.dumps({"mode": mode, "samples": out}))


def orchestrate() -> None:
    results = {}
    for mode in ("shipped", "stubbed"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("AB_RESULT ")]
        if not line:
            print(p.stdout[-3000:], p.stderr[-3000:])
            raise SystemExit(f"child {mode} produced no result")
        results[mode] = json.loads(line[-1][len("AB_RESULT "):])["samples"]

    print(f"\n{'query':34s} {'shipped mean±sd':>20s} {'stubbed mean±sd':>20s} {'ratio':>7s}")
    for name in QUERIES:
        a, b = results["shipped"][name], results["stubbed"][name]
        ma, mb = statistics.mean(a), statistics.mean(b)
        sa = statistics.stdev(a) if len(a) > 1 else 0.0
        sb = statistics.stdev(b) if len(b) > 1 else 0.0
        print(f"{name:34s} {ma:9.3f}±{sa:.3f}s     {mb:9.3f}±{sb:.3f}s   {ma/mb:6.2f}x")
    print("\nraw: " + json.dumps(results))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
    else:
        orchestrate()
