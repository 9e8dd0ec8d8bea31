#!/usr/bin/env python3
"""Round-9b scale rows: message-passing graph ops and drift stats.

1. pagerank at 1x and 10x edges — replicas are DISJOINT node-id-offset
   copies of the knn edge set, so the true structure replicates and
   shuffle/wall should scale ~1x-per-edge (each iteration is one hash
   join + one groupBy; nothing quadratic, no global state).
2. two_sample_ks at 1x and 10x event values — distinct-value counts +
   shard-decomposed cumulative; linear in distinct values.

Measurement discipline per memory/spark-measurement-traps: noop sink
for full plans, COLD-run shuffle via cumulative before/after diffs,
wall from the warm repeat.

Usage: python tools_scaling_r9b.py [base_sf_dir]
"""

from __future__ import annotations

import json
import math
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
UI_PORT = 4051


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.loads(r.read())


def shuffle_total(app):
    b = r = 0
    for st in rest(f"applications/{app}/stages?status=complete"):
        b += st["shuffleWriteBytes"]
        r += st["shuffleWriteRecords"]
    return b, r


def run_full(df):
    df.write.format("noop").mode("overwrite").save()


def measure(app, label, builder):
    time.sleep(1.5)
    b0, r0 = shuffle_total(app)
    run_full(builder())
    time.sleep(1.5)
    b1, r1 = shuffle_total(app)
    t0 = time.perf_counter()
    run_full(builder())
    wall = time.perf_counter() - t0
    print(
        f"{label}: warm-wall={wall:.2f}s cold-shuffle={(b1-b0)/1e6:.2f}MB"
        f" ({r1-r0} rows)",
        flush=True,
    )
    return wall, b1 - b0, r1 - r0


def exp(b, a):
    return math.log(max(b, 1) / max(a, 1)) / math.log(10)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaling-r9b")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    from bo_sql_spark.operators import similarity as S
    from bo_sql_spark.operators.drift import two_sample_ks
    from bo_sql_spark.operators.graph import pagerank

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    edges1 = (
        S.knn_graph(emb, cents, k=5)
        .select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
        .localCheckpoint(eager=True)
    )
    n_off = emb.count() * 10
    parts = [edges1]
    for r in range(1, 10):
        parts.append(
            edges1.select(
                (F.col("src") + F.lit(r * n_off)).alias("src"),
                (F.col("dst") + F.lit(r * n_off)).alias("dst"),
            )
        )
    e10 = parts[0]
    for p in parts[1:]:
        e10 = e10.unionByName(p)
    edges10 = e10.localCheckpoint(eager=True)

    r1 = measure(app, "pagerank@1x", lambda: pagerank(edges1, n_iter=3))
    r10 = measure(app, "pagerank@10x", lambda: pagerank(edges10, n_iter=3))
    print(
        f"pagerank scaling: rows exp {exp(r10[2], r1[2]):.2f},"
        f" bytes exp {exp(r10[1], r1[1]):.2f},"
        f" wall {r1[0]:.2f}s -> {r10[0]:.2f}s"
    )

    ev = spark.read.parquet(f"{BASE}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    ev1 = ev.select("value", F.dayofweek("ts").isin(1, 7).alias("b"))
    vparts = [ev1]
    for r in range(1, 10):
        # shift values per replica so the distinct-value set actually
        # grows 10x (same-value replication would only grow counts)
        vparts.append(
            ev1.select((F.col("value") + F.lit(r * 1e7)).alias("value"), "b")
        )
    v10 = vparts[0]
    for p in vparts[1:]:
        v10 = v10.unionByName(p)
    ev10 = v10.localCheckpoint(eager=True)

    k1 = measure(
        app, "ks@1x", lambda: two_sample_ks(ev1, "value", F.col("b"))
    )
    k10 = measure(
        app, "ks@10x", lambda: two_sample_ks(ev10, "value", F.col("b"))
    )
    print(
        f"ks scaling: rows exp {exp(k10[2], k1[2]):.2f},"
        f" bytes exp {exp(k10[1], k1[1]):.2f},"
        f" wall {k1[0]:.2f}s -> {k10[0]:.2f}s"
    )


if __name__ == "__main__":
    main()
