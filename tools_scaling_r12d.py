#!/usr/bin/env python3
"""Round-12 (cont. 2) scale rows: the graph family — degree-ordered
triangle counting and modularity.

Synthetic pseudorandom graphs (deterministic LCG edge endpoints) at
1x and 8x edges with node count scaling alongside (constant average
degree — the sparse-graph regime a similarity graph lives in).
Expected:
- triangle_stats: wedge rows track m * avg_deg; at CONSTANT average
  degree that is linear in m (exp ~1). The degree-ordered orientation
  is what keeps hub blowup out; the probe's graphs are near-regular so
  this measures the baseline shape, not the hub defense (the hub
  defense is an O(sqrt m) bound argument, graph.py docstring).
- modularity: two broadcast-able joins + groupBys — exp ~1 rows, flat
  small walls.

Usage: python tools_scaling_r12d.py
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

UI_PORT = 4058


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


def exp(b, a, ratio):
    return math.log(max(b, 1) / max(a, 1)) / math.log(ratio)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaling-r12d")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    from bo_sql_spark.operators.graph import modularity, triangle_stats

    def rand_graph(n_nodes: int, n_edges: int):
        # deterministic LCG endpoints; avg degree = 2*m/n held constant
        return (
            spark.range(n_edges)
            .select(
                (F.col("id") * 1_000_003 % n_nodes).alias("src"),
                ((F.col("id") * 998_244_353 + 12_345) % n_nodes).alias("dst"),
            )
            .localCheckpoint(eager=True)
        )

    g1 = rand_graph(10_000, 60_000)
    g8 = rand_graph(80_000, 480_000)

    one = measure(app, "triangle_stats 1x", lambda: triangle_stats(g1))
    eight = measure(app, "triangle_stats 8x", lambda: triangle_stats(g8))
    print(
        f"triangle_stats scaling (edges x8, const avg degree):"
        f" rows exp {exp(eight[2], one[2], 8):.2f},"
        f" bytes exp {exp(eight[1], one[1], 8):.2f},"
        f" wall {one[0]:.2f}s -> {eight[0]:.2f}s",
        flush=True,
    )

    def mod(g, n_nodes):
        def b():
            assign = (
                g.select(F.col("src").alias("node"))
                .union(g.select(F.col("dst").alias("node")))
                .distinct()
                .select("node", F.pmod(F.col("node"), F.lit(64)).alias("community"))
            )
            return modularity(g, assign)

        return b

    one = measure(app, "modularity 1x", mod(g1, 10_000))
    eight = measure(app, "modularity 8x", mod(g8, 80_000))
    print(
        f"modularity scaling (edges x8): rows exp {exp(eight[2], one[2], 8):.2f},"
        f" bytes exp {exp(eight[1], one[1], 8):.2f},"
        f" wall {one[0]:.2f}s -> {eight[0]:.2f}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
