#!/usr/bin/env python3
"""Round-9c scale rows: keyword retrieval and robust anomaly profile.

1. bm25_topk at 1x and 10x corpus — replicas are doc-id-offset copies,
   so corpus stats (n_docs, sum_dl, df) scale by 10 and the score
   distribution replicates. Expected linear: the query-term filter
   lands at token grain, so the tf shuffle is selectivity-bound; dl is
   a doc-grain aggregate (linear); the top-k is a
   TakeOrderedAndProject (no global sort).
2. conjunctive_search at 1x/10x — posting-list AND; shuffled rows are
   (doc_id, term) for query-term hits only.
3. robust_group_outliers at 1x/10x — replicas VALUE-SHIFTED per copy
   (same trick as the KS row) so the distinct-value set really grows
   10x; the median/MAD windows run at value grain, expected linear.

Measurement discipline per memory/spark-measurement-traps: noop sink
for full plans, COLD-run shuffle via cumulative before/after diffs,
wall from the warm repeat.

Usage: python tools_scaling_r9c.py [base_sf_dir]
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
UI_PORT = 4052


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
        .appName("scaling-r9c")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    from bo_sql_spark.operators.drift import robust_group_outliers
    from bo_sql_spark.operators.search import bm25_topk, conjunctive_search

    terms = ["dup", "merge", "vector"]
    docs1 = (
        spark.read.parquet(f"{BASE}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    n_off = docs1.count() * 10
    dparts = [docs1]
    for r in range(1, 10):
        dparts.append(
            docs1.select((F.col("doc_id") + F.lit(r * n_off)).alias("doc_id"), "text")
        )
    d10 = dparts[0]
    for p in dparts[1:]:
        d10 = d10.unionByName(p)
    docs10 = d10.localCheckpoint(eager=True)

    b1 = measure(app, "bm25@1x", lambda: bm25_topk(docs1, terms, k=20))
    b10 = measure(app, "bm25@10x", lambda: bm25_topk(docs10, terms, k=20))
    print(
        f"bm25 scaling: rows exp {exp(b10[2], b1[2]):.2f},"
        f" bytes exp {exp(b10[1], b1[1]):.2f},"
        f" wall {b1[0]:.2f}s -> {b10[0]:.2f}s"
    )

    c1 = measure(app, "search@1x", lambda: conjunctive_search(docs1, terms))
    c10 = measure(app, "search@10x", lambda: conjunctive_search(docs10, terms))
    print(
        f"search scaling: rows exp {exp(c10[2], c1[2]):.2f},"
        f" bytes exp {exp(c10[1], c1[1]):.2f},"
        f" wall {c1[0]:.2f}s -> {c10[0]:.2f}s"
    )

    ev = spark.read.parquet(f"{BASE}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    ev1 = ev.select("event_type", "value").localCheckpoint(eager=True)
    vparts = [ev1]
    for r in range(1, 10):
        vparts.append(
            ev1.select(
                "event_type", (F.col("value") + F.lit(r * 1e7)).alias("value")
            )
        )
    v10 = vparts[0]
    for p in vparts[1:]:
        v10 = v10.unionByName(p)
    ev10 = v10.localCheckpoint(eager=True)

    m1 = measure(
        app, "mad@1x", lambda: robust_group_outliers(ev1, "value", "event_type")
    )
    m10 = measure(
        app, "mad@10x", lambda: robust_group_outliers(ev10, "value", "event_type")
    )
    print(
        f"mad scaling: rows exp {exp(m10[2], m1[2]):.2f},"
        f" bytes exp {exp(m10[1], m1[1]):.2f},"
        f" wall {m1[0]:.2f}s -> {m10[0]:.2f}s"
    )


if __name__ == "__main__":
    main()
