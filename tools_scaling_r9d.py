#!/usr/bin/env python3
"""Round-9d scale rows: positional retrieval (phrase + proximity).

Doc-id-offset corpus replicas (as r9c): term statistics and phrase
occurrences replicate, so linear scaling is the pass bar. Both
operators shuffle only query-word HITS (each row: id, position,
word-index/bit) — the token stream itself never shuffles — so the
expectation is rows exp ~1.0 with constants proportional to the
query words' document frequency.

Also measures proximity SERVED vs direct at 10x: the served form
reads pruned term buckets of a prebuilt positional index instead of
tokenizing the corpus — the wall gap is the amortization payoff.

Measurement discipline per memory/spark-measurement-traps: noop sink,
COLD-run shuffle via cumulative diffs, warm-repeat wall.

Usage: python tools_scaling_r9d.py [base_sf_dir]
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
UI_PORT = 4053


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
    import tempfile

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaling-r9d")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    from bo_sql_spark.operators.search import (
        materialize_inverted_index,
        phrase_search,
        proximity_search,
        proximity_served,
    )

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

    p1 = measure(app, "phrase@1x", lambda: phrase_search(docs1, ["hash", "join"]))
    p10 = measure(app, "phrase@10x", lambda: phrase_search(docs10, ["hash", "join"]))
    print(
        f"phrase scaling: rows exp {exp(p10[2], p1[2]):.2f},"
        f" bytes exp {exp(p10[1], p1[1]):.2f},"
        f" wall {p1[0]:.2f}s -> {p10[0]:.2f}s"
    )

    x1 = measure(
        app, "prox@1x", lambda: proximity_search(docs1, ["dup", "vector"], window=12)
    )
    x10 = measure(
        app, "prox@10x", lambda: proximity_search(docs10, ["dup", "vector"], window=12)
    )
    print(
        f"proximity scaling: rows exp {exp(x10[2], x1[2]):.2f},"
        f" bytes exp {exp(x10[1], x1[1]):.2f},"
        f" wall {x1[0]:.2f}s -> {x10[0]:.2f}s"
    )

    # served-vs-direct at 10x: prebuild the positional index once,
    # then compare one proximity query answered from pruned buckets
    # against the direct corpus scan.
    idx = tempfile.mkdtemp(prefix="bosql_r9d_idx_") + "/index"
    t0 = time.perf_counter()
    materialize_inverted_index(docs10, idx)
    build = time.perf_counter() - t0
    s10 = measure(
        app,
        "prox_served@10x",
        lambda: proximity_served(spark, idx, ["dup", "vector"], window=12),
    )
    print(
        f"served amortization at 10x: build {build:.2f}s ONCE, then "
        f"served {s10[0]:.2f}s vs direct {x10[0]:.2f}s per query "
        f"({x10[0]/max(s10[0],1e-9):.1f}x)"
    )


if __name__ == "__main__":
    main()
