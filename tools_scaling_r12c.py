#!/usr/bin/env python3
"""Round-12 (cont. 2) scale rows: the KMV/theta sketch family and the
Efraimidis-Spirakis weighted reservoir.

1. kmv build+estimate (per-lang, k=256) at 1x and 10x corpus with the
   replica-unique token remap (disjoint replica token sets -> distinct
   shingles scale ~10x). Expected: shuffle rows exp ~1 — the cost IS
   the distinct-hash exchange (any distinct count pays it); the
   sketch itself stays k rows per lang at every scale.
2. kmv set estimates SERVED from two prebuilt (checkpointed) k=512
   sketches at both scales. Expected: wall and shuffle FLAT — the
   whole point of the sketch: set algebra never revisits the corpus,
   it joins k-row tables.
3. weighted_reservoir_topk (k=100) at 1x and 10x. Expected: shuffle
   rows ~0 (TakeOrderedAndProject ships k rows per partition to one
   reducer, never the losers); wall tracks the scan linearly.

Measurement discipline (SCALE.md): noop sink for full plans,
cold-shuffle via cumulative REST diffs, wall from the warm repeat.

Usage: python tools_scaling_r12c.py [base_sf_dir]
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
UI_PORT = 4057


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


def exp(b, a, ratio=10.0):
    return math.log(max(b, 1) / max(a, 1)) / math.log(ratio)


def report(name, one, ten, ratio=10.0):
    print(
        f"{name} scaling (input x{ratio:g}): rows exp {exp(ten[2], one[2], ratio):.2f},"
        f" bytes exp {exp(ten[1], one[1], ratio):.2f},"
        f" wall {one[0]:.2f}s -> {ten[0]:.2f}s",
        flush=True,
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaling-r12c")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import kmv as K
    from bo_sql_spark.operators.sampling import weighted_reservoir_topk

    docs1 = (
        spark.read.parquet(f"{BASE}/documents.parquet")
        .select("doc_id", "lang", "text")
        .filter(F.col("text").isNotNull())
        .localCheckpoint(eager=True)
    )
    n1 = docs1.count()
    d_off = n1 * 10
    parts = [docs1]
    for r in range(1, 10):
        parts.append(
            docs1.select(
                (F.col("doc_id") + F.lit(r * d_off)).alias("doc_id"),
                "lang",
                F.regexp_replace("text", r"(\S+)", f"$1zz{r}").alias("text"),
            )
        )
    m10 = parts[0]
    for p in parts[1:]:
        m10 = m10.unionByName(p)
    docs10 = m10.localCheckpoint(eager=True)
    print(f"corpus: 1x={n1} docs, 10x={docs10.count()} docs", flush=True)

    def shingles(docs):
        return docs.select(
            "lang", F.explode(word_shingles(F.col("text"), 3)).alias("shingle")
        ).filter(F.col("shingle") != "")

    # -- 1. KMV build + per-lang estimate -----------------------------
    def kmv_build(docs):
        def b():
            sk = K.kmv_sketch(shingles(docs), "shingle", ["lang"], 256, 32)
            return K.kmv_estimate(sk, ["lang"], 256)

        return b

    one = measure(app, "kmv_build_estimate 1x", kmv_build(docs1))
    ten = measure(app, "kmv_build_estimate 10x", kmv_build(docs10))
    report("kmv_build_estimate", one, ten)

    # -- 2. KMV set estimates served from prebuilt sketches -----------
    def prebuilt(docs):
        half_a = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
        half_b = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
        ska = K.kmv_sketch(
            shingles(half_a).select(F.col("shingle")), "shingle", [], 512, 32
        ).localCheckpoint(eager=True)
        skb = K.kmv_sketch(
            shingles(half_b).select(F.col("shingle")), "shingle", [], 512, 32
        ).localCheckpoint(eager=True)
        return ska, skb

    ska1, skb1 = prebuilt(docs1)
    ska10, skb10 = prebuilt(docs10)
    one = measure(app, "kmv_set_estimates 1x", lambda: K.kmv_set_estimates(ska1, skb1, 512))
    ten = measure(app, "kmv_set_estimates 10x", lambda: K.kmv_set_estimates(ska10, skb10, 512))
    report("kmv_set_estimates(served)", one, ten)

    # -- 3. weighted reservoir ----------------------------------------
    def reservoir(docs):
        def b():
            alpha = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
            w = F.greatest(
                F.lit(1).cast("long"),
                F.least(
                    F.lit(999).cast("long"),
                    F.floor(
                        F.lit(1000) * alpha / F.greatest(F.lit(1), F.length("text"))
                    ).cast("long"),
                ),
            )
            staged = docs.select("doc_id", w.alias("w"))
            return weighted_reservoir_topk(staged, "doc_id", "w", 100, 29)

        return b

    one = measure(app, "weighted_reservoir 1x", reservoir(docs1))
    ten = measure(app, "weighted_reservoir 10x", reservoir(docs10))
    report("weighted_reservoir", one, ten)

    spark.stop()


if __name__ == "__main__":
    main()
