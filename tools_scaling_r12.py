#!/usr/bin/env python3
"""Round-12 scale rows: portable MinHash dedup, the v2 e2e pipeline,
and the consistency-checked BM25 serve.

1. minhash_dedup_pairs_portable at 1x and 10x corpus. Replicas get a
   replica-unique SUFFIX on every word — an isomorphic word remap, so
   each replica reproduces the base corpus's shingle statistics
   exactly while sharing zero shingles across replicas: 10x is ten
   independent corpora, not an artificial 10-way duplicate cluster.
   (First attempt spliced a tag token BETWEEN words; that collapsed
   the effective shingle arity from 3 words to 2 over the fixture's
   ~60-word vocabulary and every doc became everyone's near-dup —
   a lesson worth keeping: replica schemes must preserve the
   statistic the operator keys on.) Expected: shuffle rows exp ~1
   (band rows + per-doc signatures linear; verify O(real candidates)).
2. training_pipeline_e2e_v2's full composition at 1x/10x. The e2e
   replicas use a STOPWORD-PRESERVING remap (suffix only words of
   >= 5 chars): the full remap would rename 'the' and the Gopher
   stopword rule would drop every replica at stage 1 (measured: rows
   exp 0.33 — the pipeline WORKING as designed on a corpus that is
   90% rule-garbage, but not a machinery-scaling measurement).
   Expected with preserved stopwords: rows exp ~1 with the r11
   vocab-partial caveat (map-side partials emit O(vocab) per task).
3. bm25_served serve-only walls: precomputed-idf (stamp check ON — two
   extra 1-row driver reads, the r12 ADVICE hardening) vs the
   postings-derived fallback. Expected: the stamp check costs
   milliseconds on the serve wall; the precomputed path stays ahead.

Measurement discipline (SCALE.md): noop sink for full plans,
cold-shuffle via cumulative REST diffs, wall from the warm repeat.

Usage: python tools_scaling_r12.py [base_sf_dir]
"""

from __future__ import annotations

import json
import math
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
UI_PORT = 4055


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


def report(name, one, ten):
    print(
        f"{name} scaling: rows exp {exp(ten[2], one[2]):.2f},"
        f" bytes exp {exp(ten[1], one[1]):.2f},"
        f" wall {one[0]:.2f}s -> {ten[0]:.2f}s",
        flush=True,
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaling-r12")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    from bo_sql_spark.operators import dedup as D
    from bo_sql_spark.operators.search import (
        bm25_served,
        materialize_inverted_index,
    )
    from bo_sql_spark import fsutil

    docs1 = (
        spark.read.parquet(f"{BASE}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    n1 = docs1.count()
    d_off = n1 * 10
    parts = [docs1]
    for r in range(1, 10):
        parts.append(
            docs1.select(
                (F.col("doc_id") + F.lit(r * d_off)).alias("doc_id"),
                # isomorphic word remap per replica (see module doc)
                F.regexp_replace("text", r"(\S+)", f"$1zz{r}").alias("text"),
            )
        )
    m10 = parts[0]
    for p in parts[1:]:
        m10 = m10.unionByName(p)
    docs10 = m10.localCheckpoint(eager=True)
    print(f"corpus: 1x={n1} docs, 10x={docs10.count()} docs", flush=True)

    # e2e replicas: remap only >=5-char words so the Gopher stopwords
    # ('the', 'with', ...) survive — see module doc item 2
    eparts = [docs1]
    for r in range(1, 10):
        eparts.append(
            docs1.select(
                (F.col("doc_id") + F.lit(r * d_off)).alias("doc_id"),
                F.regexp_replace("text", r"(\S{5,})", f"$1zz{r}").alias("text"),
            )
        )
    e10 = eparts[0]
    for p in eparts[1:]:
        e10 = e10.unionByName(p)
    edocs10 = e10.localCheckpoint(eager=True)

    # -- 1. portable MinHash pairs --------------------------------
    one = measure(app, "pm_pairs 1x",
                  lambda: D.minhash_dedup_pairs_portable(docs1))
    ten = measure(app, "pm_pairs 10x",
                  lambda: D.minhash_dedup_pairs_portable(docs10))
    report("minhash_dedup_pairs_portable", one, ten)

    # -- 2. e2e v2 composition -------------------------------------
    from bo_sql_spark.queries.training import training_pipeline_e2e_v2

    def e2e(docs):
        # rebuild the registered composition over an injected corpus by
        # round-tripping through a temp table dir the builder reads
        path = tempfile.mkdtemp(prefix="bosql_sc12_") 
        docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text").cast("long")).write.mode(
            "overwrite"
        ).parquet(path + "/documents.parquet")
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            fsutil  # table loader only touches documents for this query
        return path

    import bo_sql_spark.queries.training as TR

    p1 = e2e(docs1)
    p10 = e2e(edocs10)
    # load_tables loads all tables; symlink the rest from BASE
    import os
    for p in (p1, p10):
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            os.symlink(f"{BASE}/{t}.parquet", f"{p}/{t}.parquet")
    one = measure(app, "e2e_v2 1x", lambda: training_pipeline_e2e_v2(spark, p1))
    ten = measure(app, "e2e_v2 10x", lambda: training_pipeline_e2e_v2(spark, p10))
    report("training_pipeline_e2e_v2", one, ten)

    # -- 3. serve walls: precomputed+stamp vs fallback --------------
    idx = tempfile.mkdtemp(prefix="bosql_sc12_idx_") + "/index"
    materialize_inverted_index(docs1, idx)
    terms = ["dup", "merge", "vector"]

    def serve():
        return bm25_served(spark, idx, terms, k=20)

    serve().collect()
    t0 = time.perf_counter()
    for _ in range(3):
        serve().collect()
    pre = (time.perf_counter() - t0) / 3
    fsutil.delete(spark, idx + "_terms")
    serve().collect()
    t0 = time.perf_counter()
    for _ in range(3):
        serve().collect()
    fb = (time.perf_counter() - t0) / 3
    print(
        f"bm25 serve wall: precomputed+stamp {pre:.3f}s vs fallback {fb:.3f}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
