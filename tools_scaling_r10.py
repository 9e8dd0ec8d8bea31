#!/usr/bin/env python3
"""Round-10 scale rows: the entropy family and hybrid RRF retrieval.

1. token_entropy at 1x and 10x corpus — replicas are doc-id-offset
   copies. Expected linear in shuffle ROWS: the only exchange carries
   the (doc, term) tf table (posting grain) and the per-doc fold; the
   ln is a codegen'd integer map, so 10x docs => 10x tf rows, same
   bytes/row.
2. cross_entropy_lm at 1x/10x — same tf exchange plus a VOCABULARY-
   grain gf aggregate (constant across replication: replicas repeat
   the same text, so |vocab| is constant while counts grow — exactly
   the at-scale shape where the broadcast side stays fixed).
3. kl_from_counts at 1x/10x CATEGORIES (not corpus: the operator's
   input is the pre-aggregated count table, so the scale axis is
   category cardinality) — expected linear rows, trivial bytes.
4. search_hybrid_rrf legs at 1x/10x corpus — the fusion itself is a
   50x50 join (constant); what scales is each leg: bm25 (measured in
   r9c, re-rowed here post log-idf) and the brute-force cosine scan
   (linear scan, top-50 heap; the served IVF replaces it drop-in).

Measurement discipline per memory/spark-measurement-traps: noop sink
for full plans, COLD-run shuffle via cumulative before/after diffs,
wall from the warm repeat.

Usage: python tools_scaling_r10.py [base_sf_dir]
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
        .appName("scaling-r10")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    from bo_sql_spark.operators.drift import kl_from_counts
    from bo_sql_spark.operators.text import cross_entropy_lm, token_entropy

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

    e1 = measure(app, "entropy@1x", lambda: token_entropy(docs1))
    e10 = measure(app, "entropy@10x", lambda: token_entropy(docs10))
    report("token_entropy", e1, e10)

    x1 = measure(app, "xent@1x", lambda: cross_entropy_lm(docs1))
    x10 = measure(app, "xent@10x", lambda: cross_entropy_lm(docs10))
    report("cross_entropy_lm", x1, x10)

    def counts(n_cat):
        return spark.range(n_cat).select(
            F.concat(F.lit("c"), F.col("id")).alias("category"),
            (F.pmod(F.col("id") * 2654435761, F.lit(97)) + 1).alias("n_a"),
            (F.pmod(F.col("id") * 40503, F.lit(89)) + 1).alias("n_b"),
        )

    k1 = measure(app, "kl@1x", lambda: kl_from_counts(counts(10_000)))
    k10 = measure(app, "kl@10x", lambda: kl_from_counts(counts(100_000)))
    report("kl_from_counts(categories)", k1, k10)

    # hybrid legs: the cosine brute-force top-50 (the leg the IVF
    # serving index replaces) over 1x/10x embeddings
    from bo_sql_spark.functions import cosine_similarity

    emb1 = (
        spark.read.parquet(f"{BASE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    v_off = emb1.count() * 10
    eparts = [emb1]
    for r in range(1, 10):
        eparts.append(
            emb1.select(
                (F.col("vec_id") + F.lit(r * v_off)).alias("vec_id"), "embedding"
            )
        )
    m10 = eparts[0]
    for p in eparts[1:]:
        m10 = m10.unionByName(p)
    emb10 = m10.localCheckpoint(eager=True)

    def cos_leg(emb):
        q = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        return (
            emb.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                cosine_similarity(F.col("embedding"), F.col("qv")).alias("sim"),
            )
            .orderBy(F.col("sim").desc(), "vec_id")
            .limit(50)
        )

    s1 = measure(app, "cos_leg@1x", lambda: cos_leg(emb1))
    s10 = measure(app, "cos_leg@10x", lambda: cos_leg(emb10))
    report("hybrid_cosine_leg", s1, s10)

    spark.stop()


if __name__ == "__main__":
    main()
