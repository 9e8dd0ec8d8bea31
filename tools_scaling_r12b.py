#!/usr/bin/env python3
"""Round-12 (cont.) scale rows: the portable SimHash pair pipeline,
the portable RP-LSH similarity join, and the portable ANN bucket probe.

1. simhash_near_dup_pairs_portable at 1x and 10x corpus, using the
   r12 isomorphic word remap (replica-unique SUFFIX on every word):
   each replica reproduces the base corpus's token statistics with a
   disjoint token set, so per-replica signatures are independent and
   the TRUE pair set scales linearly. Expected: rows exp ~1 (token
   rows and band rows linear; chunk-bucket collisions across replicas
   are random 15-bit coincidences, not near-dups — the Hamming verify
   rejects them at O(1) per candidate).
2. approx_similarity_join_portable on the NATURAL fixture scale
   (sf0.01 -> sf0.1 embeddings, 500 -> 2000 vectors — a 4x step; all
   exponents are computed against the MEASURED ratio). At FIXED bits
   the candidate set is Theta(N^2 / 2^bits) per seed — a similarity
   self-JOIN's output itself is quadratic for i.i.d. vectors, so this
   is the operator's true shape, not a defect. Expected: rows exp ~2
   at fixed bits; the 100 TB knob is bits ~ log2(N) (hold per-bucket
   occupancy constant), exactly like IVF's cell count scaling with
   corpus size — the bits=8 leg measures the knob working.
3. ann_topk_lsh_portable on the same natural scale. The probe is a
   broadcast semi-join (corpus never shuffles for it); only matching-
   bucket rows (~23% at bits=4/seeds=4) reach the top-k heap.
   Expected: rows exp ~1 (candidates linear in corpus at fixed
   bucket fraction), wall dominated by the quantize+bucket map.

Measurement discipline (SCALE.md): noop sink for full plans,
cold-shuffle via cumulative REST diffs, wall from the warm repeat.

Usage: python tools_scaling_r12b.py [base_sf_dir]
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
SMALL = BASE.replace("sf0.1", "sf0.01")
UI_PORT = 4056


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
    """Scaling exponent vs the ACTUAL input growth: rows(k*N) ~ k^exp.
    The embeddings fixture grows 4x between sf0.01 and sf0.1 (500 ->
    2000 vectors), not 10x — exponents against the wrong base read a
    clean quadratic as '1.27'."""
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
        .appName("scaling-r12b")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    from bo_sql_spark.operators import dedup as D
    from bo_sql_spark.operators import similarity as S

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
                F.regexp_replace("text", r"(\S+)", f"$1zz{r}").alias("text"),
            )
        )
    m10 = parts[0]
    for p in parts[1:]:
        m10 = m10.unionByName(p)
    docs10 = m10.localCheckpoint(eager=True)
    print(f"corpus: 1x={n1} docs, 10x={docs10.count()} docs", flush=True)

    # -- 1. portable SimHash pairs --------------------------------
    one = measure(
        app, "simhash_pairs 1x",
        lambda: D.simhash_near_dup_pairs_portable(docs1),
    )
    ten = measure(
        app, "simhash_pairs 10x",
        lambda: D.simhash_near_dup_pairs_portable(docs10),
    )
    report("simhash_pairs_portable", one, ten)

    emb1 = (
        spark.read.parquet(f"{SMALL}/embeddings.parquet").localCheckpoint(eager=True)
    )
    emb10 = (
        spark.read.parquet(f"{BASE}/embeddings.parquet").localCheckpoint(eager=True)
    )
    print(
        f"embeddings: 1x={emb1.count()} vecs, 10x={emb10.count()} vecs",
        flush=True,
    )

    # -- 2. portable RP-LSH join (natural fixture scale) ----------
    one = measure(
        app, "rp_join 1x",
        lambda: S.approx_similarity_join_portable(emb1, 0.40, dim=64),
    )
    ten = measure(
        app, "rp_join 10x",
        lambda: S.approx_similarity_join_portable(emb10, 0.40, dim=64),
    )
    ratio = emb10.count() / emb1.count()
    report("rp_join_portable(fixed bits)", one, ten, ratio)
    # the 100 TB knob: more bits at a bigger corpus holds per-bucket
    # occupancy ~constant -> candidates linear again
    ten_b = measure(
        app, "rp_join bigger bits=8",
        lambda: S.approx_similarity_join_portable(emb10, 0.40, dim=64, bits=8),
    )
    report("rp_join_portable(bits+4 at bigger N)", one, ten_b, ratio)

    # -- 3. portable ANN probe ------------------------------------
    q1 = [float(x) for x in emb1.filter("vec_id = 0").first()["embedding"]]
    q10 = [float(x) for x in emb10.filter("vec_id = 0").first()["embedding"]]
    one = measure(
        app, "ann_probe 1x",
        lambda: S.ann_topk_lsh_portable(emb1.filter("vec_id <> 0"), q1, dim=64),
    )
    ten = measure(
        app, "ann_probe 10x",
        lambda: S.ann_topk_lsh_portable(emb10.filter("vec_id <> 0"), q10, dim=64),
    )
    report("ann_probe_portable", one, ten, ratio)

    spark.stop()


if __name__ == "__main__":
    main()
