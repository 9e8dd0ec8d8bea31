"""Empirical scale-up checks for the round-6 operators.

Three measurements, feeding the "Scale-up evidence" notes in SCALE.md:

1. BPE training (text_bpe_train's 6-merge loop) at 1x vs 10x corpus —
   the 10x corpus is the same replica-suffix construction as
   tools_scaling.py (disjoint per-replica vocabularies), so the
   word-frequency table and pair tables scale ~10x and the measured
   exponent shows whether the vocab-sized-iteration claim holds.
2. SemDeDup's cluster-count lever: the within-cell pairwise stage at
   fixed corpus (sf0.1, 2000 vecs) with k=16 vs k=160 centroids, plus
   corpus growth 500 -> 2000 at fixed k=16. Reports candidate-pair
   counts and wall times — the point is that pair work is O(n^2/k), so
   scaling k with n (the published SemDeDup setup) is what keeps the
   stage linear; a fixed k does not survive corpus growth.
3. Heavy hitters at 1x vs 10x corpus (ratio threshold scaled with the
   replica dilution so the output profile matches: 30 hitters -> 300).

Usage: python tools_scaling_r6.py [base_sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def corpus_10x(spark):
    """Ten replicas with per-replica word suffixes (disjoint vocabs),
    built in-engine (same construction as tools_scaling.py)."""
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    parts = []
    for r in range(10):
        if r == 0:
            parts.append(docs.select("doc_id", "text"))
        else:
            parts.append(
                docs.select(
                    (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                    F.regexp_replace(
                        F.col("text"), r"(\S+)", f"$1r{r}"
                    ).alias("text"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def timed(fn, warm: int = 1, best_of: int = 2) -> float:
    for _ in range(warm):
        fn()
    times = []
    for _ in range(best_of):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from bo_sql_spark.operators.dedup import semantic_dedup
    from bo_sql_spark.operators.heavy_hitters import heavy_hitters
    from bo_sql_spark.operators.text import bpe_train
    from bo_sql_spark.functions.textfn import tokens

    docs1 = spark.read.parquet(os.path.join(BASE, "documents.parquet")).select(
        "doc_id", "text"
    )
    docs10 = corpus_10x(spark).localCheckpoint(eager=True)

    # 1. BPE training
    t1 = timed(lambda: bpe_train(docs1, 6).collect())
    t10 = timed(lambda: bpe_train(docs10, 6).collect())
    exp = math.log10(t10 / t1)
    print(f"bpe_train 6 merges: 1x {t1:.2f}s  10x {t10:.2f}s  exponent {exp:.2f}")

    # 2. SemDeDup cluster-count lever
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    for n, k in ((500, 16), (2000, 16), (2000, 160)):
        sub = emb.filter(F.col("vec_id") < n)
        cents = emb.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
        )
        # candidate-pair count for the workload statement
        from bo_sql_spark.operators.similarity import ivf_assign

        assigned = ivf_assign(sub, cents)
        pairs = (
            assigned.groupBy("cell").count()
            .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p"))
            .first()["p"]
        )
        t = timed(lambda: semantic_dedup(sub, cents, threshold=0.95).count())
        print(f"semantic_dedup n={n} k={k}: pairs={int(pairs)} wall={t:.2f}s")

    # 3. heavy hitters (threshold scaled with replica dilution)
    tk1 = docs1.select(F.explode(tokens(F.col("text"))).alias("term")).filter(
        F.col("term") != ""
    )
    tk10 = docs10.select(F.explode(tokens(F.col("text"))).alias("term")).filter(
        F.col("term") != ""
    )
    h1 = timed(lambda: heavy_hitters(tk1, "term", ratio_denom=200).count())
    h10 = timed(lambda: heavy_hitters(tk10, "term", ratio_denom=2000).count())
    n1 = heavy_hitters(tk1, "term", ratio_denom=200).count()
    n10 = heavy_hitters(tk10, "term", ratio_denom=2000).count()
    exp = math.log10(h10 / h1)
    print(
        f"heavy_hitters: 1x {h1:.2f}s ({n1} hitters)  10x {h10:.2f}s "
        f"({n10} hitters)  exponent {exp:.2f}"
    )


if __name__ == "__main__":
    main()
