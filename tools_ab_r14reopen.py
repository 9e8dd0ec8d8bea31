"""Reopen-session interleaved A/B (guide §1): narrow-vs-wide simhash
fold and single-pass-vs-4-subtree kmv exact stats, noop-sink timed,
alternating A/B/A/B within one session so host weather hits both sides.

Usage: python tools_ab_r14reopen.py [--sf DIR] [--pairs N]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"
PAIRS = 4
args = sys.argv[1:]
if "--sf" in args:
    SF = args[args.index("--sf") + 1]
if "--pairs" in args:
    PAIRS = int(args[args.index("--pairs") + 1])

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import bo_sql_spark.operators.dedup as dedup_mod  # noqa: E402
from bo_sql_spark.queries import load_all  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()

_orig_simhash = dedup_mod.simhash_portable


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_simhash(impl):
    dedup_mod.simhash_portable = (
        lambda docs, id_col="doc_id", text_col="text": _orig_simhash(
            docs, id_col, text_col, impl=impl
        )
    )
    try:
        df = reg["dedup_simhash_portable"].builder(spark, SF)
        t0 = time.perf_counter()
        _noop(df)
        return time.perf_counter() - t0
    finally:
        dedup_mod.simhash_portable = _orig_simhash


# ---- old kmv body (verbatim from HEAD pre-edit, 4 exact subtrees) ----
def kmv_overlap_old(spark, sf_dir):
    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import kmv as K
    from bo_sql_spark.parallel import spread_scan
    from bo_sql_spark.queries.pipeline import _KMV_OK, _KMV_SHARDS, _t

    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())

    def hashes(pred):
        return (
            spread_scan(docs.filter(pred), "doc_id")
            .select(F.explode(word_shingles(F.col("text"), 3)).alias("shingle"))
            .filter(F.col("shingle") != "")
            .select(K.kmv_hash("shingle").alias("h"))
            .distinct()
        )

    ha = hashes(F.col("doc_id") < 250).localCheckpoint(eager=False)
    hb = hashes(F.col("doc_id") >= 250).localCheckpoint(eager=False)
    ska = K.kmv_sketch_from_hashes(ha, [], _KMV_OK, _KMV_SHARDS).localCheckpoint(
        eager=False
    )
    skb = K.kmv_sketch_from_hashes(hb, [], _KMV_OK, _KMV_SHARDS).localCheckpoint(
        eager=False
    )
    est = K.kmv_set_estimates(ska, skb, _KMV_OK)
    exact = (
        ha.agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
        .crossJoin(
            F.broadcast(hb.agg(F.count(F.lit(1)).cast("long").alias("exact_b")))
        )
        .crossJoin(
            F.broadcast(
                ha.union(hb)
                .distinct()
                .agg(F.count(F.lit(1)).cast("long").alias("exact_union"))
            )
        )
        .crossJoin(
            F.broadcast(
                ha.intersect(hb).agg(
                    F.count(F.lit(1)).cast("long").alias("exact_intersect")
                )
            )
        )
    )
    return est.crossJoin(F.broadcast(exact))


def time_kmv(side):
    if side == "new":
        df = reg["sketch_kmv_overlap"].builder(spark, SF)
    else:
        df = kmv_overlap_old(spark, SF)
    t0 = time.perf_counter()
    _noop(df)
    return time.perf_counter() - t0


for label, fn, a, b in (
    ("simhash", time_simhash, "narrow", "wide"),
    ("kmv_overlap", time_kmv, "new", "old"),
):
    # warm both sides once
    fn(a), fn(b)
    ta, tb = [], []
    for i in range(PAIRS):
        spark.sparkContext.setJobDescription(f"ab:{label} {a} {i}")
        ta.append(fn(a))
        spark.sparkContext.setJobDescription(f"ab:{label} {b} {i}")
        tb.append(fn(b))
    ra = sorted(ta)[len(ta) // 2]
    rb = sorted(tb)[len(tb) // 2]
    print(
        f"{label}: {a} median {ra:.2f}s reps={[round(x,2) for x in ta]} | "
        f"{b} median {rb:.2f}s reps={[round(x,2) for x in tb]} | "
        f"ratio {a}/{b} = {ra/rb:.2f}",
        flush=True,
    )
spark.stop()
