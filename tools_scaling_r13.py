#!/usr/bin/env python3
"""Round-13 scale rows (SCALE.md): the auto-sized portable RP-LSH
family, the Arrow-vs-HOF twin A/B, and the semantic stream-ingest
microbatch budget.

1. approx_similarity_join_portable at AUTO bits across the natural
   4x fixture step (sf0.01 500 -> sf0.1 2000 vectors; auto picks
   bits 4 -> 6). r12b measured exp 2.12 at FIXED bits=4 and 0.93
   when bits was hand-raised to 8; this re-run asks whether the
   OPERATOR now applies its own knob — expected shuffle-rows exp
   <= ~1 at the auto defaults (the r12 verdict's #2 'Done' re-run).
2. ann_topk_lsh_portable at the auto probe knobs (bits 7 -> 9,
   query-directed flips) — candidates 112 -> 382 at 4x input,
   expected exp < 1.
3. Twin A/B, SAME-SESSION ALTERNATING ORDER (the SCALE.md:1226
   method): impl='arrow' (NumPy int64 matmul pandas_udf) vs
   impl='hof' (interpreted aggregate/zip_with) for the join and the
   probe at sf0.1 — the r12 verdict's #3: results are bit-identical
   (unit-pinned), only the wall may differ; report per-leg medians.
4. dedup_semantic_stream_ingest budget: the operator ingests one
   microbatch of n, 2n, 4n vectors (replica ids, perturbed vectors)
   against a fresh store; if rows/s RISES with batch size the 570
   rows/s graded number is per-batch-overhead-dominated (fixed
   microbatch cost amortized over more rows), not a per-row cost —
   the r12 verdict's #5 ask.

Measurement discipline (SCALE.md): noop sink for full plans,
cold-shuffle via cumulative REST diffs, wall from the warm repeat.

Usage: python tools_scaling_r13.py [base_sf_dir]
"""

from __future__ import annotations

import json
import math
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SMALL = BASE.replace("sf0.1", "sf0.01")
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


def exp(b, a, ratio):
    return math.log(max(b, 1) / max(a, 1)) / math.log(ratio)


def report(name, one, ten, ratio):
    print(
        f"{name} scaling (input x{ratio:g}): rows exp {exp(ten[2], one[2], ratio):.2f},"
        f" bytes exp {exp(ten[1], one[1], ratio):.2f},"
        f" wall {one[0]:.2f}s -> {ten[0]:.2f}s",
        flush=True,
    )


def twin_ab(label, build_a, build_b, reps=3):
    """Same-session alternating-order A/B: ABBA-style interleave so
    slow host drift hits both legs equally; report medians."""
    wa, wb = [], []
    for i in range(reps):
        order = [("A", build_a, wa), ("B", build_b, wb)]
        if i % 2:
            order.reverse()
        for _, build, acc in order:
            t0 = time.perf_counter()
            run_full(build())
            acc.append(time.perf_counter() - t0)
    ma, mb = statistics.median(wa), statistics.median(wb)
    print(
        f"twin A/B {label}: A(arrow) median {ma:.2f}s"
        f" [{', '.join(f'{w:.2f}' for w in wa)}]"
        f" vs B(hof) median {mb:.2f}s"
        f" [{', '.join(f'{w:.2f}' for w in wb)}]"
        f" -> arrow is x{mb / ma:.2f} {'FASTER' if ma < mb else 'slower'}",
        flush=True,
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaling-r13")
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

    emb1 = spark.read.parquet(f"{SMALL}/embeddings.parquet").localCheckpoint(
        eager=True
    )
    emb4 = spark.read.parquet(f"{BASE}/embeddings.parquet").localCheckpoint(
        eager=True
    )
    n1, n4 = emb1.count(), emb4.count()
    ratio = n4 / n1
    print(f"embeddings: 1x={n1} vecs, big={n4} vecs (x{ratio:g})", flush=True)
    print(
        f"auto params: join {S.rp_auto_join_params(n1)} -> {S.rp_auto_join_params(n4)},"
        f" probe {S.rp_auto_probe_params(n1 - 1)} -> {S.rp_auto_probe_params(n4 - 1)}",
        flush=True,
    )

    # -- 1. auto-sized RP join ------------------------------------
    one = measure(
        app, "rp_join auto 1x",
        lambda: S.approx_similarity_join_portable(emb1, 0.40, dim=64),
    )
    four = measure(
        app, "rp_join auto 4x",
        lambda: S.approx_similarity_join_portable(emb4, 0.40, dim=64),
    )
    report("rp_join_portable(AUTO bits)", one, four, ratio)
    # The noop-sink rows above are OUTPUT pairs (the Arrow path joins
    # broadcast bucket tables, so candidates never hit an exchange, and
    # the true >=0.40 pair count itself grows ~N^2 for i.i.d. vectors).
    # The operator's own cost driver is the CANDIDATE set — measure it
    # directly from bucket occupancies: sum over (seed, bucket) of
    # C(n_b, 2).
    from bo_sql_spark.operators.similarity import (
        _stack_rp_buckets, quantize_vec, rp_auto_join_params, rp_sign_masks,
    )

    def cand_pairs(emb, n):
        bits, seeds = rp_auto_join_params(n)
        q = emb.select(quantize_vec("embedding").alias("qv")).filter(
            F.exists("qv", lambda x: x != 0)
        )
        occ = (
            _stack_rp_buckets(q, rp_sign_masks(seeds, bits), 64, [], "arrow")
            .groupBy("seed", "bucket").count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("p"))
            .first()["p"]
        )
        return int(occ)

    cp1, cp4 = cand_pairs(emb1, n1), cand_pairs(emb4, n4)
    print(
        f"rp_join candidate pairs (auto bits): {cp1} -> {cp4}"
        f" = exp {exp(cp4, cp1, ratio):.2f}"
        f" (scan fraction {cp1 / (n1 * (n1 - 1) / 2):.3f}"
        f" -> {cp4 / (n4 * (n4 - 1) / 2):.3f})",
        flush=True,
    )

    # -- 2. auto probe ---------------------------------------------
    q1 = [float(x) for x in emb1.filter("vec_id = 0").first()["embedding"]]
    q4 = [float(x) for x in emb4.filter("vec_id = 0").first()["embedding"]]
    c1, c4 = emb1.filter("vec_id <> 0"), emb4.filter("vec_id <> 0")
    one = measure(
        app, "ann_probe auto 1x",
        lambda: S.ann_topk_lsh_portable(c1, q1, dim=64),
    )
    four = measure(
        app, "ann_probe auto 4x",
        lambda: S.ann_topk_lsh_portable(c4, q4, dim=64),
    )
    report("ann_probe_portable(AUTO knobs)", one, four, ratio)

    # -- 3. Arrow vs HOF twins -------------------------------------
    twin_ab(
        "rp_join sf0.1",
        lambda: S.approx_similarity_join_portable(emb4, 0.40, dim=64, impl="arrow"),
        lambda: S.approx_similarity_join_portable(emb4, 0.40, dim=64, impl="hof"),
    )
    twin_ab(
        "ann_probe sf0.1",
        lambda: S.ann_topk_lsh_portable(c4, q4, dim=64, impl="arrow"),
        lambda: S.ann_topk_lsh_portable(c4, q4, dim=64, impl="hof"),
    )

    # -- 4. semantic stream-ingest microbatch budget ---------------
    import shutil
    import tempfile

    cents = emb4.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    base = emb4.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    for mult in (1, 2, 4):
        parts = [base]
        for r in range(1, mult):
            parts.append(
                base.select(
                    (F.col("vec_id") + F.lit(r * 1_000_000)).alias("vec_id"),
                    F.transform(
                        "embedding",
                        (lambda rr: (lambda x, i: x * (
                            F.lit(1.0) + F.lit(0.001 * rr) * ((i % 3) + 1)
                        )))(r),
                    ).alias("embedding"),
                )
            )
        batch = parts[0]
        for p in parts[1:]:
            batch = batch.unionAll(p)
        batch = batch.localCheckpoint(eager=True)
        n = batch.count()
        walls = []
        for rep in range(2):
            root = tempfile.mkdtemp(prefix="bosql_r13_semstream_")
            t0 = time.perf_counter()
            D.semantic_dedup_stream_ingest(
                spark, batch, cents,
                root + "/assignment", root + "/survivors",
                threshold=0.95, batch_id=0,
            )
            walls.append(time.perf_counter() - t0)
            shutil.rmtree(root, ignore_errors=True)
        w = min(walls)
        print(
            f"semantic_ingest batch x{mult}: {n} rows in {w:.2f}s"
            f" = {n / w:,.0f} rows/s"
            f" [{', '.join(f'{x:.2f}' for x in walls)}]",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
