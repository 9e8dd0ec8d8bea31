#!/usr/bin/env python3
"""Round-9 scale evidence: dedup_lines_global's text-shuffle cut.

The r8 form keyed the first-occurrence window on the chunk TEXT, so
corpus text crossed two exchanges (window + per-doc rebuild). The r9
form keys the window on a 128-bit fingerprint (xxhash64 pair) and
joins fixed-width kept-indices back to the tokenized doc — text
crosses at most ONE exchange (the rebuild join; ZERO when the kept
side broadcasts). This tool measures total shuffle bytes + rows for
both forms at 1x and 10x corpus, same session, cold plans.

Measurement discipline (memory: spark-measurement-traps): full plans
via the noop sink (count() prunes), shuffle bytes from the COLD run
(warm repeats reuse shuffle stages), wall from the warm repeat.

Usage: python tools_scaling_r9.py [base_sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.window import Window

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
UI_PORT = 4049
K = 8


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.loads(r.read())


def shuffle_total(app):
    """Cumulative shuffle-write (bytes, records) over ALL completed
    stages — callers diff before/after a run. Timestamp-window
    attribution (the r8 tools) proved flaky: stage submission strings
    parse in local time and overlapping warm runs bleed in; a
    monotonic cumulative diff can't misattribute."""
    total_b = total_r = 0
    for st in rest(f"applications/{app}/stages?status=complete"):
        total_b += st["shuffleWriteBytes"]
        total_r += st["shuffleWriteRecords"]
    return total_b, total_r


def run_full(df):
    df.write.format("noop").mode("overwrite").save()


def measure(app, label, df_builder):
    time.sleep(1.5)
    b0, r0 = shuffle_total(app)
    run_full(df_builder())
    time.sleep(1.5)
    b1, r1 = shuffle_total(app)
    sb, srec = b1 - b0, r1 - r0
    t0 = time.time()
    run_full(df_builder())
    wall = time.time() - t0
    print(
        f"{label}: warm-wall={wall:.2f}s cold-shuffle={sb/1e6:.2f}MB"
        f" ({srec} rows)",
        flush=True,
    )
    return wall, sb, srec


def lines_global_r8_textkeyed(docs):
    """The round-8 form, reproduced verbatim for the A/B: window keyed
    on chunk text, rebuild via collect_list of (c, chunk) structs —
    corpus text crosses BOTH exchanges."""
    from bo_sql_spark.functions import tokens

    d = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", tokens(F.col("text")).alias("_tok")
    )
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, (size(_tok) - 1) DIV {K}),"
                f" c -> struct(c AS c, array_join(slice(_tok, c * {K} + 1, {K}), ' ') AS chunk))"
            )
        ).alias("_e"),
    ).select("doc_id", F.col("_e.c").alias("c"), F.col("_e.chunk").alias("chunk"))
    w = Window.partitionBy("chunk").orderBy("doc_id", "c")
    flagged = chunks.withColumn("_keep", F.row_number().over(w) == 1)
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_kept"),
        F.coalesce(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "CASE WHEN _keep THEN struct(c, chunk) END)), x -> x.chunk), ' ')"
            ),
            F.lit(""),
        ).alias("text_kept"),
    )


def docs_10x(docs):
    """10x docs: replicate with remapped ids and a per-replica token
    prefix so replicas are not global duplicates of each other (which
    would make the 10x run measure a planted-dup explosion, not
    scale). Replica 0 is the original corpus, so the original dup
    structure is preserved."""
    n = docs.count()
    parts = [docs.select("doc_id", "text")]
    for r in range(1, 10):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10 * n)).alias("doc_id"),
                F.concat(F.lit(f"replica{r} marker "), F.col("text")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def overlap_scaling(spark, app):
    """interval_overlap_incidents at 1x and 10x events — replicas are
    TIME-SHIFTED (+r * span) so windows never cross replicas and the
    true pair count scales linearly (same-range replication would
    square it and measure the data, not the operator). Claim under
    test: shuffle rows/bytes and wall scale ~1x-per-row (the bucket
    explosion factor is a constant ceil(len/w)+1 per side)."""
    import pyspark.sql.functions as F

    from bo_sql_spark.queries import load_all

    reg = load_all()
    builder = reg["interval_overlap_incidents"].builder

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    bounds = ev.agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx"), F.count("*").alias("n")
    ).first()
    span_s = int((bounds["mx"] - bounds["mn"]).total_seconds()) + 3600
    n = bounds["n"]
    parts = [ev]
    for r in range(1, 10):
        parts.append(
            ev.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {r * span_s} SECONDS"))
            .withColumn("event_id", F.col("event_id") + F.lit(r * 10 * n))
        )
    big = parts[0]
    for pdf in parts[1:]:
        big = big.unionByName(pdf)
    import os
    import shutil
    import tempfile

    tdir = tempfile.mkdtemp(prefix="r9_ev10x_")
    big.write.mode("overwrite").parquet(f"{tdir}/events.parquet")
    # the builder reads <dir>/events.parquet via the catalog: stage a
    # dir with only events (the query touches nothing else)
    r1 = measure(app, "overlap@1x", lambda: builder(spark, BASE))
    r10 = measure(app, "overlap@10x", lambda: builder(spark, tdir))
    print(
        f"overlap scaling: rows {r1[2]} -> {r10[2]}"
        f" (exp {math_log_ratio(r10[2], r1[2]):.2f}),"
        f" bytes {r1[1]/1e6:.2f}MB -> {r10[1]/1e6:.2f}MB"
        f" (exp {math_log_ratio(r10[1], r1[1]):.2f}),"
        f" wall {r1[0]:.2f}s -> {r10[0]:.2f}s"
    )
    shutil.rmtree(tdir, ignore_errors=True)


def math_log_ratio(b, a):
    import math

    return math.log(max(b, 1) / max(a, 1)) / math.log(10)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaling-r9-lines")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        # disable broadcast so the rebuild join's text shuffle is
        # VISIBLE at this tiny SF (at 100 TB the kept side wouldn't
        # broadcast anyway — this measures the honest scale shape)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bo_sql_spark.operators import dedup as D

    app = rest("applications")[0]["id"]
    docs1 = spark.read.parquet(f"{BASE}/documents.parquet").select("doc_id", "text")
    docs10 = docs_10x(docs1)
    docs10.write.mode("overwrite").parquet("/tmp/r9_docs10x.parquet")
    docs10 = spark.read.parquet("/tmp/r9_docs10x.parquet")

    results = {}
    for label, docs in (("1x", docs1), ("10x", docs10)):
        for form, builder in (
            ("r8-textkeyed", lambda d=docs: lines_global_r8_textkeyed(d)),
            ("r9-hashkeyed", lambda d=docs: D.dedup_lines_global(d)),
        ):
            results[f"{form}@{label}"] = measure(
                app, f"{form}@{label}", builder
            )

    # K=8 chunks are ~45 chars — barely above the 40-byte fingerprint
    # row, so the fixture UNDERSTATES the cut. Real line/sentence-level
    # dedup units are 100-300 bytes; K=32 (~180 chars) shows that case.
    global K
    K = 32
    for form, builder in (
        (
            "r8-textkeyed-K32",
            lambda: lines_global_r8_textkeyed(docs10),
        ),
        (
            "r9-hashkeyed-K32",
            lambda: D.dedup_lines_global(docs10, chunk_tokens=32),
        ),
    ):
        results[f"{form}@10x"] = measure(app, f"{form}@10x", builder)

    for a_key, b_key, scale in (
        ("r8-textkeyed@1x", "r9-hashkeyed@1x", "1x K=8"),
        ("r8-textkeyed@10x", "r9-hashkeyed@10x", "10x K=8"),
        ("r8-textkeyed-K32@10x", "r9-hashkeyed-K32@10x", "10x K=32"),
    ):
        a, b = results[a_key], results[b_key]
        print(
            f"{scale}: shuffle bytes {a[1]/1e6:.2f}MB -> {b[1]/1e6:.2f}MB"
            f" ({b[1]/max(a[1],1):.2f}x), wall {a[0]:.2f}s -> {b[0]:.2f}s"
        )

    overlap_scaling(spark, app)


if __name__ == "__main__":
    main()
