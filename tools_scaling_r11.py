#!/usr/bin/env python3
"""Round-11 scale rows: single-scan entropy filter, precomputed-idf
ranked serving, and the train->serve LM filter.

1. corpus_filter_entropy BEFORE vs AFTER the single-scan refactor at
   the base SF — "before" recomposes the r10 shape (token_entropy and
   cross_entropy_lm each re-tokenizing the corpus), "after" is the
   shipped shared-tf fold. Expected: cold-shuffle ROWS roughly halve
   (one tokenization feeds both folds) at identical output.
2. The single-scan filter at 1x and 10x corpus (doc-id-offset
   replicas) — expected linear rows: the shared tf exchange is the
   only corpus-sized shuffle; vocab-grain gf stays constant across
   replication.
3. bm25_served: PRECOMPUTED idf (the <index>_terms table) vs the
   on-the-fly fallback (terms table deleted), same store, serve-only
   walls — the r10-verdict remedy measured. Expected: identical
   results, fewer serve-time stages (ln chain and df aggregate gone),
   lower serve wall.
4. corpus_filter_entropy_served at 1x/10x corpus — model tables are
   VOCAB grain (constant under replication), per-arrival scoring is
   one term-keyed join: rows exp ~1, bytes exp ~1.

Measurement discipline (memory/spark-measurement-traps): noop sink for
full plans, COLD-run shuffle via cumulative REST diffs, wall from the
warm repeat.

Usage: python tools_scaling_r11.py [base_sf_dir]
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
UI_PORT = 4054


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
        .appName("scaling-r11")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    from bo_sql_spark.operators.text import (
        cross_entropy_lm,
        cross_entropy_served,
        doc_term_freq,
        lm_smoothed_model,
        token_entropy,
        token_entropy_from_tf,
    )
    from bo_sql_spark.queries.pipeline import (
        _ENTROPY_REASONS_SQL,
        _entropy_filter_from_tf,
    )

    docs1 = (
        spark.read.parquet(f"{BASE}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    d_off = docs1.count() * 10
    parts = [docs1]
    for r in range(1, 10):
        parts.append(
            docs1.select((F.col("doc_id") + F.lit(r * d_off)).alias("doc_id"), "text")
        )
    m10 = parts[0]
    for p in parts[1:]:
        m10 = m10.unionByName(p)
    docs10 = m10.localCheckpoint(eager=True)

    # -- 1. before/after the single-scan refactor (base SF) ----------
    def filter_before(docs):
        # the r10 composition: each operator re-tokenizes the corpus
        ent = token_entropy(docs).select(
            "doc_id", "n_tokens", "norm_entropy_permille"
        )
        ce = cross_entropy_lm(docs).select("doc_id", "cross_entropy_micros")
        m = ce.agg(
            F.expr(
                "CAST(SUM(cross_entropy_micros) DIV COUNT(*) AS BIGINT)"
            ).alias("mean_ce")
        )
        reasons = _ENTROPY_REASONS_SQL
        return (
            ent.join(ce, "doc_id")
            .crossJoin(F.broadcast(m))
            .select(
                "doc_id",
                "n_tokens",
                "norm_entropy_permille",
                "cross_entropy_micros",
                F.expr(f"({reasons}) = ''").alias("keep"),
                F.expr(reasons).alias("drop_reasons"),
            )
            .orderBy("doc_id")
        )

    def filter_after(docs):
        return _entropy_filter_from_tf(doc_term_freq(docs))

    before1 = measure(app, "entropy_filter_before@1x", lambda: filter_before(docs1))
    after1 = measure(app, "entropy_filter_after@1x", lambda: filter_after(docs1))
    print(
        f"single-scan saving: shuffle rows {before1[2]} -> {after1[2]}"
        f" ({after1[2] / max(before1[2], 1):.2f}x),"
        f" wall {before1[0]:.2f}s -> {after1[0]:.2f}s",
        flush=True,
    )

    # -- 2. the single-scan filter at 1x/10x -------------------------
    after10 = measure(app, "entropy_filter_after@10x", lambda: filter_after(docs10))
    report("entropy_filter_single_scan", after1, after10)

    # -- 3. bm25 serving: precomputed idf vs fallback ----------------
    import tempfile

    from bo_sql_spark import fsutil
    from bo_sql_spark.operators.search import bm25_served, materialize_inverted_index

    ipath = tempfile.mkdtemp(prefix="bosql_scale_bm25_") + "/index"
    materialize_inverted_index(docs1, ipath)
    terms = ["dup", "merge", "vector"]
    pre = measure(
        app,
        "bm25_serve_precomputed_idf",
        lambda: bm25_served(spark, ipath, terms, k=20),
    )
    got_pre = bm25_served(spark, ipath, terms, k=20).collect()
    fsutil.delete(spark, ipath + "_terms")
    fb = measure(
        app,
        "bm25_serve_fallback_idf",
        lambda: bm25_served(spark, ipath, terms, k=20),
    )
    got_fb = bm25_served(spark, ipath, terms, k=20).collect()
    same = sorted(map(tuple, got_pre)) == sorted(map(tuple, got_fb))
    print(
        f"bm25 serve: precomputed {pre[0]:.2f}s vs fallback {fb[0]:.2f}s"
        f" ({pre[0] / max(fb[0], 1e-9):.2f}x), results identical: {same}",
        flush=True,
    )

    # -- 4. train->serve LM filter at 1x/10x -------------------------
    def served_filter(docs):
        tf_all = doc_term_freq(docs).localCheckpoint(eager=False)
        model_tf = tf_all.filter(F.expr("doc_id % 10 != 0"))
        arr_tf = tf_all.filter(F.expr("doc_id % 10 = 0"))
        tms, total = lm_smoothed_model(model_tf)
        tms = tms.localCheckpoint(eager=False)
        total = total.localCheckpoint(eager=False)
        mean = cross_entropy_served(model_tf, tms, total).agg(
            F.expr(
                "CAST(SUM(cross_entropy_micros) DIV COUNT(*) AS BIGINT)"
            ).alias("mean_ce")
        )
        ent = token_entropy_from_tf(arr_tf).select(
            "doc_id", "n_tokens", "norm_entropy_permille"
        )
        ce = cross_entropy_served(arr_tf, tms, total).select(
            "doc_id", "cross_entropy_micros"
        )
        reasons = _ENTROPY_REASONS_SQL
        return (
            ent.join(ce, "doc_id")
            .crossJoin(F.broadcast(mean))
            .select(
                "doc_id",
                "n_tokens",
                "norm_entropy_permille",
                "cross_entropy_micros",
                F.expr(f"({reasons}) = ''").alias("keep"),
                F.expr(reasons).alias("drop_reasons"),
            )
        )

    sv1 = measure(app, "lm_served_filter@1x", lambda: served_filter(docs1))
    sv10 = measure(app, "lm_served_filter@10x", lambda: served_filter(docs10))
    report("lm_served_filter", sv1, sv10)

    spark.stop()


if __name__ == "__main__":
    main()
