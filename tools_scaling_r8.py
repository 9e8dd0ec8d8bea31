"""Empirical scale-up checks for the round-7/8 operators that the
SCALE.md ledger didn't yet cover with measured 1x/10x evidence.

1. k-NN graph + graph clustering (similarity_knn_graph /
   similarity_knn_clusters): 10x vectors with the CELL COUNT scaled
   10x too — the documented lever ("cluster count is the published
   lever: scale cells with the corpus and |cell| stays bounded").
   Claim under test: with |cell| held constant the pair space, wall,
   and shuffle bytes scale ~linearly (exponent ~1), not quadratically.

2. OPQ/ADC serving (similarity_opq_adc shape): rotation + encode +
   ADC are linear scans with broadcast codebooks — wall and shuffle
   should both be ~1x-per-row at 10x vectors (codes shuffle only for
   the per-sub groupBy in training steps).

3. Winnowed span fingerprints (round-8 pure-map rewrite): corpus text
   must appear in ZERO shuffles now — total shuffle bytes should be
   fingerprint rows only (~2/(w+1) density), compared against the r7
   WindowExec form's corpus-sized repartition. Wall at 1x and 10x.

4. Streaming SemDeDup ingest cost attribution (VERDICT r7 #8): same
   corpus drained as B = 1/2/4/8 microbatches (monotone id ranges).
   wall(B) separates per-batch fixed cost (localCheckpoint + store
   read-back + planning) from per-row work; prints the fitted
   per-batch overhead so the bench entry's 603 rows/s has an owner.

Measurement discipline (memory: spark-measurement-traps): full plans
via the noop sink (count() prunes), shuffle bytes from the COLD run
(warm repeats reuse shuffle stages), wall from the warm repeat.

Usage: python tools_scaling_r8.py [base_sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
UI_PORT = 4048


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.loads(r.read())


def app_id():
    return rest("applications")[0]["id"]


def shuffle_bytes_since(app, t0_ms):
    total_b = total_r = 0
    for st in rest(f"applications/{app}/stages?status=complete"):
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if sub is None:
            continue
        ts = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")) * 1000
        if ts >= t0_ms - 500:
            total_b += st["shuffleWriteBytes"]
            total_r += st["shuffleWriteRecords"]
    return total_b, total_r


def run_full(df):
    df.write.format("noop").mode("overwrite").save()


def measure(spark, app, label, df_builder):
    t0_ms = time.time() * 1000
    run_full(df_builder())
    time.sleep(1.5)
    sb, srec = shuffle_bytes_since(app, t0_ms)
    t0 = time.time()
    run_full(df_builder())
    wall = time.time() - t0
    print(
        f"{label}: warm-wall={wall:.2f}s cold-shuffle={sb/1e6:.1f}MB "
        f"({srec} rows)",
        flush=True,
    )
    return wall, sb


def emb_10x(spark, emb):
    """10x vectors: remapped ids, deterministically perturbed values so
    replicas are not bit-equal (keeps near-dup structure from exploding
    the planted-pairs count)."""
    parts = [emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))]

    # structurally different per-replica sign/scale pattern (the
    # pattern depends on i*(r+2), not just amplitude): replicas of
    # the same base vector are NOT mutual near-dups, so the 0.95
    # edge density stays ~constant per corpus and the 10x row
    # measures scale, not a planted dup explosion
    def pert(r):
        # multiplier r+3 in 4..12 is distinct and nonzero mod 13, so no
        # two replicas share a pattern (r+2 mod 5 collided: r=1 vs r=6
        # produced bit-identical vectors and a 50x edge blow-up)
        return lambda x, i: x * (
            F.lit(1.0) + F.lit(0.1) * (((i * (r + 3)) % 13) - 6)
        )

    for r in range(1, 10):
        parts.append(
            emb.select(
                (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
                F.transform(
                    F.col("embedding").cast("array<double>"), pert(r)
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def knn_scaling(spark, app):
    from bo_sql_spark.operators import similarity as S
    from bo_sql_spark.operators.dedup import connected_components

    emb1 = spark.read.parquet(os.path.join(BASE, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).localCheckpoint(eager=True)
    emb10 = emb_10x(spark, emb1).localCheckpoint(eager=True)
    n1, n10 = emb1.count(), emb10.count()
    print(f"vectors: 1x={n1} 10x={n10}")

    def cents(emb, n_cells):
        # 10x corpus -> 10x cells: |cell| constant (the published lever)
        return emb.orderBy("vec_id").limit(n_cells).select(
            F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
        ).localCheckpoint(eager=True)

    c1, c10 = cents(emb1, 16), cents(emb10, 160)

    res = {}
    for scale, emb, cc in (("1x", emb1, c1), ("10x", emb10, c10)):
        res[f"graph {scale}"] = measure(
            spark, app, f"knn_graph {scale}",
            lambda e=emb, c=cc: S.knn_graph(e, c, k=5),
        )
        def clusters(e=emb, c=cc):
            g = S.knn_graph(e, c, k=5)
            edges = g.filter(F.col("cos_sim") >= 0.95).select(
                F.col("vec_id").alias("id_a"), F.col("neighbor_id").alias("id_b")
            )
            canon = connected_components(edges)
            return (
                e.select("vec_id")
                .join(canon, e.vec_id == canon.node, "left")
                .select(
                    "vec_id",
                    F.coalesce(F.col("cluster_id"), F.col("vec_id")).alias("cluster_id"),
                )
            )
        res[f"clusters {scale}"] = measure(
            spark, app, f"knn_clusters {scale}", clusters
        )
    for fam in ("graph", "clusters"):
        (w1, s1), (w10, s10) = res[f"{fam} 1x"], res[f"{fam} 10x"]
        print(
            f"SUMMARY knn_{fam}: wall 1x {w1:.2f}s -> 10x {w10:.2f}s "
            f"(exp {math.log(max(w10, 1e-9) / w1, 10):.2f}); shuffle "
            f"{s1/1e6:.1f}MB -> {s10/1e6:.1f}MB "
            f"(exp {math.log(max(s10, 1) / max(s1, 1), 10):.2f}) "
            f"[cells 16 -> 160, |cell| constant]"
        )
    return emb1, emb10


def opq_scaling(spark, app, emb1, emb10):
    from bo_sql_spark.operators import similarity as S

    rotM = S.seeded_rotation_micro()

    def opq(emb):
        rot = S.rotate_embeddings(emb, rotM)
        m, dsub, ks = 8, 8, 256
        cb0 = S.pq_codebooks_from_seeds(rot, m=m, dsub=dsub, ks=ks)
        cb1 = S.pq_train_step(rot, cb0, m=m, dsub=dsub).select(
            "sub", "code", "c_vec"
        )
        codes = S.pq_encode(rot, cb1, m=m, dsub=dsub)
        qrow = rot.filter(F.col("vec_id") == 0).select("embedding").first()
        qvec = [float(x) for x in qrow["embedding"]]
        return S.pq_adc_topk(codes, cb1, qvec, m=m, dsub=dsub, k=10)

    w1, s1 = measure(spark, app, "opq_adc 1x", lambda: opq(emb1))
    w10, s10 = measure(spark, app, "opq_adc 10x", lambda: opq(emb10))
    print(
        f"SUMMARY opq_adc: wall 1x {w1:.2f}s -> 10x {w10:.2f}s "
        f"(exp {math.log(max(w10, 1e-9) / w1, 10):.2f}); shuffle "
        f"{s1/1e6:.1f}MB -> {s10/1e6:.1f}MB "
        f"(exp {math.log(max(s10, 1) / max(s1, 1), 10):.2f})"
    )


def winnow_scaling(spark, app):
    from bo_sql_spark.operators.dedup import duplicate_span_stats_winnowed

    docs1 = spark.read.parquet(os.path.join(BASE, "documents.parquet")).select(
        "doc_id", "text"
    ).localCheckpoint(eager=True)
    parts = [docs1]
    for r in range(1, 10):
        parts.append(
            docs1.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1r{r}").alias("text"),
            )
        )
    docs10 = parts[0]
    for p in parts[1:]:
        docs10 = docs10.unionAll(p)
    docs10 = docs10.localCheckpoint(eager=True)
    corpus_b = docs1.select(
        F.sum(F.length(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))))
    ).collect()[0][0]
    print(f"corpus bytes 1x: {corpus_b/1e6:.1f}MB")
    w1, s1 = measure(
        spark, app, "winnow-map 1x",
        lambda: duplicate_span_stats_winnowed(docs1, winnow_w=16),
    )
    w10, s10 = measure(
        spark, app, "winnow-map 10x",
        lambda: duplicate_span_stats_winnowed(docs10, winnow_w=16),
    )
    print(
        f"SUMMARY winnow-map: shuffle {s1/corpus_b:.2f}x corpus at 1x "
        f"(fingerprint rows only — r7 WindowExec form was ~1.2x corpus "
        f"via the doc repartition); wall 1x {w1:.2f}s -> 10x {w10:.2f}s "
        f"(exp {math.log(max(w10, 1e-9) / w1, 10):.2f}), shuffle exp "
        f"{math.log(max(s10, 1) / max(s1, 1), 10):.2f}"
    )


def stream_ingest_batches(spark):
    """Same corpus, drained as B monotone-id microbatches. wall(B) is
    ~ fixed*B + work: the slope attributes the per-batch overhead."""
    from bo_sql_spark.operators import dedup as D

    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).localCheckpoint(eager=True)
    n = emb.count()
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    ).localCheckpoint(eager=True)
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    results = {}
    for B in (1, 2, 4, 8):
        root = tempfile.mkdtemp(prefix="bosql_r8_stream_")
        store, surv = os.path.join(root, "store"), os.path.join(root, "surv")
        bounds = [ids[(len(ids) * k) // B] for k in range(B)] + [ids[-1] + 1]
        t0 = time.time()
        for k in range(B):
            batch = emb.filter(
                (F.col("vec_id") >= bounds[k]) & (F.col("vec_id") < bounds[k + 1])
            )
            D.semantic_dedup_stream_ingest(
                spark, batch, cents, store, surv, threshold=0.95, batch_id=k
            )
        wall = time.time() - t0
        survivors = spark.read.parquet(surv).count()
        results[B] = wall
        print(
            f"stream-ingest B={B}: wall={wall:.2f}s "
            f"({n/wall:.0f} rows/s), survivors={survivors}",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    bs = sorted(results)
    # least-squares slope of wall vs B = per-batch fixed cost
    mb = sum(bs) / len(bs)
    mw = sum(results[b] for b in bs) / len(bs)
    slope = sum((b - mb) * (results[b] - mw) for b in bs) / sum(
        (b - mb) ** 2 for b in bs
    )
    print(
        f"SUMMARY stream-ingest: per-batch fixed cost ~{slope:.2f}s "
        f"(fit over B={bs}); per-row work ~{results[1]:.2f}s for {n} "
        f"rows single-batch => microbatch overhead dominates at small "
        f"batches; batch coarser or cache the store read at 100 TB"
    )


def new_ops_scaling(spark, app):
    """1x/10x rows for the round-8 additions: C4 line dedup (shuffle
    ~2x corpus by design), Count-Min grid (shuffle BOUNDED by d*w per
    task — near-constant rows at any corpus size), snapshot diff
    (id-join, linear)."""
    from bo_sql_spark.functions import tokens
    from bo_sql_spark.operators import heavy_hitters as HH
    from bo_sql_spark.operators.dedup import dedup_lines_global

    docs1 = spark.read.parquet(os.path.join(BASE, "documents.parquet")).select(
        "doc_id", "text"
    ).localCheckpoint(eager=True)
    parts = [docs1]
    for r in range(1, 10):
        parts.append(
            docs1.select(
                (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1r{r}").alias("text"),
            )
        )
    docs10 = parts[0]
    for p in parts[1:]:
        docs10 = docs10.unionAll(p)
    docs10 = docs10.localCheckpoint(eager=True)

    def lines(d):
        return lambda: dedup_lines_global(d, chunk_tokens=8)

    def cm(d):
        return lambda: HH.count_min_table(
            d.filter(F.col("text").isNotNull()).select(
                F.explode(tokens(F.col("text"))).alias("k")
            ),
            "k",
            depth=4,
            width=256,
        )

    def diff(d):
        old = d.filter(F.col("doc_id") % 10 != 0).select(
            "doc_id", F.md5("text").alias("h")
        )
        new = d.filter(F.col("doc_id") % 7 != 0).select(
            "doc_id", F.md5("text").alias("h")
        )
        o, n = old.alias("o"), new.alias("n")
        j = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
        st = (
            F.when(F.col("o.doc_id").isNull(), "added")
            .when(F.col("n.doc_id").isNull(), "removed")
            .when(F.col("o.h") != F.col("n.h"), "changed")
            .otherwise("unchanged")
        )
        return lambda: j.select(
            F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
            st.alias("status"),
        ).groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))

    for label, f1, f10 in (
        ("lines_global", lines(docs1), lines(docs10)),
        ("count_min_grid", cm(docs1), cm(docs10)),
        ("snapshot_diff", diff(docs1), diff(docs10)),
    ):
        w1, s1 = measure(spark, app, f"{label} 1x", f1)
        w10, s10 = measure(spark, app, f"{label} 10x", f10)
        print(
            f"SUMMARY {label}: wall 1x {w1:.2f}s -> 10x {w10:.2f}s "
            f"(exp {math.log(max(w10, 1e-9) / w1, 10):.2f}); shuffle "
            f"{s1/1e6:.2f}MB -> {s10/1e6:.2f}MB "
            f"(exp {math.log(max(s10, 1) / max(s1, 1), 10):.2f})"
        )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        # local mode hosts every executor thread in the one JVM: the
        # default 1g heap OOMs on the 10x fan-outs; the box has 128G
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = app_id()
    emb1, emb10 = knn_scaling(spark, app)
    opq_scaling(spark, app, emb1, emb10)
    winnow_scaling(spark, app)
    stream_ingest_batches(spark)


if __name__ == "__main__":
    main()
