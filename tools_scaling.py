"""Empirical scale-up check for the two heaviest pipeline operators.

Builds a 10x documents corpus (50k docs) whose duplicate-rate profile
is IDENTICAL to sf0.1's: ten replicas of the 5k-doc fixture with a
replica suffix appended to every word, so each replica's vocabulary is
disjoint (no cross-replica shingle overlap — near-dup structure per
replica is isomorphic to the original) while within-replica structure
is untouched. Runs, at 1x and 10x:

  1. the unbounded dedup chain the registered dedup_survivors query is
     a (doc_id < 150)-bounded twin of: MinHash+LSH near-dup pairs ->
     connected components -> one survivor per cluster;
  2. training_pipeline_e2e exactly as registered (its input is the
     whole documents table).

Reports wall times, the scaling exponent log10(t10/t1) (1.0 = linear),
and asserts no SortMergeJoin / CartesianProduct appears at 10x that
was absent at 1x. Feeds the "Scale-up evidence" table in SCALE.md.

Usage: python tools_scaling.py [base_sf_dir]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPLICAS = 10


def build_fixtures() -> tuple[str, str]:
    t = pq.read_table(os.path.join(BASE, "documents.parquet"))
    n = t.num_rows
    root = tempfile.mkdtemp(prefix="bosql_scaling_")
    one = os.path.join(root, "x1")
    ten = os.path.join(root, "x10")
    os.makedirs(one)
    os.makedirs(ten)
    shutil.copy(os.path.join(BASE, "documents.parquet"), one)

    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    out = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    for r in range(REPLICAS):
        suf = "" if r == 0 else f"r{r}"
        for i in range(n):
            txt = texts[i]
            if suf and txt:
                txt = " ".join(w + suf for w in txt.split(" "))
            out["doc_id"].append(doc_ids[i] + r * n)
            out["text"].append(txt)
            out["lang"].append(langs[i])
            out["source"].append(sources[i])
            out["n_chars"].append(len(txt) if txt is not None else 0)
    big = pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
        }
    )
    pq.write_table(big, os.path.join(ten, "documents.parquet"))
    return one, ten


def dedup_chain(spark, sf_dir):
    from bo_sql_spark.catalog import load_tables
    from bo_sql_spark.operators import dedup as D

    docs = load_tables(spark, sf_dir)["documents"]
    pairs = D.minhash_dedup_pairs(docs).select("id_a", "id_b")
    canon = D.connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(canon, docs.doc_id == canon.node, "left")
        .filter(F.col("node").isNull() | (F.col("cluster_id") == F.col("doc_id")))
        .select("doc_id")
    )


def plan_nodes(df) -> set[str]:
    from bo_sql_spark.plans import explain_str

    text = explain_str(df, "simple")
    return {op for op in ("SortMergeJoin", "CartesianProduct") if op in text}


def main():
    from bo_sql_spark.queries import load_all
    from bo_sql_spark.session import get_session

    spark = get_session()
    REG = load_all()
    one, ten = build_fixtures()
    print(f"fixtures: 1x={one} 10x={ten}")

    jobs = {
        "dedup_chain(minhash->cc->survivors)": dedup_chain,
        "training_pipeline_e2e": lambda s, d: REG["training_pipeline_e2e"].builder(s, d),
    }
    for name, fn in jobs.items():
        results = {}
        for label, d in (("1x", one), ("10x", ten)):
            # dedup_chain runs a driver convergence loop (materializes per
            # round), so "build then time collect" would hide most of the
            # work — time the whole build+collect instead, best of 2.
            best = None
            for _ in range(2):
                t0 = time.time()
                df = fn(spark, d)
                rows = df.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            bad = plan_nodes(fn(spark, d))
            results[label] = (best, rows, bad)
            print(f"  {name} @ {label}: {best:.2f}s rows={rows} bad_nodes={bad or 'none'}")
        t1, t10 = results["1x"][0], results["10x"][0]
        exp = math.log10(t10 / t1)
        new_bad = results["10x"][2] - results["1x"][2]
        print(
            f"{name}: {t1:.2f}s -> {t10:.2f}s at 10x "
            f"(exponent {exp:.2f}, linear=1.0); new bad plan nodes at 10x: "
            f"{new_bad or 'none'}"
        )
        assert not new_bad, f"scale-up introduced {new_bad}"


if __name__ == "__main__":
    main()
