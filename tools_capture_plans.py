"""Capture explain('formatted') before/after plans for the round-14-opt
touched queries into plans/r14/.

'before' reproduces the pre-optimization plan via the measurement kill
switches (BOSQL_SPREAD_DISABLE / BOSQL_CKPT_DISABLE) plus impl='wide'
for the centroid fold; 'after' is the shipped default. Streaming
queries are excluded (building their DataFrame executes the stream);
their serve-side folds are covered by the batch twins captured here.

Note: multimodal_image_neardup_pairs' true pre-round plan additionally
carried a hard-coded .repartition(32) at the query site (removed this
round in favor of the operator-level spread); its 'before' here shows
the un-spread form.

Usage: python tools_capture_plans.py [--sf DIR]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

args = sys.argv[1:]
SF = "/root/testdata/sf0.1"
if "--sf" in args:
    SF = args[args.index("--sf") + 1]

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r14")
os.makedirs(OUT, exist_ok=True)

import __spark_entry__ as e  # noqa: E402

from bo_sql_spark.session import get_session  # noqa: E402

spark = get_session(app_name="capture-plans")
spark.sparkContext.setLogLevel("ERROR")
q = e.queries()

NAMES = [
    "dedup_duplicate_spans_winnowed",
    "dedup_minhash_survivors_portable",
    "dedup_simhash_portable",
    "multimodal_image_neardup_pairs",
    "similarity_ann_lsh_portable",
    "similarity_approx_join_portable",
    "drift_embedding_centroid",
    "sketch_quantile_sampled",
    "sketch_hll_distinct",
    "sketch_count_min_grid",
    "text_heavy_hitters",
    "sketch_kmv_overlap",
    "text_token_entropy",
    "text_cross_entropy_lm",
    "corpus_filter_entropy",
    "dedup_semantic",
    "dedup_survivors",
    "dedup_lines_global",
    "text_bm25_topdocs",
    "search_hybrid_rrf",
    "text_gopher_filter",
    "text_repetition_signals",
    "decontaminate_bloom_survivors",
    "text_bpe_train",
]


def plan_text(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


for name in NAMES:
    for suffix, spread, ckpt in (("before", "1", "1"), ("after", "0", "0")):
        os.environ["BOSQL_SPREAD_DISABLE"] = spread
        os.environ["BOSQL_CKPT_DISABLE"] = ckpt
        try:
            if name == "drift_embedding_centroid" and suffix == "before":
                # the pre-round form is the wide-column fold
                import pyspark.sql.functions as F

                from bo_sql_spark.catalog import load_tables
                from bo_sql_spark.operators.drift import embedding_centroid_drift

                t = load_tables(spark, SF)
                df = embedding_centroid_drift(
                    t["embeddings"], "label", dims=64, impl="wide"
                ).select(
                    F.col("label").cast("long").alias("label"),
                    "n_vectors",
                    "cos_to_global",
                )
            else:
                df = q[name](spark, SF)
            with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan_text(df))
            print(f"{name}_{suffix}: ok", flush=True)
        except Exception as ex:  # noqa: BLE001 — keep capturing the rest
            print(f"{name}_{suffix}: ERR {str(ex)[:120]}", flush=True)

os.environ["BOSQL_SPREAD_DISABLE"] = "0"
os.environ["BOSQL_CKPT_DISABLE"] = "0"
spark.stop()
