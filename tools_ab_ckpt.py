"""Interleaved A/B of the multi-consumer lineage cuts (r14-opt wave 2):
BOSQL_CKPT_DISABLE=1 (base: re-execute the subtree per consumer) vs the
shipped lineage_cut form. Noop sink, warm, median of N interleaved reps.

Usage: python tools_ab_ckpt.py [--sf DIR] [--reps N] [--queries a,b]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

args = sys.argv[1:]


def _opt(flag, default=None):
    if flag in args:
        i = args.index(flag)
        v = args[i + 1]
        del args[i : i + 2]
        return v
    return default


SF = _opt("--sf", "/root/testdata/sf0.1")
REPS = int(_opt("--reps", "3"))
ONLY = _opt("--queries")

import __spark_entry__ as e  # noqa: E402

from bo_sql_spark.session import get_session  # noqa: E402

spark = get_session(app_name="ab-ckpt")
spark.sparkContext.setLogLevel("ERROR")
q = e.queries()

TARGETS = [
    "dedup_minhash_survivors_portable",
    "dedup_simhash_portable",
    "multimodal_image_neardup_pairs",
    "similarity_ann_lsh_portable",
]
if ONLY:
    TARGETS = ONLY.split(",")


def timed(name, variant):
    os.environ["BOSQL_CKPT_DISABLE"] = "1" if variant == "base" else "0"
    spark.sparkContext.setJobDescription(f"{name}:{variant}")
    t0 = time.perf_counter()
    q[name](spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for name in TARGETS:
    timed(name, "base")
    timed(name, "ckpt")
    reps = {"base": [], "ckpt": []}
    for _ in range(REPS):
        reps["base"].append(timed(name, "base"))
        reps["ckpt"].append(timed(name, "ckpt"))
    b = statistics.median(reps["base"])
    c = statistics.median(reps["ckpt"])
    print(f"{name}: base={b:.3f}s ckpt={c:.3f}s ratio={c / b:.2f}", flush=True)

os.environ["BOSQL_CKPT_DISABLE"] = "0"
spark.stop()
