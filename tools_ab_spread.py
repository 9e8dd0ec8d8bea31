"""A/B the spread_scan parallelism fix on heavy-map operators (r14-opt).

Interleaved base/spread reps in ONE session (the host's weather band is
wide — see plans/r14 baseline runs — so only interleaved comparisons
count): "base" disables spread_scan via BOSQL_SPREAD_DISABLE (the old
single-task plans), "spread" is the shipped code. Noop sink per guide
§1.4; also asserts both variants return IDENTICAL rows at sf0.01 so the
fix is provably result-neutral before the full rehearsal.

Usage: python tools_ab_spread.py [--sf DIR] [--reps N] [--queries a,b]
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

spark = get_session(app_name="ab-spread")
spark.sparkContext.setLogLevel("ERROR")
q = e.queries()

TARGETS = [
    "dedup_duplicate_spans_winnowed",
    "dedup_minhash_survivors_portable",
    "dedup_simhash_portable",
    "drift_embedding_centroid",
    "dedup_semantic",
    "multimodal_image_neardup_pairs",
    "similarity_ann_lsh_portable",
    "dedup_survivors",
    "dedup_lines_global",
]
if ONLY:
    TARGETS = ONLY.split(",")


def timed(name, variant):
    os.environ["BOSQL_SPREAD_DISABLE"] = "1" if variant == "base" else "0"
    spark.sparkContext.setJobDescription(f"{name}:{variant}")
    t0 = time.perf_counter()
    q[name](spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for name in TARGETS:
    # warm both variants once, then interleave timed reps
    timed(name, "base")
    timed(name, "spread")
    reps = {"base": [], "spread": []}
    for _ in range(REPS):
        reps["base"].append(timed(name, "base"))
        reps["spread"].append(timed(name, "spread"))
    b = statistics.median(reps["base"])
    s = statistics.median(reps["spread"])
    print(f"{name}: base={b:.3f}s spread={s:.3f}s ratio={s / b:.2f}", flush=True)

os.environ["BOSQL_SPREAD_DISABLE"] = "0"
spark.stop()
