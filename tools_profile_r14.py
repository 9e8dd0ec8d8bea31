"""Round-14-opt profiler: isolate named registry queries with the noop
sink (guide §1.4) and report warm per-rep times + the formatted plan.

Usage:
  python tools_profile_r14.py NAME [NAME...] [--sf DIR] [--reps N]
      [--plan-out plans/r14] [--suffix before|after] [--collect]

Times the COMPUTATION via df.write.format("noop") by default (so the
sink, not driver serialization, is measured); --collect instead times
len(df.collect()) to mirror bench.py's action for small-output queries.
Writes <plan-out>/<name>_<suffix>.txt with explain("formatted") when
--plan-out is given. Jobs are labelled for the UI (guide §1.5).
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
PLAN_OUT = _opt("--plan-out")
SUFFIX = _opt("--suffix", "before")
COLLECT = "--collect" in args
if COLLECT:
    args.remove("--collect")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
names = args

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
q = e.queries()

for name in names:
    if name not in q:
        print(f"UNKNOWN {name}")
        continue
    df = q[name](spark, SF)
    if PLAN_OUT:
        os.makedirs(PLAN_OUT, exist_ok=True)
        with open(os.path.join(PLAN_OUT, f"{name}_{SUFFIX}.txt"), "w") as fh:
            # PythonSQLUtils path: QueryExecution.explainString(String)
            # has no py4j-visible overload on Spark 4.1
            fh.write(
                spark._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )

    def run():
        d = q[name](spark, SF)
        if COLLECT:
            return len(d.collect())
        d.write.format("noop").mode("overwrite").save()
        return 0

    spark.sparkContext.setJobDescription(f"profile:{name} warm")
    run()
    reps = []
    for r in range(REPS):
        spark.sparkContext.setJobDescription(f"profile:{name} rep{r}")
        t0 = time.perf_counter()
        run()
        reps.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(
        f"{name}: min={min(reps):.3f} median={statistics.median(reps):.3f} "
        f"max={max(reps):.3f} reps={[round(x, 3) for x in reps]}",
        flush=True,
    )
spark.stop()
