"""1x/10x scale check for the portable HLL: shuffle is O(m), not O(rows).

The sketch's scale claim: the register build is one map-combinable
groupBy on (bucket), so each task's partial output is <= m rows no
matter how many input rows it scanned — total shuffle rows are bounded
by m * tasks and DON'T grow with the corpus. 10x lineitem rows with
10x distinct keys (offset-remapped orderkeys) should show ~constant
shuffle bytes and ~linear-at-worst wall, while the estimate itself
tracks the 10x distinct count.

Reuses tools_scaling_r8's REST measurement discipline (cold shuffle,
warm wall, noop sink). Usage: python tools_scaling_hll.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

import tools_scaling_r8 as R8


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.port", str(R8.UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = R8.app_id()

    from bo_sql_spark.operators import heavy_hitters as HH

    li1 = (
        spark.read.parquet(f"{R8.BASE}/lineitem.parquet")
        .select("l_orderkey")
        .localCheckpoint(eager=True)
    )
    parts = [li1]
    for r in range(1, 10):
        parts.append(
            li1.select((F.col("l_orderkey") + r * 100_000_000).alias("l_orderkey"))
        )
    li10 = parts[0]
    for p in parts[1:]:
        li10 = li10.unionAll(p)
    li10 = li10.localCheckpoint(eager=True)

    def hll(d):
        return lambda: HH.hll_distinct(d, "l_orderkey", p=9)

    w1, s1 = R8.measure(spark, app, "hll_distinct 1x", hll(li1))
    w10, s10 = R8.measure(spark, app, "hll_distinct 10x", hll(li10))
    import math

    e1 = HH.hll_distinct(li1, "l_orderkey", p=9).collect()[0]["hll_estimate"]
    e10 = HH.hll_distinct(li10, "l_orderkey", p=9).collect()[0]["hll_estimate"]
    print(
        f"SUMMARY hll_distinct: wall 1x {w1:.2f}s -> 10x {w10:.2f}s "
        f"(exp {math.log(max(w10, 1e-9) / w1, 10):.2f}); shuffle "
        f"{s1/1e3:.1f}KB -> {s10/1e3:.1f}KB "
        f"(exp {math.log(max(s10, 1) / max(s1, 1), 10):.2f}); "
        f"estimate {e1} -> {e10} (true NDV x10)"
    )


if __name__ == "__main__":
    main()
