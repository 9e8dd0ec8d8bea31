"""Runtime Bloom-filter join pruning, demonstrated and measured.

ROADMAP round-9 candidate #2. Spark's runtime row-level filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, SPARK-32268)
injects a Bloom filter built from the SELECTIVE side of a shuffle
join into the scan of the large side: large-side rows whose join key
cannot match are dropped BEFORE the shuffle, so the shuffle shrinks
by roughly the join selectivity. This matters exactly where broadcast
is off the table — both sides too big to broadcast, the classic
100 TB fact-to-filtered-fact join.

Demo query (TPC-H-shaped): lineitem joined to URGENT orders from one
quarter (the fixtures span 1995-2001, ~0.8% selectivity), so ~99% of
lineitem's shuffle is wasted without the runtime filter. Broadcast is disabled
to model the both-sides-big regime; the application-side scan-size
threshold is lowered (default 10GB) because sf0.1 lineitem is ~70MB —
on a real cluster the default fires by itself.

Measured (cold-run REST stage metrics, memory: count() prunes plans
=> noop sink; warm runs reuse shuffles => shuffle from cold run):

- plan WITH the filter contains `might_contain` (the
  BloomFilterMightContain runtime predicate) on the lineitem scan;
  plan without does not (asserted)
- lineitem-side shuffle records/bytes with vs without
- result parity: identical agg over both runs (asserted)

Usage: python tools_bloom_join.py  (~1 min; prints the table)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
UI_PORT = 4049


def rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}"
    ) as r:
        return json.loads(r.read())


def shuffle_since(app, t0_ms):
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


def build(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    sel = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-04-01"))
    )
    return (
        li.join(sel, li.l_orderkey == sel.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "rev"
            ),
        )
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]

    results = {}
    for enabled in (False, True):
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            str(enabled).lower(),
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1MB",
        )
        df = build(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        has_bloom = "might_contain" in plan
        assert has_bloom == enabled, (
            f"bloom={enabled} but might_contain in plan: {has_bloom}"
        )
        t0_ms = time.time() * 1000
        rows = {
            r["o_orderpriority"]: (r["n"], str(r["rev"]))
            for r in df.collect()
        }
        time.sleep(1.5)
        sb, srec = shuffle_since(app, t0_ms)
        t0 = time.time()
        df2 = build(spark)
        df2.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        results[enabled] = (sb, srec, wall, rows)
        print(
            f"bloomFilter={'on ' if enabled else 'off'}: "
            f"cold-shuffle={sb/1e6:.2f}MB ({srec} rows) "
            f"warm-wall={wall:.2f}s might_contain={has_bloom}",
            flush=True,
        )

    assert results[False][3], "empty join result — demo filter matches nothing"
    assert results[False][3] == results[True][3], "result mismatch"
    off, on = results[False], results[True]
    print()
    print(
        f"shuffle reduction: {off[1]} -> {on[1]} records "
        f"({on[1]/off[1]:.1%}), {off[0]/1e6:.2f} -> {on[0]/1e6:.2f} MB "
        f"({on[0]/off[0]:.1%}); identical results"
    )


if __name__ == "__main__":
    main()
