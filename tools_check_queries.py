"""Targeted oracle check: run NAMED queries() entries vs their oracles.

Usage: python tools_check_queries.py q1 q2 ... [--sf /root/testdata/sf0.01]

The round-14-opt surgical twin of tools_rehearsal.py: after touching one
operator, re-grade just its dependent queries at both small SFs instead
of paying the full 293-query rehearsal per iteration (the closing
rehearsal still runs before commit).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e
from bo_sql_spark.catalog import TABLES
from bo_sql_spark.testing import compare_results

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if "--sf" in args:
    i = args.index("--sf")
    SF = args[i + 1]
    args = args[:i] + args[i + 2 :]
names = args

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
q, o = e.queries(), e.oracle_sql()
unknown = [n for n in names if n not in q]
if unknown:
    print("UNKNOWN:", unknown)
    sys.exit(2)
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

fails = []
for name in names:
    t0 = time.time()
    try:
        s = q[name](spark, SF).toPandas()
        if name in o:
            d = con.execute(o[name]).df()
            ok, msg = compare_results(s, d)
        else:
            ok, msg = len(s) >= 0, "rows-only"
        dt = time.time() - t0
        status = "MATCH" if ok else "MISMATCH"
        print(
            f"{dt:6.1f}s {name}: {status} rows={len(s)}"
            + ("" if ok else " :: " + msg[:300]),
            flush=True,
        )
        if not ok:
            fails.append(name)
    except Exception as ex:
        print(f"  ERR  {name}: {str(ex)[:300]}", flush=True)
        fails.append(name)
print("FAILS:", fails or "none")
spark.stop()
sys.exit(1 if fails else 0)
