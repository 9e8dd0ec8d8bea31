"""Portable fixed-point ln (functions/fixedpoint.py): accuracy vs
math.log and bit-exact Spark / DuckDB / Python agreement over the
whole positive-BIGINT domain."""

import math

import duckdb
import pytest

import pyspark.sql.functions as F

from bo_sql_spark.functions.fixedpoint import (
    duckdb_ln_select,
    ln_micros_py,
    ln_micros_steps,
    with_ln_micros,
)

_MAXL = 9_223_372_036_854_775_807
# exhaustive small range + every power-of-2 boundary + decades + oddballs
PROBES = sorted(
    set(range(1, 3000))
    | {10**k for k in range(3, 19)}
    | {2**k for k in range(10, 63)}
    | {2**k - 1 for k in range(10, 63)}
    | {2**k + 1 for k in range(10, 62)}
    | {_MAXL, 123_456_789, 987_654_321_012_345, 5_000_000_029}
)


def test_ln_micros_py_accuracy_vs_libm():
    """The documented ulp bound: <= 1 micro from math.log everywhere
    (measured worst 0.59 micros over these probes)."""
    worst = max(abs(ln_micros_py(v) / 1e6 - math.log(v)) for v in PROBES)
    assert worst <= 1e-6, worst


def test_ln_micros_py_edges():
    assert ln_micros_py(1) == 0
    assert ln_micros_py(2) == 693_147  # round(ln 2 * 1e6)
    with pytest.raises(ValueError):
        ln_micros_py(0)
    with pytest.raises(ValueError):
        ln_micros_py(-5)


def test_ln_micros_spark_matches_py(spark):
    df = spark.createDataFrame([(v,) for v in PROBES], "x long")
    rows = with_ln_micros(df, "x", "lnx").collect()
    assert len(rows) == len(PROBES)
    for r in rows:
        assert r["lnx"] == ln_micros_py(r["x"]), r["x"]


def test_ln_micros_duckdb_matches_py():
    con = duckdb.connect()
    vals = ",".join(f"(CAST({v} AS BIGINT))" for v in PROBES)
    sql = duckdb_ln_select(f"SELECT * FROM (VALUES {vals}) v(x)", "x", "lnx")
    for x, lnx in con.execute(sql).fetchall():
        assert lnx == ln_micros_py(x), x
    con.close()


def test_ln_micros_steps_rejects_unknown_dialect():
    with pytest.raises(ValueError):
        ln_micros_steps("x", "lnx", "postgres")


def test_with_ln_micros_drops_temp_columns(spark):
    df = spark.createDataFrame([(7, "a")], "x long, tag string")
    out = with_ln_micros(df, "x", "lnx")
    assert set(out.columns) == {"x", "tag", "lnx"}
