"""Local oracle-parity harness mirroring the driver's correctness gate.

Runs a QuerySpec's Spark builder AND its DuckDB oracle SQL on the same
parquet tables, normalizes both results, and compares EXACTLY (values,
row multiset, column names). Exact float equality is intentional: the
driver hash-compares values, so "close" is not good enough — queries
must round any order-dependent float aggregation identically on both
sides (see bo_sql_spark.queries docstring).
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from bo_sql_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the same tables registered as views."""
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v: Any) -> str:
    """Canonical string for one cell (drives row sorting + equality)."""
    if v is None or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 == 3 regardless of engine int/float typing
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "tolist"):  # numpy scalars / arrays
        return _norm_cell(v.tolist())
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Column-name-sorted, row-sorted canonical form of a result."""
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def _dtype_kind(dtype: Any) -> str:
    """Coarse dtype class that mirrors how the driver renders values.

    The driver stringifies fetched cells before hashing, so int32 vs
    int64 is harmless but int64 vs float64 is fatal (106140089767 vs
    1.061401e+11). DuckDB HUGEINT (from SUM(BIGINT)) fetches as
    float64 — the round-2 regression — which this catches."""
    kind = getattr(dtype, "kind", "O")
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "datetime"}.get(
        kind, "object"
    )


def compare_dtypes(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> tuple[bool, str]:
    """Per-column fetched-dtype-kind parity (names sorted, driver-style)."""
    bad = []
    for col in sorted(spark_pdf.columns):
        if col not in oracle_pdf.columns:
            continue
        sk = _dtype_kind(spark_pdf[col].dtype)
        ok = _dtype_kind(oracle_pdf[col].dtype)
        # An all-NULL (or empty) oracle column fetches as object/float
        # regardless of declared type — not a hashable difference.
        if sk != ok and not oracle_pdf[col].isna().all():
            if not spark_pdf[col].isna().all():
                bad.append(f"{col}: spark={sk} oracle={ok}")
    if bad:
        return False, "fetched-dtype mismatch: " + "; ".join(bad)
    return True, "ok"


def compare_results(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return False, (
            f"column mismatch: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
    ok, msg = compare_dtypes(spark_pdf, oracle_pdf)
    if not ok:
        return False, msg
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if a == b:
        return True, "ok"
    diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
    return False, f"value mismatch, first diffs (spark vs oracle): {diffs}"


def check_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    sf_dir: str,
) -> tuple[bool, str]:
    """Run one registered query against its oracle; (ok, message)."""
    from bo_sql_spark.queries import load_all

    spec = load_all()[name]
    spark_pdf = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        ok = len(spark_pdf) >= 0
        return ok, f"rows-only check: {len(spark_pdf)} rows"
    oracle_pdf = con.execute(spec.oracle).df()
    return compare_results(spark_pdf, oracle_pdf)
