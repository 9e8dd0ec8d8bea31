"""Physical-plan inspection helpers.

Scale discipline is enforced as TESTS, not hope: every headline query
asserts its plan shape (broadcast vs shuffle join, filter pushdown,
column pruning, partial aggregation, top-k fusion) in
tests/test_plans.py. A plan regression — e.g. a dimension join silently
flipping to sort-merge — fails CI long before it burns a cluster.

The reference's only plan surface is a logical-tree printer
(reference src/logical/logical.cpp:7-116); Catalyst's formatted explain
is the analogue with physical detail.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text (what ``df.explain(mode)`` prints)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def has_operator(df: DataFrame, name: str) -> bool:
    """True if the physical plan contains an operator by (sub)name,
    e.g. 'BroadcastHashJoin', 'TakeOrderedAndProject', 'WindowGroupLimit'."""
    return name.lower() in explain_str(df, "simple").lower()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the scan pushed into the parquet reader."""
    text = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan column lists actually read from parquet (pruning check)."""
    text = explain_str(df, "formatted")
    scans: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        body = m.group(1)
        cols = [p.split(":")[0].strip() for p in body.split(",") if ":" in p]
        scans.append(cols)
    return scans


def pin_plan_with_confs(spark, confs: dict, build):
    """Per-QUERY (non-session) conf mechanism: set ``confs``, build the
    DataFrame, force its physical plan to materialize UNDER those
    confs, then restore the previous values — callers can collect the
    returned DataFrame later under a clean session because Spark
    caches the QueryExecution on the Dataset (planning happens once;
    later actions reuse the pinned plan).

    Exists for plan-affecting confs with environment-scaled thresholds
    — e.g. the runtime Bloom-filter's 10GB application-side scan floor,
    which a 100 TB table clears by itself but a test fixture never
    will. Restoring the conf immediately keeps every OTHER registered
    query planning under the session defaults (a leaked threshold
    would silently change their plan signatures)."""
    old: dict[str, str | None] = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    for k, v in confs.items():
        spark.conf.set(k, str(v))
    try:
        df = build()
        df._jdf.queryExecution().executedPlan()  # pin under these confs
        return df
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
