"""Registry-wide plan lint: build every registered query's physical
plan at sf0.001 and flag anti-patterns: CartesianProduct and
row-at-a-time PythonUDF (BatchEvalPython). (Global-sort detection is
NOT implemented — Sort nodes also appear inside windows and fused
top-ks, so a naive check would be all false positives.)

The hand-written pins in tests/test_plans.py assert the POSITIVE shape
of ~30 queries; this lint asserts the NEGATIVE space over all of them.
Builders with side effects (index materialization, stream drains)
execute during build — that is the same cost the rehearsal pays.

Usage: python tools_plan_lint.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import SparkSession

    from bo_sql_spark.queries import load_all

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    flags: dict[str, list[str]] = {}
    for name, spec in sorted(load_all().items()):
        try:
            df = spec.builder(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - registration gates
            flags.setdefault(name, []).append(f"BUILD-ERROR {type(exc).__name__}")
            continue
        found = []
        if "CartesianProduct" in plan:
            found.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            found.append("row-Python (BatchEvalPython)")
        for f in found:
            flags.setdefault(name, []).append(f)
    if flags:
        for name, fs in sorted(flags.items()):
            print(f"FLAG {name}: {', '.join(fs)}")
    print(f"lint done: {len(flags)} flagged")


if __name__ == "__main__":
    main()
