"""CSV source with reference-compatible type inference.

The reference infers column types at load time in priority order
DATE32 -> INT64 -> DOUBLE -> STRING (reference src/storage/csv_loader.cpp:49-161),
where DATE32 is an 8-digit yyyymmdd integer in [19000000, 21000000]
(csv_loader.cpp:53-66). Spark's CSV reader handles header/inference/quoting
(properly — the reference splits on raw commas, csv_loader.cpp:26-38, a
bug we do NOT reproduce); we add only the yyyymmdd->DateType post-pass,
since Spark infers those as integers.

Scale note: inferSchema scans the file twice. At 100 TB you'd supply an
explicit schema (the ``schema`` arg) and skip inference entirely.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, LongType, StructType

_DATE_LO, _DATE_HI = 19000000, 21000000


def _yyyymmdd_columns(df: DataFrame) -> list[str]:
    """Integer columns whose every value is a valid yyyymmdd in range.

    One aggregate job checks all candidate columns at once (no
    per-column passes, no collect of data rows).
    """
    candidates = [
        f.name for f in df.schema.fields if isinstance(f.dataType, (IntegerType, LongType))
    ]
    if not candidates:
        return []
    checks = []
    for c in candidates:
        in_range = (F.col(c) >= _DATE_LO) & (F.col(c) <= _DATE_HI)
        valid_date = F.try_to_date(F.col(c).cast("string"), "yyyyMMdd").isNotNull()
        checks.append(
            F.min((in_range & valid_date).cast("int")).alias(c)
        )
    row = df.agg(*checks).collect()[0]
    return [c for c in candidates if row[c] == 1]


def load_csv(
    spark: SparkSession,
    path: str,
    name: str | None = None,
    schema: StructType | None = None,
    infer_yyyymmdd_dates: bool = True,
) -> DataFrame:
    """Load a CSV with header + type inference (+ yyyymmdd date pass)."""
    # escape='"' gives RFC-4180 doubled-quote handling (Spark defaults to
    # backslash escapes). The reference can't parse quoted fields at all
    # (csv_loader.cpp:26-38) — standard behavior adopted per SURVEY §4.3.
    reader = spark.read.option("header", "true").option("escape", '"')
    if schema is not None:
        df = reader.schema(schema).csv(path)
    else:
        df = reader.option("inferSchema", "true").csv(path)
        if infer_yyyymmdd_dates:
            for c in _yyyymmdd_columns(df):
                df = df.withColumn(
                    c, F.to_date(F.col(c).cast("string"), "yyyyMMdd")
                )
    if name:
        df.createOrReplaceTempView(name)
    return df
