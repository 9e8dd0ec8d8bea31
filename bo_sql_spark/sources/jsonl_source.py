"""JSONL (newline-delimited JSON) source — the other half of corpus
ingest: training corpora arrive as JSONL at least as often as parquet
(one document object per line: Common Crawl derivatives, chat logs,
instruction sets).

The reference engine loads CSV only (reference src/storage/
csv_loader.cpp) — JSONL is beyond-reference surface with the SAME
typed-load contract as ``csv_source.load_csv``: native Spark schema
inference plus a date post-pass. JSON already distinguishes
numbers/strings/booleans, so the only ambiguity worth fixing is dates:
string columns whose every non-null value is a strict ISO ``yyyy-MM-dd``
become DateType (checked in ONE aggregate job over all candidate
columns — no per-column passes).

Scale notes:
- Schema inference scans the data twice. At 100 TB, pass ``schema``
  explicitly and the reader is single-pass.
- JSONL is an INGEST format: text-encoded, unsplittable when gzipped
  whole-file, no column pruning at the byte level. The intended
  pattern is ``load_jsonl -> write parquet once``, then query the
  parquet (this is what the round-trip query demonstrates in reverse).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructType

_ISO_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"


def _iso_date_columns(df: DataFrame) -> list[str]:
    """String columns whose every NON-NULL value is a valid strict ISO
    date. All candidates checked in one aggregate job; all-NULL columns
    stay strings (no evidence)."""
    candidates = [
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    ]
    if not candidates:
        return []
    checks = []
    for c in candidates:
        ok = (
            F.col(c).rlike(_ISO_DATE_RE)
            & F.try_to_date(F.col(c), "yyyy-MM-dd").isNotNull()
        )
        # min over non-null rows == 1 -> every present value is a date;
        # max(non-null flag) == 1 -> at least one value present.
        checks.append(
            (
                F.min(F.when(F.col(c).isNotNull(), ok.cast("int")))
                * F.max(F.col(c).isNotNull().cast("int"))
            ).alias(c)
        )
    row = df.agg(*checks).collect()[0]
    return [c for c in candidates if row[c] == 1]


def load_jsonl(
    spark: SparkSession,
    path: str,
    name: str | None = None,
    schema: StructType | None = None,
    infer_iso_dates: bool = True,
) -> DataFrame:
    """Load JSONL with schema inference (+ ISO-date post-pass), or a
    caller schema (single-pass, the 100 TB form)."""
    reader = spark.read
    if schema is not None:
        df = reader.schema(schema).json(path)
    else:
        df = reader.json(path)
        if infer_iso_dates:
            for c in _iso_date_columns(df):
                df = df.withColumn(c, F.to_date(F.col(c), "yyyy-MM-dd"))
    if name:
        df.createOrReplaceTempView(name)
    return df


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write one JSON object per row. Spark escapes embedded newlines,
    so records stay line-delimited; NULL fields are omitted (and read
    back as NULL). Dates/timestamps serialize as ISO strings — which
    ``load_jsonl``'s date pass restores, making parquet -> JSONL ->
    load a typed round trip. ``compression`` (e.g. 'gzip') trades
    splittability for size — gzipped JSONL reads back fine but each
    file is one task, so size output files accordingly for export."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
