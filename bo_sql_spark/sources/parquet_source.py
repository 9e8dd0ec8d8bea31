"""Parquet source — the scale-path table format.

The reference has no binary table format (CSV only,
src/storage/csv_loader.cpp). Parquet is the 100 TB answer: columnar,
dictionary/RLE encoded (subsuming the reference's string Dictionary,
include/storage/dictionary.h:11-17), with min/max row-group statistics
that Spark's scan uses for predicate pushdown and column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_parquet(
    spark: SparkSession,
    path: str,
    name: str | None = None,
) -> DataFrame:
    """Read a parquet file/directory; optionally register it as a view."""
    df = spark.read.parquet(path)
    if name:
        df.createOrReplaceTempView(name)
    return df
