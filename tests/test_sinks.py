"""Sink round-trips: distributed writes readable with identical content,
partitioned layout prunable."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from bo_sql_spark.plans import explain_str
from bo_sql_spark.sinks import write_csv, write_parquet


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    out = str(tmp_path / "plain")
    write_parquet(df, out)
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert sorted(back.columns) == ["grp", "id"]


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("grp")
    )
    out = str(tmp_path / "parted")
    write_parquet(df, out, partition_by=["grp"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("grp=")
    ) == ["grp=0", "grp=1", "grp=2"]
    back = spark.read.parquet(out).filter(F.col("grp") == 1)
    text = explain_str(back, "formatted")
    assert "PartitionFilters" in text
    assert back.count() == 33


def test_csv_roundtrip_quoting(spark, tmp_path):
    df = spark.createDataFrame([("a,b", 'q"x', 1)], "s1 string, s2 string, n long")
    out = str(tmp_path / "csv")
    write_csv(df, out)
    back = (
        spark.read.option("header", "true")
        .option("escape", '"')
        .option("inferSchema", "true")
        .csv(out)
    )
    row = back.first()
    assert row["s1"] == "a,b" and row["s2"] == 'q"x' and row["n"] == 1
