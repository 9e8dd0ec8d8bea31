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


def test_compact_table_rebins_and_preserves_content(spark, tmp_path):
    """Simulate a streaming sink's confetti (40 tiny appends), compact
    to ~2500-row files, and require: far fewer files, identical row
    multiset, readable through the same path."""
    import pyspark.sql.functions as F

    from bo_sql_spark.sinks import compact_table

    path = str(tmp_path / "confetti")
    for b in range(40):
        spark.range(b * 250, (b + 1) * 250).select(
            "id", (F.col("id") % 7).alias("g")
        ).coalesce(1).write.mode("append").parquet(path)
    before_rows = sorted(r["id"] for r in spark.read.parquet(path).collect())

    nb, na = compact_table(spark, path, target_rows_per_file=2500)
    assert nb >= 40 and na <= 5, (nb, na)
    after = spark.read.parquet(path)
    assert sorted(r["id"] for r in after.collect()) == before_rows


def test_compact_table_partitioned_keeps_layout(spark, tmp_path):
    """Partitioned compaction must preserve the hive directory layout
    (pruning keeps working) and the row multiset."""
    import os

    import pyspark.sql.functions as F

    from bo_sql_spark.sinks import compact_table

    path = str(tmp_path / "by_g")
    for b in range(10):
        spark.range(b * 100, (b + 1) * 100).select(
            "id", (F.col("id") % 3).alias("g")
        ).coalesce(1).write.mode("append").partitionBy("g").parquet(path)
    nb, na = compact_table(
        spark, path, target_rows_per_file=500, partition_by=["g"]
    )
    assert na < nb
    dirs = {d for d in os.listdir(path) if d.startswith("g=")}
    assert dirs == {"g=0", "g=1", "g=2"}
    after = spark.read.parquet(path)
    assert after.count() == 1000
    assert after.filter(F.col("g") == 1).count() == 333
