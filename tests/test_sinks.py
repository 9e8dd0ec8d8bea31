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


def test_compact_table_file_uri_and_no_posix_calls(spark, tmp_path, monkeypatch):
    """Cluster-FS safety (round-9 verdict): compaction must route ALL
    listing/rename/delete through the Hadoop FileSystem API, so it
    works on any scheme — proven two ways: (a) the whole op runs
    against an explicit file:// URI, (b) posix os.rename/os.walk/
    shutil.rmtree are booby-trapped for the duration (the r8
    implementation used all three)."""
    import os as _os
    import shutil as _shutil

    import pyspark.sql.functions as F

    from bo_sql_spark.sinks import compact_table

    local = str(tmp_path / "uri_table")
    for b in range(8):
        spark.range(b * 100, (b + 1) * 100).coalesce(1).write.mode(
            "append"
        ).parquet(local)

    def _boom(*a, **k):
        raise AssertionError("posix FS call on a table path")

    monkeypatch.setattr(_os, "rename", _boom)
    monkeypatch.setattr(_os, "walk", _boom)
    monkeypatch.setattr(_shutil, "rmtree", _boom)
    nb, na = compact_table(spark, "file://" + local, target_rows_per_file=400)
    assert nb >= 8 and na <= 3, (nb, na)
    assert spark.read.parquet(local).count() == 800


def test_compact_table_partitioned_rebins_large_partition(spark, tmp_path):
    """Skew fix (round-9 advice): a hive partition larger than the
    target must be split across MULTIPLE output files (the r8 version
    repartitioned on the partition columns alone, funneling each
    partition value into one task/one giant file)."""
    import os

    import pyspark.sql.functions as F

    from bo_sql_spark.sinks import compact_table

    path = str(tmp_path / "skewed")
    # g=0 holds 2000 rows, g=1 holds 50: same table, 40x skew
    df = spark.range(0, 2050).select(
        "id", F.when(F.col("id") < 2000, 0).otherwise(1).alias("g")
    )
    df.repartition(10).write.partitionBy("g").parquet(path)
    compact_table(spark, path, target_rows_per_file=250, partition_by=["g"])
    big = [
        f
        for f in os.listdir(os.path.join(path, "g=0"))
        if f.endswith(".parquet")
    ]
    assert len(big) >= 4, big  # 2000 rows / 250 target -> ~8 bins
    back = spark.read.parquet(path)
    assert back.count() == 2050
    assert back.filter(F.col("g") == 0).count() == 2000


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
