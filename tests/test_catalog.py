"""Catalog behavior: registration, memoization, and cross-directory
invalidation (stale views would silently corrupt every query)."""

from __future__ import annotations

from bo_sql_spark.catalog import describe_table, load_tables


def test_memoized_same_dir_returns_same_frames(spark, sf_dir):
    a = load_tables(spark, sf_dir)
    b = load_tables(spark, sf_dir)
    assert a is b  # cached — no re-read of 10 parquet footers


def test_switching_dirs_reregisters_views(spark):
    load_tables(spark, "/root/testdata/sf0.001")
    n_small = spark.table("lineitem").count()
    load_tables(spark, "/root/testdata/sf0.01")
    n_big = spark.table("lineitem").count()
    assert n_big > n_small  # views must follow the directory switch
    load_tables(spark, "/root/testdata/sf0.001")
    assert spark.table("lineitem").count() == n_small


def test_events_gets_usable_timestamp(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    fields = {f.name: f.dataType.simpleString() for f in t["events"].schema.fields}
    assert fields["ts"] == "timestamp"
    assert fields["ts_ns"] == "bigint"


def test_describe_table_stats(spark, sf_dir):
    load_tables(spark, sf_dir)
    n, stats = describe_table(spark, "region")
    assert n == 5
    by_name = {s.name: s for s in stats}
    assert by_name["r_regionkey"].min == 0 and by_name["r_regionkey"].max == 4
    assert by_name["r_name"].ndv == 5
