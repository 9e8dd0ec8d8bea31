"""Layout operators: range-sorted and Z-ordered parquet writes must
produce row-group min/max statistics that a stats-aware reader can
actually skip on — proven from the real parquet footers (pyarrow),
not from plan text."""

from __future__ import annotations

import pyspark.sql.functions as F

from bo_sql_spark.operators.layout import (
    overlap_fraction,
    rowgroup_spans,
    write_range_sorted,
    zorder_code,
)


def _synth(spark, n=60_000):
    """(x, y) uniform-ish over [0, 1024)^2, insertion order random
    w.r.t. both keys (the ingest order a log would have)."""
    return spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1024)).alias("y"),
    )


def test_zorder_code_interleaves_bits(spark):
    row = (
        spark.range(1)
        .select(
            zorder_code(F.lit(0b1011), F.lit(0b0110), bits=4).alias("z"),
            zorder_code(F.lit(0), F.lit(0), bits=4).alias("zero"),
            zorder_code(F.lit(15), F.lit(15), bits=4).alias("full"),
        )
        .first()
    )
    # x=1011, y=0110 -> bits (y3 x3 y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 0 1
    assert row["z"] == 0b01101101
    assert row["zero"] == 0
    assert row["full"] == 0b11111111


def test_sorted_layout_skips_on_sort_key_only(spark, tmp_path):
    df = _synth(spark)
    sorted_path = str(tmp_path / "by_x")
    unsorted_path = str(tmp_path / "raw")
    write_range_sorted(df, sorted_path, ["x"], n_files=8)
    df.repartition(8).write.mode("overwrite").parquet(unsorted_path)

    lo, hi = 100, 150  # ~5% of the x key space
    sorted_x = overlap_fraction(rowgroup_spans(sorted_path, "x"), lo, hi)
    unsorted_x = overlap_fraction(rowgroup_spans(unsorted_path, "x"), lo, hi)
    sorted_y = overlap_fraction(rowgroup_spans(sorted_path, "y"), lo, hi)
    # sorted on x: only ~1-2 of 8 row groups can contain [100, 150]
    assert sorted_x <= 0.3, sorted_x
    # random layout: every row group spans ~the full range -> no skipping
    assert unsorted_x == 1.0, unsorted_x
    # sorting by x buys NOTHING on y — the single-key layout limitation
    assert sorted_y == 1.0, sorted_y


def test_zorder_layout_skips_on_both_keys(spark, tmp_path):
    df = _synth(spark).withColumn("_z", zorder_code("x", "y", bits=10))
    zpath = str(tmp_path / "by_z")
    write_range_sorted(df, zpath, ["_z"], n_files=16)

    lo, hi = 100, 150
    zx = overlap_fraction(rowgroup_spans(zpath, "x"), lo, hi)
    zy = overlap_fraction(rowgroup_spans(zpath, "y"), lo, hi)
    # each z row group is a small rectangle: BOTH columns skip most
    # row groups (neither as sharply as a dedicated single-key sort)
    assert zx <= 0.7, zx
    assert zy <= 0.7, zy
    assert zx + zy < 2.0  # and strictly better than no skipping at all


def test_sorted_write_row_groups_are_disjoint(spark, tmp_path):
    df = _synth(spark)
    path = str(tmp_path / "disjoint")
    write_range_sorted(df, path, ["x"], n_files=8)
    spans = sorted(rowgroup_spans(path, "x"))
    # global range partition + in-file sort => non-overlapping spans
    # (boundary values may touch where a key straddles two files)
    for (mn1, mx1), (mn2, mx2) in zip(spans, spans[1:]):
        assert mx1 <= mn2, (mx1, mn2)
