"""Materialized time rollups (hypertable-style continuous aggregates).

The 100 TB pattern for serving time-series dashboards: maintain a small
pre-aggregated rollup at fine granularity (hour), answer coarser
queries (day/week/month) by RE-aggregating the rollup instead of the
raw events. Correct for algebraic aggregates (sum/count/min/max; avg
as sum+count) because time buckets nest.

The rollup is a parquet table partitioned by day (`day_part`), so
refresh touches only the partitions the new batch lands in:
``refresh_hourly_rollup`` merges the new batch's hour partials with the
existing partials for just those days and rewrites just those
partitions (dynamic partition overwrite). An ingest that appends one
hour of events rewrites one day's directory, never the table — at
100 TB the refresh cost is O(new data), not O(history).

Contract: each raw event is presented to exactly one materialize/
refresh call (append-only ingest). Partials then merge losslessly:
counts and sums add, mins/maxes combine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

_PARTIAL_AGGS = (
    ("n_events", F.sum, "n_events"),
    ("sum_value", F.sum, "sum_value"),
    ("min_value", F.min, "min_value"),
    ("max_value", F.max, "max_value"),
)


def build_hourly_rollup(events: DataFrame) -> DataFrame:
    """Hourly grain: (hour_start epoch secs, event_type) -> partials."""
    return events.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def _with_day_part(hourly: DataFrame) -> DataFrame:
    """Partition column: UTC day start (epoch secs) the hour belongs to."""
    return hourly.withColumn(
        "day_part", F.col("hour_start") - F.pmod(F.col("hour_start"), F.lit(86400))
    )


def materialize_hourly_rollup(events: DataFrame, path: str) -> None:
    """Full (re)build: persist the hourly rollup partitioned by day."""
    _with_day_part(build_hourly_rollup(events)).write.mode("overwrite").partitionBy(
        "day_part"
    ).parquet(path)


def refresh_hourly_rollup(
    spark: SparkSession, new_events: DataFrame, path: str
) -> list[int]:
    """Incrementally fold a new event batch into the materialized rollup.

    1. Aggregate the batch to hour partials (O(batch), the only scan of
       raw data).
    2. Read the EXISTING partials for the days the batch touches —
       `day_part` is the partition column, so this is a pruned read of
       just those directories, not the table.
    3. Merge old+new partials per (hour, event_type): sum the counts and
       sums, min/max the extrema — late data folding into an existing
       bucket is handled by the same merge, no special case.
    4. Rewrite ONLY the touched day partitions via dynamic partition
       overwrite; untouched days' files are not read or written.

    Returns the list of day_part values refreshed (driver-side: one int
    per touched day — bounded by the batch's time span, never by table
    size).

    First call on a nonexistent path degrades to a plain materialize of
    the batch.
    """
    new_partials = _with_day_part(build_hourly_rollup(new_events))
    try:
        existing = spark.read.parquet(path)
        existing.schema  # force analysis so a missing path raises here
    except AnalysisException:
        existing = None
    if existing is not None:
        touched = sorted(
            r["day_part"] for r in new_partials.select("day_part").distinct().collect()
        )
        old = existing.filter(F.col("day_part").isin(touched))
        merged = (
            old.unionByName(new_partials)
            .groupBy("day_part", "hour_start", "event_type")
            .agg(*(fn(src).alias(dst) for src, fn, dst in _PARTIAL_AGGS))
        )
    else:
        touched = sorted(
            r["day_part"] for r in new_partials.select("day_part").distinct().collect()
        )
        merged = new_partials
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("day_part").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return touched


def daily_from_hourly(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Serve a daily query FROM the rollup: re-aggregate hour partials.

    86400-second alignment of hour buckets nests exactly into days, so
    sum-of-sums / sum-of-counts / min-of-mins / max-of-maxes equal the
    direct daily aggregation over raw events.
    """
    hourly = spark.read.parquet(rollup_path)
    day_start = (F.col("hour_start") - F.pmod(F.col("hour_start"), F.lit(86400))).alias(
        "day_start"
    )
    return hourly.groupBy(day_start, "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
