"""Materialized time rollups (hypertable-style continuous aggregates).

The 100 TB pattern for serving time-series dashboards: maintain a small
pre-aggregated rollup at fine granularity (hour), answer coarser
queries (day/week/month) by RE-aggregating the rollup instead of the
raw events. Correct for algebraic aggregates (sum/count/min/max; avg
as sum+count) because time buckets nest.

The rollup is itself a partitioned parquet table — refresh appends only
new buckets (idempotent overwrite per partition in production).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


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


def materialize_hourly_rollup(
    events: DataFrame, path: str
) -> None:
    """Persist the hourly rollup partitioned by event_type."""
    build_hourly_rollup(events).write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(path)


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
