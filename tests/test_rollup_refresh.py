"""Incremental rollup refresh: partial-merge correctness + partition locality.

The reference has no materialized views at all (its tables are immutable
after load, reference README.md:9); this is north-star hypertable
surface. The invariant under test is the continuous-aggregate contract:
  full_rebuild(events) == materialize(batch1) then refresh(batch2)
for any split of events — including late rows landing in buckets batch1
already wrote — and the refresh must rewrite ONLY the day partitions
batch2 touches.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from bo_sql_spark.catalog import load_tables
from bo_sql_spark.operators.rollup_mat import (
    daily_from_hourly,
    materialize_hourly_rollup,
    refresh_hourly_rollup,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"]


def _partials_snapshot(spark, path):
    """Rollup contents keyed for exact comparison (floats rounded 6dp:
    the merge sums partials in a different order than the full rebuild)."""
    rows = (
        spark.read.parquet(path)
        .select(
            "day_part",
            "hour_start",
            "event_type",
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
            F.round("min_value", 6).alias("min_value"),
            F.round("max_value", 6).alias("max_value"),
        )
        .collect()
    )
    return {
        (r["day_part"], r["hour_start"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
        )
        for r in rows
    }


def test_refresh_equals_full_rebuild(spark, events, tmp_path):
    split_ts = events.select(
        F.expr("percentile_approx(unix_timestamp(ts), 0.6)")
    ).first()[0]
    batch1 = events.filter(F.unix_timestamp("ts") < split_ts)
    batch2 = events.filter(F.unix_timestamp("ts") >= split_ts)
    assert batch1.count() > 0 and batch2.count() > 0

    full = str(tmp_path / "full")
    inc = str(tmp_path / "inc")
    materialize_hourly_rollup(events, full)
    materialize_hourly_rollup(batch1, inc)
    touched = refresh_hourly_rollup(spark, batch2, inc)
    assert touched == sorted(touched) and len(touched) > 0

    assert _partials_snapshot(spark, inc) == _partials_snapshot(spark, full)


def test_late_data_merges_into_existing_bucket(spark, events, tmp_path):
    # Hold back half the rows of ONE existing hour bucket: pure late data.
    target_hour = (
        events.select(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("h")
        )
        .groupBy("h")
        .count()
        .filter("count >= 4")
        .orderBy("h")
        .first()["h"]
    )
    in_hour = F.unix_timestamp(F.date_trunc("hour", "ts")) == target_hour
    late = events.filter(in_hour & (F.col("event_id") % 2 == 0))
    first = events.exceptAll(late)

    full = str(tmp_path / "full")
    inc = str(tmp_path / "inc")
    materialize_hourly_rollup(events, full)
    materialize_hourly_rollup(first, inc)
    touched = refresh_hourly_rollup(spark, late, inc)
    assert touched == [target_hour - target_hour % 86400]

    assert _partials_snapshot(spark, inc) == _partials_snapshot(spark, full)


def test_refresh_rewrites_only_touched_partitions(spark, events, tmp_path):
    days = sorted(
        r["d"]
        for r in events.select(
            F.unix_timestamp(F.date_trunc("day", "ts")).alias("d")
        )
        .distinct()
        .collect()
    )
    assert len(days) >= 2, "fixture must span 2+ days for this test"
    last_day = days[-1]
    batch1 = events.filter(F.unix_timestamp(F.date_trunc("day", "ts")) < last_day)
    batch2 = events.filter(F.unix_timestamp(F.date_trunc("day", "ts")) >= last_day)

    inc = str(tmp_path / "inc")
    materialize_hourly_rollup(batch1, inc)

    def files_for(day):
        d = os.path.join(inc, f"day_part={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    untouched_before = {d: files_for(d) for d in days[:-1]}
    touched = refresh_hourly_rollup(spark, batch2, inc)
    assert touched == [last_day]
    assert os.path.isdir(os.path.join(inc, f"day_part={last_day}"))
    for d in days[:-1]:
        assert files_for(d) == untouched_before[d], f"partition {d} was rewritten"


def test_daily_serving_from_refreshed_rollup(spark, events, tmp_path, oracle_con):
    """End to end: incremental rollup serves the same daily answer the
    oracle computes from raw events."""
    split_ts = events.select(
        F.expr("percentile_approx(unix_timestamp(ts), 0.5)")
    ).first()[0]
    inc = str(tmp_path / "inc")
    materialize_hourly_rollup(events.filter(F.unix_timestamp("ts") < split_ts), inc)
    refresh_hourly_rollup(
        spark, events.filter(F.unix_timestamp("ts") >= split_ts), inc
    )
    served = {
        (r["day_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
        for r in daily_from_hourly(spark, inc).collect()
    }
    oracle = {
        (int(r[0]), r[1]): (r[2], float(r[3]))
        for r in oracle_con.execute(
            """
            SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY day_start, event_type
            """
        ).fetchall()
    }
    assert served == oracle
