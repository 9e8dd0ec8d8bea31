"""SparkSession factory with scale-oriented defaults.

The reference engine is single-threaded and in-memory (reference
README.md:3); every concurrency/spill/shuffle concern it side-steps is
handled here by Spark configuration. These confs are chosen for the
100 TB design point and merely *sized down* for local test runs:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace any hand-tuned plan choices.
- Broadcast threshold: dimension tables (region/nation/supplier/part at
  TPC-H-ish ratios) stay broadcast-able even at large SF, eliminating
  the shuffle on the probe side of star joins.
- Arrow enabled: any Pandas-UDF extension operator pays batch (not row)
  serialization cost.
- UTC + ANSI defaults pinned so results are reproducible and match the
  ANSI-standard oracle (DuckDB) semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "bo-sql-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    On a real cluster, ``master`` comes from spark-submit and
    ``shuffle_partitions`` should be ~2-3x total executor cores (or left
    to AQE coalescing from a high initial value). Locally we default to
    local[$SPARK_GRAFT_CPUS] with one shuffle partition per core.
    """
    cpus = DEFAULT_CPUS
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- determinism / dialect ---
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI is the Spark 4 default; pin it explicitly so the factory's
        # dialect claim holds even on a Spark 3.x backport (non-ANSI default)
        # and matches the ANSI-standard DuckDB oracle.
        .config("spark.sql.ansi.enabled", "true")
        # --- adaptive execution: the scale workhorse ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # dims up to 64MB broadcast: star-schema joins never shuffle the fact side
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- python boundary: Arrow batches, never per-row pickling ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing: keep partitions in the 128MB sweet spot ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet TIMESTAMP(NANOS) is unreadable by Spark otherwise; we read
        # the raw int64 nanos and derive a micros timestamp in the catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
