"""Structured Streaming pipelines over the events table.

The reference has no streaming at all (SURVEY §2.3); these are the
Spark-native stateful operators a live event feed needs: watermarked
tumbling/sliding windows, session windows, and streaming dedup.

Test/grading harness runs them BOUNDED: ``readStream`` over the same
parquet file with ``trigger(availableNow=True)`` drains everything and
terminates, so results are deterministic and oracle-comparable against
batch SQL over the identical rows. In production the same pipeline
points at Kafka/files and simply never terminates — the plan is
unchanged, which is the point of Structured Streaming.

Timestamps: events.ts has shipped as both parquet TIMESTAMP(NANOS)
(read as int64 nanos via nanosAsLong) and timestamp[us]; the stream
peeks the file's batch schema and normalizes to the same ``ts``
(micros timestamp) + ``ts_ns`` (int64 nanos) contract as the batch
catalog path (catalog.normalize_events).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bo_sql_spark.catalog import normalize_events

EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # int64 nanos (nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table (bounded file stream)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ->TIMESTAMP cast in normalize_events is wall-clock-preserving
    # only under UTC; pin it even for caller-provided sessions.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Streaming disables AQE, so every stateful shuffle materializes
    # spark.sql.shuffle.partitions state stores PER MICROBATCH. Under a
    # caller-provided plain session that's the 200 default — ~200 tiny
    # RocksDB/HDFS stores for a local run. Right-size it once here
    # (only if still at the default; a tuned session is left alone).
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", "16")
    # file-stream sources need a DIRECTORY; select the one table file
    # via glob filter (in production this is the landing directory that
    # new files keep arriving into). File streams require an explicit
    # schema; peek the batch footer so we track whichever ts encoding
    # (int64 nanos vs timestamp[us]) this copy of the data uses. When
    # no events file exists yet (an empty landing directory is a normal
    # streaming cold start), fall back to the int64-nanos raw schema
    # instead of failing — the pre-peek behavior. Only the two
    # cold-start error classes fall back; a corrupt file or permission
    # error must fail loudly at load time, not stream a wrong schema.
    from pyspark.errors import AnalysisException

    try:
        file_schema = (
            spark.read.format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
            .schema
        )
    except AnalysisException as exc:
        cold_start = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}
        err_class = getattr(exc, "getErrorClass", lambda: None)()
        if err_class not in cold_start and not any(
            c in str(exc) for c in cold_start
        ):
            raise
        file_schema = EVENTS_RAW_SCHEMA
    raw = (
        spark.readStream.schema(file_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_events(raw)


def tumbling_counts(stream: DataFrame, width: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event_type."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    stream: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "n_events",
        )
    )


def sessionize(stream: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: events merge while gaps < ``gap``.

    State is one open session per user (merged incrementally as events
    arrive); the watermark bounds how long a session can stay open.
    """
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(stream: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    dropDuplicatesWithinWatermark keeps state only for the watermark
    window — bounded memory forever, unlike a batch distinct.
    """
    return (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def interval_join(
    stream: DataFrame, max_gap: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join: purchases joined to the same user's
    clicks that happened in the preceding ``max_gap``.

    Both sides are the same watermarked stream filtered by type; state
    on each side is bounded by the watermark + interval condition (Spark
    evicts rows that can no longer match). Emits one row per
    (click, purchase) pair in the window — the relational (multi-match)
    counterpart of the funnel operator's latest-click semantics.
    """
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL {max_gap}"
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.unix_timestamp("c_ts").alias("click_sec"),
        F.unix_timestamp("p_ts").alias("purchase_sec"),
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain a bounded stream into an in-memory table (blocking).

    availableNow processes the full backlog in rate-limited batches then
    stops — the streaming equivalent of 'run to completion'.
    """
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
