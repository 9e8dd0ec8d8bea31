"""Unit tests for the streaming module on crafted event sequences."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F


@pytest.fixture()
def event_file(spark, tmp_path):
    """A tiny events parquet dir with controlled nanosecond timestamps."""
    us = 1_000_000
    rows = [
        # user 1: click at t=0, purchase at t=10min (converts),
        # purchase at t=50min (too late vs last click at 0)
        (1, 1, 0, "click", 1.0, "{}"),
        (2, 1, 600 * us * 1000, "purchase", 2.0, "{}"),
        (3, 1, 3000 * us * 1000, "purchase", 3.0, "{}"),
        # user 2: purchase with no prior click (never converts)
        (4, 2, 100 * us * 1000, "purchase", 4.0, "{}"),
        # user 2: click then click then purchase (last click wins)
        (5, 2, 200 * us * 1000, "click", 5.0, "{}"),
        (6, 2, 300 * us * 1000, "click", 6.0, "{}"),
        (7, 2, 400 * us * 1000, "purchase", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts long, event_type string, value double, props string",
    )
    path = str(tmp_path / "stream_fixture")
    df.write.mode("overwrite").parquet(path)
    return path


def _stream_fixture(spark, path):
    from bo_sql_spark.streaming.events import EVENTS_RAW_SCHEMA

    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).format("parquet").load(path)
    return raw.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
    )


def test_funnel_semantics(spark, event_file):
    from bo_sql_spark.streaming.stateful import funnel_conversions
    from bo_sql_spark.streaming.events import run_to_memory

    out = funnel_conversions(_stream_fixture(spark, event_file))
    spark.sql("DROP TABLE IF EXISTS mem_funnel_unit")
    run_to_memory(out, "mem_funnel_unit", output_mode="append")
    got = {
        (r["user_id"], r["click_tsn"], r["purchase_tsn"])
        for r in spark.table("mem_funnel_unit").collect()
    }
    assert got == {
        (1, 0, 600 * 1_000_000),  # converts within 30min
        (2, 300 * 1_000_000, 400 * 1_000_000),  # most recent click wins
    }


def test_funnel_tws_semantics(spark, event_file):
    """transformWithStateInPandas port must match the classic funnel.
    Skips where pyspark's TWS python runner can't start (it needs
    protobuf, absent in this container)."""
    pytest.importorskip(
        "google.protobuf", reason="transformWithState runner needs protobuf"
    )
    from bo_sql_spark.streaming.events import run_to_memory
    from bo_sql_spark.streaming.stateful import funnel_conversions_tws

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = funnel_conversions_tws(_stream_fixture(spark, event_file))
        spark.sql("DROP TABLE IF EXISTS mem_funnel_tws_unit")
        run_to_memory(out, "mem_funnel_tws_unit", output_mode="append")
        got = {
            (r["user_id"], r["click_tsn"], r["purchase_tsn"])
            for r in spark.table("mem_funnel_tws_unit").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    assert got == {
        (1, 0, 600 * 1_000_000),
        (2, 300 * 1_000_000, 400 * 1_000_000),
    }


def test_session_window_merges_by_gap(spark, event_file):
    from bo_sql_spark.streaming.events import run_to_memory, sessionize

    out = sessionize(_stream_fixture(spark, event_file), gap="10 minutes")
    spark.sql("DROP TABLE IF EXISTS mem_sess_unit")
    run_to_memory(out, "mem_sess_unit")
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table("mem_sess_unit").collect()
    }
    # user 1: events at 0s/600s MERGE (a boundary event exactly gap
    # after the last one joins the session — gap must EXCEED 10min to
    # split); the 3000s event is separate
    assert (1, 0, 2) in got
    assert (1, 3000, 1) in got
    # user 2: 100s/200s/300s/400s all within 10min gaps -> one session
    assert (2, 100, 4) in got


def test_normalize_events_timestamp_and_ntz(spark, tmp_path):
    """normalize_events must honor the two-column contract (ts timestamp
    + ts_ns int64 nanos) for TIMESTAMP and TIMESTAMP_NTZ source columns,
    not just the int64-nanos fixture used elsewhere in this file."""
    import datetime

    from pyspark.sql.types import TimestampType
    from bo_sql_spark.catalog import normalize_events

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0, 123456)
    for src_type in ("timestamp", "timestamp_ntz"):
        df = spark.createDataFrame(
            [(1, t0)], f"event_id long, ts {src_type}"
        )
        out = normalize_events(df)
        assert isinstance(out.schema["ts"].dataType, TimestampType)
        row = out.select(
            "ts_ns", (F.unix_micros("ts") * F.lit(1000)).alias("expect")
        ).first()
        assert row["ts_ns"] == row["expect"], (src_type, row)


def test_normalize_events_rejects_unknown_ts_type(spark):
    from bo_sql_spark.catalog import normalize_events

    df = spark.createDataFrame([(1, "2024-03-01")], "event_id long, ts string")
    with pytest.raises(TypeError, match="events.ts"):
        normalize_events(df)


def test_events_stream_empty_dir_falls_back_to_raw_schema(spark, tmp_path):
    """A landing directory with no events.parquet yet is a normal
    streaming cold start: events_stream must construct an (empty)
    stream on the raw int64-nanos schema instead of raising."""
    from bo_sql_spark.streaming.events import events_stream

    empty = tmp_path / "landing"
    empty.mkdir()
    stream = events_stream(spark, str(empty))
    assert stream.isStreaming
    assert "ts_ns" in stream.columns


def test_semantic_stream_ingest_multibatch_equals_batch(spark, tmp_path):
    """FOUR microbatches (ids in arrival order; the last containing
    near-copies of first-batch vectors) must drain to exactly the
    survivor set of ONE batch SemDeDup over all rows — store
    precedence across batches == min-id-wins globally. Four batches
    matter: from batch 2 on, the store read spans MULTIPLE
    ingest_batch dirs, each with its own cell=... partition tree —
    the read needs an explicit basePath or Spark raises
    CONFLICTING_DIRECTORY_STRUCTURES (regression found by the r8
    batch-count sweep; a 2-batch drain never reads 2+ dirs)."""
    import os
    import time

    import numpy as np
    import pyspark.sql.functions as F

    from bo_sql_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_stream_ingest,
    )

    rng = np.random.default_rng(3)
    all_vecs = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(120)
    ]
    first = all_vecs[:30]
    batches = [first, all_vecs[30:60], all_vecs[60:90]]
    # last batch: fresh vectors + near-copies of batch-1 vectors
    batches.append(
        all_vecs[90:] + [(1000 + i, [x * 1.0002 for x in v]) for i, v in first[:10]]
    )
    schema = "vec_id long, embedding array<double>"
    land = str(tmp_path / "land")
    os.makedirs(land)
    for j, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"f{j}")
        )
    import glob
    import shutil

    for j in range(len(batches)):
        part = glob.glob(str(tmp_path / f"f{j}" / "part-*.parquet"))[0]
        dst = os.path.join(land, f"batch{j}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (time.time() + j * 10, time.time() + j * 10))

    cents_df = spark.createDataFrame(first[:4], schema).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    store = str(tmp_path / "store")
    surv_path = str(tmp_path / "surv")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(land)
    )

    def ingest(batch_df, batch_id):
        semantic_dedup_stream_ingest(
            spark,
            batch_df,
            cents_df,
            store,
            surv_path,
            threshold=0.95,
            batch_id=batch_id,
        )

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(surv_path).collect()
    }
    everything = spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    )
    batch = {
        (r["vec_id"], r["cell"])
        for r in semantic_dedup(everything, cents_df, threshold=0.95).collect()
    }
    assert streamed == batch
    # and the near-copies were really killed across the batch boundary
    assert not any(v >= 1000 for v, _ in streamed)


def test_semantic_stream_ingest_retry_is_idempotent(spark, tmp_path):
    """foreachBatch exactly-once: replaying a microbatch with the same
    batch_id (a retry after a crash — including a crash BETWEEN the
    survivors write and the store write) must leave survivors and the
    assignment store byte-identical to a single clean run, not
    duplicated or inconsistent."""
    import numpy as np
    import pyspark.sql.functions as F

    from bo_sql_spark.operators.dedup import semantic_dedup_stream_ingest

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    schema = "vec_id long, embedding array<double>"
    b0 = spark.createDataFrame(vecs[:20], schema)
    b1 = spark.createDataFrame(
        vecs[20:] + [(500 + i, [x * 1.0001 for x in v]) for i, v in vecs[:5]],
        schema,
    )
    cents = spark.createDataFrame(vecs[:4], schema).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    store = str(tmp_path / "store")
    surv = str(tmp_path / "surv")
    kw = dict(threshold=0.95)
    semantic_dedup_stream_ingest(spark, b0, cents, store, surv, batch_id=0, **kw)
    # simulate a crash between sinks: batch 1's survivors land but its
    # store write doesn't, then the whole microbatch is replayed
    semantic_dedup_stream_ingest(spark, b1, cents, store, surv, batch_id=1, **kw)
    import shutil

    shutil.rmtree(f"{store}/ingest_batch=1")
    semantic_dedup_stream_ingest(spark, b1, cents, store, surv, batch_id=1, **kw)

    surv_rows = spark.read.parquet(surv).select("vec_id").collect()
    ids = [r["vec_id"] for r in surv_rows]
    assert len(ids) == len(set(ids)), "retry duplicated survivor rows"
    assert not any(i >= 500 for i in ids)
    store_rows = spark.read.parquet(store).select("vec_id").collect()
    sids = [r["vec_id"] for r in store_rows]
    assert len(sids) == len(set(sids)) == 45


def test_hadoop_ls_lists_store_through_fs_api(spark, tmp_path):
    """Store discovery must go through the Hadoop FileSystem API so
    non-local stores (hdfs://, s3a://) list correctly: verify it sees
    batch-scoped dirs both as a bare posix path and as an explicit
    file:// URI, and returns [] for a missing store."""
    from bo_sql_spark.operators.dedup import _hadoop_ls

    store = tmp_path / "store"
    (store / "ingest_batch=0").mkdir(parents=True)
    (store / "ingest_batch=1").mkdir()
    (store / "_SUCCESS").write_text("")

    for root in (str(store), f"file://{store}"):
        names = sorted(name for name, _ in _hadoop_ls(spark, root))
        assert names == ["_SUCCESS", "ingest_batch=0", "ingest_batch=1"], root
        paths = dict(_hadoop_ls(spark, root))
        # full paths must be readable URIs/paths for spark.read
        assert paths["ingest_batch=1"].endswith("ingest_batch=1")
    assert _hadoop_ls(spark, str(tmp_path / "missing")) == []
