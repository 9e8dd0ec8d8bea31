"""Scale-adaptive minimum map parallelism for CPU-heavy per-row stages.

The round-14-opt measurement found every fixture table is ONE parquet
file with ONE row group, so every scan-side map stage — the md5/shingle
explodes feeding MinHash/SimHash/KMV, the winnowing HOF chain, the
Arrow matmul stages, the 64-wide decimal sums — ran as a SINGLE task on
``local[32]``: the "input skew: one huge unsplittable file" case of the
optimization guide (§2.5, "repartition immediately after the read").

``spread_scan`` fixes that without hurting the 100 TB shape: it adds a
hash-repartition ONLY when the input's planned partition count is below
the session's default parallelism. At production scale a corpus scan
already has >= cores splits and the function is an exact no-op (no
exchange in the plan); on the single-file fixture it costs one tiny
shuffle (the whole file is < one split by construction of the branch)
and buys every core for the expensive map that follows.

Deliberately NOT applied to cheap scan->aggregate paths (core tier):
there the map is parquet decode + a codegen aggregate, the decode
cannot be parallelized below one row group anyway, and the added
exchange is pure cost. Apply it where per-row CPU (hashing, HOF/Arrow
evaluation, wide decimal aggregation) dominates the stage.
"""

from __future__ import annotations

import contextlib
import os
import threading

from pyspark.sql import DataFrame

_tls = threading.local()


@contextlib.contextmanager
def no_spread():
    """Disable ``spread_scan`` for plans built inside this block (driver
    -side, thread-local). Used by paths where the per-row map is cheap
    relative to the added exchange — measured per-site this round: the
    streaming semantic ingest (many small per-microbatch actions; the
    repartition multiplied per-action constants, bench pairs 2.3-2.5x
    slower with spread)."""
    prev = getattr(_tls, "off", False)
    _tls.off = True
    try:
        yield
    finally:
        _tls.off = prev


def spread_scan(df: DataFrame, *key_cols: str, target: int | None = None) -> DataFrame:
    """Hash-repartition ``df`` to the session's default parallelism when
    (and only when) its planned partition count is lower — the
    unsplittable-tiny-input case. ``key_cols`` should be a stable,
    high-cardinality key (the doc/vec id); keyless calls fall back to
    round-robin (deterministic under retries via Spark's
    sort-before-repartition default, SPARK-23207).
    """
    # measurement kill switch (A/B tooling) and cluster escape hatch
    if os.environ.get("BOSQL_SPREAD_DISABLE") == "1":
        return df
    if getattr(_tls, "off", False):  # no_spread() scope
        return df
    sess = df.sparkSession
    if target is None:
        target = sess.sparkContext.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: exotic plans
        return df
    if nparts >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)


def lineage_cut(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=False)`` behind a measurement kill
    switch (BOSQL_CKPT_DISABLE=1 returns ``df`` unchanged) — the
    multi-consumer lineage cut the operators apply when one expensive
    subtree feeds several joins/aggregates (the "one-consumer rule":
    without the cut Spark re-executes the subtree once per consumer;
    the round-14 minhash plan showed 16 parquet scans for one query).
    Lazy: the checkpoint RDD materializes inside the first consuming
    job, adding no extra action."""
    if os.environ.get("BOSQL_CKPT_DISABLE") == "1":
        return df
    return df.localCheckpoint(eager=False)
