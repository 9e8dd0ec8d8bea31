"""Write path (sinks): distributed table output.

The reference's only outputs are driver-side formatters (markdown/CSV
to stdout, reference src/exec/formatter.cpp) — no table write path at
all (SURVEY §2.2). At 100 TB results are written BY THE EXECUTORS,
partitioned, never through the driver:

- parquet: the default interchange sink (columnar, stats, splittable)
- partitioned parquet: directory-partitioned by low-cardinality keys ->
  downstream partition pruning
- csv: interchange with non-columnar consumers
- bucketed tables: see sources/bucketed.py (pre-shuffled storage)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Distributed parquet write; optionally directory-partitioned.

    ``partition_by`` keys should be low-cardinality (date, category):
    each distinct combination becomes a directory, and downstream
    readers prune on them without touching data. max_records_per_file
    caps output file size (small-file problems are the other failure
    mode — coalesce upstream if the write produces confetti).
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """Distributed CSV write (RFC quoting via escape='\"')."""
    df.write.mode(mode).option("header", str(header).lower()).option(
        "escape", '"'
    ).csv(path)


def compact_table(
    spark,
    path: str,
    target_rows_per_file: int,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Compact a small-file parquet table in place: read, re-bin to
    ~``target_rows_per_file`` rows per output file, atomically swap.
    Returns (files_before, files_after).

    The small-file problem is the silent tax of streaming/incremental
    sinks at scale: every microbatch appends a few files, and a year
    later the table is a million 100 KB files — each one a listing
    call, a footer fetch, and a task. Compaction is the maintenance
    op every lakehouse runs (OPTIMIZE / rewriteDataFiles): one
    distributed read + one write sized by data volume, not by history.

    Partitioned tables compact WITHIN partitions (partition columns
    are preserved in the rewrite, so pruning keeps working) and re-bin
    INSIDE each hive partition: a per-partition bin key sized from the
    partition's row count spreads a large partition over
    ceil(rows/target) tasks — repartitioning on the partition columns
    alone would funnel every row of a partition value into ONE task
    (single giant file + task skew, the opposite of re-binning).

    All listing/swap I/O goes through the Hadoop FileSystem API
    (fsutil), so file://, hdfs:// and s3a:// tables all work — not
    just the driver's local disk. The swap is write-to-side-dir +
    rename: atomic on HDFS/posix, but on S3 a directory rename is a
    COPY+DELETE, so there readers can observe the gap — a production
    lakehouse commits a manifest/snapshot pointer instead (Iceberg/
    Delta style); this two-rename swap is the HDFS-honest version.
    Concurrent writers must be quiesced either way. A crash between
    the two renames leaves the data intact at ``<path>.old`` plus the
    full rewrite at ``<path>.compacting`` (recovery = rename either
    back); nothing is deleted until both renames have succeeded.
    """
    import pyspark.sql.functions as F

    from bo_sql_spark import fsutil

    df = spark.read.parquet(path)
    target = max(1, int(target_rows_per_file))
    n_files_before = fsutil.count_files(spark, path)
    tmp = path.rstrip("/") + ".compacting"
    if partition_by:
        # rebin within partitions: per-partition bin count from the
        # partition's own row count (tiny aggregate, broadcast back)
        counts = df.groupBy(*partition_by).agg(
            F.ceil(F.count(F.lit(1)) / target).cast("int").alias("_n_bins")
        )
        binned = (
            df.join(F.broadcast(counts), partition_by)
            .withColumn(
                "_bin",
                F.pmod(
                    F.xxhash64(F.monotonically_increasing_id()),
                    F.greatest(F.lit(1), F.col("_n_bins")),
                ),
            )
        )
        writer = (
            binned.repartition(*(list(partition_by) + ["_bin"]))
            .drop("_bin", "_n_bins")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", target)
            .partitionBy(*partition_by)
        )
    else:
        n_rows = df.count()
        n_out = max(1, -(-n_rows // target))
        writer = df.repartition(n_out).write.mode("overwrite")
    writer.parquet(tmp)
    old = path.rstrip("/") + ".old"
    fsutil.rename(spark, path, old)
    fsutil.rename(spark, tmp, path)
    fsutil.delete(spark, old)
    n_files_after = fsutil.count_files(spark, path)
    return n_files_before, n_files_after
