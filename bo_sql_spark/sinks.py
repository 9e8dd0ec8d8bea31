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
    are preserved in the rewrite, so pruning keeps working). The swap
    is write-to-side-dir + rename: readers never see a half-compacted
    table; concurrent writers must be quiesced (real lakehouses take a
    table lock or use snapshot commits — out of scope here, noted).
    """
    import os
    import shutil

    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files_before = sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_out = max(1, -(-n_rows // max(1, int(target_rows_per_file))))
    tmp = path.rstrip("/") + ".compacting"
    writer = (
        df.repartition(n_out).write.mode("overwrite")
    )
    if partition_by:
        # rebin within partitions, keep the directory layout
        writer = (
            df.repartition(n_out, *partition_by)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
        )
    writer.parquet(tmp)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_files_after = sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    return n_files_before, n_files_after
