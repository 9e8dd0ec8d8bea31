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
