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
    COPY+DELETE, so there readers can observe the gap — use the
    snapshot store below (snapshot_write: immutable version dirs +
    an atomically-updated pointer) where rename is a copy; this
    two-rename swap is the HDFS-honest in-place version.
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


# ------------------------------------------------- snapshot table store
# The manifest-commit pattern compact_table's docstring points at: on
# object stores a directory rename is a COPY+DELETE, so swap-style
# commits are not atomic there. A snapshot store never renames data:
# each write lands in a fresh immutable version directory and the only
# mutable object is a tiny version pointer, updated last — a
# single-object PUT, atomic on S3/HDFS/posix alike. Readers resolve
# the pointer then read an immutable directory, so a crashed writer
# can never expose a half-written table (its orphan version is
# invisible and vacuumable). This is the (heavily simplified) core of
# the Iceberg/Delta commit protocol; what it deliberately omits is
# multi-writer conflict arbitration — single-writer-at-a-time remains
# the caller's contract, now crash-SAFE rather than crash-atomic-ish.

_VERSION_FILE = "_VERSION"


def _pointer_path(root: str) -> str:
    return root.rstrip("/") + "/" + _VERSION_FILE


def snapshot_version(spark, root: str) -> int:
    """Current committed version of a snapshot table (0 = none)."""
    from bo_sql_spark import fsutil

    fs, hpath = fsutil._fs_and_path(spark, _pointer_path(root))
    if not fs.exists(hpath):
        return 0
    stream = fs.open(hpath)
    try:
        vals = []
        while len(vals) < 20:
            b = stream.read()  # one byte; -1 at EOF
            if b < 0:
                break
            vals.append(b)
    finally:
        stream.close()
    text = bytes(vals).decode("ascii", "ignore").strip()
    return int(text) if text.isdigit() else 0


def snapshot_write(spark, df: DataFrame, root: str) -> int:
    """Commit ``df`` as the table's next version; returns the version.

    Write order is the whole protocol: (1) data to the immutable
    ``v=<n>`` directory, (2) the version pointer LAST (create a temp
    pointer object, then a same-FS rename — a single-file rename,
    atomic on HDFS/posix; on S3 the temp+rename degenerates to a
    copy of a <20-byte object followed by the pointer PUT, and the
    PUT itself is atomic, so readers still see old-or-new, never
    half). A crash before (2) leaves an orphan version directory that
    ``snapshot_vacuum`` removes."""
    from bo_sql_spark import fsutil

    v = snapshot_version(spark, root) + 1
    data_dir = root.rstrip("/") + f"/v={v}"
    df.write.mode("errorifexists").parquet(data_dir)
    tmp = _pointer_path(root) + f".tmp-{v}"
    fs, hpath = fsutil._fs_and_path(spark, tmp)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(str(v).encode("ascii")))
    finally:
        out.close()
    ptr = _pointer_path(root)
    fs.delete(spark._jvm.org.apache.hadoop.fs.Path(ptr), False)
    fsutil.rename(spark, tmp, ptr)
    return v


def snapshot_read(spark, root: str, version: int | None = None) -> DataFrame:
    """Read a committed snapshot (latest by default). Time travel is
    free: every version directory is immutable until vacuumed."""
    v = version if version is not None else snapshot_version(spark, root)
    if v <= 0:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    return spark.read.parquet(root.rstrip("/") + f"/v={v}")


def snapshot_vacuum(spark, root: str, keep: int = 2) -> list[int]:
    """Delete version directories older than the newest ``keep``
    committed ones, PLUS any orphans newer than the pointer (crashed
    writers). Returns the versions removed. Never touches the pointer
    or the kept versions, so concurrent readers of retained versions
    are safe; readers of a vacuumed version fail loudly (the
    time-travel retention trade every lakehouse documents)."""
    from bo_sql_spark import fsutil

    cur = snapshot_version(spark, root)
    removed = []
    for name, full in fsutil.ls(spark, root):
        if not name.startswith("v="):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        if v > cur or v <= cur - int(keep):
            fsutil.delete(spark, full)
            removed.append(v)
    return sorted(removed)


def snapshot_compact(spark, root: str, target_rows_per_file: int) -> int:
    """Compact the LATEST snapshot into a fresh version: read, re-bin,
    commit. Unlike compact_table's in-place swap this never blocks or
    breaks readers — they keep resolving the old version until the
    pointer flips, which is the operational payoff of the snapshot
    protocol (run it any time; vacuum reclaims the fat versions
    later). Returns the new version number."""
    df = snapshot_read(spark, root)
    target = max(1, int(target_rows_per_file))
    n_rows = df.count()
    n_out = max(1, -(-n_rows // target))
    return snapshot_write(spark, df.repartition(n_out), root)
