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


def snapshot_write(
    spark, df: DataFrame, root: str, partition_by: list[str] | None = None
) -> int:
    """Commit ``df`` as the table's next version; returns the version.

    Write order is the whole protocol: (1) data to the immutable
    ``v=<n>`` directory, (2) the version pointer LAST (create a temp
    pointer object, then a same-FS rename — a single-file rename,
    atomic on HDFS/posix; on S3 the temp+rename degenerates to a
    copy of a <20-byte object followed by the pointer PUT, and the
    PUT itself is atomic, so readers still see old-or-new, never
    half). A crash before (2) leaves an orphan version directory that
    ``snapshot_vacuum`` removes.

    ``partition_by`` lays each version out hive-partitioned, so
    readers filtering on those columns get PARTITION PRUNING inside
    the version dir — what lets a versioned SERVING index (IVF cells,
    term buckets) keep its pruned-scan economics across CAS swaps."""
    from bo_sql_spark import fsutil

    v = _resolve_version(spark, root) + 1  # respects CAS commits too
    data_dir = root.rstrip("/") + f"/v={v}"
    w = df.write.mode("errorifexists")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(data_dir)
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
    free: every version directory is immutable until vacuumed. Resolves
    the latest version across BOTH commit protocols (single-writer
    pointer and multi-writer CAS log), so a table can migrate between
    them without a rewrite. Latest-resolution SKIPS committed versions
    whose data directory is missing — the residue of a writer stalled
    past vacuum's claim age that published after its data was reclaimed
    (snapshot_write_cas aborts on that race, but the abort check and
    the marker create aren't one atomic op; the reader-side skip closes
    the window). An explicitly requested version still fails loudly if
    vacuumed — the documented time-travel retention trade."""
    from bo_sql_spark import fsutil

    if version is not None:
        if version <= 0:
            raise FileNotFoundError(f"no committed snapshot under {root}")
        return spark.read.parquet(root.rstrip("/") + f"/v={version}")
    candidates = _marker_versions(spark, root, _COMMITS_DIR)
    candidates.add(snapshot_version(spark, root))
    for v in sorted(candidates, reverse=True):
        if v <= 0:
            break
        data_dir = root.rstrip("/") + f"/v={v}"
        if fsutil.exists(spark, data_dir):
            return spark.read.parquet(data_dir)
    raise FileNotFoundError(f"no committed snapshot under {root}")


def snapshot_vacuum(
    spark,
    root: str,
    keep: int = 2,
    claim_min_age_s: int = 86400,
    min_age_s: float = 0.0,
) -> list[int]:
    """Delete version directories older than the newest ``keep``
    committed ones, PLUS crashed-writer orphans. Returns the versions
    removed. Never touches the pointer, the commit log's committed
    entries, or the kept versions, so concurrent readers of retained
    versions are safe; readers of a vacuumed version fail loudly (the
    time-travel retention trade every lakehouse documents).

    ``min_age_s`` is the TIME-HORIZON retention rail (Delta's VACUUM
    retention period): a committed version outside the keep window is
    still retained while its commit is younger than ``min_age_s`` —
    the policy is "keep the last N versions AND everything newer than
    T". The horizon is what protects in-flight READERS of a
    just-superseded version on an append-heavy store (a decision log
    compacting every few minutes would otherwise vacuum a version a
    long-running backfill is still scanning); the default 0 keeps the
    pure count-based behavior for tests and manual runs. Age is the
    commit marker's mtime where one exists (CAS protocol), else the
    data directory's.

    Orphan arbitration differs by protocol: a pointer-protocol orphan
    (data dir newer than the pointer, NO claim marker) can only be a
    crashed single writer — removed immediately, as before. A
    CAS-protocol orphan (claim marker without a commit marker) might
    be a SLOW IN-FLIGHT writer, not a crashed one — deleting its data
    mid-write would let its later commit publish a hole — so claimed-
    but-uncommitted versions are removed only when the claim is older
    than ``claim_min_age_s`` (Iceberg/Delta's orphan-retention rule;
    tests pass 0)."""
    import time

    from bo_sql_spark import fsutil

    cur = _resolve_version(spark, root)
    committed = _marker_versions(spark, root, _COMMITS_DIR)
    claims = _marker_versions(spark, root, _CLAIMS_DIR)
    now_ms = time.time() * 1000.0
    removed = []
    for name, full in fsutil.ls(spark, root):
        if not name.startswith("v="):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        # committed = published by either protocol: in the CAS commit
        # log, or (pointer protocol, no log entry) at-or-below the ptr
        is_committed = v in committed or (v not in claims and v <= cur)
        if is_committed:
            if v > cur - int(keep):
                continue  # retained by count
            if min_age_s > 0:
                marker = _marker_path(root, _COMMITS_DIR, v)
                stamp = marker if fsutil.exists(spark, marker) else full
                if (now_ms - fsutil.mtime_ms(spark, stamp)) / 1000.0 < min_age_s:
                    continue  # retained by the time horizon
        elif v in claims:
            age_s = (
                now_ms - fsutil.mtime_ms(spark, _marker_path(root, _CLAIMS_DIR, v))
            ) / 1000.0
            if age_s < claim_min_age_s:
                continue  # possibly a slow in-flight writer — leave it
        # else: pointer-protocol crashed writer (v > cur, unclaimed)
        fsutil.delete(spark, full)
        fsutil.delete(spark, _marker_path(root, _CLAIMS_DIR, v))
        fsutil.delete(spark, _marker_path(root, _COMMITS_DIR, v))
        removed.append(v)
    # a writer that crashed BETWEEN claim and data write leaves a
    # claim marker with no v= dir — invisible to the loop above (it
    # iterates data dirs), so it would leak forever and permanently
    # skip that version number. Same age gate applies.
    data_vs = {
        int(name[2:])
        for name, _ in fsutil.ls(spark, root)
        if name.startswith("v=") and name[2:].isdigit()
    }
    for v in sorted(claims):
        if v in committed or v in data_vs or v in removed:
            continue
        age_s = (
            now_ms - fsutil.mtime_ms(spark, _marker_path(root, _CLAIMS_DIR, v))
        ) / 1000.0
        if age_s >= claim_min_age_s:
            fsutil.delete(spark, _marker_path(root, _CLAIMS_DIR, v))
            removed.append(v)
    return sorted(removed)


# ------------------------------------------- multi-writer arbitration
# The one thing the pointer protocol above deliberately omits. CAS
# commit: version numbers are RESERVED by atomically creating a claim
# marker (create-if-absent — the filesystem is the arbiter), data lands
# in the claimed immutable v=<n> dir, and the version is PUBLISHED by
# creating a commit marker. Latest = max committed marker, so a
# crashed writer (claim, maybe data, no commit) is invisible exactly
# like a crashed pointer writer, and two concurrent writers can never
# write the same version directory — the loser's create fails and it
# retries at the next number. This is the simplified shape of the
# Iceberg/Delta optimistic-concurrency commit (their claim object is
# the numbered metadata/log file itself); like theirs it needs
# create-if-absent to actually be atomic (HDFS yes; S3 via conditional
# PUT — fsutil.create_atomic documents the caveat).

_CLAIMS_DIR = "_claims"
_COMMITS_DIR = "_commits"


def _marker_path(root: str, kind: str, v: int) -> str:
    return root.rstrip("/") + f"/{kind}/v-{int(v)}"


def _marker_versions(spark, root: str, kind: str) -> set[int]:
    from bo_sql_spark import fsutil

    out = set()
    for name, _ in fsutil.ls(spark, root.rstrip("/") + "/" + kind):
        if name.startswith("v-"):
            try:
                out.add(int(name[2:]))
            except ValueError:
                pass
    return out


def snapshot_version_committed(spark, root: str) -> int:
    """Latest CAS-committed version (0 if the commit log is empty)."""
    return max(_marker_versions(spark, root, _COMMITS_DIR), default=0)


def _resolve_version(spark, root: str) -> int:
    """Latest committed version across both protocols: the pointer
    (single-writer) and the commit log (CAS multi-writer)."""
    return max(snapshot_version(spark, root), snapshot_version_committed(spark, root))


def _is_path_exists_write_error(ex: Exception) -> bool:
    """True iff a DataFrame errorifexists write failed BECAUSE the
    target path already existed (Spark's PATH_ALREADY_EXISTS error
    condition), matched structurally — not by message substring."""
    cond = None
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(ex, attr, None)
        if fn is not None:
            try:
                cond = fn()
                break
            except Exception:
                pass
    return cond == "PATH_ALREADY_EXISTS" or "[PATH_ALREADY_EXISTS]" in str(ex)


def snapshot_write_cas(
    spark,
    df: DataFrame,
    root: str,
    max_attempts: int = 16,
    allow_downgrade: bool = False,
    partition_by: list[str] | None = None,
) -> int:
    """Commit ``df`` as the next version under MULTI-writer contention;
    returns the committed version.

    Guards, in order:
    - Store-open capability probe (fsutil.cas_create_capability): a
      filesystem whose create-if-absent cannot arbitrate writers (s3a
      without conditional PUT, unknown schemes) RAISES — or, with
      ``allow_downgrade=True``, warns and falls back to the pointer
      protocol (single-writer semantics, caller's responsibility).
    - Protocol per attempt: propose v = (max claimed-or-committed) + 1
      and atomically create the claim marker; lost the marker race →
      re-observe, retry at the new next number (bounded by
      ``max_attempts`` — contention this protocol is wrong for, e.g.
      dozens of writers per second, should use a real transaction log
      service).
    - The data write itself runs errorifexists, and a PATH_ALREADY_
      EXISTS failure is treated as a LOST RACE, not an error: on a
      check-then-act filesystem (the local FS) two writers can both
      'win' the same claim marker, and the immutable data directory is
      the second arbiter — the loser retries at the next number.
    - Before publishing, the writer re-checks its claim marker still
      exists: a writer stalled past ``snapshot_vacuum``'s
      claim_min_age_s may have had its claim AND data reclaimed, and
      publishing a commit marker for vacuumed data would break every
      reader of latest (the commit-after-vacuum race). Such a writer
      aborts loudly; snapshot_read additionally skips committed
      versions whose data is missing, closing the residual window
      between this check and the marker create.

    Readers resolve max(commit log with data present) so they see
    old-until-published, never partial."""
    import warnings

    from bo_sql_spark import fsutil

    ok, reason = fsutil.cas_create_capability(spark, root)
    if not ok:
        if allow_downgrade:
            warnings.warn(
                f"snapshot_write_cas: downgrading to single-writer pointer "
                f"protocol under {root}: {reason}",
                stacklevel=2,
            )
            return snapshot_write(spark, df, root, partition_by=partition_by)
        raise RuntimeError(
            f"snapshot_write_cas: filesystem cannot arbitrate concurrent "
            f"writers under {root}: {reason} (pass allow_downgrade=True to "
            f"fall back to the single-writer pointer protocol)"
        )
    for _ in range(int(max_attempts)):
        observed = max(
            max(_marker_versions(spark, root, _CLAIMS_DIR), default=0),
            _resolve_version(spark, root),
        )
        v = observed + 1
        if not fsutil.create_atomic(spark, _marker_path(root, _CLAIMS_DIR, v), str(v)):
            continue  # lost the claim-marker race
        data_dir = root.rstrip("/") + f"/v={v}"
        try:
            w = df.write.mode("errorifexists")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(data_dir)
        except Exception as ex:
            if _is_path_exists_write_error(ex):
                # check-then-act FS: another writer also won this claim
                # and beat us to the data dir — their claim now, ours is
                # the loss; retry at the next number (never delete the
                # shared claim marker: the winner owns it).
                continue
            raise
        if not fsutil.exists(spark, _marker_path(root, _CLAIMS_DIR, v)):
            raise RuntimeError(
                f"snapshot_write_cas: claim for v={v} was vacuumed mid-write "
                f"(writer stalled past claim_min_age_s); aborting instead of "
                f"publishing a dataless commit under {root}"
            )
        if not fsutil.create_atomic(spark, _marker_path(root, _COMMITS_DIR, v), str(v)):
            raise RuntimeError(f"commit marker for claimed v={v} already exists")
        return v
    raise RuntimeError(
        f"snapshot_write_cas: lost the claim race {max_attempts} times under {root}"
    )


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
