"""Hadoop FileSystem helpers: path ops that work on ANY Spark-visible
filesystem (file://, hdfs://, s3a://), not just the driver's local
posix FS.

Why this exists: ``os.listdir``/``os.rename``/``shutil.rmtree`` on a
table path silently see nothing (or crash) when the path is a remote
URI — the table lives wherever the cluster's default FS is, which at
100 TB is never the driver's local disk. Every maintenance op in this
package (SemDeDup store listing, compaction swaps, catalog existence
checks) routes through these instead. The JVM Hadoop FileSystem is
resolved FROM the path itself, so mixed-scheme usage (a file:// test
against an s3a:// prod table) needs no configuration.

No reference counterpart (the reference is a single-process CSV engine,
src/cli/main.cpp:104-172); this is the operational layer a distributed
engine needs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def ls(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """(name, full_path) for each direct child of ``path``. Missing
    path => empty list, same as an empty store."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    return [
        (st.getPath().getName(), st.getPath().toString())
        for st in fs.listStatus(hpath)
    ]


def count_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Recursive count of data files under ``path`` (listing-only; at
    a million files this is the same RPC cost any reader's file index
    pays, which is exactly what compaction exists to shrink)."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return 0
    it = fs.listFiles(hpath, True)  # recursive RemoteIterator
    n = 0
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(suffix):
            n += 1
    return n


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """fs.rename with failure surfaced (Hadoop returns False, not an
    exception, on e.g. existing destination). NOTE: atomic on HDFS and
    posix; on S3 object stores a directory 'rename' is a COPY+DELETE —
    callers doing swap-style commits must treat it as non-atomic there
    (a manifest/snapshot commit is the real answer; see compact_table)."""
    fs, hsrc = _fs_and_path(spark, src)
    hdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(hsrc, hdst):
        raise IOError(f"rename failed: {src} -> {dst}")


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.delete(hpath, recursive))


def create_atomic(spark: SparkSession, path: str, payload: str = "") -> bool:
    """Create ``path`` with ``overwrite=False``; True if THIS caller
    created it, False if it already existed — the create-if-absent
    primitive a compare-and-swap commit needs. Atomicity is the
    filesystem's: HDFS create(overwrite=false) is atomic (one namenode
    op); S3A needs conditional writes (If-None-Match, supported by
    recent Hadoop S3A via fs.s3a.create.conditional) — without them
    two racing S3 writers can both 'win', which is why Delta needs
    DynamoDB LogStore there; the local FS is check-then-act but
    single-machine tests don't race past the GIL in practice. Parent
    dirs are created implicitly (Hadoop semantics)."""
    fs, hpath = _fs_and_path(spark, path)
    try:
        out = fs.create(hpath, False)
    except Exception as ex:  # FileAlreadyExistsException and kin
        if "Exists" in type(ex).__name__ or "exists" in str(ex).lower():
            return False
        raise
    try:
        out.write(bytearray(payload.encode("ascii")))
    finally:
        out.close()
    return True


def mtime_ms(spark: SparkSession, path: str) -> int:
    """Modification time of ``path`` in epoch milliseconds (0 if the
    path is missing) — what stale-orphan retention decisions key on."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return 0
    return int(fs.getFileStatus(hpath).getModificationTime())
