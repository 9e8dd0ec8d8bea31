"""Sink round-trips: distributed writes readable with identical content,
partitioned layout prunable."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from bo_sql_spark.plans import explain_str
from bo_sql_spark.sinks import write_csv, write_parquet


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    out = str(tmp_path / "plain")
    write_parquet(df, out)
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert sorted(back.columns) == ["grp", "id"]


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("grp")
    )
    out = str(tmp_path / "parted")
    write_parquet(df, out, partition_by=["grp"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("grp=")
    ) == ["grp=0", "grp=1", "grp=2"]
    back = spark.read.parquet(out).filter(F.col("grp") == 1)
    text = explain_str(back, "formatted")
    assert "PartitionFilters" in text
    assert back.count() == 33


def test_csv_roundtrip_quoting(spark, tmp_path):
    df = spark.createDataFrame([("a,b", 'q"x', 1)], "s1 string, s2 string, n long")
    out = str(tmp_path / "csv")
    write_csv(df, out)
    back = (
        spark.read.option("header", "true")
        .option("escape", '"')
        .option("inferSchema", "true")
        .csv(out)
    )
    row = back.first()
    assert row["s1"] == "a,b" and row["s2"] == 'q"x' and row["n"] == 1


def test_compact_table_rebins_and_preserves_content(spark, tmp_path):
    """Simulate a streaming sink's confetti (40 tiny appends), compact
    to ~2500-row files, and require: far fewer files, identical row
    multiset, readable through the same path."""
    import pyspark.sql.functions as F

    from bo_sql_spark.sinks import compact_table

    path = str(tmp_path / "confetti")
    for b in range(40):
        spark.range(b * 250, (b + 1) * 250).select(
            "id", (F.col("id") % 7).alias("g")
        ).coalesce(1).write.mode("append").parquet(path)
    before_rows = sorted(r["id"] for r in spark.read.parquet(path).collect())

    nb, na = compact_table(spark, path, target_rows_per_file=2500)
    assert nb >= 40 and na <= 5, (nb, na)
    after = spark.read.parquet(path)
    assert sorted(r["id"] for r in after.collect()) == before_rows


def test_compact_table_file_uri_and_no_posix_calls(spark, tmp_path, monkeypatch):
    """Cluster-FS safety (round-9 verdict): compaction must route ALL
    listing/rename/delete through the Hadoop FileSystem API, so it
    works on any scheme — proven two ways: (a) the whole op runs
    against an explicit file:// URI, (b) posix os.rename/os.walk/
    shutil.rmtree are booby-trapped for the duration (the r8
    implementation used all three)."""
    import os as _os
    import shutil as _shutil

    import pyspark.sql.functions as F

    from bo_sql_spark.sinks import compact_table

    local = str(tmp_path / "uri_table")
    for b in range(8):
        spark.range(b * 100, (b + 1) * 100).coalesce(1).write.mode(
            "append"
        ).parquet(local)

    def _boom(*a, **k):
        raise AssertionError("posix FS call on a table path")

    monkeypatch.setattr(_os, "rename", _boom)
    monkeypatch.setattr(_os, "walk", _boom)
    monkeypatch.setattr(_shutil, "rmtree", _boom)
    nb, na = compact_table(spark, "file://" + local, target_rows_per_file=400)
    assert nb >= 8 and na <= 3, (nb, na)
    assert spark.read.parquet(local).count() == 800


def test_compact_table_partitioned_rebins_large_partition(spark, tmp_path):
    """Skew fix (round-9 advice): a hive partition larger than the
    target must be split across MULTIPLE output files (the r8 version
    repartitioned on the partition columns alone, funneling each
    partition value into one task/one giant file)."""
    import os

    import pyspark.sql.functions as F

    from bo_sql_spark.sinks import compact_table

    path = str(tmp_path / "skewed")
    # g=0 holds 2000 rows, g=1 holds 50: same table, 40x skew
    df = spark.range(0, 2050).select(
        "id", F.when(F.col("id") < 2000, 0).otherwise(1).alias("g")
    )
    df.repartition(10).write.partitionBy("g").parquet(path)
    compact_table(spark, path, target_rows_per_file=250, partition_by=["g"])
    big = [
        f
        for f in os.listdir(os.path.join(path, "g=0"))
        if f.endswith(".parquet")
    ]
    assert len(big) >= 4, big  # 2000 rows / 250 target -> ~8 bins
    back = spark.read.parquet(path)
    assert back.count() == 2050
    assert back.filter(F.col("g") == 0).count() == 2000


def test_compact_table_partitioned_keeps_layout(spark, tmp_path):
    """Partitioned compaction must preserve the hive directory layout
    (pruning keeps working) and the row multiset."""
    import os

    import pyspark.sql.functions as F

    from bo_sql_spark.sinks import compact_table

    path = str(tmp_path / "by_g")
    for b in range(10):
        spark.range(b * 100, (b + 1) * 100).select(
            "id", (F.col("id") % 3).alias("g")
        ).coalesce(1).write.mode("append").partitionBy("g").parquet(path)
    nb, na = compact_table(
        spark, path, target_rows_per_file=500, partition_by=["g"]
    )
    assert na < nb
    dirs = {d for d in os.listdir(path) if d.startswith("g=")}
    assert dirs == {"g=0", "g=1", "g=2"}
    after = spark.read.parquet(path)
    assert after.count() == 1000
    assert after.filter(F.col("g") == 1).count() == 333


def test_snapshot_store_commit_read_timetravel(spark, tmp_path):
    """Manifest-commit store: versions commit via the pointer object
    (written LAST), reads resolve the pointer, old versions remain
    readable (time travel) until vacuumed. Runs through a file:// URI
    with posix calls booby-trapped — the store must be pure Hadoop-FS
    like the rest of the maintenance layer."""
    import os as _os
    import shutil as _shutil

    import pytest

    from bo_sql_spark.sinks import (
        snapshot_read,
        snapshot_vacuum,
        snapshot_version,
        snapshot_write,
    )

    root = "file://" + str(tmp_path / "snap")
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, root)
    assert snapshot_version(spark, root) == 0

    v1 = snapshot_write(spark, spark.range(0, 10), root)
    v2 = snapshot_write(spark, spark.range(0, 25), root)
    assert (v1, v2) == (1, 2)
    assert snapshot_read(spark, root).count() == 25
    assert snapshot_read(spark, root, version=1).count() == 10  # time travel


def test_snapshot_store_crash_and_vacuum(spark, tmp_path):
    """A writer that crashes AFTER writing data but BEFORE the pointer
    update must be invisible to readers; vacuum removes both the
    orphan and versions beyond the retention window."""
    from bo_sql_spark.sinks import (
        snapshot_read,
        snapshot_vacuum,
        snapshot_version,
        snapshot_write,
    )

    root = "file://" + str(tmp_path / "snap2")
    for n in (10, 20, 30):
        snapshot_write(spark, spark.range(0, n), root)
    # simulate a crashed writer: data for v=4 exists, pointer still 3
    spark.range(0, 99).write.parquet(root + "/v=4")
    assert snapshot_version(spark, root) == 3
    assert snapshot_read(spark, root).count() == 30  # orphan invisible

    removed = snapshot_vacuum(spark, root, keep=2)
    assert removed == [1, 4]  # old beyond keep=2, plus the orphan
    assert snapshot_read(spark, root).count() == 30
    assert snapshot_read(spark, root, version=2).count() == 20  # kept


def test_snapshot_compact_is_nonblocking_rebin(spark, tmp_path):
    """snapshot_compact commits the re-binned table as a NEW version
    (old one intact until vacuum): content identical, fewer files."""
    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import (
        snapshot_compact,
        snapshot_read,
        snapshot_write,
    )

    root = "file://" + str(tmp_path / "snapc")
    snapshot_write(spark, spark.range(0, 1000).repartition(20), root)
    files_v1 = fsutil.count_files(spark, root + "/v=1")
    v = snapshot_compact(spark, root, target_rows_per_file=500)
    assert v == 2
    files_v2 = fsutil.count_files(spark, root + "/v=2")
    assert files_v1 >= 20 and files_v2 <= 3, (files_v1, files_v2)
    assert snapshot_read(spark, root).count() == 1000
    assert snapshot_read(spark, root, version=1).count() == 1000  # intact


def test_snapshot_cas_contention_and_read(spark, tmp_path):
    """Two writers racing from the same observed version: the loser's
    claim create fails and it retries at the next number — versions
    never collide, both commits become readable, latest wins."""
    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import (
        _CLAIMS_DIR,
        _marker_path,
        snapshot_read,
        snapshot_version_committed,
        snapshot_write_cas,
    )

    root = str(tmp_path / "cas_tbl")
    v1 = snapshot_write_cas(spark, spark.range(0, 10), root)
    assert v1 == 1
    # simulate a racing writer that already claimed v2 (it holds the
    # claim but hasn't committed): our writer must skip to v3
    assert fsutil.create_atomic(spark, _marker_path(root, _CLAIMS_DIR, 2), "2")
    v3 = snapshot_write_cas(spark, spark.range(0, 25), root)
    assert v3 == 3
    assert snapshot_version_committed(spark, root) == 3
    assert snapshot_read(spark, root).count() == 25
    assert snapshot_read(spark, root, version=1).count() == 10  # time travel


def test_cas_scheme_matrix_s3a_contract(spark, tmp_path):
    """r10-verdict ask: exercise the S3A conditional-PUT CAS leg as a
    CONTRACT test with a Hadoop FileSystem double — a RawLocalFileSystem
    subclass (tests/java/, compiled by conftest when a JDK exists)
    registered under the s3a scheme via fs.s3a.impl: full FileSystem
    API surface over local disk, and _path_scheme keys capability /
    atomicity decisions on the scheme the caller addressed, not the
    double's native URI. Legs:

    - conditional PUT enabled  -> capability ok; commits advance and
      a racing writer's claim marker arbitrates (skip to next v)
    - conditional PUT disabled -> snapshot_write_cas raises LOUDLY at
      store-open; allow_downgrade=True warns and runs the pointer
      protocol instead
    - unknown scheme           -> unverified, raises

    A real-object-store leg is env-gated (BOSQL_S3A_TEST_URL) in
    test_cas_real_object_store_leg."""
    import warnings

    import pytest

    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import (
        _CLAIMS_DIR,
        _marker_path,
        snapshot_read,
        snapshot_version_committed,
        snapshot_write_cas,
    )

    conf = spark._jsc.hadoopConfiguration()
    conf.set("fs.s3a.impl", "bosql.testing.S3ALikeLocalFileSystem")
    conf.set("fs.s3a.impl.disable.cache", "true")
    conf.set("fs.mock.impl", "bosql.testing.S3ALikeLocalFileSystem")
    conf.set("fs.mock.impl.disable.cache", "true")
    conf.set("fs.s3a.create.conditional.enabled", "true")
    try:
        try:
            fsutil.exists(spark, "s3a:" + str(tmp_path / "probe0"))
        except Exception as ex:  # JDK absent -> conftest skipped the build
            pytest.skip(f"FileSystem double unavailable: {str(ex)[:120]}")
        ok, reason = fsutil.cas_create_capability(
            spark, "s3a:" + str(tmp_path / "probe")
        )
        assert ok and "fs.s3a.create.conditional" in reason, (ok, reason)
        root = "s3a:" + str(tmp_path / "cas_s3a")
        assert snapshot_write_cas(spark, spark.range(0, 10), root) == 1
        # claims arbitrate under the scheme: a racing writer's marker
        # exists -> a second creator loses, and our commit skips to v3
        assert fsutil.create_atomic(spark, _marker_path(root, _CLAIMS_DIR, 2), "2")
        assert not fsutil.create_atomic(
            spark, _marker_path(root, _CLAIMS_DIR, 2), "dup"
        )
        assert snapshot_write_cas(spark, spark.range(0, 25), root) == 3
        assert snapshot_version_committed(spark, root) == 3
        assert snapshot_read(spark, root).count() == 25
        # capability ABSENT: loud raise at store-open
        conf.set("fs.s3a.create.conditional.enabled", "false")
        root2 = "s3a:" + str(tmp_path / "cas_s3a_nocond")
        with pytest.raises(RuntimeError, match="cannot arbitrate"):
            snapshot_write_cas(spark, spark.range(3), root2)
        # explicit opt-in: warned downgrade to the pointer protocol
        with warnings.catch_warnings(record=True) as seen:
            warnings.simplefilter("always")
            v = snapshot_write_cas(
                spark, spark.range(3), root2, allow_downgrade=True
            )
        assert v == 1
        assert any("downgrading" in str(w.message) for w in seen)
        assert snapshot_read(spark, root2).count() == 3
        # unknown scheme: atomicity unverified -> raise
        with pytest.raises(RuntimeError, match="cannot arbitrate"):
            snapshot_write_cas(
                spark, spark.range(3), "mock:" + str(tmp_path / "cas_mock")
            )
    finally:
        conf.unset("fs.s3a.impl")
        conf.unset("fs.s3a.impl.disable.cache")
        conf.unset("fs.mock.impl")
        conf.unset("fs.mock.impl.disable.cache")
        conf.unset("fs.s3a.create.conditional.enabled")


def test_cas_real_object_store_leg(spark):
    """Env-gated real-store leg of the scheme matrix: set
    BOSQL_S3A_TEST_URL=s3a://bucket/prefix (with working credentials
    and Hadoop 3.4.1+ conditional-PUT conf) to run two CAS commits
    against the actual object store; skipped with reason otherwise."""
    import os

    import pytest

    url = os.environ.get("BOSQL_S3A_TEST_URL")
    if not url:
        pytest.skip(
            "no real object store available — set "
            "BOSQL_S3A_TEST_URL=s3a://bucket/prefix to exercise this leg"
        )
    from bo_sql_spark.sinks import snapshot_read, snapshot_write_cas

    root = url.rstrip("/") + "/bosql_cas_contract"
    v1 = snapshot_write_cas(spark, spark.range(0, 10), root)
    v2 = snapshot_write_cas(spark, spark.range(0, 25), root)
    assert v2 == v1 + 1
    assert snapshot_read(spark, root).count() == 25


def test_create_atomic_uri_forms_and_utf8_payload(spark, tmp_path):
    """ADVICE regression (fsutil.create_atomic local branch): file:
    URIs are parsed as URIs, never prefix-stripped — 'file:///abs'
    and 'file:/abs' both land at /abs (the old textual strip turned
    authority-form 'file://host/path' into the CWD-RELATIVE path
    'host/path', silently breaking CAS arbitration for that store,
    so authority forms now raise) — and payloads write as utf-8
    (the old ascii encode raised on non-ASCII)."""
    import pytest

    from bo_sql_spark import fsutil

    p = tmp_path / "claims" / "v-1"
    assert fsutil.create_atomic(spark, "file://" + str(p), "café ✓")
    assert p.read_text(encoding="utf-8") == "café ✓"
    # the same file through the other two URI spellings: already exists
    assert not fsutil.create_atomic(spark, "file:" + str(p), "x")
    assert not fsutil.create_atomic(spark, str(p), "x")
    with pytest.raises(ValueError, match="authority-form"):
        fsutil.create_atomic(
            spark, "file://remotehost" + str(tmp_path / "claim"), "x"
        )
    # localhost authority is the documented local alias
    p2 = tmp_path / "claims" / "v-2"
    assert fsutil.create_atomic(spark, "file://localhost" + str(p2), "2")
    assert p2.read_text() == "2"


def test_snapshot_cas_crash_invisible_and_age_gated_vacuum(spark, tmp_path):
    """A claimed-but-uncommitted version is invisible to readers, is
    NOT vacuumed while the claim is fresh (it could be a slow in-flight
    writer), and IS vacuumed once older than the retention age."""
    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import (
        _CLAIMS_DIR,
        _marker_path,
        snapshot_read,
        snapshot_vacuum,
        snapshot_write_cas,
    )

    root = str(tmp_path / "cas_crash")
    snapshot_write_cas(spark, spark.range(0, 10), root)
    # crashed writer: claim + data dir, no commit marker
    assert fsutil.create_atomic(spark, _marker_path(root, _CLAIMS_DIR, 2), "2")
    spark.range(0, 99).write.parquet(str(tmp_path / "cas_crash" / "v=2"))
    assert snapshot_read(spark, root).count() == 10  # orphan invisible
    # fresh claim: protected by the age gate
    assert snapshot_vacuum(spark, root, keep=2, claim_min_age_s=3600) == []
    assert snapshot_read(spark, root).count() == 10
    # stale claim: removed (age 0 => everything uncommitted is stale)
    assert snapshot_vacuum(spark, root, keep=2, claim_min_age_s=0) == [2]
    assert not fsutil.exists(spark, str(tmp_path / "cas_crash" / "v=2"))
    # a new writer reuses the vacuumed number cleanly
    assert snapshot_write_cas(spark, spark.range(0, 7), root) == 2
    assert snapshot_read(spark, root).count() == 7


def test_snapshot_cas_threaded_writers_all_commit(spark, tmp_path):
    """Genuinely concurrent writers (threads sharing the session):
    every write lands as a DISTINCT committed version, nothing is lost,
    and the final read resolves the highest committed version."""
    from concurrent.futures import ThreadPoolExecutor

    from bo_sql_spark.sinks import (
        snapshot_read,
        snapshot_version_committed,
        snapshot_write_cas,
    )

    root = str(tmp_path / "cas_race")

    def writer(i: int) -> int:
        return snapshot_write_cas(spark, spark.range(0, 10 + i), root, max_attempts=64)

    with ThreadPoolExecutor(max_workers=4) as pool:
        versions = sorted(pool.map(writer, range(6)))
    assert versions == [1, 2, 3, 4, 5, 6]  # unique, gapless
    assert snapshot_version_committed(spark, root) == 6
    # each version is intact and readable (immutability under race)
    counts = {v: snapshot_read(spark, root, version=v).count() for v in versions}
    assert sorted(counts.values()) == [10, 11, 12, 13, 14, 15]


def test_snapshot_pointer_and_cas_interoperate(spark, tmp_path):
    """A pointer-protocol write on top of CAS commits (and vice versa)
    never collides: both writers resolve the max across protocols."""
    from bo_sql_spark.sinks import (
        snapshot_read,
        snapshot_write,
        snapshot_write_cas,
    )

    root = str(tmp_path / "mixed")
    assert snapshot_write(spark, spark.range(0, 5), root) == 1
    assert snapshot_write_cas(spark, spark.range(0, 6), root) == 2
    assert snapshot_write(spark, spark.range(0, 7), root) == 3
    assert snapshot_read(spark, root).count() == 7
    assert snapshot_read(spark, root, version=2).count() == 6


def test_jsonl_gzip_export_roundtrip(spark, tmp_path):
    """write_jsonl with compression='gzip' must emit real .gz part
    files that the repo's own loader reads back intact (the export
    path most corpus-exchange tooling expects)."""
    import glob

    from bo_sql_spark.sources import load_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, 'quote " comma,', -3.0), (3, None, 0.0)],
        "id long, s string, v double",
    )
    gz = str(tmp_path / "out_gz.jsonl")
    write_jsonl(df, gz, compression="gzip")
    assert glob.glob(gz + "/*.gz")  # actually compressed
    back = load_jsonl(spark, gz)
    assert sorted(map(tuple, back.select("id", "s", "v").collect())) == sorted(
        map(tuple, df.collect())
    )


def test_snapshot_cas_dataless_claim_vacuumed_and_number_reused(spark, tmp_path):
    """A writer that crashed between CLAIM and data write leaves a
    claim marker with no v= dir: invisible to readers, skipped by new
    writers, age-protected while fresh, and reclaimed by vacuum so
    the version number becomes reusable."""
    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import (
        _CLAIMS_DIR,
        _marker_path,
        snapshot_read,
        snapshot_vacuum,
        snapshot_write_cas,
    )

    root = str(tmp_path / "cas_claimonly")
    snapshot_write_cas(spark, spark.range(0, 10), root)
    assert fsutil.create_atomic(spark, _marker_path(root, _CLAIMS_DIR, 2), "2")
    # new writers skip the claimed-but-dataless number
    assert snapshot_write_cas(spark, spark.range(0, 5), root) == 3
    assert snapshot_read(spark, root).count() == 5
    # fresh claim survives vacuum
    assert snapshot_vacuum(spark, root, keep=5, claim_min_age_s=3600) == []
    assert fsutil.exists(spark, _marker_path(root, _CLAIMS_DIR, 2))
    # stale claim is reclaimed even with no data dir
    assert snapshot_vacuum(spark, root, keep=5, claim_min_age_s=0) == [2]
    assert not fsutil.exists(spark, _marker_path(root, _CLAIMS_DIR, 2))
    # numbering stays monotonic past the committed frontier (max+1,
    # never backfilling a hole behind a committed version) — the
    # reclaimed 2 simply remains a gap, invisible to readers
    assert snapshot_write_cas(spark, spark.range(0, 7), root) == 4
    assert snapshot_read(spark, root).count() == 7


def test_cas_capability_kernel():
    """The pure decision kernel behind the store-open probe: HDFS-family
    atomic, local OK (with the collision fallback), s3a ONLY with the
    conditional-PUT conf enabled, everything else refused."""
    from bo_sql_spark.fsutil import _cas_capability_for

    none = lambda k: None
    assert _cas_capability_for("hdfs", none)[0]
    assert _cas_capability_for("viewfs", none)[0]
    assert _cas_capability_for("file", none)[0]
    assert _cas_capability_for(None, none)[0]  # defaults to local
    ok, reason = _cas_capability_for("s3a", none)
    assert not ok and "conditional" in reason
    assert _cas_capability_for(
        "s3a", {"fs.s3a.create.conditional.enabled": "true"}.get
    )[0]
    assert _cas_capability_for(
        "s3a", {"fs.s3a.create.conditional": "TRUE"}.get
    )[0]
    ok, reason = _cas_capability_for(
        "s3a", {"fs.s3a.create.conditional.enabled": "false"}.get
    )
    assert not ok and "disabled" in reason
    ok, reason = _cas_capability_for("wasb", none)
    assert not ok and "unverified" in reason


def test_cas_refuses_unarbitrable_fs_then_downgrades(spark, tmp_path, monkeypatch):
    """A filesystem the probe rejects makes snapshot_write_cas fail
    LOUDLY at store-open (the round-9 'asserted, not validated' S3 gap);
    allow_downgrade=True instead warns and commits via the single-writer
    pointer protocol."""
    import warnings

    import pytest

    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import snapshot_read, snapshot_version, snapshot_write_cas

    root = str(tmp_path / "cas_refuse")
    monkeypatch.setattr(
        fsutil, "cas_create_capability", lambda s, p: (False, "probe says no")
    )
    with pytest.raises(RuntimeError, match="cannot arbitrate"):
        snapshot_write_cas(spark, spark.range(0, 4), root)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        v = snapshot_write_cas(spark, spark.range(0, 4), root, allow_downgrade=True)
    assert v == 1 and any("downgrading" in str(x.message) for x in w)
    assert snapshot_version(spark, root) == 1  # pointer protocol wrote it
    assert snapshot_read(spark, root).count() == 4


def test_cas_data_dir_collision_is_lost_race(spark, tmp_path, monkeypatch):
    """Simulated check-then-act filesystem: BOTH writers 'win' the same
    claim marker (create_atomic lies for v=2). The second arbiter — the
    errorifexists data directory — must turn the loser's collision into
    a retry at the next number, not a RuntimeError (the ADVICE-flagged
    broken local multi-process CAS)."""
    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import snapshot_read, snapshot_write_cas

    root = str(tmp_path / "cas_collide")
    assert snapshot_write_cas(spark, spark.range(0, 10), root) == 1
    # the "other writer" that also won claim v=2: its claim marker and
    # its data are already on disk, its commit hasn't landed yet
    assert fsutil.create_atomic(spark, root + "/_claims/v-2", "2")
    spark.range(0, 99).write.parquet(root + "/v=2")

    real = fsutil.create_atomic

    def lying_create(s, path, payload=""):
        if path.endswith("_claims/v-2"):
            return True  # non-atomic FS: we ALSO think we won this claim
        return real(s, path, payload)

    monkeypatch.setattr(fsutil, "create_atomic", lying_create)
    v = snapshot_write_cas(spark, spark.range(0, 7), root, max_attempts=8)
    assert v == 3  # collided on v=2's data dir, retried, committed v=3
    assert snapshot_read(spark, root).count() == 7
    assert snapshot_read(spark, root, version=1).count() == 10


def test_cas_commit_after_vacuum_aborts(spark, tmp_path, monkeypatch):
    """A writer stalled past claim_min_age_s whose claim+data were
    vacuumed mid-flight must ABORT instead of publishing a dataless
    commit (the ADVICE-flagged commit-after-vacuum race): the claim
    re-check before the commit marker catches it."""
    import pytest

    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import snapshot_read, snapshot_vacuum, snapshot_write_cas

    root = str(tmp_path / "cas_stall")
    assert snapshot_write_cas(spark, spark.range(0, 10), root) == 1

    real = fsutil.create_atomic
    state = {"vacuumed": False}

    def stalling_create(s, path, payload=""):
        made = real(s, path, payload)
        if made and not state["vacuumed"] and "/_claims/v-2" in path:
            state["vacuumed"] = True  # retention fires while we "stall"
            snapshot_vacuum(spark, root, keep=2, claim_min_age_s=0)
        return made

    monkeypatch.setattr(fsutil, "create_atomic", stalling_create)
    with pytest.raises(RuntimeError, match="vacuumed mid-write"):
        snapshot_write_cas(spark, spark.range(0, 5), root)
    assert snapshot_read(spark, root).count() == 10  # store intact


def test_snapshot_read_skips_dataless_committed_version(spark, tmp_path):
    """Latest-resolution skips a committed marker whose data directory
    is gone (the residual window the writer-side re-check can't close);
    explicit time travel to it still fails loudly."""
    import pytest

    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import snapshot_read, snapshot_write_cas

    root = str(tmp_path / "cas_dataless")
    assert snapshot_write_cas(spark, spark.range(0, 10), root) == 1
    assert snapshot_write_cas(spark, spark.range(0, 20), root) == 2
    # dataless committed version: marker only (vacuum raced the writer)
    assert fsutil.create_atomic(spark, root + "/_claims/v-3", "3")
    assert fsutil.create_atomic(spark, root + "/_commits/v-3", "3")
    assert snapshot_read(spark, root).count() == 20  # skipped v=3
    with pytest.raises(Exception):
        snapshot_read(spark, root, version=3).count()


def test_is_already_exists_exception_concrete_classes():
    """Exists-detection matches the concrete JVM class up the cause
    chain — a plain Python error whose MESSAGE contains 'exists' is NOT
    a lost race (the ADVICE-flagged substring misclassification)."""
    from bo_sql_spark.fsutil import _is_already_exists_exception

    class _JClass:
        def __init__(self, name):
            self._n = name

        def getName(self):
            return self._n

    class _JThrowable:
        def __init__(self, name, cause=None):
            self._c = _JClass(name)
            self._cause = cause

        def getClass(self):
            return self._c

        def getCause(self):
            return self._cause

    class _Py4JError(Exception):
        def __init__(self, je):
            super().__init__("boom")
            self.java_exception = je

    hit = _Py4JError(_JThrowable("org.apache.hadoop.fs.FileAlreadyExistsException"))
    assert _is_already_exists_exception(hit)
    nested = _Py4JError(
        _JThrowable(
            "java.io.IOException",
            cause=_JThrowable("java.nio.file.FileAlreadyExistsException"),
        )
    )
    assert _is_already_exists_exception(nested)
    miss = _Py4JError(_JThrowable("java.io.IOException"))
    assert not _is_already_exists_exception(miss)
    assert not _is_already_exists_exception(ValueError("path already exists"))


def test_vacuum_concurrent_reader_of_retained_version(spark, tmp_path):
    """The retention race (verdict r11 #6): a reader holding an OPEN
    plan on a retained version must survive a vacuum that reclaims
    older versions (version dirs are immutable and vacuum never
    touches retained ones); a reader of the vacuumed version fails
    loudly; and the time horizon retains an out-of-count-window
    version while it is younger than min_age_s."""
    import pyspark.sql.functions as F
    import pytest

    from bo_sql_spark.sinks import (
        snapshot_read,
        snapshot_vacuum,
        snapshot_write_cas,
    )

    root = str(tmp_path / "ret")
    for n in (10, 20, 30):
        df = spark.range(n).select(F.col("id").cast("long").alias("id"))
        snapshot_write_cas(spark, df, root)

    # reader opens v2 BEFORE the vacuum; vacuum reclaims only v1
    reader = snapshot_read(spark, root, version=2)
    removed = snapshot_vacuum(spark, root, keep=2, claim_min_age_s=0)
    assert removed == [1]
    assert reader.count() == 20  # the open plan still reads v2 intact

    # horizon rail: keep=1 would drop v2, but it is younger than T
    assert snapshot_vacuum(
        spark, root, keep=1, claim_min_age_s=0, min_age_s=3600
    ) == []
    assert snapshot_read(spark, root, version=2).count() == 20

    # horizon at 0: v2 goes; its reader now fails loudly
    assert snapshot_vacuum(spark, root, keep=1, claim_min_age_s=0) == [2]
    with pytest.raises(Exception):
        snapshot_read(spark, root, version=2).count()
    # latest keeps resolving
    assert snapshot_read(spark, root).count() == 30
