"""bench.py is a graded artifact: it must print exactly ONE JSON line
with the driver's expected keys, from a clean subprocess."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_single_json_line(tmp_path):
    # Redirect the side artifact: without this the test's sf0.001 run
    # CLOBBERS the committed BENCH_SPREAD.json (which should hold the
    # graded sf0.1 run) every time the suite runs.
    spread_out = str(tmp_path / "BENCH_SPREAD.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        BOSQL_BENCH_SPREAD_OUT=spread_out,
        # r15: the test asserts the stdout TRANSPORT CONTRACT (one JSON
        # line, key set, byte budget, spread side artifact), not timing
        # quality — skip the warm pass and run ONE timed rep per query,
        # which cuts the subprocess from ~10 min to ~3 min on the
        # weather-degraded host that blew the round-14 driver's pytest
        # ceiling. The driver never sets these knobs, so graded bench
        # runs keep the full warm + best-of-N methodology.
        BOSQL_BENCH_WARM="0",
        BOSQL_BENCH_TIMED_REPS="1",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        # Ceiling catches hangs, not pace: the 1-rep unwarmed sf0.001
        # run measured ~3 min where the full methodology took ~10.
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected one line, got: {lines}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload["queries"]) >= {
        "scan_project",
        "agg_pricing_summary",
        "composite_top_regions",
    }
    # value is the CORE tier total (comparable across rounds); pipeline
    # and streaming tiers are separate keys
    assert set(payload["tiers"]) == {"core", "pipeline", "streaming"}
    assert abs(payload["tiers"]["core"] - payload["value"]) < 0.01
    assert payload["tiers"]["pipeline"] > 0
    assert abs(sum(payload["queries"].values()) - sum(payload["tiers"].values())) < 0.05

    # STDOUT TRANSPORT CONTRACT (round-12): the driver tail-captures the
    # last ~2000 bytes of stdout; the round-11 spread dict pushed the line
    # past that window and BENCH_r11.json recorded parsed:null. Lock it:
    # the line stays under budget, spread is NOT on the line, and the
    # exact round-10 key set is present (so the head — "value" — survives
    # even if the window ever shrinks a little).
    assert len(lines[0].encode()) <= 1900, (
        f"bench stdout line is {len(lines[0].encode())} bytes — exceeds the "
        "1900-byte budget under the driver's ~2000-byte tail-capture window; "
        "move any new payload to BENCH_SPREAD.json"
    )
    assert "spread" not in payload
    assert set(payload) == {
        "metric", "value", "unit", "queries", "tiers", "tiers_frozen",
        "streaming_rows_per_sec", "anchor_s", "sf",
    }
    # the frozen tier is a SUBSET wall: <= the growing tier, same keys
    assert set(payload["tiers_frozen"]) == set(payload["tiers"])
    for k in payload["tiers"]:
        assert payload["tiers_frozen"][k] <= payload["tiers"][k] + 1e-9
    # the full payload incl. spread lands in the side artifact
    with open(spread_out) as fh:
        side = json.load(fh)
    assert set(side["spread"]) == set(payload["queries"])
    for q, (lo, med, hi) in side["spread"].items():
        assert lo <= med <= hi
        # stdout reports min at 3dp (line-budget headroom); the side
        # artifact keeps 4dp — equal within the rounding step
        assert abs(lo - payload["queries"][q]) <= 0.0005 + 1e-9


def test_frozen_pipeline_names_all_registered():
    """FROZEN_PIPELINE is the like-for-like cross-round wall: a name
    missing from the registry (retired/renamed) would silently shrink
    the pinned tier (ADVICE r13) — bench.py warns at run time, and
    this pins it statically."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    from bo_sql_spark.queries import load_all

    reg = load_all()
    missing = [n for n in bench.FROZEN_PIPELINE if n not in reg]
    assert not missing, f"FROZEN_PIPELINE names not in the registry: {missing}"
