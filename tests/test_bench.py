"""bench.py is a graded artifact: it must print exactly ONE JSON line
with the driver's expected keys, from a clean subprocess."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_single_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
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
