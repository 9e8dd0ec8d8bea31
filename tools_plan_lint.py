"""Registry-wide plan lint: build every registered query's physical
plan at sf0.001 and flag anti-patterns:

- CartesianProduct
- row-at-a-time PythonUDF (BatchEvalPython)
- no-partition WindowExec over a NON-AGGREGATED input: Spark moves the
  window's entire input to ONE task ("WARN WindowExec: No Partition
  Defined"), the classic silent scale-killer — it never shows up in
  local wall-time, which is exactly why it must be lint-caught.
  Whitelisted automatically: global windows whose subtree contains an
  aggregate (HashAggregate/SortAggregate/ObjectHashAggregate) — those
  run over a GROUPED, bounded input (ranking 25 nation rows, sharing
  over ~150 p_type rows, cumulating 32 shard offsets), where a single
  task is the right plan. The heuristic is unit-tested against seeded
  good/bad plans in tests/test_plans.py.

(Global-sort detection is NOT implemented — Sort nodes also appear
inside windows and fused top-ks, so a naive check would be all false
positives.)

The hand-written pins in tests/test_plans.py assert the POSITIVE shape
of ~30 queries; this lint asserts the NEGATIVE space over all of them,
and additionally diffs every query's plan SIGNATURE (exchange / SMJ /
cartesian / Python / global-window counts) against the committed
PLAN_BASELINE.json — an accidental extra shuffle anywhere in the
registry flags without a per-query pin. Refresh intentionally with
`python tools_plan_lint.py --write-baseline` after reviewing IMPROVED/
NEW lines.
Builders with side effects (index materialization, stream drains)
execute during build — that is the same cost the rehearsal pays.

Usage: python tools_plan_lint.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = _pos[0] if _pos else "/root/testdata/sf0.001"

_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
_WINDOW_RE = re.compile(r"(?<![A-Za-z])Window(?:Exec)? \[")


def _depth(line: str) -> int:
    """Column where the node name starts in Spark's tree rendering
    (prefix chars are spaces and the branch glyphs ':', '+', '-')."""
    return len(line) - len(line.lstrip(" :+-"))


def _bracket_groups(text: str) -> list[str]:
    """Top-level [...] group bodies of a Window node's argument list.
    `Window [funcs], [part], [order]` has 3; with an empty partition
    spec the group is omitted: `Window [funcs], [order]` (ordered) or
    `Window [funcs], [part]` (partition-only, frame-spec windows).
    Depth-tracks both [] and () so nested frames / windowspecdefinition
    internals don't split groups."""
    depth = 0
    groups: list[str] = []
    start = -1
    for i, ch in enumerate(text):
        if ch in "[(":
            if ch == "[" and depth == 0:
                start = i + 1
            depth += 1
        elif ch in "])":
            depth -= 1
            if ch == "]" and depth == 0 and start >= 0:
                groups.append(text[start:i])
                start = -1
    return groups


def _is_global(window_text: str) -> bool:
    """True when the Window node has an EMPTY partition spec. 3 groups
    => partitioned. 2 groups => the second is either a partition spec
    (no sort direction tokens — partition-only frame windows like
    min() OVER (PARTITION BY h)) or an order spec (always prints
    ASC/DESC): only the latter is global."""
    groups = _bracket_groups(window_text)
    if len(groups) >= 3:
        return False
    if len(groups) == 2:
        return " ASC" in groups[1] or " DESC" in groups[1]
    return True  # funcs only: no partition, no order


def global_windows(plan: str) -> list[tuple[str, bool]]:
    """(window_line, has_aggregate_below) for every NO-PARTITION Window
    node in a physical plan string. has_aggregate_below=True means the
    window runs over grouped (bounded-cardinality) input and a single
    task is acceptable."""
    lines = plan.splitlines()
    out: list[tuple[str, bool]] = []
    for i, line in enumerate(lines):
        m = _WINDOW_RE.search(line)
        if not m:
            continue
        if not _is_global(line[m.start():]):
            continue  # partitioned
        d = _depth(line)
        agg_below = False
        for nxt in lines[i + 1:]:
            if nxt.strip() and _depth(nxt) <= d:
                break  # left the subtree
            if any(a in nxt for a in _AGG_NODES):
                agg_below = True
                break
        out.append((line.strip(), agg_below))
    return out


def lint_plan(plan: str) -> list[str]:
    """Anti-pattern findings for one physical plan string."""
    found = []
    if "CartesianProduct" in plan:
        found.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        found.append("row-Python (BatchEvalPython)")
    for line, agg_below in global_windows(plan):
        if not agg_below:
            found.append(f"no-partition Window over non-aggregated input: {line[:120]}")
    return found


def plan_signature(plan: str) -> dict[str, int]:
    """Shuffle/join/Python operator counts — the plan-shape regression
    signature diffed against the committed PLAN_BASELINE.json. An
    Exchange or SortMergeJoin appearing where none was before is an
    accidental extra shuffle ANYWHERE in the registry, caught without
    a hand-written pin per query."""
    return {
        "exchanges": plan.count("Exchange "),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "py": plan.count("Python"),
        "global_windows": len(global_windows(plan)),
    }


BASELINE_PATH = "/root/repo/PLAN_BASELINE.json"


def diff_signatures(
    sigs: dict[str, dict[str, int]], base: dict[str, dict[str, int]]
) -> tuple[dict[str, list[str]], list[str]]:
    """(regressions, notes) from comparing current plan signatures to
    the committed baseline: any count growing (except broadcast joins,
    which often replace worse strategies) is a regression; shrinking
    exchange/SMJ counts are improvements to fold into the baseline."""
    flags: dict[str, list[str]] = {}
    notes: list[str] = []
    for name, sig in sigs.items():
        b = base.get(name)
        if b is None:
            notes.append(f"NEW {name}: {sig} (not in baseline)")
            continue
        for k, v in sig.items():
            if v > b.get(k, 0) and k != "bhj":
                flags.setdefault(name, []).append(
                    f"plan regression: {k} {b.get(k, 0)} -> {v}"
                )
        for k in ("exchanges", "smj"):
            if sig[k] < b.get(k, 0):
                notes.append(
                    f"IMPROVED {name}: {k} {b[k]} -> {sig[k]} (refresh baseline)"
                )
    return flags, notes


def main() -> None:
    import json

    from pyspark.sql import SparkSession

    from bo_sql_spark.queries import load_all

    write_baseline = "--write-baseline" in sys.argv

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    flags: dict[str, list[str]] = {}
    whitelisted = 0
    sigs: dict[str, dict[str, int]] = {}
    for name, spec in sorted(load_all().items()):
        try:
            df = spec.builder(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - registration gates
            flags.setdefault(name, []).append(f"BUILD-ERROR {type(exc).__name__}")
            continue
        sigs[name] = plan_signature(plan)
        for f in lint_plan(plan):
            flags.setdefault(name, []).append(f)
        for line, agg_below in global_windows(plan):
            if agg_below:
                whitelisted += 1
                print(f"INFO {name}: post-aggregation global window (bounded): {line[:100]}")
    if write_baseline:
        with open(BASELINE_PATH, "w") as fh:
            json.dump(sigs, fh, indent=1, sort_keys=True)
        print(f"baseline written: {len(sigs)} signatures")
    else:
        try:
            with open(BASELINE_PATH) as fh:
                base = json.load(fh)
        except FileNotFoundError:
            base = {}
            print("NOTE: no PLAN_BASELINE.json — run with --write-baseline")
        reg, notes = diff_signatures(sigs, base)
        for name, fs in reg.items():
            flags.setdefault(name, []).extend(fs)
        for note in notes:
            print(note)
    if flags:
        for name, fs in sorted(flags.items()):
            print(f"FLAG {name}: {', '.join(fs)}")
    print(f"lint done: {len(flags)} flagged ({whitelisted} bounded post-agg global windows whitelisted)")


if __name__ == "__main__":
    main()
