#!/usr/bin/env python3
"""Cross-round bench comparison with automatic weather-vs-signal
classification (SCALE.md round-11 "reading rule", automated).

Usage: python tools_bench_compare.py OLD_BENCH.json NEW_BENCH.json

Per query:
- normalize by the MEDIAN per-query ratio (the fleet shift): a code
  regression is LOCALIZED while an environment shift is UNIFORM, so
  the robust baseline for "did this query regress" is how it moved
  relative to the whole suite — the round-9 worktree-A/B archaeology,
  codified. The pure-JVM ``anchor_s`` is reported for context but
  measured round-11: it tracks CPU speed only and under-corrects
  walls dominated by I/O/shuffle (this box: anchor 0.85x, walls
  uniformly ~1.25x), so it is NOT used as the correction factor;
- when both files carry ``spread`` ([min, median, max] per query), the
  per-round noise band is median - min; a delta is SIGNAL only if the
  fleet-relative delta exceeds BOTH rounds' bands AND the relative
  ratio is outside [0.9, 1.11] — otherwise WEATHER;
- when either side lacks spread (pre-r11 files, and driver BENCH_r{N}
  artifacts from r12 on — the spread dict was moved OFF the stdout
  contract line after it overflowed the driver's tail-capture window
  and killed BENCH_r11's parse), fall back to the relative-ratio-only
  rule with a wider 1.25x / 0.8x gate and tag the verdict "(no-band)".
  For band-aware comparisons pass BENCH_SPREAD.json files (bench.py
  writes one per run; point BOSQL_BENCH_SPREAD_OUT at distinct paths
  for worktree A/B runs) — they carry the full payload plus spread.

Exit code 0 always — this is a report, not a gate; the plan-shape
lint is the regression gate.
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        return d
    if "tail" in d:
        m = re.search(r"\{\"metric.*", d["tail"])
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"{path}: no queries payload found")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load_bench(sys.argv[1]), load_bench(sys.argv[2])
    a_old, a_new = old.get("anchor_s"), new.get("anchor_s")
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    raw_ratios = sorted(
        new["queries"][q] / old["queries"][q] for q in shared if old["queries"][q]
    )
    fleet = raw_ratios[len(raw_ratios) // 2] if raw_ratios else 1.0
    print(
        f"fleet shift (median raw ratio over {len(shared)} shared queries):"
        f" x{fleet:.3f} — deltas below are RELATIVE to it"
        + (
            f"; anchors old {a_old}s / new {a_new}s (context only)"
            if a_old and a_new
            else ""
        )
    )
    so, sn = old.get("spread") or {}, new.get("spread") or {}
    rows = []
    for q, t_new in sorted(new["queries"].items()):
        t_old = old["queries"].get(q)
        if t_old is None:
            rows.append((q, None, t_new, "NEW", ""))
            continue
        t_adj = t_new / fleet
        ratio = t_adj / t_old if t_old else float("inf")
        if q in so and q in sn:
            band = max(so[q][1] - so[q][0], (sn[q][1] - sn[q][0]) / fleet)
            is_signal = abs(t_adj - t_old) > band and not (0.9 <= ratio <= 1.11)
            verdict = (
                ("REGRESSION" if ratio > 1 else "IMPROVED")
                if is_signal
                else "weather"
            )
            note = f"band={band:.3f}s"
        else:
            verdict = (
                "REGRESSION (no-band)"
                if ratio > 1.25
                else "IMPROVED (no-band)"
                if ratio < 0.8
                else "weather (no-band)"
            )
            note = ""
        rows.append((q, t_old, t_adj, verdict, f"x{ratio:.2f} {note}"))
    width = max(len(q) for q, *_ in rows)
    n_sig = 0
    for q, t_old, t_adj, verdict, note in rows:
        if verdict.startswith(("REGRESSION", "IMPROVED")):
            n_sig += 1
        o = f"{t_old:7.3f}" if t_old is not None else "      -"
        print(f"{q:{width}s} {o} -> {t_adj:7.3f}  {verdict:22s} {note}")
    print(
        f"\n{n_sig} signal deltas, "
        f"{sum(1 for r in rows if r[3].startswith('weather'))} weather, "
        f"{sum(1 for r in rows if r[3] == 'NEW')} new"
    )


if __name__ == "__main__":
    main()
