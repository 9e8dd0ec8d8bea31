#!/usr/bin/env python3
"""Cross-round bench comparison with automatic weather-vs-signal
classification (SCALE.md round-11 "reading rule", automated; anchor
abstain + N-run medians added round 13 after the r12 drift review
showed two same-code runs 15 minutes apart producing 18 false
"signal" flags with anchors 2.5x apart).

Usage:
  python tools_bench_compare.py OLD.json NEW.json
  python tools_bench_compare.py OLD1.json,OLD2.json,OLD3.json NEW1.json,NEW2.json

Each side accepts a comma-separated list of bench payloads from
REPEATED RUNS of the same code; per-query times are the across-run
MEDIANS and the across-run [min, median, max] becomes the noise band
(overriding any single-run spread) — the only honest way to band a
box whose between-run weather exceeds its within-run spread.

DECISION RULE, in order:
1. ABSTAIN (anchor gate): if both sides carry ``anchor_s`` (a pure-JVM
   CPU probe) and they differ by more than 1.3x, the host was in
   materially different weather between the two measurements — NOTHING
   is classified; every row reads "abstain (anchor-gated)". Re-run one
   side, or pass N-run medians per side. (The anchor is still never
   used as a correction FACTOR — measured r11: it tracks CPU only and
   under-corrects I/O-dominated walls — it gates, it does not scale.)
2. Fleet-normalize: divide each new time by the MEDIAN per-query ratio
   (a code regression is LOCALIZED; an environment shift is UNIFORM).
3. Band test: with spread on both sides (from BENCH_SPREAD.json or
   N-run inputs), a delta is SIGNAL only if the fleet-relative delta
   exceeds BOTH rounds' bands AND the relative ratio is outside
   [0.9, 1.11]; otherwise WEATHER.
4. No-band fallback (pre-r11 files / driver BENCH_r{N} stdout
   payloads): relative-ratio-only with a wider 1.25x / 0.8x gate,
   tagged "(no-band)".

Exit code 0 always — this is a report, not a gate; the plan-shape
lint is the regression gate.
"""

from __future__ import annotations

import json
import re
import statistics
import sys

ANCHOR_ABSTAIN_RATIO = 1.3


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


def load_side(spec: str) -> dict:
    """One side of the comparison: a single payload, or a
    comma-separated list of payloads from repeated same-code runs —
    merged to per-query MEDIANS with the across-run [min, med, max]
    as the spread and the median anchor."""
    paths = [p for p in spec.split(",") if p]
    runs = [load_bench(p) for p in paths]
    if len(runs) == 1:
        return runs[0]
    qnames = set(runs[0]["queries"])
    for r in runs[1:]:
        qnames &= set(r["queries"])
    queries, spread = {}, {}
    for q in qnames:
        ts = sorted(r["queries"][q] for r in runs)
        queries[q] = statistics.median(ts)
        spread[q] = [ts[0], statistics.median(ts), ts[-1]]
    anchors = [r["anchor_s"] for r in runs if r.get("anchor_s")]
    frozen_runs = [r["tiers_frozen"] for r in runs if r.get("tiers_frozen")]
    tiers_frozen = None
    if frozen_runs:
        tiers_frozen = {
            t: statistics.median(fr[t] for fr in frozen_runs if t in fr)
            for t in frozen_runs[0]
            if t != "missing"
        }
    return {
        "queries": queries,
        "spread": spread,
        "anchor_s": statistics.median(anchors) if anchors else None,
        "tiers_frozen": tiers_frozen,
        "n_runs": len(runs),
    }


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load_side(sys.argv[1]), load_side(sys.argv[2])
    a_old, a_new = old.get("anchor_s"), new.get("anchor_s")
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    raw_ratios = sorted(
        new["queries"][q] / old["queries"][q] for q in shared if old["queries"][q]
    )
    fleet = raw_ratios[len(raw_ratios) // 2] if raw_ratios else 1.0

    abstain = False
    if a_old and a_new:
        a_ratio = max(a_old, a_new) / min(a_old, a_new)
        abstain = a_ratio > ANCHOR_ABSTAIN_RATIO
        print(
            f"anchors old {a_old}s / new {a_new}s (x{a_ratio:.2f})"
            + (
                f" — EXCEEDS {ANCHOR_ABSTAIN_RATIO}x: host weather differs"
                " materially between the runs; ABSTAINING from all"
                " classification. Re-run one side, or pass N-run medians"
                " (comma-separated files) per side."
                if abstain
                else " — within the abstain gate"
            )
        )
    print(
        f"fleet shift (median raw ratio over {len(shared)} shared queries):"
        f" x{fleet:.3f} — deltas below are RELATIVE to it"
    )
    # frozen-membership tier walls: the like-for-like cross-round read
    # (raw, NOT fleet-normalized — the tier IS the aggregate signal;
    # anchor-abstain still applies).
    tf_old, tf_new = old.get("tiers_frozen"), new.get("tiers_frozen")
    if tf_old and tf_new:
        for t in sorted(set(tf_old) & set(tf_new)):
            if t == "missing":
                continue  # single-run payloads may carry the marker list
            if tf_old[t]:
                tag = "abstain (anchor-gated)" if abstain else ""
                print(
                    f"tiers_frozen.{t}: {tf_old[t]:.3f}s ->"
                    f" {tf_new[t]:.3f}s (x{tf_new[t] / tf_old[t]:.2f}) {tag}"
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
        if abstain:
            rows.append(
                (q, t_old, t_adj, "abstain (anchor-gated)", f"x{ratio:.2f}")
            )
            continue
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
        f"{sum(1 for r in rows if r[3].startswith('abstain'))} abstained, "
        f"{sum(1 for r in rows if r[3] == 'NEW')} new"
    )


if __name__ == "__main__":
    main()
