"""Winnow parameter sweep: recall vs shuffle across (W, L).

The round-8 locality measurement (tools_span_recall.py) pinned the
guarantee for the shipped defaults (L=40, W=16). This tool sweeps the
DIAL: for each winnow width W (and two span lengths L), it measures

- fingerprint DENSITY on the real sf0.01 documents corpus —
  selected fingerprints / total windows. Density is the shuffle cost:
  after the winnow map, only (id, pos, h) triples for selected
  positions ever shuffle, so shuffle bytes scale linearly with it.
  Expected 2/(W+1) for random text (Schleimer et al. §4).
- DETECTION RATE on planted shared spans at lengths bracketing the
  guarantee point W+L-1: the midpoint of the alignment-luck zone
  [L, W+L-1), the last unguaranteed length W+L-2, and the guarantee
  itself. Detection at the guarantee must be 100% for EVERY (W, L) —
  that is the theorem, swept rather than spot-checked.

Together these are the S-curve ledger equivalent for span dedup
(ROADMAP round-9 candidate #1): pick W from a target minimum
detectable span (W = S_min - L + 1), read the shuffle multiplier off
the density column. Lower W => shorter guaranteed spans at more
shuffle; W=4 guarantees 43-char spans at ~5.5x the W=16 shuffle.

Usage: python tools_span_sweep.py  (~4 min; prints the two tables)
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

W_SWEEP = [4, 8, 16, 32, 64]
L_SWEEP = [20, 40]
PAIRS_PER_LEN = 40
DOC_LEN = 400
SF_DIR = "/root/testdata/sf0.01"


def planted_docs(spark, rng, L: int, W: int):
    """Random doc pairs sharing one planted span per pair, at the
    three lengths that bracket the (W, L) guarantee point."""
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def rand_text(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    lengths = sorted({L + W // 2, W + L - 2, W + L - 1})
    rows, pairs = [], {s: [] for s in lengths}
    next_id = 0
    for s_len in lengths:
        for _ in range(PAIRS_PER_LEN):
            span = rand_text(s_len)
            a, b = next_id, next_id + 1
            next_id += 2
            for doc_id in (a, b):
                body = rand_text(DOC_LEN)
                at = rng.randint(0, DOC_LEN - 1)
                rows.append((doc_id, body[:at] + span + body[at:]))
            pairs[s_len].append((a, b))
    return spark.createDataFrame(rows, "doc_id long, text string"), pairs


def main() -> None:
    from bo_sql_spark.operators.dedup import winnow_fingerprints

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    print(f"corpus: sf0.01 documents ({corpus.count()} rows); "
          f"{PAIRS_PER_LEN} planted pairs per span length")
    print()
    print("| L | W | guarantee S>= | density (measured) | 2/(W+1) "
          "(expected) | shuffle vs W=16 | det @ mid-zone | det @ "
          "guarantee-1 | det @ guarantee |")
    print("|---|---|---|---|---|---|---|---|---|")

    rows_out = []
    for L in L_SWEEP:
        for W in W_SWEEP:
            t0 = time.time()
            fp = winnow_fingerprints(corpus, span_len=L, winnow_w=W)
            # n_windows repeats per fingerprint row; one value per doc
            nw = fp.groupBy("doc_id").agg(
                F.first("n_windows").alias("nw"),
                F.count(F.lit(1)).alias("k"),
            ).groupBy().agg(
                F.sum("nw").alias("n_win"), F.sum("k").alias("n_fp")
            ).collect()[0]
            density = nw["n_fp"] / nw["n_win"]
            wall = time.time() - t0

            rng = random.Random(1000 * L + W)
            docs, pairs = planted_docs(spark, rng, L, W)
            sel = winnow_fingerprints(docs, span_len=L, winnow_w=W).collect()
            sets: dict[int, set] = {}
            for r in sel:
                sets.setdefault(r["doc_id"], set()).add(r["h"])
            det = {}
            for s_len, ps in pairs.items():
                det[s_len] = sum(
                    1 for a, b in ps
                    if sets.get(a, set()) & sets.get(b, set())
                ) / len(ps)
            g = W + L - 1
            rows_out.append((L, W, g, density, det))
            assert det[g] == 1.0, (
                f"guarantee violated at L={L} W={W}: {det[g]:.0%}"
            )
            sys.stderr.write(f"done L={L} W={W} ({wall:.1f}s)\n")

    base = {L: d for (L, W, g, d, det) in rows_out if W == 16}
    for L, W, g, density, det in rows_out:
        print(
            f"| {L} | {W} | {g} | {density:.4f} | {2 / (W + 1):.4f} "
            f"| {density / base[L]:.2f}x | {det[L + W // 2]:.0%} "
            f"| {det[g - 1]:.0%} | {det[g]:.0%} |"
        )

    print()
    print("Every (W, L) row detects 100% at its own guarantee point "
          "W+L-1 — the theorem holds across the sweep, not just at "
          "the shipped defaults.")


if __name__ == "__main__":
    main()
