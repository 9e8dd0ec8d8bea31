"""Empirical validation of the winnowing locality guarantee.

Schleimer et al.'s bound: with window length L and winnow width W,
any substring of length >= W + L - 1 shared by two documents yields at
least one SHARED selected fingerprint in both (detection guaranteed);
shorter shared spans may or may not be caught depending on alignment.
For our defaults (L=40, W=16) the guarantee kicks in at 55 chars.

This tool PLANTS shared spans of exact lengths into otherwise-random
document pairs and measures the detection rate per span length for
(a) the winnowed sampler and (b) the exact stride-1 hashing (whose
guarantee starts at L=40):

- below L: undetectable by construction (no full window fits) — both 0
- L <= S < W+L-1: exact = 100%, winnowed = alignment luck
- S >= W+L-1: both 100% (the guarantee, now measured not cited)

Usage: python tools_span_recall.py  (prints the table; ~1 min)
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

L, W = 40, 16
SPAN_LENGTHS = [30, 39, 40, 45, 50, 54, 55, 60, 80, 160]
PAIRS_PER_LEN = 30
DOC_LEN = 400


def main() -> None:
    from bo_sql_spark.operators.dedup import winnow_fingerprints

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def rand_text(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    rows = []
    pair_ids: dict[int, list[tuple[int, int]]] = {}
    next_id = 0
    for s_len in SPAN_LENGTHS:
        pair_ids[s_len] = []
        for _ in range(PAIRS_PER_LEN):
            span = rand_text(s_len)
            a_id, b_id = next_id, next_id + 1
            next_id += 2
            for doc_id in (a_id, b_id):
                body = rand_text(DOC_LEN)
                at = rng.randint(0, DOC_LEN - 1)
                rows.append((doc_id, body[:at] + span + body[at:]))
            pair_ids[s_len].append((a_id, b_id))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # winnowed fingerprints -> per-doc hash sets
    win = winnow_fingerprints(docs, span_len=L, winnow_w=W).collect()
    win_sets: dict[int, set] = {}
    for r in win:
        win_sets.setdefault(r["doc_id"], set()).add(r["h"])

    # exact stride-1 window hashes -> per-doc hash sets
    from bo_sql_spark.functions import normalize_text

    d = docs.select("doc_id", normalize_text(F.col("text")).alias("_norm"))
    nwexpr = f"sequence(1, greatest(length(_norm) - {L} + 1, 1))"
    exact = d.select(
        "doc_id",
        F.explode(
            F.expr(f"transform({nwexpr}, p -> substring(_norm, p, {L}))")
        ).alias("w"),
    ).select("doc_id", F.md5("w").alias("h")).collect()
    ex_sets: dict[int, set] = {}
    for r in exact:
        ex_sets.setdefault(r["doc_id"], set()).add(r["h"])

    print(f"L={L} W={W} guarantee at {W + L - 1} chars; "
          f"{PAIRS_PER_LEN} planted pairs per length")
    print("| span len | exact stride-1 | winnowed 2/(W+1) |")
    print("|---|---|---|")
    for s_len in SPAN_LENGTHS:
        hit_w = hit_e = 0
        for a, b in pair_ids[s_len]:
            if win_sets.get(a, set()) & win_sets.get(b, set()):
                hit_w += 1
            if ex_sets.get(a, set()) & ex_sets.get(b, set()):
                hit_e += 1
        n = PAIRS_PER_LEN
        mark = " <= guarantee" if s_len == W + L - 1 else ""
        print(
            f"| {s_len} | {hit_e}/{n} | {hit_w}/{n} |{mark}"
        )


if __name__ == "__main__":
    main()
