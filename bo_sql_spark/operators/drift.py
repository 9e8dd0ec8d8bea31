"""Distribution-drift detection between two corpus samples.

Beyond-reference monitoring surface (SURVEY §2.3): the check a
continuously-ingested training corpus runs per snapshot — has the
category mix (source, language, event type, quality bucket) shifted
between two samples? Pearson's two-sample chi-square statistic per
category, in INTEGER fixed-point so the oracle replays every
contribution bit-for-bit (memory: oracle-determinism doctrine).

Math, integer-exact: for category c with counts a, b and sample
totals N_a, N_b (N = N_a + N_b), the classic contribution
(a - E_a)^2 / E_a with E_a = (a+b) * N_a / N rewrites as

    d = a * N - (a + b) * N_a            -- integer, sign irrelevant
    contrib_a = d^2 / (N * (a+b) * N_a)  -- all-positive denominator

so contrib_micros = (d * d * 10^6) DIV (N * (a+b) * N_a), computed in
DECIMAL(38,0) / HUGEINT because d^2 reaches ~N^4 (overflows int64 at
~60k rows). The statistic is the sum over categories of both sides'
contributions; the caller compares it to a chi-square critical value
(df = categories - 1) OFF-engine — thresholds need the inverse CDF,
which is float territory and deliberately out of the exact core.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def two_sample_chisq(
    df: DataFrame, category_col: str, in_b: Column
) -> DataFrame:
    """Per-category drift between rows where ``in_b`` is false (sample
    A) and true (sample B). One counting groupBy + a broadcast 1-row
    totals join — nothing else shuffles at any corpus size. Emits
    (category, n_a, n_b, chisq_micros) with chisq_micros = 10^6 x the
    category's summed A+B contribution; categories absent from one
    sample contribute via their zero side exactly like the textbook
    formula (guarded: a zero denominator -- category count or sample
    total of 0 -- contributes 0)."""
    counts = (
        df.select(F.col(category_col).alias("category"), in_b.alias("_b"))
        .groupBy("category")
        .agg(
            F.sum(F.when(~F.col("_b"), 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(F.col("_b"), 1).otherwise(0)).cast("long").alias("n_b"),
        )
    )
    totals = counts.agg(
        F.sum("n_a").cast("long").alias("_ta"),
        F.sum("n_b").cast("long").alias("_tb"),
    )

    def contrib(n_side: str, tot_side: str) -> str:
        # (d*d*10^6) DIV (N * (a+b) * N_side) in DECIMAL(38,0);
        # d = n_side*N - (n_a+n_b)*N_side
        return (
            f"CAST(CASE WHEN (n_a + n_b) = 0 OR {tot_side} = 0 THEN 0 "
            f"ELSE CAST(({n_side} * (_ta + _tb) - (n_a + n_b) * {tot_side})"
            f" AS DECIMAL(38,0))"
            f" * ({n_side} * (_ta + _tb) - (n_a + n_b) * {tot_side})"
            f" * 1000000"
            f" DIV (CAST((_ta + _tb) AS DECIMAL(38,0)) * (n_a + n_b)"
            f" * {tot_side}) END AS BIGINT)"
        )

    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "category",
            "n_a",
            "n_b",
            (F.expr(contrib("n_a", "_ta")) + F.expr(contrib("n_b", "_tb")))
            .cast("long")
            .alias("chisq_micros"),
        )
        .orderBy("category")
    )
