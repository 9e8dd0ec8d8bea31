"""Mergeable equi-depth quantile sketch — percentiles over 100 TB
without a global sort.

The reference engine exposes only exact aggregates (no quantile sketch
exists in bo-sql; see SURVEY.md §2.3 "approx aggs" for the
beyond-reference surface this belongs to). Spark's built-in
``percentile_approx`` answers one query over one scan; what it cannot
do is leave behind a reusable, *mergeable* artifact. This module does:

- ``build_sketch`` reduces each (group, shard) to <= ``buckets``
  centroid rows ``(s=SUM(value), w=COUNT)`` covering near-equal row
  counts — an equi-depth histogram, i.e. a t-digest with the uniform
  (k0) scale function.
- ``merge_sketches`` combines any number of sketches into one per
  coarser group with pure integer arithmetic — associative, so daily
  sketches roll up to months, shards to days, clusters to fleets.
- ``sketch_quantiles`` evaluates quantiles by midpoint-rank linear
  interpolation between adjacent centroid means (the standard t-digest
  estimator).

Scale design: the only full-data pass is the build's one
partition-by-group sort; everything after runs on O(groups x buckets)
rows. A group too large to sort in one task is pre-sharded (any
deterministic shard key) and merged — mergeability IS the scale
mechanism, not a bigger sort. Error is bounded by bucket span:
~W/(2*buckets) in rank terms.

Determinism contract (what makes the sketch oracle-checkable on any
SQL engine): ``value_col`` must be integral (cents/micros) so sums are
exact and order-independent; ``tie_cols`` must complete a total order
so ntile assignment is engine-independent; every division is either
integer div or a double division of exact integers. Two engines running
this algorithm produce bit-identical centroids.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def build_sketch(
    df: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    group_cols: Sequence[str],
    buckets: int = 32,
) -> DataFrame:
    """Equi-depth centroid sketch: <= ``buckets`` rows per group of
    (group_cols..., _b, s, w).

    One shuffle (hash by group), one in-partition sort for the ntile
    window. ``_b`` (the bucket ordinal) is kept as the deterministic
    tie-breaker downstream merges need.
    """
    w = Window.partitionBy(*group_cols).orderBy(value_col, *tie_cols)
    return (
        df.withColumn("_b", F.ntile(buckets).over(w))
        .groupBy(*group_cols, "_b")
        .agg(F.sum(value_col).alias("s"), F.count(F.lit(1)).alias("w"))
    )


def _ordered(sk: DataFrame, group_cols: Sequence[str], tie_cols: Sequence[str]):
    """Centroids ordered by mean within group, with running and total
    weight. Explicit ROWS frame: with a total order RANGE==ROWS, but
    spelling it keeps any engine's default-frame choice out of the
    contract."""
    mean = F.col("s").cast("double") / F.col("w")
    order = [mean.asc()] + [F.col(c).asc() for c in tie_cols]
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    return (
        sk.withColumn("_cumw", F.sum("w").over(w_run))
        .withColumn("_tw", F.sum("w").over(w_all))
        .withColumn("_mid2", F.lit(2) * F.col("_cumw") - F.col("w"))
    )


def merge_sketches(
    sk: DataFrame,
    group_cols: Sequence[str],
    tie_cols: Sequence[str],
    buckets: int = 32,
) -> DataFrame:
    """Merge sketches to one per ``group_cols``: order all source
    centroids by mean, re-bucket by integer midpoint-rank arithmetic
    (``_mid2 * buckets div 2*total``), sum within new buckets.

    Runs on O(sources x buckets) rows — merging a year of daily
    sketches moves ~365*buckets tiny rows, never data. ``tie_cols``
    are whatever distinguishes source rows (e.g. ``["day", "_b"]``).
    Output carries ``_b`` so merges compose.
    """
    return (
        _ordered(sk, group_cols, tie_cols)
        .withColumn(
            "_b",
            F.expr(f"(_mid2 * {buckets}) div (2 * _tw)"),
        )
        .groupBy(*group_cols, "_b")
        .agg(F.sum("s").alias("s"), F.sum("w").alias("w"))
    )


def sketch_quantiles(
    sk: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    tie_cols: Sequence[str] = ("_b",),
) -> DataFrame:
    """Evaluate quantiles from a sketch: (group_cols..., q, est).

    Midpoint-rank interpolation: centroid i covers rank midpoint
    ``mid2/2``; a target rank ``q*total`` between two midpoints
    interpolates linearly between their means; targets outside the
    first/last midpoint clamp to that centroid's mean. Exactly one
    centroid row survives per (group, q).
    """
    mean = F.col("s").cast("double") / F.col("w")
    order = [mean.asc()] + [F.col(c).asc() for c in tie_cols]
    w_lead = Window.partitionBy(*group_cols).orderBy(*order)
    c = (
        _ordered(sk, group_cols, tie_cols)
        .withColumn("_mean", mean)
        .withColumn("_rn", F.row_number().over(w_lead))
        .withColumn("_next_mean", F.lead("_mean").over(w_lead))
        .withColumn("_next_mid2", F.lead("_mid2").over(w_lead))
    )
    qdf = c.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).withColumn("_t2", F.col("q") * 2 * F.col("_tw"))
    below_first = (F.col("_rn") == 1) & (F.col("_t2") < F.col("_mid2"))
    bracket = (F.col("_mid2") <= F.col("_t2")) & (
        F.col("_next_mid2").isNull() | (F.col("_t2") < F.col("_next_mid2"))
    )
    est = (
        F.when(below_first | F.col("_next_mid2").isNull(), F.col("_mean"))
        .otherwise(
            F.col("_mean")
            + (F.col("_t2") - F.col("_mid2"))
            / (F.col("_next_mid2") - F.col("_mid2"))
            * (F.col("_next_mean") - F.col("_mean"))
        )
    )
    return qdf.filter(below_first | bracket).select(
        *group_cols, "q", est.alias("est")
    )


def weighted_percentile_exact(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    qs_permille: Sequence[int],
) -> DataFrame:
    """EXACT weighted lower percentile per group: for each q (in
    permille), the smallest value whose cumulative weight reaches
    ceil(q * W / 1000) — the weighted-median/percentile definition
    (type-1 / lower quantile generalized to weights).

    The sketch functions above trade exactness for mergeability; this
    is the exact complement for when the question itself is weighted —
    'the token-weighted p90 document length' treats a 10k-token doc as
    10k observations, which the unweighted percentile (and Spark's
    percentile/approx_percentile, which weight rows equally) cannot
    express without exploding rows by weight.

    Shape: one groupBy to VALUE grain (weights summed per distinct
    value — also what makes the cumulative window tie-free), one
    cumulative-sum window partitioned by group over that value-domain
    aggregate (the drift_emd/ordinal-support precedent: rows = value
    domain, not events), and a broadcast (group x qs) threshold join.
    All-integer (caller passes integral value/weight encodings, e.g.
    cents), so both engines replay every threshold and pick exactly.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    gcols = list(group_cols)
    vg = df.groupBy(*gcols, value_col).agg(
        F.sum(F.col(weight_col).cast("long")).cast("long").alias("_w")
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vg.withColumn("_cw", F.sum("_w").over(w).cast("long"))
    tot = vg.groupBy(*gcols).agg(F.sum("_w").cast("long").alias("_tw"))
    qs = (
        df.sparkSession.createDataFrame(
            [(int(q),) for q in qs_permille], "q_permille long"
        )
    )
    thr = tot.crossJoin(F.broadcast(qs)).withColumn(
        "_thr", F.expr("(q_permille * _tw + 999) DIV 1000").cast("long")
    )
    return (
        cum.join(F.broadcast(thr), gcols)
        .filter(F.col("_cw") >= F.col("_thr"))
        .groupBy(*gcols, "q_permille")
        .agg(F.min(value_col).alias("value"))
    )
