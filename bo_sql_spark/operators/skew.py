"""Skew-mitigation helpers: salted joins and salted aggregation.

At 100 TB, one hot key (the 'null customer', the viral document) can
pin a join or aggregation to a single straggler task. AQE's skew-join
splitting handles sort-merge joins automatically; these helpers cover
the cases AQE can't — hot keys in shuffled-hash aggregations and
broadcast-ineligible skewed joins — via explicit salting:

- salted_agg: two-phase aggregate — key+salt partial, then key final.
  Valid for any algebraic aggregate (sum/count/min/max, and avg via
  sum+count).
- salted_join: replicate the small side SALT ways, scatter the big
  side's hot keys across salts; equi-join on (key, salt). The join
  result is identical to the unsalted join, shuffle is balanced.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(
    df: DataFrame,
    salt_buckets: int,
    col_name: str = "_salt",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic salt in [0, salt_buckets): xxhash64 over the row's
    own columns (all of them by default, or ``salt_cols``).

    Derived from DATA, not from position: monotonically_increasing_id /
    rand() are nondeterministic under task retries, and Spark's
    nondeterministic-expression + stage-retry interaction can duplicate
    or drop rows on recompute. A content hash gives every retry the
    same salt. Rows that are full duplicates share a salt — spread is
    by distinct row content, which is what real fact tables have; pass
    ``salt_cols`` naming a high-cardinality id column when you know one.
    """
    cols = salt_cols if salt_cols is not None else list(df.columns)
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets)),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the big side.

    big gets a random salt per row; small is exploded ``salt_buckets``
    times (one copy per salt). Join on (key, salt) spreads each hot key
    over ``salt_buckets`` tasks. Small side grows by the salt factor —
    use for dimension-sized right sides only.
    """
    b = with_salt(big, salt_buckets)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = b.join(s, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps column -> 'sum'|'count'|'min'|'max'. Phase 1 groups on
    (keys + salt) — the hot key's rows split across tasks; phase 2
    re-aggregates the per-salt partials (count re-aggregates with sum).
    NOTE Spark's own partial aggregation usually makes this unnecessary;
    it matters when partial agg is defeated (high-NDV compound state,
    collect_list-like aggregates, or distinct-aggregation rewrites).
    """
    phase1_cols = [getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in aggs.items()]
    refn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    phase2_cols = [
        getattr(F, refn[fn])(f"__p_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()
    ]
    return (
        with_salt(df, salt_buckets)
        .groupBy(*keys, "_salt")
        .agg(*phase1_cols)
        .groupBy(*keys)
        .agg(*phase2_cols)
    )
