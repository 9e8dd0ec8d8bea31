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
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _hashable(dtype: DataType) -> bool:
    """xxhash64 rejects MapType (unordered => no stable hash), at any
    nesting depth; everything else hashes."""
    if isinstance(dtype, MapType):
        return False
    if isinstance(dtype, StructType):
        return all(_hashable(f.dataType) for f in dtype.fields)
    if isinstance(dtype, ArrayType):
        return _hashable(dtype.elementType)
    return True


def with_salt(
    df: DataFrame,
    salt_buckets: int,
    col_name: str = "_salt",
    salt_cols: list[str] | None = None,
    position_salt: bool = False,
) -> DataFrame:
    """Deterministic salt in [0, salt_buckets): xxhash64 over the row's
    own columns (all hashable ones by default, or ``salt_cols``).

    Derived from DATA, not from position: monotonically_increasing_id /
    rand() are nondeterministic under task retries, and Spark's
    nondeterministic-expression + stage-retry interaction can duplicate
    or drop rows on recompute. A content hash gives every retry the
    same salt. MapType columns are excluded from the default set
    (xxhash64 rejects them — no stable hash for unordered maps); pass
    ``salt_cols`` naming a high-cardinality id column when you know one.

    Rows that are FULL duplicates share a content salt, so a hot key
    made of identical rows stays un-spread. For that shape, set
    ``position_salt=True``: the salt hashes monotonically_increasing_id
    (partition id + within-partition row index). Positional salts are
    retry-stable ONLY directly above a deterministic file scan (stable
    partition layout and row order); do NOT use above a shuffle, where
    reducer input order may differ between task attempts.
    """
    if position_salt:
        src: list[Column] = [F.monotonically_increasing_id()]
    else:
        if salt_cols is not None:
            cols = salt_cols
        else:
            cols = [f.name for f in df.schema.fields if _hashable(f.dataType)]
            if not cols:
                raise ValueError(
                    "no hashable columns to salt on; pass salt_cols or "
                    "position_salt=True"
                )
        src = [F.col(c) for c in cols]
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*src), F.lit(salt_buckets))
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
