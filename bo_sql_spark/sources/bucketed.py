"""Bucketed tables: pre-shuffled storage for co-located joins.

The 100 TB answer to 'this fact-fact join shuffles both sides every
query': persist both tables bucketed by the join key
(``bucketBy(n, key).sortBy(key)``); Spark then plans the join with NO
Exchange on either side — the shuffle was paid once at write time.
Also accelerates groupBy on the bucket key.

Requires saveAsTable (bucket metadata lives in the metastore); plain
``.parquet(path)`` writes cannot carry bucket info.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_left: str,
    key_right: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — planner elides both Exchanges."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right], how)
