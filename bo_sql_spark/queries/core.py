"""Core reference-parity queries (SURVEY.md §2.1 — the entire reference surface).

Each query exercises one of the reference's seven physical operators
(reference src/exec/operator.cpp) re-expressed as a declarative Spark
plan; Catalyst supplies the pruning/pushdown the reference lacks
(reference src/logical/planner.cpp:29-58 implements only scan pruning).

Scale notes are inline per query: every plan here is shuffle-minimal —
dimension joins broadcast, aggregations are partial+final map-side
combined, top-k is TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bo_sql_spark.catalog import load_tables
from bo_sql_spark.queries import register


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


def _fixed_point(col, scale: int):
    """Exact fixed-point (cents/micros) as LONG: floor(x*scale + 0.5).

    Identical to round-half-up for the non-negative money/rate columns
    this schema carries, but stays pure codegen arithmetic — Spark's
    ``round()`` on DoubleType routes every row through a BigDecimal
    setScale (allocation in the aggregate hot loop; measured ~35% of
    agg_pricing_summary's runtime at sf0.1). Oracles use the same
    ``FLOOR(x * scale + 0.5)`` formula so both engines round the same
    doubles through the same function. NOT for signed values: floor
    rounds -0.5 toward -inf while HALF_UP rounds away from zero.
    """
    return F.floor(col * scale + F.lit(0.5))


# --------------------------------------------------------------------------
# Operator 1+3: ColumnarScan + Project (reference operator.cpp:321-386,435-559)
# --------------------------------------------------------------------------
@register(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity * 2 + 1 AS qty_expr
    FROM lineitem
    """,
    doc="Column-pruned scan + expression project. Catalyst pushes the "
    "4-column ReadSchema into the parquet scan; the reference does the "
    "same pruning by hand (planner.cpp:29-58).",
    tags=("core", "scan", "project"),
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") * 2 + 1).alias("qty_expr"),
    )


# --------------------------------------------------------------------------
# Operator 2: Selection / filter (reference operator.cpp:388-433)
# --------------------------------------------------------------------------
@register(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30 AND l_returnflag = 'R') OR l_discount < 0.02
    """,
    doc="WHERE with AND/OR + comparisons. Pushed to the parquet scan as "
    "PushedFilters; the reference evaluates row-at-a-time above the scan "
    "(operator.cpp:410-416).",
    tags=("core", "filter"),
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"]
    pred = ((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R")) | (
        F.col("l_discount") < 0.02
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


# --------------------------------------------------------------------------
# Operator 5: HashAggregate (reference operator.cpp:860-1074) — TPC-H Q1 shape
# --------------------------------------------------------------------------
@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                        AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                                                                  AS sum_base_price_cents,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                                                                  AS sum_disc_price_cents,
           ROUND(AVG(l_quantity), 4)                              AS avg_qty,
           CAST(ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                      / COUNT(*), 0) AS BIGINT)                   AS avg_price_cents,
           CAST(ROUND(CAST(SUM(CAST(FLOOR(l_discount * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                      / COUNT(*), 0) AS BIGINT)                   AS avg_disc_micros,
           COUNT(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Grouped SUM/COUNT/AVG (the reference's complete aggregate set, "
    "planner.cpp:96). Spark runs partial+final hash agg: map-side combine "
    "shrinks the shuffle to |groups|*|partitions| rows — at 100 TB the "
    "shuffle is KB-sized because there are only ~6 groups. Money/rate "
    "aggregates are integer cents/micros (fixed-point per ROW, sum "
    "longs): exact and summation-order-independent, so the value hash "
    "can never flake on float merge order (ROADMAP #8); avg_qty stays "
    "double because integer-valued doubles sum exactly at any order. "
    "Fixed-point uses floor(x+0.5), not round() — see _fixed_point.",
    tags=("core", "aggregate"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"]
    price_cents = _fixed_point(F.col("l_extendedprice"), 100)
    disc_price_cents = _fixed_point(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 100
    )
    disc_micros = _fixed_point(F.col("l_discount"), 1_000_000)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(price_cents).alias("sum_base_price_cents"),
            F.sum(disc_price_cents).alias("sum_disc_price_cents"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum(price_cents).cast("double") / n, 0)
            .cast("long")
            .alias("avg_price_cents"),
            F.round(F.sum(disc_micros).cast("double") / n, 0)
            .cast("long")
            .alias("avg_disc_micros"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Operator 4: HashJoin inner-equi (reference operator.cpp:622-858)
# --------------------------------------------------------------------------
@register(
    "join_orders_customer",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000
    """,
    doc="Inner equi-join fact->dim. customer is small relative to orders "
    "at every SF, so Catalyst broadcasts it (BroadcastHashJoin): zero "
    "shuffle of the orders side. The reference always fully materializes "
    "the build side in one thread (operator.cpp:739-762).",
    tags=("core", "join"),
)
def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_totalprice") > 100000)
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Operators 6+7: OrderBy + Limit => top-k (reference operator.cpp:1076-1161,561-620)
# --------------------------------------------------------------------------
@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="ORDER BY + LIMIT fuses into TakeOrderedAndProject: each partition "
    "keeps a 10-row heap, the driver merges — no global sort, no shuffle. "
    "The reference fully materializes + std::sort then truncates "
    "(operator.cpp:1098-1122). Tie-broken on o_orderkey for determinism.",
    tags=("core", "orderby", "limit"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Global aggregate, no GROUP BY (COUNT(*) / COUNT(col) / SUM / AVG)
# --------------------------------------------------------------------------
@register(
    "global_agg",
    oracle="""
    SELECT COUNT(*)                          AS n_rows,
           COUNT(l_quantity)                 AS n_qty,
           SUM(l_quantity)                   AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           CAST(ROUND(CAST(SUM(CAST(FLOOR(l_discount * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                      / COUNT(*), 0) AS BIGINT) AS avg_disc_micros
    FROM lineitem
    """,
    doc="Ungrouped aggregate — single-row result, partial agg per "
    "partition then one tiny final reduce. Money/rate outputs are "
    "integer cents/micros (order-independent exact sums, ROADMAP #8).",
    tags=("core", "aggregate"),
)
def global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    disc_micros = _fixed_point(F.col("l_discount"), 1_000_000)
    return t["lineitem"].agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(_fixed_point(F.col("l_extendedprice"), 100)).alias(
            "sum_price_cents"
        ),
        F.round(F.sum(disc_micros).cast("double") / F.count(F.lit(1)), 0)
        .cast("long")
        .alias("avg_disc_micros"),
    )


# --------------------------------------------------------------------------
# Flagship composite: the reference's "top region by quantity" pipeline
# (reference tests/test_execution.cpp:254-270) at star-schema scale.
# --------------------------------------------------------------------------
@register(
    "composite_top_regions",
    oracle="""
    SELECT r_name,
           SUM(l_quantity)                                   AS total_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                                                             AS revenue_cents,
           COUNT(*)                                          AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus <> 'P'
    GROUP BY r_name
    ORDER BY total_qty DESC, r_name
    LIMIT 5
    """,
    doc="4-way star join + agg + top-k: filter -> scan -> broadcast joins "
    "-> partial/final agg -> TakeOrderedAndProject. The fact table is "
    "never shuffled: every dim broadcasts (region/nation/customer are "
    "tiny fractions of lineitem at all SFs). The reference planner only "
    "handles ONE join (planner.cpp:66-69); this is the multi-join case "
    "it TODO'd.",
    tags=("core", "join", "aggregate", "composite"),
)
def composite_top_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") != "P"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.sum(
                _fixed_point(F.col("l_extendedprice") * (1 - F.col("l_discount")), 100)
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("total_qty").desc(), "r_name")
        .limit(5)
    )


# --------------------------------------------------------------------------
# The reference README's own sample queries (reference README.md:114-133),
# mapped onto the star schema. Dates emitted as yyyymmdd BIGINT — the
# reference's DATE32 representation (SURVEY §1.2).
# --------------------------------------------------------------------------
@register(
    "ref_revenue_by_day",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS order_day,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY order_day
    ORDER BY order_day
    """,
    doc="Reference sample Q1 'Revenue by day' (README.md:117-123): "
    "status filter + date range + group + order. Both filters push to "
    "the parquet scan.",
    tags=("core", "reference-sample"),
)
def ref_revenue_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["orders"]
        .filter(
            (F.col("o_orderstatus") == "F")
            & F.col("o_orderdate").between("1996-01-01", "1996-12-31")
        )
        .groupBy(
            F.date_format("o_orderdate", "yyyyMMdd").cast("long").alias("order_day")
        )
        .agg(F.sum(_fixed_point(F.col("o_totalprice"), 100)).alias("rev_cents"))
        .orderBy("order_day")
    )


@register(
    "ref_top_skus",
    oracle="""
    SELECT l_partkey AS sku,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS rev_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_partkey
    ORDER BY rev_cents DESC, sku
    LIMIT 20
    """,
    doc="Reference sample Q2 'Top SKUs by revenue' (README.md:125-133): "
    "join + grouped revenue + top-20. Orders side broadcasts after its "
    "filter; limit is a TakeOrderedAndProject. Revenue is integer cents "
    "and the top-20 cut orders on the exact cents value, so neither the "
    "hash nor the LIMIT boundary depends on float summation order.",
    tags=("core", "reference-sample"),
)
def ref_top_skus(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    rev = F.sum(
        _fixed_point(F.col("l_extendedprice") * (1 - F.col("l_discount")), 100)
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_partkey").alias("sku"))
        .agg(rev.alias("rev_cents"))
        .orderBy(F.col("rev_cents").desc(), "sku")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Expression semantics: arithmetic, comparison, CASE (reference
# expression.cpp:31-120 — we adopt standard semantics per SURVEY §4.3)
# --------------------------------------------------------------------------
@register(
    "expr_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity + l_tax            AS add_col,
           l_extendedprice - l_discount  AS sub_col,
           l_extendedprice / l_quantity  AS unit_price,
           CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS bucket
    FROM lineitem
    WHERE l_quantity * (1 + l_tax) > 20 AND NOT (l_returnflag = 'N' AND l_linestatus = 'F')
    """,
    doc="Scalar expression coverage: + - * /, comparisons, AND/OR/NOT, "
    "CASE. All JVM-side whole-stage-codegen (the reference interprets "
    "row-at-a-time, expression.cpp:153-206).",
    tags=("core", "expressions"),
)
def expr_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"]
    return (
        li.filter(
            (F.col("l_quantity") * (1 + F.col("l_tax")) > 20)
            & ~((F.col("l_returnflag") == "N") & (F.col("l_linestatus") == "F"))
        ).select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_quantity") + F.col("l_tax")).alias("add_col"),
            (F.col("l_extendedprice") - F.col("l_discount")).alias("sub_col"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
            F.when(F.col("l_quantity") > 25, "big").otherwise("small").alias("bucket"),
        )
    )
