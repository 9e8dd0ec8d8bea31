"""Second batch of TPC-H query shapes (Q2/Q3/Q5/Q7/Q8/Q9/Q11/Q12/Q15/Q16/Q17/Q19/Q20/Q21).

The reference engine supports none of these shapes (its SQL subset is
single-join SELECT/WHERE/GROUP BY/ORDER BY/LIMIT with SUM/COUNT/AVG,
reference README.md:10,16); they exercise the beyond-reference surface
on the driver's star schema. The fixture schema has no partsupp table
and lineitem lacks l_shipmode/l_commitdate/l_receiptdate, so Q2, Q11,
Q16, Q17 and Q21 are adapted: the (partkey, suppkey) relation is
derived as DISTINCT pairs from lineitem, and Q21's "kept waiting"
predicate becomes a returnflag-based exists/not-exists on the same
order.

Scale notes (100 TB posture):
- Every dim side (part/supplier/customer/nation/region) is broadcast —
  the fact table never shuffles for these joins.
- Q15/Q11's "compare against a global scalar" is a 1-row cross-join
  broadcast, not a driver-side collect.
- Q21's exists/not-exists are left_semi/left_anti shuffles keyed on
  l_orderkey, the natural co-partitioning key (bucketing lineitem by
  orderkey makes them exchange-free, sources/bucketed.py).
- Q17's per-part threshold is a partial-agg broadcast join, not a
  correlated subquery re-scan.

Determinism: double sums rounded 2dp, ratios 6dp, thresholds 6dp on
both sides before comparison (package docstring rules).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bo_sql_spark.catalog import load_tables
from bo_sql_spark.queries import register


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, order_epoch, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): segment-filtered customer "
    "broadcast onto orders, fact-side date filters pushed to parquet, "
    "top-10 via TakeOrderedAndProject (no global sort).",
    tags=("extended", "tpch"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > "1998-06-01")
        .join(
            t["orders"].filter(F.col("o_orderdate") < "1998-06-01"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("order_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "order_epoch", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): 5-way "
    "join where every dim is broadcast; the symmetric nation-pair "
    "disjunction is evaluated after both nation joins.",
    tags=("extended", "tpch"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ns = t["nation"].select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = t["nation"].select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0.0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               ns.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation nc ON nc.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = nc.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ns ON ns.n_nationkey = s_nationkey
        JOIN part     ON p_partkey = l_partkey
        WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    )
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): 7-way star join, "
    "conditional share-of-total per year. Ratio rounded to 6dp on both "
    "sides (float sum order differs across engines).",
    tags=("extended", "tpch"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ns = t["nation"].select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = t["nation"].select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    asia = t["region"].filter(F.col("r_name") == "ASIA")
    std_part = t["part"].filter(F.col("p_type") == "STANDARD")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .join(F.broadcast(asia), F.col("r_regionkey") == F.col("nc_region"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .join(F.broadcast(std_part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", volume).otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape (top supplier): quarter revenue per supplier, "
    "keep the max. The global max is a 1-row broadcast cross join — "
    "no driver-side collect; ties (if any) are kept on both sides.",
    tags=("extended", "tpch"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_revenue()), 2).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    WITH thr AS (
        SELECT l_partkey AS t_partkey,
               ROUND(0.2 * AVG(l_quantity), 6) AS qty_thr
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN thr  ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < qty_thr
    """,
    doc="TPC-H Q17 shape (small-quantity revenue): the correlated "
    "AVG-per-part subquery is planned as a partial aggregate joined "
    "back to the fact — one shuffle on l_partkey, not a re-scan per "
    "row. Threshold rounded to 6dp both sides before the comparison.",
    tags=("extended", "tpch"),
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    thr = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_thr"))
    )
    brand = t["part"].filter(F.col("p_brand") == "Brand#3")
    return (
        t["lineitem"]
        .join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .join(thr, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q19_disjunctive_pred",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (disjunctive mixed-table predicate): the OR of "
    "brand/size/quantity conjuncts spans both join sides, so it can only "
    "be applied post-join — but Catalyst still derives and pushes the "
    "implied single-side filters (quantity<=30, brand IN ...) to the scans.",
    tags=("extended", "tpch"),
)
def tpch_q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)

    def block(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            block("Brand#1", 15, 1, 11)
            | block("Brand#2", 25, 10, 20)
            | block("Brand#3", 35, 20, 30)
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


@register(
    "tpch_q2_min_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    bal AS (
        SELECT l_partkey, s_suppkey, s_name, s_acctbal,
               MIN(s_acctbal) OVER (PARTITION BY l_partkey) AS min_bal
        FROM ps JOIN supplier ON s_suppkey = l_suppkey
    )
    SELECT p_partkey, p_name, s_suppkey, s_name,
           ROUND(s_acctbal, 2) AS acctbal
    FROM bal JOIN part ON p_partkey = l_partkey
    WHERE s_acctbal = min_bal AND p_size = 15
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part), adapted: the "
    "fixture has no partsupp table, so the part-supplier relation is "
    "DISTINCT (l_partkey, l_suppkey) from lineitem and min supply cost "
    "becomes min supplier account balance. The correlated MIN subquery "
    "is a window over the partkey partition — one shuffle, no re-scan; "
    "ties kept on both sides. Reference: no subqueries at all "
    "(README.md:16).",
    tags=("extended", "tpch"),
)
def tpch_q2_min_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ps = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    bal = ps.join(
        F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey")
    ).withColumn(
        "min_bal", F.min("s_acctbal").over(Window.partitionBy("l_partkey"))
    )
    p15 = t["part"].filter(F.col("p_size") == 15)
    return (
        bal.filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(p15), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH pv AS (
        SELECT l_partkey, ROUND(SUM(l_extendedprice), 2) AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (SELECT AVG(part_value) * 1.5 FROM pv)
    """,
    doc="TPC-H Q11 shape (important stock), adapted to value = gross "
    "revenue per part (no partsupp/availqty in fixture) with a "
    "scale-free threshold (1.5x mean part value — TPC-H's fixed "
    "fraction selects ~0 rows once part count grows). The global "
    "threshold scalar is broadcast, not collected.",
    tags=("extended", "tpch"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    pv = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("part_value"))
    )
    thr = pv.agg((F.avg("part_value") * 1.5).alias("thr"))
    return pv.join(F.broadcast(thr), F.col("part_value") > F.col("thr")).select(
        "l_partkey", "part_value"
    )


@register(
    "tpch_q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (supplier variety per brand/type/size), "
    "adapted: part-supplier pairs from lineitem, excluded suppliers are "
    "the negative-balance ones. NOT IN is a broadcast left_anti join "
    "(s_suppkey is non-null so anti-join and NOT IN agree).",
    tags=("extended", "tpch"),
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    sized = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(sized), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q21_sole_returner",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting), adapted: "
    "no l_commitdate/l_receiptdate in fixture, so 'failed to deliver' "
    "becomes 'sole returner' — supplier returned a line on a finished "
    "multi-supplier order where no co-supplier returned. EXISTS / NOT "
    "EXISTS compile to left_semi / left_anti self-joins on l_orderkey "
    "(co-partitioned with the probe side; bucketing removes the "
    "exchange entirely).",
    tags=("extended", "tpch"),
)
def tpch_q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"]
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
        .alias("l3")
    )
    fin = t["orders"].filter(F.col("o_orderstatus") == "F")
    return (
        l1.join(
            l2,
            (F.col("k2") == F.col("l1.l_orderkey"))
            & (F.col("s2") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l1.l_orderkey"))
            & (F.col("s3") != F.col("l1.l_suppkey")),
            "left_anti",
        )
        .join(fin, F.col("o_orderkey") == F.col("l1.l_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): 6-way join whose "
    "supplier join carries TWO conditions (suppkey equi + the "
    "customer-nation = supplier-nation locality constraint). Every dim "
    "is broadcast; the only shuffle is orders-lineitem on orderkey, and "
    "the date window is pushed to the orders parquet scan.",
    tags=("extended", "tpch"),
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) AS BIGINT)
             AS profit_cents
    FROM (
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%g%'
    )
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape (product-type profit), adapted: no partsupp in "
    "the fixture, so supply cost becomes 0.6 * p_retailprice (same "
    "per-row arithmetic shape; identical operand order both engines so "
    "per-row floats agree bitwise). Profit is emitted as integer cents "
    "(round per ROW, then sum longs) — an exact, summation-order-"
    "independent aggregate; ROUND(SUM(double), 2) flaked at sf0.01 "
    "because the two engines' merge orders landed on opposite sides of "
    "a cent boundary (ROADMAP #8). Part/supplier/nation broadcast; the "
    "LIKE filter prunes the part build side before the join.",
    tags=("extended", "tpch"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%g%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(F.round(amount * 100, 0).cast("long"))
            .cast("long")
            .alias("profit_cents")
        )
    )


@register(
    "tpch_q12_late_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_class
    """,
    doc="TPC-H Q12 shape (shipmode / priority split), adapted: the "
    "fixture has no l_shipmode or l_receiptdate, so 'late' means "
    "shipped 60+ days after order date and the mode dimension is "
    "l_returnflag. The lateness predicate references both join sides, "
    "so it's a post-join filter; the single-side shipdate window still "
    "pushes to the parquet scan. Conditional counts in one pass.",
    tags=("extended", "tpch"),
)
def tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 60 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "tpch_q20_dominant_supplier",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    total AS (
        SELECT l_partkey AS t_partkey, SUM(supp_qty) AS part_qty
        FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM shipped
    JOIN total    ON t_partkey = l_partkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE supp_qty > 0.5 * part_qty
      AND p_name LIKE 'small%'
      AND r_name = 'ASIA'
    """,
    doc="TPC-H Q20 shape (potential part promotion), adapted: no "
    "partsupp/availqty, so 'has excess stock' becomes 'shipped more "
    "than half the part's 1996 volume' (dominant supplier), and the "
    "geographic scope is a region (a single nation selects zero rows "
    "at every fixture SF — vacuous test). The correlated availqty "
    "subquery is a two-level partial aggregate — the per-part total "
    "re-aggregates the per-(part,supplier) rollup instead of "
    "re-scanning lineitem, so the fact table is read once. Quantity "
    "sums are integer-valued doubles: exact, no rounding needed for "
    "the oracle hash.",
    tags=("extended", "tpch"),
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    total = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    small_parts = t["part"].filter(F.col("p_name").like("small%"))
    asia = t["region"].filter(F.col("r_name") == "ASIA")
    return (
        shipped.join(total, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .join(F.broadcast(small_parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )
