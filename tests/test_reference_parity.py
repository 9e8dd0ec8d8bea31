"""The reference engine's own execution-test scenarios, re-run on our
engine (reference tests/test_execution.cpp:127-270 — same fixtures, same
queries, same expected rows).

Fixtures: orders(id, qty) = (1,10),(2,20),(3,30);
detail(id, region) = (1,'north'),(2,'south'),(4,'west')
(test_execution.cpp:14-63). The reference names columns 'orders.id'
because it has no alias resolution (SURVEY §1.3); we use real alias
resolution, so the same semantics spell naturally.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def ref_tables(spark):
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id long, qty long"
    ).createOrReplaceTempView("ref_orders")
    spark.createDataFrame(
        [(1, "north"), (2, "south"), (4, "west")], "id long, region string"
    ).createOrReplaceTempView("ref_detail")
    return spark


def rows(spark, sql: str) -> list[tuple]:
    return [tuple(r) for r in spark.sql(sql).collect()]


def test_selection_filters_rows(ref_tables):
    # test_execution.cpp:127-138
    got = rows(ref_tables, "SELECT id FROM ref_orders WHERE qty > 15 ORDER BY id")
    assert got == [(2,), (3,)]


def test_projection_evaluates_expressions(ref_tables):
    # test_execution.cpp:140-153
    got = rows(
        ref_tables,
        "SELECT id, qty * 2 AS double_qty FROM ref_orders ORDER BY id",
    )
    assert got == [(1, 20), (2, 40), (3, 60)]


def test_limit_short_circuits(ref_tables):
    # test_execution.cpp:155-166
    got = rows(ref_tables, "SELECT id FROM ref_orders LIMIT 2")
    assert len(got) == 2


def test_hash_join_matching_rows(ref_tables):
    # test_execution.cpp:168-185
    got = rows(
        ref_tables,
        """SELECT o.id, d.region FROM ref_orders o
           INNER JOIN ref_detail d ON o.id = d.id ORDER BY o.id""",
    )
    assert got == [(1, "north"), (2, "south")]


def test_aggregate_computes_totals(ref_tables):
    # test_execution.cpp:187-208 (reference sorts rows before asserting —
    # its group order is nondeterministic hash order, SURVEY §4.3 #11)
    got = rows(
        ref_tables,
        """SELECT d.region, SUM(o.qty) AS total FROM ref_orders o
           INNER JOIN ref_detail d ON o.id = d.id
           GROUP BY d.region ORDER BY d.region""",
    )
    assert got == [("north", 10), ("south", 20)]


def test_global_aggregate_counts_rows(ref_tables):
    # test_execution.cpp:210-225
    got = rows(ref_tables, "SELECT COUNT(*) AS n FROM ref_orders")
    assert got == [(3,)]


def test_order_by_sorts_descending(ref_tables):
    # test_execution.cpp:227-239
    got = rows(ref_tables, "SELECT id, qty FROM ref_orders ORDER BY qty DESC")
    assert got == [(3, 30), (2, 20), (1, 10)]


def test_order_by_with_limit_top_row(ref_tables):
    # test_execution.cpp:241-252
    got = rows(
        ref_tables, "SELECT id, qty FROM ref_orders ORDER BY qty DESC LIMIT 1"
    )
    assert got == [(3, 30)]


def test_top_region_by_quantity(ref_tables):
    # test_execution.cpp:254-270 — the reference's flagship composite
    got = rows(
        ref_tables,
        """SELECT d.region, SUM(o.qty) AS total FROM ref_orders o
           INNER JOIN ref_detail d ON o.id = d.id
           GROUP BY d.region ORDER BY total DESC LIMIT 1""",
    )
    assert got == [("south", 20)]


def test_order_by_aggregate_expression(ref_tables):
    """ORDER BY SUM(qty) un-aliased THROWS in the reference at execution
    (SURVEY §4.3 #10, expression.cpp:202-203); standard SQL runs it."""
    got = rows(
        ref_tables,
        """SELECT d.region FROM ref_orders o
           JOIN ref_detail d ON o.id = d.id
           GROUP BY d.region ORDER BY SUM(o.qty) DESC""",
    )
    assert got == [("south",), ("north",)]


def test_having_is_real_not_dropped(ref_tables):
    """HAVING is silently DROPPED by the reference planner (SURVEY §4.3
    #6, planner.cpp:108-165) — it would return both regions; we filter."""
    got = rows(
        ref_tables,
        """SELECT d.region, SUM(o.qty) AS total FROM ref_orders o
           JOIN ref_detail d ON o.id = d.id
           GROUP BY d.region HAVING SUM(o.qty) > 15""",
    )
    assert got == [("south", 20)]


def test_select_list_order_preserved(ref_tables):
    """The reference emits group keys first regardless of SELECT order
    (SURVEY §4.3 #9); standard SQL preserves the SELECT list."""
    df = ref_tables.sql(
        """SELECT SUM(o.qty) AS total, d.region FROM ref_orders o
           JOIN ref_detail d ON o.id = d.id GROUP BY d.region"""
    )
    assert df.columns == ["total", "region"]
