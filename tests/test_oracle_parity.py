"""Every registered query must match its DuckDB oracle exactly.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): same
tables, order-insensitive compare, exact values. Runs at sf0.001 by
default (set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the
driver-scale check).
"""

from __future__ import annotations

import pytest

from bo_sql_spark.queries import load_all
from bo_sql_spark.testing import check_query

ALL_QUERIES = sorted(load_all())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    ok, msg = check_query(spark, oracle_con, name, sf_dir)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames()


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert q, "no queries registered"
    assert set(o) <= set(q)
