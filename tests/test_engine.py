"""Engine surface tests: command dispatch, formatters, load path.

Mirrors the reference's CLI smoke scenarios (reference smoke.sh:72-90)
at the Engine API level; the subprocess-level CLI is exercised by the
CLI smoke script (smoke.sh at the repo root).
"""

from __future__ import annotations

import pytest

from bo_sql_spark.engine import Engine
from bo_sql_spark.formatters import to_csv, to_markdown


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    e = Engine(spark)
    e.load_dir(sf_dir)
    return e


def test_select_markdown(engine):
    out = engine.execute("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
    lines = out.splitlines()
    assert lines[0].startswith("| r_regionkey | r_name")
    assert lines[1].startswith("|-")
    assert len(lines) == 2 + 5  # header + sep + 5 regions


def test_empty_result_markdown(engine):
    out = engine.execute("SELECT * FROM region WHERE r_regionkey < 0")
    assert out == "(no results)"


def test_set_format_csv(engine):
    assert "csv" in engine.execute("SET FORMAT csv")
    out = engine.execute("SELECT r_name FROM region ORDER BY r_regionkey LIMIT 1")
    assert out.splitlines()[0] == "r_name"
    engine.execute("SET FORMAT markdown")


def test_csv_quoting(spark):
    df = spark.createDataFrame(
        [('a,b', 'say "hi"', 'plain')], "c1 string, c2 string, c3 string"
    )
    out = to_csv(df)
    assert out.splitlines()[1] == '"a,b","say ""hi""",plain'


def test_markdown_null_and_float(spark):
    df = spark.sql("SELECT CAST(NULL AS STRING) AS s, CAST(1.5 AS DOUBLE) AS d")
    out = to_markdown(df)
    assert "NULL" in out and "1.500000" in out


def test_show_tables(engine):
    out = engine.execute("SHOW TABLES")
    assert "lineitem" in out and "region" in out


def test_describe(engine):
    out = engine.execute("DESCRIBE region")
    assert "rows: 5" in out
    assert "r_regionkey" in out and "ndv=" in out


def test_explain_shows_pushdown(engine):
    out = engine.execute(
        "EXPLAIN SELECT l_orderkey FROM lineitem WHERE l_quantity > 30"
    )
    assert "Scan parquet" in out
    assert "PushedFilters" in out


def test_explain_cost_annotates_statistics(engine):
    out = engine.execute(
        "EXPLAIN COST SELECT l_orderkey FROM lineitem WHERE l_quantity > 30"
    )
    assert "Statistics" in out and "sizeInBytes" in out


def test_explain_mode_keyword_not_eaten(engine):
    # a query whose first token merely STARTS with a mode word must not
    # be parsed as a mode
    out = engine.execute("EXPLAIN SELECT 1 AS extended_col")
    assert "error" not in out.lower()
    for mode in ("SIMPLE", "EXTENDED", "FORMATTED"):
        assert "Project" in engine.execute(f"EXPLAIN {mode} SELECT 1 AS x")


def test_load_table_roundtrip(engine, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,val,when\n1,2.5,20240101\n2,3.5,20240202\n")
    out = engine.execute(f"LOAD TABLE mini FROM '{p}'")
    assert "loaded mini" in out
    res = engine.execute("SELECT id, val, when FROM mini ORDER BY id")
    assert "2024-01-01" in res  # yyyymmdd inference kicked in


def test_error_does_not_raise_in_execute(engine):
    with pytest.raises(Exception):
        engine.sql("SELECT bogus_column FROM region").collect()


def test_cache_table_passthrough(engine):
    # CACHE TABLE / UNCACHE TABLE are native Spark SQL — the engine
    # passes them straight through
    assert engine.execute("CACHE TABLE region") == "(no results)"
    assert engine.spark.catalog.isCached("region")
    engine.execute("UNCACHE TABLE region")
    assert not engine.spark.catalog.isCached("region")


def test_exit_raises_eof(engine):
    with pytest.raises(EOFError):
        engine.execute("EXIT")


def test_stdin_csv_registers_implicit_table(spark, monkeypatch, capsys):
    """`cat f.csv | bo-sql --sql ...` registers stdin as 'table'
    (reference main.cpp:115-127). Driven through main() with a fake
    non-tty stdin; the live session is reused via getOrCreate."""
    import io

    from bo_sql_spark.engine import main

    class FakeStdin(io.StringIO):
        def isatty(self) -> bool:
            return False

    monkeypatch.setattr(
        "sys.stdin", FakeStdin("id,name,value\n1,alpha,1.5\n2,beta,2.5\n")
    )
    rc = main(["--sql", "SELECT COUNT(*) AS n FROM table", "--output-format", "csv"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.splitlines()[-2:] == ["n", "2"]


def test_stdin_empty_does_not_register(spark, monkeypatch, capsys):
    import io

    from bo_sql_spark.engine import main

    class FakeStdin(io.StringIO):
        def isatty(self) -> bool:
            return False

    spark.catalog.dropTempView("table")
    monkeypatch.setattr("sys.stdin", FakeStdin(""))
    rc = main(["--sql", "SHOW TABLES"])
    assert rc == 0
    assert "table" not in capsys.readouterr().out.splitlines()


def test_explain_analyze_executes_and_reports(engine):
    out = engine.execute(
        "EXPLAIN ANALYZE SELECT l_returnflag, COUNT(*) AS n "
        "FROM lineitem GROUP BY l_returnflag"
    )
    # executed => AQE finalized the plan and runtime stats are real
    assert "isFinalPlan=true" in out, out
    assert "rows: 3" in out, out
    assert "wall:" in out and "ms" in out, out
