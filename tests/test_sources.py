"""CSV load-path tests — the type-inference contract from the reference
(reference src/storage/csv_loader.cpp:49-161, tests/test_csv.cpp):
DATE32(yyyymmdd) -> INT64 -> DOUBLE -> STRING priority, applied per
column over ALL values. Plus the quoting behavior the reference lacks.
"""

from __future__ import annotations

from datetime import date

import pytest

from bo_sql_spark.sources import load_csv


def _load(spark, tmp_path, text, **kw):
    p = tmp_path / "t.csv"
    p.write_text(text)
    return load_csv(spark, str(p), **kw)


def test_type_inference_priority(spark, tmp_path):
    # mirrors reference test_csv.cpp:7-53: int, string, double columns
    df = _load(spark, tmp_path, "id,name,value\n1,alpha,1.5\n2,beta,2.0\n3,gamma,3.25\n")
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["id"] == "int"
    assert kinds["name"] == "string"
    assert kinds["value"] == "double"


def test_yyyymmdd_dates_become_dates(spark, tmp_path):
    df = _load(spark, tmp_path, "d,n\n20240131,5\n20231225,6\n")
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds == {"d": "date", "n": "int"}
    assert df.orderBy("n").first()["d"] == date(2024, 1, 31)


def test_out_of_range_int_stays_int(spark, tmp_path):
    # 19000000 <= v <= 21000000 AND a valid calendar date required
    df = _load(spark, tmp_path, "a,b,c\n18991231,20241301,20240101\n19000101,20240101,20240102\n")
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["a"] == "int"  # 18991231 below range
    assert kinds["b"] == "int"  # 20241301 not a real date (month 13)
    assert kinds["c"] == "date"


def test_mixed_column_falls_back_to_string(spark, tmp_path):
    df = _load(spark, tmp_path, "x\n1\nnotanumber\n")
    assert df.schema["x"].dataType.simpleString() == "string"


def test_quoted_fields_and_escapes(spark, tmp_path):
    # the reference splits on raw commas (csv_loader.cpp:26-38) and would
    # corrupt this row; we adopt real RFC-4180 parsing (SURVEY §4.3 #13)
    df = _load(spark, tmp_path, 'a,b\n"x,y","say ""hi"""\n')
    row = df.first()
    assert row["a"] == "x,y"
    assert row["b"] == 'say "hi"'


def test_explicit_schema_skips_inference(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("d", LongType()), StructField("n", StringType())]
    )
    df = _load(spark, tmp_path, "d,n\n20240131,5\n", schema=schema)
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds == {"d": "bigint", "n": "string"}  # yyyymmdd pass NOT applied


def test_view_registration(spark, tmp_path):
    _load(spark, tmp_path, "q\n7\n", name="csv_view_t")
    assert spark.sql("SELECT SUM(q) AS s FROM csv_view_t").first()["s"] == 7
