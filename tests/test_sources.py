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


# ----------------------------------------------------------- JSONL


def _load_jsonl(spark, tmp_path, lines, **kw):
    from bo_sql_spark.sources import load_jsonl

    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return load_jsonl(spark, str(p), **kw)


def test_jsonl_native_types_and_iso_dates(spark, tmp_path):
    df = _load_jsonl(
        spark,
        tmp_path,
        [
            '{"id": 1, "name": "alpha", "score": 1.5, "day": "2024-01-31"}',
            '{"id": 2, "name": "beta", "score": 2.0, "day": "2023-12-01"}',
        ],
    )
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds == {"id": "bigint", "name": "string", "score": "double", "day": "date"}
    assert df.count() == 2


def test_jsonl_non_date_strings_stay_strings(spark, tmp_path):
    # one non-date value in the column -> whole column stays string
    df = _load_jsonl(
        spark,
        tmp_path,
        ['{"day": "2024-01-31"}', '{"day": "not a date"}'],
    )
    assert df.schema["day"].dataType.simpleString() == "string"


def test_jsonl_invalid_calendar_date_stays_string(spark, tmp_path):
    # matches the regex but not the calendar -> stays string
    df = _load_jsonl(spark, tmp_path, ['{"day": "2024-02-30"}'])
    assert df.schema["day"].dataType.simpleString() == "string"


def test_jsonl_all_null_column_stays_string(spark, tmp_path):
    df = _load_jsonl(
        spark,
        tmp_path,
        ['{"day": null, "x": 1}', '{"day": null, "x": 2}'],
    )
    assert df.schema["day"].dataType.simpleString() == "string"


def test_jsonl_null_mixed_with_dates_becomes_date(spark, tmp_path):
    df = _load_jsonl(
        spark,
        tmp_path,
        ['{"day": "2024-01-31"}', '{"day": null, "x": 1}'],
    )
    assert df.schema["day"].dataType.simpleString() == "date"


def test_jsonl_explicit_schema_single_pass(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = _load_jsonl(
        spark, tmp_path, ['{"id": 7, "name": "x"}'], schema=schema
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint",
        "string",
    ]
    assert df.first()["id"] == 7


def test_jsonl_roundtrip_preserves_newlines_and_unicode(spark, tmp_path):
    from bo_sql_spark.sources import load_jsonl, write_jsonl

    src = spark.createDataFrame(
        [(1, "line1\nline2\ttab"), (2, "unicode: …déjà vu"), (3, None)],
        "id long, text string",
    )
    out = str(tmp_path / "rt")
    write_jsonl(src, out)
    back = load_jsonl(spark, out)
    got = {r["id"]: r["text"] for r in back.collect()}
    assert got == {1: "line1\nline2\ttab", 2: "unicode: …déjà vu", 3: None}
