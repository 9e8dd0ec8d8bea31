from bo_sql_spark.sources.csv_source import load_csv
from bo_sql_spark.sources.jsonl_source import load_jsonl, write_jsonl
from bo_sql_spark.sources.parquet_source import load_parquet

__all__ = ["load_csv", "load_jsonl", "load_parquet", "write_jsonl"]
