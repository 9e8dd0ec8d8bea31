from bo_sql_spark.sources.csv_source import load_csv
from bo_sql_spark.sources.parquet_source import load_parquet

__all__ = ["load_csv", "load_parquet"]
