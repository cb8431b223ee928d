from kaggle_ecommerce_etl_spark.sources.csv_source import (
    read_csv_with_encoding_fallback,
    read_recent_csv,
)
from kaggle_ecommerce_etl_spark.sources.ingest import (
    ingest_raw_files,
    sale_csv_filter,
)

__all__ = [
    "ingest_raw_files",
    "read_csv_with_encoding_fallback",
    "read_recent_csv",
    "sale_csv_filter",
]
