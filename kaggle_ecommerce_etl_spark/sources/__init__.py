from kaggle_ecommerce_etl_spark.sources.csv_source import (
    read_csv_with_encoding_fallback,
    read_recent_csv,
)

__all__ = ["read_csv_with_encoding_fallback", "read_recent_csv"]
