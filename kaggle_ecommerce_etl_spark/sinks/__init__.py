from kaggle_ecommerce_etl_spark.sinks.csv_sink import write_csv
from kaggle_ecommerce_etl_spark.sinks.jdbc import (
    TABLE_DDL,
    write_jdbc_append,
    write_upsert,
)

__all__ = ["TABLE_DDL", "write_csv", "write_jdbc_append", "write_upsert"]
