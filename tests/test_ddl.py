"""Catalog DDL tests (op 6)."""

from __future__ import annotations

from kaggle_ecommerce_etl_spark.sinks.ddl import create_tables, ddl_for
from kaggle_ecommerce_etl_spark.sinks.jdbc import TABLE_DDL


def test_create_tables_idempotent(spark):
    create_tables(spark, ["sale_report"], database="kaggle_test")
    create_tables(spark, ["sale_report"], database="kaggle_test")  # IF NOT EXISTS
    cols = spark.sql("DESCRIBE kaggle_test.sale_report").collect()
    names = [r.col_name for r in cols if r.col_name and not r.col_name.startswith("#")]
    assert names[: len(TABLE_DDL["sale_report"])] == [
        n for n, _ in TABLE_DDL["sale_report"]
    ]
    spark.sql("INSERT INTO kaggle_test.sale_report VALUES "
              "('S1','D1',5,'Kurta','M','Red', current_timestamp())")
    assert spark.table("kaggle_test.sale_report").count() == 1
    spark.sql("DROP TABLE kaggle_test.sale_report")
    spark.sql("DROP DATABASE kaggle_test")


def test_ddl_text():
    sql = ddl_for("amazon_sale")
    assert sql.startswith("CREATE TABLE IF NOT EXISTS amazon_sale")
    assert "`order_id` string" in sql and "USING parquet" in sql
