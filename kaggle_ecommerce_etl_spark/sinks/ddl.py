"""Catalog DDL (SURVEY.md §2a op 6).

Reference: ``CREATE TABLE IF NOT EXISTS`` ×4 in schema ``kaggle``
(ecommerce_s3_to_pg.py:450-533). Spark-native: catalog tables (USING
parquet) created from the same TABLE_DDL map the JDBC writer uses, so
batch and warehouse schemas can't drift. Idempotent by IF NOT EXISTS,
exactly like the reference.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from kaggle_ecommerce_etl_spark.sinks.jdbc import TABLE_DDL


def ddl_for(table: str, database: str | None = None) -> str:
    cols = ", ".join(f"`{name}` {typ}" for name, typ in TABLE_DDL[table])
    qual = f"{database}.{table}" if database else table
    return f"CREATE TABLE IF NOT EXISTS {qual} ({cols}) USING parquet"


def create_tables(
    spark: SparkSession,
    tables: list[str] | None = None,
    database: str | None = None,
    location: str | None = None,
) -> None:
    """Create the warehouse tables in the session catalog.

    Tables are fully qualified — no ``USE``, so the session's current
    database is never mutated (a shared session may be running other
    work). ``location`` pins the database directory (e.g. under a job
    scratch dir) instead of the session warehouse default."""
    if database:
        loc = f" LOCATION '{location}'" if location else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
    for t in tables or list(TABLE_DDL):
        spark.sql(ddl_for(t, database))
