"""JDBC sink with idempotent upsert (SURVEY.md §2a ops 5-6, §2c op 16).

Reference: psycopg2 ``execute_values`` batch INSERT with
``ON CONFLICT (order_id, date) DO NOTHING`` for amazon_sale, plain
append for the rest, ``CREATE TABLE IF NOT EXISTS`` DDL
(ecommerce_s3_to_pg.py:423-635).

Spark-first shape:
- plain append → ``df.write.jdbc(mode='append', batchsize=…)``
- DO-NOTHING upsert → anti-join the incoming batch against the target's
  existing keys (column-pruned key scan), then append. The anti-join is
  the scalable idempotency mechanism: only key columns cross the wire,
  and Catalyst broadcasts whichever side is small.

No JDBC driver/Postgres exists in this environment, so the physical
write is exercised in tests via an in-memory "existing table" DataFrame;
the JDBC call itself is a thin option-passing wrapper.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from kaggle_ecommerce_etl_spark.operators.dedup import upsert_anti_join

#: target DDL (reference pg.py:450-533), expressed as Spark SQL types —
#: used for createTableColumnTypes and for align_columns targets.
TABLE_DDL: dict[str, list[tuple[str, str]]] = {
    "amazon_sale": [
        ("order_id", "string"), ("date", "date"), ("status", "string"),
        ("fulfillment", "string"), ("sales_channel", "string"),
        ("ship_service_level", "string"), ("sku", "string"),
        ("category", "string"), ("size", "string"), ("asin", "string"),
        ("courier_status", "string"), ("quantity", "int"),
        ("amount", "double"), ("ship_city", "string"),
        ("ship_state", "string"), ("ship_postal_code", "double"),
        ("ship_country", "string"), ("b2b", "string"),
        ("loaded_at", "timestamp"),
    ],
    "amazon_sale_version": [
        ("order_id", "string"), ("date", "date"), ("status", "string"),
        ("fulfillment", "string"), ("sales_channel", "string"),
        ("ship_service_level", "string"), ("sku", "string"),
        ("category", "string"), ("size", "string"), ("asin", "string"),
        ("courier_status", "string"), ("quantity", "int"),
        ("amount", "double"), ("ship_city", "string"),
        ("ship_state", "string"), ("ship_postal_code", "double"),
        ("ship_country", "string"), ("b2b", "string"),
        ("loaded_at", "timestamp"),
    ],
    "sale_report": [
        ("sku_code", "string"), ("design_no", "string"), ("stock", "int"),
        ("category", "string"), ("size", "string"), ("color", "string"),
        ("loaded_at", "timestamp"),
    ],
    "international_sale": [
        ("customer", "string"), ("date", "date"), ("months", "string"),
        ("style", "string"), ("sku", "string"), ("pcs", "int"),
        ("rate", "string"), ("gross_amount", "double"), ("size", "string"),
        ("stock", "string"), ("data_source", "string"),
        ("loaded_at", "timestamp"),
    ],
}

UPSERT_KEYS: dict[str, list[str]] = {"amazon_sale": ["order_id", "date"]}


def write_jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict | None = None,
    batchsize: int = 10_000,
) -> None:
    """Plain JDBC append (reference's execute_values batching → the
    writer's batchsize option)."""
    props = dict(properties or {})
    props.setdefault("batchsize", str(batchsize))
    df.write.jdbc(url=url, table=table, mode="append", properties=props)


def write_upsert(
    incoming: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    append_fn,
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Idempotent DO-NOTHING upsert: anti-join then append via
    ``append_fn(to_append)``. Returns the appended subset (for tests /
    metrics). Re-running the same batch appends zero rows; duplicate
    keys WITHIN one batch keep one row (``order_by`` picks which —
    see upsert_anti_join)."""
    to_append = upsert_anti_join(incoming, existing, keys, order_by=order_by)
    append_fn(to_append)
    return to_append
