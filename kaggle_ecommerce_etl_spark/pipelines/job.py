"""End-to-end batch job — the reference's ``lambda_handler``
(SURVEY.md §3 EP1; ecommerce_s3_to_pg.py:687-750) as one Spark job.

Flow: discover recent files in the drop directory → classify each by
name (op 36) → run its cleaning pipeline (op 37) → write cleaned CSV
per table (op 3) → idempotently upsert into the warehouse tables
(ops 5, 16, here an in-memory/parquet stand-in for JDBC).

Scale notes:
- per-file routing happens on the LISTING (driver metadata), not the
  data; each route's files are read as one multi-file scan.
- all cleaned outputs of one run share lazily-built plans; nothing is
  collected to the driver except the 1-row embedded-header fetch of
  the international split (documented in operators.structural).
- the international report needs file order → read single-partition
  per file (these report files are tens of MB; at scale this is the
  one operator that intentionally does not parallelize per file —
  parallelism comes from processing many files at once).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession

from kaggle_ecommerce_etl_spark.operators.structural import with_file_order
from kaggle_ecommerce_etl_spark.pipelines.amazon import clean_amazon_sale
from kaggle_ecommerce_etl_spark.pipelines.dispatch import classify_file
from kaggle_ecommerce_etl_spark.pipelines.international import clean_international_sale
from kaggle_ecommerce_etl_spark.pipelines.sale import clean_sale
from kaggle_ecommerce_etl_spark.sinks.csv_sink import write_csv
from kaggle_ecommerce_etl_spark.sources.csv_source import (
    read_csv_with_encoding_fallback,
)


def discover_files(raw_dir: str, minutes: int | None = None) -> list[str]:
    """List candidate CSVs; optional recency window (op 4 semantics)."""
    out = []
    cutoff = (
        _dt.datetime.now().timestamp() - minutes * 60 if minutes is not None else None
    )
    for name in sorted(os.listdir(raw_dir)):
        if not name.lower().endswith(".csv"):
            continue
        path = os.path.join(raw_dir, name)
        if cutoff is not None and os.path.getmtime(path) < cutoff:
            continue
        out.append(path)
    return out


def run_batch(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str | None = None,
    minutes: int | None = None,
) -> dict[str, DataFrame]:
    """Process one drop of raw report files; returns the cleaned tables
    (and writes CSV outputs when out_dir is given).

    Output keys mirror the reference's warehouse tables: amazon_sale,
    amazon_sale_version, sale_report, international_sale.
    """
    routes: dict[str, list[str]] = {}
    for path in discover_files(raw_dir, minutes):
        route = classify_file(os.path.basename(path))
        if route:
            routes.setdefault(route, []).append(path)

    results: dict[str, DataFrame] = {}
    if "amazon" in routes:
        raw = read_csv_with_encoding_fallback(spark, routes["amazon"])
        clean, flagged = clean_amazon_sale(raw)
        results["amazon_sale"] = clean
        results["amazon_sale_version"] = flagged
    if "sale" in routes:
        raw = read_csv_with_encoding_fallback(spark, routes["sale"])
        results["sale_report"] = clean_sale(raw)
    if "international" in routes:
        # one file at a time: the row-group split is order-dependent
        parts = []
        for path in routes["international"]:
            raw = read_csv_with_encoding_fallback(spark, path)
            parts.append(clean_international_sale(with_file_order(raw)))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        results["international_sale"] = df

    if out_dir:
        for table, df in results.items():
            write_csv(df, os.path.join(out_dir, table), single_file=True)
    return results
