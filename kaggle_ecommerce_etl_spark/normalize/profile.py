"""Profiling aggregations & data-dependent plan gates
(SURVEY.md §2d ops 18-22, §2e op 31).

Reference behavior re-expressed:
- per-column null counts (ecommerce_s3_to_pg.py:42-43)
- describe() summary (ecommerce_s3_to_pg.py:39-40)
- numeric-cast gate: apply iff ≥90% of rows parse (pg.py:178-181)
- month/datetime gate: iff ANY value parses (pg.py:159-161)
- drop all-null columns (pg.py:202-204)

Scale design: all gates for one table are batched into ONE aggregation
job (single scan, map-side partial aggregation, one tiny shuffled
result row) rather than one scan per column — at 100 TB, N profiling
scans would dominate the pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kaggle_ecommerce_etl_spark.normalize.casts import (
    strip_numeric_noise,
    tolerant_date,
)
from kaggle_ecommerce_etl_spark.util import qcol


def null_counts(df: DataFrame) -> DataFrame:
    """One-row DataFrame: per-column null count (op 18)."""
    return df.agg(
        *[
            F.sum(qcol(c).isNull().cast("long")).alias(c)
            for c in df.columns
        ]
    )


def summary_stats(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """describe()-style summary (op 19): count/mean/stddev/min/25%/50%/75%/max."""
    return df.summary() if cols is None else df.select(*cols).summary()


def column_profile(df: DataFrame, string_cols: Sequence[str] | None = None) -> dict:
    """ONE job computing every gate the transform layer needs.

    Returns ``{col: {"nulls": int, "numeric_rate": float|None,
    "date_any": bool|None}}`` plus ``{"__rows__": n}``.
    numeric_rate / date_any are only computed for string columns.
    """
    if string_cols is None:
        string_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
        ]
    aggs = [F.count(F.lit(1)).alias("__rows__")]
    for c in df.columns:
        aggs.append(F.sum(qcol(c).isNull().cast("long")).alias(f"nulls__{c}"))
    for c in string_cols:
        aggs.append(
            F.avg(
                strip_numeric_noise(qcol(c)).try_cast("double").isNotNull().cast("double")
            ).alias(f"numrate__{c}")
        )
        aggs.append(
            F.max(tolerant_date(qcol(c)).isNotNull().cast("int")).alias(f"dateany__{c}")
        )
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict = {"__rows__": row["__rows__"]}
    for c in df.columns:
        out[c] = {
            "nulls": row[f"nulls__{c}"],
            "numeric_rate": row.get(f"numrate__{c}"),
            "date_any": bool(row[f"dateany__{c}"]) if f"dateany__{c}" in row and row[f"dateany__{c}"] is not None else None,
        }
    return out


def drop_all_null_columns(df: DataFrame, profile: dict | None = None) -> DataFrame:
    """Drop columns whose values are all NULL (op 31). Data-dependent
    projection: needs a profile pass (reused if supplied)."""
    if profile is None:
        counts = null_counts(df).collect()[0].asDict()
        total = df.count()
        dead = [c for c in df.columns if counts[c] == total]
    else:
        total = profile["__rows__"]
        dead = [c for c in df.columns if profile[c]["nulls"] == total]
    return df.drop(*dead) if dead else df
