"""Column-name normalization / projection ops (SURVEY.md §2b ops 7-9).

Reference behavior re-expressed:
- header normalization: ``lower().strip()``, ``[\\s\\-]+`` → ``_``
  (ecommerce_s3_to_pg.py:140)
- drop-if-present column lists (ecommerce_s3_to_pg.py:228-231)
- rename maps (ecommerce_s3_to_pg.py:226, 242-245, 324-326, 358-360)

All are pure metadata operations on the logical plan — zero data
movement, zero shuffle at any scale.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame


def normalize_name(name: str) -> str:
    """lower + strip + collapse whitespace/hyphens to underscores."""
    return re.sub(r"[\s\-]+", "_", name.strip().lower())


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Apply :func:`normalize_name` to every column header."""
    return df.toDF(*[normalize_name(c) for c in df.columns])


def drop_columns(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Drop the listed columns; missing names are ignored (pandas
    ``errors='ignore'`` semantics — Spark ``drop`` already ignores)."""
    return df.drop(*list(cols))


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Rename per mapping, skipping absent sources."""
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present) if present else df
