"""CSV sink (SURVEY.md §2a op 3).

Reference: re-serialize cleaned frames to headered CSV under
``kaggle/cleaned/<name>_<ts>.csv`` (ecommerce_s3_to_pg.py:637-685).

``single_file=True`` mirrors the reference's one-object-per-table
output (coalesce(1)); leave False at scale so each task writes its own
part file."""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame

TS_FMT = "%Y-%m-%d_%H-%M-%S"  # reference naming (pg.py:645, 659)


def timestamped_name(base: str, now: _dt.datetime | None = None) -> str:
    now = now or _dt.datetime.now(_dt.timezone.utc)
    return f"{base}_{now.strftime(TS_FMT)}"


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.option("header", True).mode(mode).csv(path)
