"""CSV sources (SURVEY.md §2a ops 1, 2, 4).

Reference behavior re-expressed:
- ``pd.read_csv`` UTF-8 → ISO-8859-1 retry (ecommerce_s3_to_pg.py:104-114)
- incremental source: keep files modified in the last Δ minutes
  (pg.py:74-121); filename-timestamp recency via regex (pg.py:80 —
  broken in the reference, implemented correctly here)

Everything reads as ``StringType`` (header=True, no inference) to mirror
the reference's "object dtype, coerce later" model — the transform layer
(normalize.transform) owns typing. At scale this also makes the scan
schema stable across messy files.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: corrected form of the reference's never-formatted pattern (pg.py:80)
FILENAME_TS_PATTERN = r"_(\d{4}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2})\.csv$"
FILENAME_TS_FORMAT = "yyyy-MM-dd_HH-mm-ss"


def read_csv_with_encoding_fallback(
    spark: SparkSession, path: str, encodings: tuple[str, ...] = ("UTF-8", "ISO-8859-1")
) -> DataFrame:
    """Header CSV read, all columns string; retry with fallback encodings
    on failure (driver-side try/except mirrors the reference's retry).
    A malformed-in-UTF-8 file surfaces lazily, so we force a tiny action
    (take(1)) to validate the encoding before committing to it."""
    last_err: Exception | None = None
    for enc in encodings:
        df = (
            spark.read.option("header", True)
            .option("encoding", enc)
            .option("mode", "FAILFAST")
            .csv(path)
        )
        try:
            df.take(1)
            return df
        except Exception as e:  # noqa: BLE001 — retry with next encoding
            last_err = e
    raise last_err if last_err else RuntimeError(f"no encoding worked for {path}")


def read_recent_csv(
    spark: SparkSession,
    path: str,
    minutes: int = 10,
    now: _dt.datetime | None = None,
) -> DataFrame:
    """Incremental batch variant of the reference's time-window file
    listing (op 4): only files modified after now-Δ are scanned.
    Uses the scan-level ``modifiedAfter`` option → pruning happens at
    file-listing time, no data read for stale files."""
    now = now or _dt.datetime.now(_dt.timezone.utc)
    cutoff = (now - _dt.timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%S")
    return (
        spark.read.option("header", True)
        .option("modifiedAfter", cutoff)
        .csv(path)
    )


def with_filename_timestamp(df: DataFrame) -> DataFrame:
    """Attach source file + its embedded timestamp (corrected op 33)."""
    fname = F.input_file_name()
    ts_str = F.regexp_extract(fname, FILENAME_TS_PATTERN, 1)
    return df.withColumn("_source_file", fname).withColumn(
        "_file_ts",
        F.try_to_timestamp(ts_str, F.lit(FILENAME_TS_FORMAT)),
    )
