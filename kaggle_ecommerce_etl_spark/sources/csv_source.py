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


def _tail_bytes_garbled(path: str | list[str], enc: str) -> bool:
    """Byte-level probe of each file's LAST 64 KiB under ``enc`` —
    catches garbling that starts beyond the head sample (a file whose
    first rows are clean ASCII but whose tail carries Latin-1 bytes).
    Local-filesystem only (driver-side open); non-local paths resolve
    to no files and the probe abstains. Up to 4 leading bytes of the
    chunk are skipped to find a multi-byte character boundary."""
    import glob as _glob
    import os

    paths = [path] if isinstance(path, str) else list(path)
    files: list[str] = []
    for p in paths:
        p = p.removeprefix("file://").removeprefix("file:")
        if os.path.isdir(p):
            files += sorted(
                f for f in _glob.glob(p + "/*") if os.path.isfile(f)
            )
        elif os.path.isfile(p):
            files.append(p)
        else:
            files += sorted(f for f in _glob.glob(p) if os.path.isfile(f))
    for f in files[:8]:  # bounded driver work however many files land
        size = os.path.getsize(f)
        with open(f, "rb") as fh:
            fh.seek(max(0, size - 65536))
            chunk = fh.read()
        if not any(
            _decodes(chunk[skip:], enc)
            for skip in range(min(4, len(chunk)) + 1)
        ):
            return True
    return False


def _decodes(b: bytes, enc: str) -> bool:
    try:
        b.decode(enc)
        return True
    except UnicodeDecodeError:
        return False


def read_csv_with_encoding_fallback(
    spark: SparkSession,
    path: str | list[str],
    encodings: tuple[str, ...] = ("UTF-8", "ISO-8859-1"),
) -> DataFrame:
    """Header CSV read, all columns string; retry with the next encoding
    when the current one mis-decodes (the reference's UTF-8 →
    ISO-8859-1 retry, pg.py:104-114).

    Spark does not raise on undecodable bytes — it substitutes U+FFFD —
    so "decode failed" is detected two ways, both bounded driver work:
    a 20-row head sample probed for the replacement character, plus a
    strict byte-decode of each local file's last 64 KiB (catches
    garbling that starts beyond the head rows). Files legitimately
    containing U+FFFD would fall through to the last encoding;
    acceptable for raw-CSV ingest."""
    last_df = None
    for enc in encodings:
        df = (
            spark.read.option("header", True)
            .option("encoding", enc)
            .csv(path if isinstance(path, str) else list(path))
        )
        last_df = df
        try:
            sample = df.take(20)
        except Exception:  # noqa: BLE001 — unreadable under this encoding
            continue
        garbled = (
            any(
                isinstance(v, str) and "�" in v
                for row in sample
                for v in row
            )
            or any("�" in c for c in df.columns)
            or _tail_bytes_garbled(path, enc)
        )
        if not garbled:
            return df
    if last_df is None:
        raise RuntimeError(f"no encoding worked for {path}")
    return last_df


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


def read_csv_quarantine(
    spark: SparkSession,
    path: str | list[str],
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE read with a corrupt-record quarantine: returns
    (good, quarantined) — good rows with the file's own header columns
    (all string, §1's "object then coerce" model), quarantined rows as
    their raw line text for audit/replay.

    The reference's posture on malformed input is try/except + skip the
    whole FILE (pg.py:229-233); quarantining keeps the healthy rows of
    a partially-damaged file and never drops data silently — rows whose
    field count does not match the header (extra OR missing columns)
    land in quarantine instead of being mis-parsed. At scale this is the difference
    between re-ingesting a 100 GB drop and re-processing 12 bad lines."""
    from pyspark.sql import types as T

    header_df = spark.read.option("header", True).csv(
        path if isinstance(path, str) else list(path)
    )
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in header_df.columns]
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(path if isinstance(path, str) else list(path))
        # Spark disallows filtering ONLY the corrupt column of an
        # un-materialized scan (internal raw-record pushdown), and a
        # .cache() here would leak in the CacheManager (the caller
        # can't know it must unpersist). An EAGER localCheckpoint
        # materializes the full-row parse once, severs the CSV lineage
        # (so the corrupt-only filters below are legal), and its
        # storage is reclaimed by the ContextCleaner when the returned
        # frames are garbage-collected — no unpersist contract needed.
        .localCheckpoint(eager=True)
    )
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad
