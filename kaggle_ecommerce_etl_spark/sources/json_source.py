"""JSONL source — the de-facto LLM-training interchange format.

Mirrors sources/csv_source.py's posture: explicit schema (inferSchema
would cost a full extra pass at 100 TB), PERMISSIVE parse with a
corrupt-record quarantine instead of the reference's skip-the-whole-
file try/except (pg.py:229-233).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: str | T.StructType,
    glob: str | None = None,
) -> DataFrame:
    """Schema-explicit JSONL scan. ``glob`` (e.g. ``part-*``) prunes
    non-data files at LISTING time — no bytes read for markers or
    sidecar files."""
    reader = spark.read.schema(schema)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.json(path if isinstance(path, str) else list(path))


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str | list[str],
    schema: str | T.StructType,
    glob: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSONL read split into (good, quarantined): good rows
    carry the caller's schema; malformed lines land in quarantine as
    raw text for audit/replay — web-scraped JSONL always has some.

    Same materialization contract as read_csv_quarantine
    (csv_source.py): Spark disallows filtering ONLY the corrupt column
    of an un-materialized scan, so an EAGER localCheckpoint parses
    once, severs the JSON lineage (making the corrupt-only filters
    legal), and leaves storage reclamation to the ContextCleaner — no
    unpersist contract imposed on the caller."""
    base = (
        T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    full = T.StructType(
        list(base.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.json(
        path if isinstance(path, str) else list(path)
    ).localCheckpoint(eager=True)
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad
