"""Streaming dedup: duplicate events across micro-batch files are
emitted exactly once (the reference's ON-CONFLICT idempotency as a
streaming operator)."""

from __future__ import annotations

from pyspark.sql import types as T

from kaggle_ecommerce_etl_spark.streaming.dedup import (
    dedup_stream_exact,
    dedup_stream_watermarked,
)
from kaggle_ecommerce_etl_spark.streaming.file_source import (
    run_available_now,
    stream_csv_directory,
)

CSV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(path, name, rows):
    lines = ["event_id,ts,event_type,value"] + [
        f"{i},{ts},{et},{v}" for i, ts, et, v in rows
    ]
    (path / name).write_text("\n".join(lines) + "\n")


def test_exact_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "drop"
    src.mkdir()
    # b1 contains a duplicate event_id; b2 re-delivers event 1 entirely
    _write_batch(src, "b1.csv", [(1, "2024-01-01 10:00:00", "view", 1.0),
                                 (1, "2024-01-01 10:00:00", "view", 1.0),
                                 (2, "2024-01-01 10:05:00", "click", 2.0)])

    seen: list[int] = []

    def sink(df, epoch_id):
        seen.extend(r.event_id for r in df.collect())

    stream = dedup_stream_exact(
        stream_csv_directory(spark, str(src), CSV_SCHEMA), ["event_id"]
    )
    run_available_now(stream, str(tmp_path / "ck"), sink, "d1")
    assert sorted(seen) == [1, 2]

    # redelivery in a later batch, same checkpoint → suppressed by state
    _write_batch(src, "b2.csv", [(1, "2024-01-01 10:00:00", "view", 1.0),
                                 (3, "2024-01-01 10:20:00", "view", 3.0)])
    seen.clear()
    stream = dedup_stream_exact(
        stream_csv_directory(spark, str(src), CSV_SCHEMA), ["event_id"]
    )
    run_available_now(stream, str(tmp_path / "ck"), sink, "d2")
    assert sorted(seen) == [3]


def test_watermarked_dedup_within_horizon(spark, tmp_path):
    src = tmp_path / "drop2"
    src.mkdir()
    _write_batch(src, "b1.csv", [(10, "2024-01-01 10:00:00", "view", 1.0),
                                 (10, "2024-01-01 10:03:00", "view", 1.0),
                                 (11, "2024-01-01 10:05:00", "click", 2.0)])

    seen: list[int] = []

    def sink(df, epoch_id):
        seen.extend(r.event_id for r in df.collect())

    stream = dedup_stream_watermarked(
        stream_csv_directory(spark, str(src), CSV_SCHEMA),
        ["event_id"],
        delay="10 minutes",
    )
    run_available_now(stream, str(tmp_path / "ck2"), sink, "w1")
    assert sorted(seen) == [10, 11]
