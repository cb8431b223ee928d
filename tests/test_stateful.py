"""Custom stateful streaming sessionizer tests."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kaggle_ecommerce_etl_spark.streaming.stateful import (
    sessionize_batch_custom,
    sessionize_stateful,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(path, rows):
    lines = ["ts,user_id,value"] + [f"{ts},{u},{v}" for ts, u, v in rows]
    path.write_text("\n".join(lines) + "\n")


def test_stateful_sessionizer_closes_on_gap(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    _write(src / "b1.csv", [
        ("2024-01-01 10:00:00", 7, 1.5),
        ("2024-01-01 10:10:00", 7, 2.5),
        ("2024-01-01 10:00:00", 8, 1.0),
    ])
    _write(src / "b2.csv", [
        ("2024-01-01 13:00:00", 7, 9.0),   # > 30 min gap → closes session
    ])
    # pin processing order b1 → b2 (file source orders by mod time)
    import os, time
    now = time.time()
    os.utime(src / "b1.csv", (now - 60, now - 60))
    os.utime(src / "b2.csv", (now, now))

    stream = (
        spark.readStream.schema(SCHEMA).option("header", True)
        .option("maxFilesPerTrigger", 1).csv(str(src))
    )
    out = sessionize_stateful(stream)
    q = (
        out.writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sessions").collect()

    closed = {(r.user_id, r.n_events, r.total_value) for r in rows}
    # user 7's first session (2 events, 4.0) must be closed by the gap;
    # user 7's 13:00 session and user 8's session stay open (no timeout
    # reached within available data)
    assert (7, 2, 4.0) in closed
    assert all(r.session_start <= r.session_end for r in rows)


def test_batch_twin_matches_semantics(spark):
    ev = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", 7, 1.5),
            ("2024-01-01 10:10:00", 7, 2.5),
            ("2024-01-01 13:00:00", 7, 9.0),
            ("2024-01-01 10:00:00", 8, 1.0),
        ],
        ["ts", "user_id", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize_batch_custom(ev).collect()
    sess = {(r.user_id, r.n_events, r.total_value) for r in out}
    assert sess == {(7, 2, 4.0), (7, 1, 9.0), (8, 1, 1.0)}
