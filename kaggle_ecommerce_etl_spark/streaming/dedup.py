"""Streaming deduplication — exactly-once rows across micro-batches.

The reference achieves cross-invocation idempotency only at the sink
(`ON CONFLICT DO NOTHING`, ecommerce_s3_to_pg.py:544-547). Here dedup
is a first-class streaming operator:

- ``dedup_stream_exact``: `dropDuplicates` on the key — state grows
  with distinct keys forever. Correct for bounded key domains
  (per-day batch drains with `Trigger.AvailableNow`).
- ``dedup_stream_watermarked``: `dropDuplicatesWithinWatermark` —
  state is bounded by the watermark horizon, the 100 TB / continuous
  path: duplicates arriving within the lateness bound are dropped,
  state older than the bound is evicted.

Both are declarative; Spark keeps the key state in the state store
(RocksDB on a real cluster) partitioned by key hash — no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_exact(df: DataFrame, keys: list[str]) -> DataFrame:
    """Exactly-once by key over the stream's full lifetime.

    Unbounded state: use only with bounded key domains or
    AvailableNow drains where the checkpoint is rotated per period.
    """
    return df.dropDuplicates(keys)


def dedup_stream_watermarked(
    df: DataFrame,
    keys: list[str],
    event_time_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once by key within the watermark horizon; state evicted
    beyond it. Duplicates separated by more than ``delay`` of event
    time may both survive — the explicit trade for bounded state."""
    return df.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
