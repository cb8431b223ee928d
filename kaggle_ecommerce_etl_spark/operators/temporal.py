"""Temporal joins Spark lacks as built-ins: as-of join and bucketed
range join.

Neither exists in the reference (its only temporal logic is the
recency window, ecommerce_s3_to_pg.py:74-121) — these are the
training-/feature-pipeline extensions (SURVEY.md §7 step 7): "state of
the dimension as-of the event" (point-in-time correctness for feature
generation) and "events inside an interval" (windowed attribution).

Both are implemented as compositions of existing DataFrame ops —
no UDFs, no driver participation — so Catalyst/AQE keep optimizing
them:

- ``asof_join``: the union-window shape. Tag both sides, union, one
  window per key ordered by (ts, side) carrying the right payload
  forward with ``last(ignorenulls)``, keep left rows. ONE shuffle
  (the window partitionBy), no join at all — at 100 TB this beats any
  per-key ``merge_asof`` UDF because state never leaves the JVM and
  skewed keys still sort-merge within a partition.
- ``range_join``: explode the interval side into coarse buckets and
  equi-join on (key, bucket) before applying the exact range
  predicate. Catalyst would otherwise plan key-equality + range as a
  join with a post-filter, which is fine — the bucketed form exists
  for the KEYLESS/low-key-cardinality case where the plain join
  degenerates toward a broadcast-nested-loop cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "asof_join_broadcast", "range_join_bucketed"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the single right row with the
    nearest ``right_ts <= left_ts`` (backward; ``>=`` for forward)
    within the same ``on`` key group — DuckDB/pandas ``ASOF JOIN``
    semantics, left-outer flavor (unmatched left rows keep NULLs).

    Contract: ``(on, right_ts)`` must be unique on the right side —
    ties there make "the" as-of row ill-defined (pre-aggregate with
    ``max_by`` if needed). Left columns pass through unchanged; right
    payload columns are appended (names must not collide).

    Plan shape: union both sides → ONE window over ``on`` ordered by
    (ts, side) → filter to left rows. Right rows sort before left
    rows at equal ts, so an event AT a dimension-change timestamp
    sees the new state, matching ``ts_l >= ts_r``.

    The right payload travels as a SINGLE struct column (non-null for
    every right row, even when its fields are NULL) so the carry-
    forward is atomic: a matched right row's legitimately-NULL field
    stays NULL instead of being overwritten by an older row's value,
    and multi-column payloads can never mix fields from different
    right rows.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = [c for c in right.columns if c not in on and c != right_ts]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    if not payload:
        # no payload columns -> left-outer as-of join adds nothing
        return left

    payload_t = T.StructType([right.schema[c] for c in payload])
    l_pass = [c for c in left.columns if c not in on and c != left_ts]
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *l_pass,
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_pass],
        F.struct(*payload).alias("__payload"),
    )
    ts_order: Column = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *on,
        "__ts",
        "__side",
        *l_pass,
        F.last("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    out = carried.filter(F.col("__side") == 1).withColumnRenamed("__ts", left_ts)
    # restore the left frame's column order, payload unpacked + appended
    return out.select(
        *left.columns, *[F.col("__payload")[c].alias(c) for c in payload]
    )


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    event_key: str,
    interval_key: str,
    event_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Inner-join events to intervals with
    ``start <= event_ts < end`` (plus key equality), via bucketing.

    The interval side explodes into one row per ``bucket``-sized slot
    it overlaps; the event side maps to its single slot; the join is a
    plain equi-join on (key, slot) with the exact range predicate as a
    residual filter. Shuffle volume grows with interval length /
    bucket, not |events| × |intervals| — choose ``bucket`` near the
    median interval length. Only ``date_trunc``-expressible buckets
    ('1 day', '1 hour') are supported to keep slot math exact.
    """
    unit = {"1 day": "DAY", "1 hour": "HOUR"}.get(bucket)
    if unit is None:
        raise ValueError(f"unsupported bucket: {bucket!r}")
    slots = F.expr(
        f"sequence(date_trunc('{unit}', {start_col}), "
        f"date_trunc('{unit}', {end_col}), interval {bucket})"
    )
    iv = intervals.withColumn("__slot", F.explode(slots))
    ev = events.withColumn("__slot", F.date_trunc(unit, F.col(event_ts)))
    return (
        ev.join(
            iv,
            (F.col(event_key) == F.col(interval_key))
            & (ev["__slot"] == iv["__slot"]),
        )
        .filter(
            (F.col(event_ts) >= F.col(start_col))
            & (F.col(event_ts) < F.col(end_col))
        )
        .drop("__slot")
    )


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward as-of join for a SMALL right side (rate tables, config
    histories): the right side collapses to one row per key holding
    its (ts, payload...) structs sorted by ts, broadcast-joins to the
    left, and each left row picks the last struct with ts ≤ left_ts
    via pure array expressions. ZERO shuffles on the left (the 100 TB
    fact side) — the trade vs :func:`asof_join` is O(|right per key|)
    work per left row and the broadcast ceiling, the same trade as
    any broadcast join. Same contract: unique (on, right_ts),
    left-outer semantics."""
    payload = [c for c in right.columns if c not in on and c != right_ts]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    packed = (
        right.groupBy(*on)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(right_ts).alias("__rts"), *payload))
            ).alias("__hist")
        )
    )
    joined = left.join(F.broadcast(packed), on, "left")
    # last history entry at-or-before the event time; arrays sort by
    # the leading struct field, so filter + try_element_at(-1) is the
    # pick (try_: an empty filter result must yield NULL, not an ANSI
    # out-of-bounds error)
    pick = F.try_element_at(
        F.filter("__hist", lambda s: s["__rts"] <= F.col(left_ts)), F.lit(-1)
    )
    staged = joined.withColumn("__pick", pick).drop("__hist")
    return staged.select(
        *left.columns, *[F.col("__pick")[c].alias(c) for c in payload]
    )


def gap_islands(
    df: DataFrame, key_col: str, bucket_size: int = 16384
) -> DataFrame:
    """Missing-RANGE detection over an integer key domain (gaps/
    islands) in the scale-safe two-phase shape.

    The textbook single ``LEAD(key) OVER (ORDER BY key)`` is a
    one-partition window — a non-starter at 100 TB. Instead keys
    bucket by ``key DIV bucket_size``; intra-bucket gaps come from a
    bucket-PARTITIONED lead (fully distributed), and cross-bucket gaps
    from the per-bucket (min, max) table — |keys|/bucket_size rows,
    thousands at 100 TB — via one tiny ordered window. The union is
    exactly the global gap set: a gap either lies inside one bucket or
    spans a bucket boundary, and a bucket with no keys at all never
    appears in the bounds table, so its whole range lands in the
    cross-bucket leg. Output: (gap_start, gap_end, gap_len) sorted.

    The two legs each scan the source once — DELIBERATE: the input is
    a single pruned integer column, and re-reading it columnar is
    cheaper at 100 TB than pinning |keys| in cluster memory; a caller
    that already holds the keys materialized can ``persist()`` before
    calling and both legs will reuse the cache.
    """
    keys = df.select(F.col(key_col).alias("k")).withColumn(
        "b", F.expr(f"k DIV {int(bucket_size)}")
    )
    intra_w = Window.partitionBy("b").orderBy("k")
    intra = (
        keys.withColumn("nxt", F.lead("k").over(intra_w))
        .filter(F.col("nxt") > F.col("k") + 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
        )
    )
    bounds = keys.groupBy("b").agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    )
    cross_w = Window.orderBy("b")
    cross = (
        bounds.withColumn("nxt_lo", F.lead("lo").over(cross_w))
        .filter(F.col("nxt_lo") > F.col("hi") + 1)
        .select(
            (F.col("hi") + 1).alias("gap_start"),
            (F.col("nxt_lo") - 1).alias("gap_end"),
        )
    )
    return (
        intra.unionByName(cross)
        .withColumn(
            "gap_len", F.col("gap_end") - F.col("gap_start") + F.lit(1)
        )
        .orderBy("gap_start")
    )
