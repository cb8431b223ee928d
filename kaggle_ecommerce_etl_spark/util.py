"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """Column reference by EXACT name — backtick-quoted so dots, spaces
    and other specials in raw CSV headers (e.g. ``Design No.``) are not
    parsed as nested-field access."""
    return F.col("`" + name.replace("`", "``") + "`")


def ensure_min_partitions(df, n: int | None = None):
    """Repartition iff the input has fewer partitions than the target.

    Expression-heavy operators (minhash, simhash, language ID) are
    CPU-bound; a small parquet table often arrives as ONE file = one
    partition, serializing the whole computation. The shuffle this
    inserts is negligible next to the per-row work it parallelizes.
    No-op when the scan is already parallel (the 100 TB case).

    Partition count comes from the PHYSICAL PLAN's output partitioning
    (``outputPartitioning().numPartitions()``), not ``df.rdd`` — the
    RDD probe forces a full DataFrame→RDD conversion (deserializer
    stage) per call, which showed up as constant overhead in query
    construction."""
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    try:
        parts = (
            df._jdf.queryExecution().executedPlan().outputPartitioning().numPartitions()
        )
    except Exception:  # noqa: BLE001 — plan probe is best-effort
        parts = df.rdd.getNumPartitions()
    if parts < n:
        return df.repartition(n)
    return df
