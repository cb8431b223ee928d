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
    """Repartition iff it would at least DOUBLE the parallelism.

    Expression-heavy operators (minhash, simhash, language ID) are
    CPU-bound; a small parquet table often arrives as ONE file = one
    partition, serializing the whole computation. The shuffle this
    inserts is negligible next to the per-row work it parallelizes.
    No-op when the scan is already parallel (the 100 TB case).

    The 2× threshold (r7, closes the SCALE_CURVE_r06 minhash 2.41
    question): a round-robin repartition shuffles the FULL input —
    its cost grows linearly with data while its benefit vanishes as
    native parallelism approaches the core count. Measured on the
    30×-replica documents scan (30 native parts, 32 cores):
    repartition(32) 1.66 s vs no-op 1.57 s — the shuffle costs more
    than the 30→32 gain — while at 10 native parts repartition(32)
    wins 0.93 s vs 1.29 s. Repartitioning only below n/2 keeps every
    ≥2× win and drops every marginal full-data shuffle; minhash's
    30×/10× ratio falls 2.41 → ~1.7 (same-session probe, SCALING.md).

    Partition count comes from the PHYSICAL PLAN's output partitioning
    (``outputPartitioning().numPartitions()``), not ``df.rdd`` — the
    RDD probe forces a full DataFrame→RDD conversion (deserializer
    stage) per call, which showed up as constant overhead in query
    construction."""
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    parts = 0
    try:
        parts = (
            df._jdf.queryExecution().executedPlan().outputPartitioning().numPartitions()
        )
    except Exception:  # noqa: BLE001 — plan probe is best-effort
        pass
    if parts == 0:
        # File scans report UnknownPartitioning(0) from the plan probe
        # (discovered r7 — the probe NEVER no-op'd a parquet scan, so
        # every scan paid the shuffle at every scale). Estimate from
        # the leaf-file count: a metadata call, no RDD conversion.
        # File-per-partition layouts (testdata, the replica harness,
        # any sanely-written table) make this exact; a giant
        # multi-row-group single file underestimates and pays one
        # avoidable repartition — the benign direction.
        try:
            parts = len(df.inputFiles())
        except Exception:  # noqa: BLE001 — non-file source
            parts = 0
    if parts == 0:
        parts = df.rdd.getNumPartitions()
    if parts * 2 <= n:
        return df.repartition(n)
    return df
