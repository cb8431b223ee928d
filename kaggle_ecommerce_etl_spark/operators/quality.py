"""Declarative data-quality expectations — the engine's "assert on
data" surface (the Great-Expectations-style check, Spark-first).

The reference's quality control is try/except + DB constraints
(SURVEY.md §5: composite PK pg.py:472, CHECK pg.py:519, NOT NULL
pg.py:452-453). Here the same intents are DECLARED as rules and
evaluated in ONE aggregation pass over the table (+ one tiny
broadcast-join pre-step per referential rule) — a validation report
costs one scan regardless of how many rules it carries.

Each rule yields (rule, metric, passed): metric is the violation
count (or distinct-violation count), so reports are comparable run
over run and the SQL oracle can restate them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expect_not_null", "expect_unique", "expect_in_set",
           "expect_range", "expect_ref", "validate", "observed_write"]


def observed_write(df: DataFrame, metrics: list, writer=None) -> dict:
    """Zero-extra-pass profiling: attach named aggregate metrics to a
    pass the job ALREADY makes (``Dataset.observe``) and run the write
    — the audit numbers (row counts, null counts, control sums) come
    back to the driver as task-metric side-channel, costing no second
    scan. The reference's equivalent is a separate profiling read
    before the load; at 100 TB the saved pass is the whole point.

    ``metrics`` is a list of (name, aggregate Column); ``writer``
    defaults to the noop sink (full computation, no output) and in
    production is the real parquet/JDBC writer. Returns {name: value}
    after the action completes."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics])
    if writer is None:
        def writer(d: DataFrame) -> None:
            d.write.format("noop").mode("overwrite").save()
    writer(observed)
    return obs.get


def expect_not_null(col: str) -> tuple[str, str, object]:
    return (f"not_null:{col}", "agg", F.sum(F.col(col).isNull().cast("long")))


def expect_unique(col: str) -> tuple[str, str, object]:
    # duplicates = rows - distinct keys; exact, one pass
    return (
        f"unique:{col}",
        "agg",
        F.count(F.lit(1)) - F.count_distinct(F.col(col)),
    )


def expect_in_set(col: str, allowed: list) -> tuple[str, str, object]:
    cond = ~F.col(col).isin(allowed) & F.col(col).isNotNull()
    return (f"in_set:{col}", "agg", F.sum(cond.cast("long")))


def expect_range(col: str, lo=None, hi=None) -> tuple[str, str, object]:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return (f"range:{col}", "agg", F.sum(cond.cast("long")))


def expect_ref(col: str, dim: DataFrame, dim_col: str) -> tuple[str, str, object]:
    """Referential integrity: values of ``col`` must exist in
    ``dim.dim_col``. Evaluated as a broadcast left-anti count."""
    return (f"ref:{col}->{dim_col}", "ref", (dim, dim_col, col))


def validate(df: DataFrame, rules: list) -> DataFrame:
    """Evaluate all rules; returns (rule, violations, passed) rows.

    All 'agg' rules ride ONE aggregation job; each referential rule
    adds one broadcast anti-join count folded into the same result
    frame via a cross of 1-row aggregates (unioned, not collected)."""
    if not rules:
        return df.sparkSession.createDataFrame(
            [], "rule string, violations long, passed boolean"
        )
    agg_rules = [(name, e) for name, kind, e in rules if kind == "agg"]
    ref_rules = [(name, e) for name, kind, e in rules if kind == "ref"]

    parts = []
    if agg_rules:
        wide = df.agg(
            *[e.cast("long").alias(f"__m{i}") for i, (_n, e) in enumerate(agg_rules)]
        )
        # rule names ride as lit() Column args (never interpolated into
        # SQL text — quotes/backslashes in column names stay safe)
        pairs: list[Column] = []
        for i, (name, _e) in enumerate(agg_rules):
            pairs += [F.lit(name), F.col(f"__m{i}")]
        parts.append(
            wide.select(
                F.stack(F.lit(len(agg_rules)), *pairs).alias("rule", "violations")
            )
        )
    for name, (dim, dim_col, col) in ref_rules:
        missing = (
            df.select(F.col(col))
            .filter(F.col(col).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .select(F.lit(name).alias("rule"), "violations")
        )
        parts.append(missing)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)
