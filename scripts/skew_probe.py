"""Hot-key probe for the op-15 conflict split (VERDICT r8 next-round
#5): manufacture the skew regime SCALING.md promises a fallback for,
and MEASURE it instead of asserting it.

SCALING.md documents that AQE's skew handling does not apply to the
window formulation of `conflict_split` (one hot key concentrates its
full row set in a single window task) and names the agg+join variant
(`conflict_split_aggjoin`: map-side partial counts + AQE-skew-split
join) as the shape that survives a pathological key. No committed
probe had ever built that key and timed the two variants side by side.

This script builds a REPLICATED sf0.1 lineitem (same decorrelated
replica idiom as bench._build_sf1: replica r shifts the key space so
uniform keys stay uniform) and then reassigns a deterministic ~10% of
all rows to ONE hot l_orderkey. At 10x that is ~6.0M rows with ~600k
on the hot key; at 30x ~18M rows with ~1.8M hot. Both variants are
timed min-of-N (default 3) with bench.py's dual frozen canaries
bracketing each scale point (the r8 discipline: a reading is only
adjudicable when the canaries are in band), and value parity between
the variants is asserted on the probe data itself (clean/flagged row
counts must match exactly — the skew-safe route is only a route if it
computes the same split).

Usage:
    python scripts/skew_probe.py [replicas ...]   # default: 10 30
    SPARK_GRAFT_PROBE_RUNS=4 python scripts/skew_probe.py

Output: one JSON line per scale point + a summary JSON line; redirect
to SKEW_PROBE_r{N}.txt for the committed artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from kaggle_ecommerce_etl_spark.operators.dedup import (
    conflict_split,
    conflict_split_aggjoin,
)
from kaggle_ecommerce_etl_spark.session import get_spark

HOT_FRACTION_MOD = 10  # 1-in-10 rows reassigned to the hot key
HOT_KEY = -1  # sentinel outside the natural key space


def build_skewed(spark, src: str, replicas: int) -> str:
    """Replicated lineitem with ~10% of rows on ONE hot key; cached
    under /tmp with a ready marker (same build-once idiom as
    bench._build_sf1, keyed by source + replica count)."""
    from pyspark.sql import functions as F

    dst = f"/tmp/spark_graft_skew_{replicas}x_{os.path.basename(src.rstrip('/'))}"
    done = f"{dst}/_SPARK_GRAFT_READY"
    if os.path.exists(done):
        return dst
    base = spark.read.parquet(f"{src}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice",
    )
    max_key = base.agg(F.max("l_orderkey")).collect()[0][0]
    rep = base.withColumn(
        "__r", F.explode(F.array(*[F.lit(i) for i in range(replicas)]))
    )
    # replica r shifts the key space: uniform keys stay uniform and
    # replica blocks stay decorrelated (the _build_sf1 idiom)
    shifted = rep.withColumn(
        "l_orderkey",
        F.col("l_orderkey") + F.col("__r") * F.lit(int(max_key) + 1),
    )
    # deterministic 1-in-HOT_FRACTION_MOD of ALL rows -> one hot key
    skewed = shifted.withColumn(
        "l_orderkey",
        F.when(
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber", "__r"),
                F.lit(HOT_FRACTION_MOD),
            )
            == 0,
            F.lit(HOT_KEY).cast("bigint"),
        ).otherwise(F.col("l_orderkey")),
    ).drop("__r")
    skewed.write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")
    with open(done, "w") as fh:
        fh.write("ok")
    return dst


def _time_variant(spark, path: str, fn, n_runs: int) -> tuple[float, list[float]]:
    runs = []
    for _ in range(n_runs):
        df = spark.read.parquet(f"{path}/lineitem.parquet")
        t0 = time.time()
        clean, flagged = fn(df, ["l_orderkey"])
        clean.write.format("noop").mode("overwrite").save()
        flagged.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    return min(runs), runs


def main() -> int:
    replicas = [int(a) for a in sys.argv[1:]] or [10, 30]
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-probe")
    spark.range(10).count()  # JVM warm
    summary: dict[str, dict] = {}
    for r in replicas:
        path = build_skewed(spark, src, r)
        canary_pre = bench.trivial_canary(spark, src)
        canary_shuffle_pre = bench.shuffle_canary(spark, src)
        # value parity first: the skew-safe route must compute the
        # SAME split on the skewed data (counted once, not per run)
        df = spark.read.parquet(f"{path}/lineitem.parquet")
        w_clean, w_flag = conflict_split(df, ["l_orderkey"])
        a_clean, a_flag = conflict_split_aggjoin(df, ["l_orderkey"])
        parity = {
            "clean_window": w_clean.count(),
            "clean_aggjoin": a_clean.count(),
            "flagged_window": w_flag.count(),
            "flagged_aggjoin": a_flag.count(),
        }
        assert parity["clean_window"] == parity["clean_aggjoin"], parity
        assert parity["flagged_window"] == parity["flagged_aggjoin"], parity
        t_window, window_runs = _time_variant(
            spark, path, conflict_split, n_runs
        )
        t_aggjoin, aggjoin_runs = _time_variant(
            spark, path, conflict_split_aggjoin, n_runs
        )
        canary_post = bench.trivial_canary(spark, src)
        canary_shuffle_post = bench.shuffle_canary(spark, src)
        point = {
            "replicas": r,
            "rows": df.count(),
            "hot_rows": df.filter(f"l_orderkey = {HOT_KEY}").count(),
            "window_min": t_window,
            "window_runs": window_runs,
            "aggjoin_min": t_aggjoin,
            "aggjoin_runs": aggjoin_runs,
            "window_over_aggjoin": round(t_window / t_aggjoin, 2),
            "parity": parity,
            "n_runs": n_runs,
            "canary_pre": canary_pre,
            "canary_post": canary_post,
            "canary_shuffle_pre": canary_shuffle_pre,
            "canary_shuffle_post": canary_shuffle_post,
        }
        summary[f"{r}x"] = point
        print(json.dumps(point), flush=True)
    print(json.dumps({"metric": "skew_probe", "points": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
