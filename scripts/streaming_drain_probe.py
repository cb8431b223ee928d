"""Production-shaped streaming drain at scale: foreachBatch, not memory.

The registry's streaming_dedup_run / streaming_sessionize_run drain to a
MEMORY sink because their job is the oracle comparison (the drained rows
must be readable back). That harness caps the measurable scale: at the
100x replica (10M events, 13.3M streamed rows after the dup fan-out) the
driver-side in-memory table dominates wall time (108.7 s min, runs still
falling 490 -> 420 -> 109) and OOMs an 8g heap — none of which says
anything about the OPERATOR. Production drains go through foreachBatch
to a real sink (SCALING.md "Streaming" — the memory sink appears only
inside the oracle harness), so this probe measures THAT shape: the same
fixture dirs, the same dedup_stream_exact / sessionize_stateful
operators, drained with Trigger.AvailableNow into a per-batch noop
write. What grows with scale is exactly what would grow on a cluster:
file-source listing, state-store rows, shuffle — not a driver array.

Usage: python scripts/streaming_drain_probe.py [replica_list]
Prints one JSON line shaped like scale_curve.py's output.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from kaggle_ecommerce_etl_spark.queries import _t
from kaggle_ecommerce_etl_spark.queries_ext import (
    _publish_fixture_dir,
    _stream_fixture_dir,
)
from kaggle_ecommerce_etl_spark.session import get_spark


def _noop_batch(df, _batch_id) -> None:
    df.write.format("noop").mode("overwrite").save()


def _drain(stream_df) -> None:
    # Single-use checkpoint by construction (every drain is a fresh
    # availableNow pass over the full fixture) — remove it after the
    # drain: at 100x the sessionize state store holds ~10M user keys,
    # and n_runs x drains x replicas leaked trees would accumulate
    # real /tmp disk across sessions (ADVICE r9).
    ckpt = tempfile.mkdtemp(prefix="ckpt_probe_")
    try:
        q = (
            stream_df.writeStream.foreachBatch(_noop_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def publish_dedup_fixture(spark, sf_dir: str):
    """Publish (idempotently) the dedup stream fixture; return
    (schema, src_dir). Split from the drain so main() can run it
    UNTIMED — with SPARK_GRAFT_CURVE_RUNS=1 the one-time fixture write
    (13.3M rows at 100x) would otherwise land inside the t0 window and
    be misattributed to the operator (ADVICE r9)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    src_dir = _stream_fixture_dir("dedup:v1", sf_dir)

    def _build(stage: str) -> None:
        dups = ev.filter(F.col("event_id") % 3 == 0)
        ev.unionByName(dups).repartition(2).write.mode("overwrite").parquet(stage)

    _publish_fixture_dir(src_dir, _build)
    return ev.schema, src_dir


def drain_dedup(spark, sf_dir: str) -> None:
    """streaming_dedup_run's fixture + operator, noop foreachBatch sink."""
    from kaggle_ecommerce_etl_spark.streaming.dedup import dedup_stream_exact

    schema, src_dir = publish_dedup_fixture(spark, sf_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    _drain(dedup_stream_exact(stream, ["event_id"]))


def publish_sessionize_fixture(spark, sf_dir: str):
    """Publish (idempotently) the sessionize stream fixture; return
    (schema, src_dir). Same untimed-publication contract as
    publish_dedup_fixture."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    src_dir = _stream_fixture_dir("sess:v2", sf_dir)

    def _build(stage: str) -> None:
        sentinels = (
            ev.select("user_id")
            .distinct()
            .withColumn("ts", F.lit("2030-01-01").cast("timestamp"))
            .withColumn("value", F.lit(0.0))
        )
        ev.unionByName(sentinels).repartition(2).write.mode("overwrite").parquet(
            stage
        )

    _publish_fixture_dir(src_dir, _build)
    return ev.schema, src_dir


def drain_sessionize(spark, sf_dir: str) -> None:
    """streaming_sessionize_run's fixture + operator, noop sink."""
    from kaggle_ecommerce_etl_spark.streaming.stateful import sessionize_stateful

    schema, src_dir = publish_sessionize_fixture(spark, sf_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    _drain(sessionize_stateful(stream))


DRAINS = {
    "streaming_dedup_drain": drain_dedup,
    "streaming_sessionize_drain": drain_sessionize,
}

#: Untimed fixture publication, run once per replica point before the
#: timed loop (ADVICE r9: the first timed run used to include the
#: one-time fixture build; _publish_fixture_dir is idempotent so the
#: in-loop call then costs one marker stat).
PUBLISHERS = {
    "streaming_dedup_drain": publish_dedup_fixture,
    "streaming_sessionize_drain": publish_sessionize_fixture,
}


def main() -> None:
    replicas = sorted(
        int(r) for r in (sys.argv[1] if len(sys.argv) > 1 else "10,100").split(",")
    )
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_CURVE_RUNS", "3"))
    spark = get_spark("streaming-drain-probe")
    spark.range(10).count()

    points: dict[str, dict[str, float]] = {}
    run_detail: dict[str, dict[str, list[float]]] = {}
    canaries: dict[str, float] = {}
    shuffle_canaries: dict[str, float] = {}
    for r in replicas:
        bench.SF1_REPLICAS = r
        run_dir = bench._build_sf1(spark, src)
        # min-of-2 canaries: same cold-JIT rationale as scale_curve.py
        canaries[str(r)] = min(bench.trivial_canary(spark, src) for _ in range(2))
        shuffle_canaries[str(r)] = min(
            bench.shuffle_canary(spark, src) for _ in range(2)
        )
        timings: dict[str, float] = {}
        detail: dict[str, list[float]] = {}
        for name, fn in DRAINS.items():
            PUBLISHERS[name](spark, run_dir)  # untimed: fixture build
            runs = []
            for _ in range(n_runs):
                t0 = time.time()
                fn(spark, run_dir)
                runs.append(time.time() - t0)
            timings[name] = round(min(runs), 3)
            detail[name] = [round(x, 2) for x in runs]
            print(f"# {r}x {name}: {timings[name]}s (runs {detail[name]})",
                  file=sys.stderr)
        points[str(r)] = timings
        run_detail[str(r)] = detail

    out: dict = {"points": points, "unit": "sec", "agg": f"min-of-{n_runs}",
                 "canary_per_point": canaries,
                 "shuffle_canary_per_point": shuffle_canaries,
                 "run_detail": run_detail}
    if len(replicas) >= 2:
        lo, hi = str(replicas[0]), str(replicas[-1])
        out[f"ratio_{hi}_over_{lo}"] = {
            q: round(points[hi][q] / points[lo][q], 2)
            for q in points[lo]
            if points[lo].get(q)
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
