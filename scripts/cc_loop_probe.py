"""Calibrate the distributed connected-components loop (the path
dup_clusters takes ABOVE the driver union-find cap) across pointer-
doubling hop counts — the VERDICT r10 next-round #3 measurement.

Synthetic graphs, deterministic (xxhash64-derived endpoints — no
rand(), so re-runs and retried tasks see identical edges):

- ``random``: E edges over n = E/2 nodes — supercritical, one giant
  component, O(log n) diameter; the realistic near-dup regime.
- ``path``: an n-node path — the adversarial deep-diameter shape that
  maximizes round count.

For each (graph, edge-count, hops) cell: force the distributed loop
(driver_fastpath_max_edges=0), drain through the noop sink, record
wall seconds (min-of-N) and the loop's materialized round count
(dedup_ml.LAST_LOOP_ROUNDS). Canaries (bench.py's frozen plans) stamp
host state.

Usage:
    python scripts/cc_loop_probe.py [edge_list] [hops_list] [graphs]
    python scripts/cc_loop_probe.py 10000000,30000000 1,3 random,path
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from kaggle_ecommerce_etl_spark.functions import dedup_ml
from kaggle_ecommerce_etl_spark.session import get_spark


def build_edges(spark, kind: str, n_edges: int):
    if kind == "random":
        n_nodes = max(2, n_edges // 2)
        e = spark.range(n_edges).select(
            (F.abs(F.xxhash64(F.col("id") * 2 + 1)) % n_nodes).alias("id1"),
            (F.abs(F.xxhash64(F.col("id") * 2 + 2)) % n_nodes).alias("id2"),
        )
        return e.filter(F.col("id1") != F.col("id2"))
    if kind == "path":
        return spark.range(n_edges).select(
            F.col("id").alias("id1"), (F.col("id") + 1).alias("id2")
        )
    raise ValueError(kind)


def main() -> None:
    edge_counts = [
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "10000000,30000000").split(",")
    ]
    hop_list = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,3").split(",")]
    graphs = (sys.argv[3] if len(sys.argv) > 3 else "random,path").split(",")
    n_runs = int(os.environ.get("SPARK_GRAFT_CURVE_RUNS", "2"))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("cc-loop-probe")
    spark.range(10).count()
    out: dict = {
        "canary_pre": bench.trivial_canary(spark, src),
        "canary_shuffle_pre": bench.shuffle_canary(spark, src),
        "cells": [],
    }
    # r10 code has no hops knob (1 hop hard-wired); tolerate it so the
    # same probe can measure the before-worktree
    base_hops = getattr(dedup_ml, "_CC_DOUBLING_HOPS", 1)
    try:
        for kind in graphs:
            for n_e in edge_counts:
                # materialize the edge list ONCE so every hops variant
                # times the loop, not the generator
                edges = build_edges(spark, kind, n_e).localCheckpoint(eager=True)
                real_e = edges.count()
                for hops in hop_list:
                    dedup_ml._CC_DOUBLING_HOPS = hops
                    runs, rounds = [], None
                    for _ in range(n_runs):
                        spark.sparkContext.setJobDescription(
                            f"cc {kind} E={n_e} hops={hops}"
                        )
                        t0 = time.time()
                        dedup_ml.dup_clusters(
                            edges, driver_fastpath_max_edges=0
                        ).write.format("noop").mode("overwrite").save()
                        runs.append(round(time.time() - t0, 2))
                        # r10 code (the before-measurement worktree)
                        # has no round counter
                        rounds = getattr(dedup_ml, "LAST_LOOP_ROUNDS", None)
                    cell = {
                        "graph": kind, "edges": real_e, "hops": hops,
                        "sec": min(runs), "runs": runs, "rounds": rounds,
                    }
                    out["cells"].append(cell)
                    print("#", json.dumps(cell), flush=True)
                edges.unpersist()
    finally:
        dedup_ml._CC_DOUBLING_HOPS = base_hops
    out["canary_post"] = bench.trivial_canary(spark, src)
    out["canary_shuffle_post"] = bench.shuffle_canary(spark, src)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
