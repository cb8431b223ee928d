"""Measure the size-gated Q5/Q7 join-shape router at multiple derived
scales (r11, VERDICT r10 next-round #1).

For each replica multiple: build the decorrelated replica dir
(bench._build_sf1), report which route the gate picks (the orders-scan
estimate vs the broadcast threshold), and time route=auto / "late" /
"early" through the noop sink (min-of-N). The claim under test: auto
matches the measured winner at every scale — "late" (broadcast-
chained) while orders still broadcasts, "early" (dim-filter-first)
once it does not.

Usage: python scripts/q5q7_route_probe.py [replica_list]
       python scripts/q5q7_route_probe.py 10,100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from kaggle_ecommerce_etl_spark.queries import q_revenue_by_nation
from kaggle_ecommerce_etl_spark.queries_ext import q_nation_volume_pairs
from kaggle_ecommerce_etl_spark.session import get_spark
from kaggle_ecommerce_etl_spark.util import (
    broadcast_threshold_bytes,
    outgrows_broadcast,
    plan_size_bytes,
)

QUERIES = {
    "revenue_by_nation": q_revenue_by_nation,
    "nation_volume_pairs": q_nation_volume_pairs,
}


def main() -> None:
    replicas = sorted(
        int(r) for r in (sys.argv[1] if len(sys.argv) > 1 else "10,100").split(",")
    )
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_CURVE_RUNS", "2"))
    spark = get_spark("q5q7-route-probe")
    spark.range(10).count()
    out: dict = {
        "threshold_bytes": broadcast_threshold_bytes(spark),
        "canary_pre": bench.trivial_canary(spark, src),
        "canary_shuffle_pre": bench.shuffle_canary(spark, src),
        "points": {},
    }
    for r in replicas:
        bench.SF1_REPLICAS = r
        run_dir = bench._build_sf1(spark, src)
        orders = spark.read.parquet(f"{run_dir}/orders.parquet")
        point = {
            "orders_bytes": plan_size_bytes(orders),
            "gate_early": outgrows_broadcast(orders),
            "queries": {},
        }
        for qname, fn in QUERIES.items():
            rec = {}
            for route in (None, "late", "early"):
                runs = []
                for _ in range(n_runs):
                    spark.sparkContext.setJobDescription(
                        f"{qname} x{r} route={route}"
                    )
                    t0 = time.time()
                    fn(spark, run_dir, route=route).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    runs.append(round(time.time() - t0, 2))
                rec["auto" if route is None else route] = {
                    "sec": min(runs), "runs": runs,
                }
            point["queries"][qname] = rec
            print("#", r, qname, json.dumps(rec), flush=True)
        out["points"][str(r)] = point
    out["canary_post"] = bench.trivial_canary(spark, src)
    out["canary_shuffle_post"] = bench.shuffle_canary(spark, src)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
