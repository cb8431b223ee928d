"""Head-to-head probe behind LSH_ROUTE_MARGIN (ROUTE_PROBE_r07.txt).

Measures semantic_pairs_auto's two routes against each other on a
derived replica corpus, prints which route the router picks and the
measured cost of BOTH routes — the evidence that calibrated the
margin (r7: 4 -> 128 after the n=20k, theta=0.85 misroute measured
16.2 s LSH vs 1.3 s exact) and validated it at n=200k (exact wins
2.88x; the 12.5x -> 2.88x gap narrowing is the n*T-vs-n^2/2 trend
that puts the flip near n~1M).

Usage:
    python scripts/route_probe.py [replicas] [theta] [runs]
    python scripts/route_probe.py 10 0.85 3     # the calibration point
    python scripts/route_probe.py 100 0.85 2    # the validation point
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from kaggle_ecommerce_etl_spark.functions import similarity as S
from kaggle_ecommerce_etl_spark.session import get_spark


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    theta = float(sys.argv[2]) if len(sys.argv) > 2 else 0.85
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("route-probe")
    spark.range(10).count()
    bench.SF1_REPLICAS = replicas
    run_dir = bench._build_sf1(spark, src)
    emb = spark.read.parquet(f"{run_dir}/embeddings.parquet")
    n = emb.count()
    print(f"n_vectors={n} theta={theta} runs={n_runs}", flush=True)

    chosen = getattr(S.semantic_pairs_auto(emb, theta), "_graft_route", None)
    b, t = S.lsh_auto_params(n, theta)
    print(f"route chosen: {chosen} (lsh would size b={b} T={t})", flush=True)

    def timeit(make, label):
        ts = []
        for _ in range(n_runs):
            S.release_corpus_caches()
            df = make()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 2))
        S.release_corpus_caches()
        print(f"{label}: min={min(ts)} runs={ts}", flush=True)
        return min(ts)

    t_exact = timeit(lambda: S.cosine_pairs_above(emb, theta), "exact")
    t_lsh = timeit(
        lambda: S.lsh_neardup_pairs(
            emb, theta, n_planes=b, n_tables=t, dim=64, n_rows=n
        ),
        "lsh",
    )
    right = (chosen == "exact") == (t_exact <= t_lsh)
    print(
        f"LSH/exact = {t_lsh / t_exact:.2f}x — router picked {chosen!r}: "
        f"{'RIGHT' if right else 'WRONG'}",
        flush=True,
    )


if __name__ == "__main__":
    main()
