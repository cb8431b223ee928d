"""Head-to-head probe behind LSH_ROUTE_MARGIN (ROUTE_PROBE_r07.txt).

Measures semantic_pairs_auto's two routes against each other on a
derived replica corpus, prints which route the router picks and the
measured cost of BOTH routes — the evidence that calibrated the
margin (r7: 4 -> 128 after the n=20k, theta=0.85 misroute measured
16.2 s LSH vs 1.3 s exact) and validated it at n=200k (exact wins
2.88x; the 12.5x -> 2.88x gap narrowing is the n*T*128-vs-n^2/2
trend that puts the flip near n~1M).

r8 hardening (ADVICE r7): the router is fed the exact n (same corpus
size as both timed arms and the LSH sizing — previously it used the
Catalyst sizeInBytes estimate, so a divergent estimate could make
the RIGHT/WRONG verdict compare mismatched configurations; the
estimate is still printed for drift monitoring), runs default to
min-of-3 per the repo noise discipline, and the same constant-plan
nation-count canary as bench.py brackets each timed arm so a noisy
hypervisor window is visible in-band.

Usage:
    python scripts/route_probe.py [replicas] [theta] [runs]
    python scripts/route_probe.py 10 0.85 3     # the calibration point
    python scripts/route_probe.py 100 0.85 3    # the validation point
    python scripts/route_probe.py guard [replicas] [theta]
        # r9 drift-guard audit: call the router with the ESTIMATED n
        # (production mode) on a corpus whose decision ratio lands
        # inside the guard band, and report — via the router's audit
        # attributes — whether the resolving count() fired, what n the
        # decision actually used, and the measured estimate drift on
        # this layout. Does NOT execute the chosen route (at guard-band
        # n the exact arm is minutes-long; the audit only needs the
        # plan + the count).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from kaggle_ecommerce_etl_spark.functions import similarity as S
from kaggle_ecommerce_etl_spark.session import get_spark


def guard_audit() -> None:
    """Live demonstration of LSH_ROUTE_DRIFT_GUARD on a real layout."""
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    theta = float(sys.argv[3]) if len(sys.argv) > 3 else 0.85
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("route-guard-audit")
    spark.range(10).count()
    bench.SF1_REPLICAS = replicas
    run_dir = bench._build_sf1(spark, src)
    emb = spark.read.parquet(f"{run_dir}/embeddings.parquet")
    true_n = emb.count()
    est = S._estimated_rows(emb, "embedding", 64)

    def ratio(n: int) -> float:
        _, _, _, _, ep, lc = S._route_inputs(n, theta, 256, 0.9, 64)
        return ep / (lc * S.LSH_ROUTE_MARGIN)

    t0 = time.time()
    out = S.semantic_pairs_auto(emb, theta)  # ESTIMATED n: production mode
    decide_s = round(time.time() - t0, 3)
    print(
        f"theta={theta} true_n={true_n} catalyst_estimate={est} "
        f"drift={true_n / est:.2f}x under | est ratio={ratio(est):.3f} "
        f"true ratio={ratio(true_n):.3f} band=[1/{S.LSH_ROUTE_DRIFT_GUARD:g},"
        f" {S.LSH_ROUTE_DRIFT_GUARD:g}]",
        flush=True,
    )
    print(
        f"guard_count_fired={out._graft_drift_count} "
        f"decision_n={out._graft_route_n} route={out._graft_route} "
        f"decision_cost={decide_s}s (plan build + any resolving count; "
        f"route NOT executed)",
        flush=True,
    )
    S.release_corpus_caches()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "guard":
        guard_audit()
        return
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

    def canary() -> float:
        """Constant-plan noise canary — same plan as bench.py's."""
        runs = []
        for _ in range(3):
            t0 = time.time()
            spark.read.parquet(f"{src}/nation.parquet").groupBy().count(
            ).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        return round(min(runs), 3)

    # feed the router the EXACT n so the verdict below compares the
    # same corpus size the timed arms and the (b, T) sizing use; print
    # the Catalyst estimate alongside so estimate drift stays visible
    est = S._estimated_rows(emb, "embedding", 64)
    chosen = getattr(
        S.semantic_pairs_auto(emb, theta, n_rows=n), "_graft_route", None
    )
    b, t = S.lsh_auto_params(n, theta)
    print(
        f"route chosen: {chosen} (lsh would size b={b} T={t}; "
        f"catalyst row estimate={est} vs exact n={n})",
        flush=True,
    )

    def timeit(make, label):
        c_pre = canary()
        ts = []
        for _ in range(n_runs):
            S.release_corpus_caches()
            df = make()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 2))
        S.release_corpus_caches()
        c_post = canary()
        print(
            f"{label}: min={min(ts)} runs={ts} "
            f"canary_pre={c_pre} canary_post={c_post}",
            flush=True,
        )
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
