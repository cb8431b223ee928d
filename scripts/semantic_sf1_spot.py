"""Reduced-n sf1 spot oracle for the two semantic-dedup queries
(VERDICT r7 next-round #5 — shrink the sf1 exclusion list to zero).

The full-registry sf1 gate (ORACLE_SF1_r07.txt) excluded
`semantic_dedup_keep` and `semantic_dedup_auto` because their DuckDB
RECURSIVE-CTE closure oracle takes ~35 min at the full 20k-vector sf1
corpus. This script closes that hole with a SLICE gate: it derives a
reduced embeddings corpus FROM the sf1 replica dir (every stride-th
vec_id, so the slice spans all ten decorrelated replicas and keeps
the rotated-replica structure the exclusion was about), symlinks the
other nine tables unchanged, and runs the standard check_oracle gate
— the identical Spark query and the identical recursive-CTE oracle,
just at a closure size DuckDB finishes in minutes. Pair volume scales
n², so 2k of 20k vectors ≈ 1% of the oracle's join work.

Usage:
    python scripts/semantic_sf1_spot.py [n_slice] [replicas]
    python scripts/semantic_sf1_spot.py            # 2000 of the 20k sf1 vectors
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from kaggle_ecommerce_etl_spark.session import get_spark

SPOT_QUERIES = ["semantic_dedup_keep", "semantic_dedup_auto"]
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_spot_dir(n_slice: int, replicas: int) -> str:
    """Derive the sliced-embeddings sf1 dir; returns its path."""
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("semantic-sf1-spot")
    bench.SF1_REPLICAS = replicas
    sf1_dir = bench._build_sf1(spark, src)

    spot = f"{sf1_dir}_semspot{n_slice}"
    done = f"{spot}/_SPARK_GRAFT_READY"
    # Staleness check (ADVICE r8): the marker used to cache the slice
    # forever — a rebuilt/evicted sf1 replica dir left dangling
    # symlinks and a stale embeddings slice behind a still-green
    # marker. The marker now records the source dir and its
    # ready-stamp mtime; any mismatch invalidates the cache.
    sf1_ready = f"{sf1_dir}/_SPARK_GRAFT_READY"
    src_sig = f"{sf1_dir}\n{os.path.getmtime(sf1_ready)}"
    if os.path.exists(done):
        with open(done) as fh:
            if fh.read() != src_sig:
                import shutil

                print(f"spot dir {spot}: source sf1 dir rebuilt — "
                      "invalidating stale slice", flush=True)
                shutil.rmtree(spot, ignore_errors=True)
    if not os.path.exists(done):
        os.makedirs(spot, exist_ok=True)
        emb = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")
        n = emb.count()
        stride = max(1, n // n_slice)
        # every stride-th vec_id: deterministic, spans all replicas
        # (replica r occupies the contiguous id block [r*span, (r+1)*span))
        emb.filter(f"vec_id % {stride} = 0").repartition(
            replicas
        ).write.mode("overwrite").parquet(f"{spot}/embeddings.parquet")
        # The stride-selection math assumes contiguous 0..n-1 vec_ids;
        # verify the written slice is in tolerance rather than trusting
        # it (ADVICE r8) — a sparse/offset id space would silently gate
        # a much smaller corpus than the run claims.
        written = spark.read.parquet(f"{spot}/embeddings.parquet").count()
        expect = n // stride
        assert abs(written - expect) <= max(2, expect // 10), (
            f"sliced {written} rows, expected ~{expect} "
            f"(n={n}, stride={stride}) — non-contiguous vec_ids?"
        )
        for t in TABLES:
            if t == "embeddings":
                continue
            dst = f"{spot}/{t}.parquet"
            if not os.path.lexists(dst):
                os.symlink(f"{sf1_dir}/{t}.parquet", dst)
        with open(done, "w") as fh:
            fh.write(src_sig)
        print(f"spot dir {spot}: {n}-vector sf1 corpus sliced to "
              f"{written} (stride {stride})", flush=True)
    spark.stop()
    return spot


def main() -> int:
    n_slice = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spot = build_spot_dir(n_slice, replicas)
    # fresh process for the gate: check_oracle builds its own session
    # and the builder session above pinned different shuffle settings
    return subprocess.call(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "check_oracle.py"),
         spot, *SPOT_QUERIES],
    )


if __name__ == "__main__":
    raise SystemExit(main())
