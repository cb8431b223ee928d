"""Similarity search over embedding columns (north_star extension).

Embeddings are ``array<float>`` columns. Two paths:

- :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set against the candidate corpus, score with a pure
  ``zip_with``/``aggregate`` expression (JVM-side, no Python), window
  top-k per query. At 100 TB the corpus side stays partitioned and
  scanned once; only queries are broadcast. This is the correctness
  baseline.
- :func:`lsh_bucket_topk` — scale path: random-hyperplane (SimHash) LSH
  buckets computed from a seed-derived constant hyperplane matrix; join
  queries to candidates on bucket id, then exact re-rank inside buckets.
  Trades recall for a (corpus ∞-scalable) equi-join instead of a cross
  product.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a fold — sequential over the array, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    Output: query_id, neighbor_id, sim (round 6), rank. Self-matches
    (same id) are excluded. Ties broken by neighbor_id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 6))
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Seed-derived constant hyperplane matrix (driver-side, tiny —
    shipped to executors as literals inside the plan)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of the vector against each hyperplane,
    packed into a long. Pure expression — no UDF, no shuffle."""
    v = _as_double(vec)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(p) for p in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 1,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket then exact re-rank.
    Scale path — the corpus is hash-partitioned by bucket, never
    cross-joined.

    ``n_tables`` > 1 enables OR-amplification: independent hyperplane
    sets; a pair is a candidate if it collides in ANY table. Recall for
    a pair at per-plane collision probability p is 1-(1-p^b)^T instead
    of p^b — the standard recall/cost dial.

    Physical shape (the 100 TB path): each side computes ALL table
    buckets in ONE projection, then explodes to (table, bucket) rows —
    the plane dot products run once per input row, not once per table.
    A single equi-join on (table, bucket) replaces T separate joins
    (one shuffle; per-bucket skew handled by AQE skew-join). Candidates
    are deduped before the exact re-rank, so each pair is scored once.
    """
    tables = [
        hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]

    def _bucketed(df: DataFrame, out_id: str) -> DataFrame:
        all_buckets = F.array(
            *[bucket_expr(F.col(vec_col), planes) for planes in tables]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(all_buckets).alias("__table", "__bucket"),
        )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    cand = (
        _bucketed(corpus, "neighbor_id")
        .join(F.broadcast(_bucketed(queries, "query_id")), on=["__table", "__bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn("sim", F.round(cosine_expr(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
