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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _round6(x: np.ndarray) -> np.ndarray:
    """round-half-AWAY-FROM-ZERO to 6 decimals — matches Spark
    ``F.round`` / DuckDB ``round`` (HALF_UP). ``np.round`` is
    half-to-even, which can diverge from the SQL oracles on exact
    .5 ties at the 6th decimal; this sign-aware floor form cannot."""
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5) / 1e6, x)


def _make_round6():
    """Fresh CLOSURE copy of :func:`_round6` for worker-side use.
    cloudpickle serializes module-level functions BY REFERENCE (the
    worker must import this package — breaks when only the driver
    extended sys.path); a closure pickles by value. Every nested
    mapInPandas body must capture this, never _round6 directly."""

    def _r6(x: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5) / 1e6, x)

    return _r6


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


def cosine_udf():
    """Arrow-batched cosine similarity over two array columns — the hot
    path for pairwise scoring. The pure-expression :func:`cosine_expr`
    is interpreted per-row (~45 µs/pair at dim 64); this is one numpy
    batch matmul, ~50× faster, and the idiomatic Pandas-UDF use.
    Differences vs the expression/DuckDB value are fp-summation-order
    only (≪ the round-6 output granularity)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        va = np.asarray(a.tolist(), dtype=np.float64)
        vb = np.asarray(b.tolist(), dtype=np.float64)
        dots = np.einsum("ij,ij->i", va, vb)
        norms = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        return pd.Series(dots / norms)

    return _cos


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
        .withColumn("sim", F.round(cosine_udf()(F.col("__qv"), F.col("__cv")), 6))
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


#: rows of the query side held on the driver at once. Caps BOTH driver
#: memory (one chunk of vectors) and the per-executor-batch sims matrix
#: (chunk × arrow-batch doubles: 4096 × 10 000 × 8 B ≈ 330 MB).
QUERY_CHUNK_ROWS = 4096


def _query_chunks(
    queries: DataFrame, id_col: str, vec_col: str, chunk_rows: int
):
    """Stream the query side to the driver in bounded chunks.

    ``toLocalIterator`` materializes ONE partition at a time, so the
    PYTHON-side working set is O(chunk). NOTE: each chunk is then
    ``sc.broadcast``-ed and every broadcast stays referenced by the
    lazily-returned plan until it executes, so the driver BLOCK-MANAGER
    footprint across chunks is O(|queries|) — the query side is
    contractually small. A huge query side means |Q|/chunk_rows corpus
    scans AND O(|Q|) broadcast bytes: use :func:`lsh_bucket_topk` or
    :func:`cosine_self_topk_blocked` there (a warning fires past
    ``_CHUNK_WARN_LIMIT`` chunks). Yields (ids, raw vec lists)."""
    import warnings

    n_chunks = 0
    ids: list = []
    vecs: list = []
    for row in queries.select(id_col, vec_col).toLocalIterator(
        prefetchPartitions=True
    ):
        ids.append(row[0])
        vecs.append(row[1])
        if len(ids) >= chunk_rows:
            n_chunks += 1
            if n_chunks == _CHUNK_WARN_LIMIT:
                warnings.warn(
                    f"query side exceeds {_CHUNK_WARN_LIMIT} chunks of "
                    f"{chunk_rows} rows; this path broadcasts O(|Q|) bytes "
                    "and rescans the corpus per chunk — route through "
                    "lsh_bucket_topk or cosine_self_topk_blocked instead",
                    stacklevel=3,
                )
            yield ids, vecs
            ids, vecs = [], []
    if ids:
        yield ids, vecs


#: chunks of the query side after which _query_chunks warns that the
#: "contractually small query side" contract is being stretched
_CHUNK_WARN_LIMIT = 64


def _normalized(ids: list, vecs: list) -> tuple[np.ndarray, np.ndarray]:
    q_ids = np.asarray(ids, dtype=np.int64)
    qmat = np.asarray(vecs, dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    return q_ids, qmat


def cosine_topk_matmul(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = QUERY_CHUNK_ROWS,
) -> DataFrame:
    """Exact top-k via blocked matmul, corpus fully distributed.

    Shape (the 100 TB-corpus path): the QUERY side — the contractually
    small side — is streamed to the driver in bounded chunks and
    broadcast; the corpus is scanned ONCE per chunk with
    ``mapInPandas``, each Arrow batch computing Qᵀ-block @ C-batch in
    numpy and emitting only its per-query top-k candidates (≤ |Q|·k
    rows per batch). A final window re-rank merges the partial top-ks.
    The corpus is never collected, never broadcast, and no |Q|×|C|
    pair rows ever materialize — the cross product lives only inside
    the numpy block.

    Contract: the QUERY side fits on the driver in chunks (its chunks
    are re-broadcast per corpus pass, so a huge query side means
    |Q|/chunk_rows corpus scans — use :func:`lsh_bucket_topk` there).
    Output/determinism identical to :func:`cosine_topk`: sim rounded
    to 6 BEFORE ranking, ties by neighbor_id, self-matches excluded.
    ``id_col`` must be integral on both sides — ids are coerced to
    int64 and the output schema pins long ids (string/UUID ids would
    need a surrogate-key projection first).
    """
    spark = corpus.sparkSession
    sc = spark.sparkContext
    c = corpus.select(id_col, vec_col)
    schema = "query_id long, neighbor_id long, sim double"

    partials: list[DataFrame] = []
    for ids, vecs in _query_chunks(queries, id_col, vec_col, chunk_rows):
        bc = sc.broadcast(_normalized(ids, vecs))

        _r6 = _make_round6()

        def _partial_topk(batches, _bc=bc):
            qids, qn = _bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cmat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
                cids = pdf[id_col].to_numpy(dtype=np.int64)
                # round BEFORE rank (oracle parity; HALF_UP like SQL round)
                sims = _r6(qn @ cmat.T)
                sims[qids[:, None] == cids[None, :]] = -np.inf  # self
                # per-row sort by (-sim, neighbor_id): lexsort the batch
                order = np.lexsort(
                    (np.broadcast_to(cids, sims.shape), -sims), axis=-1
                )[:, : min(k, sims.shape[1])]
                top_s = np.take_along_axis(sims, order, axis=1)
                keep = np.isfinite(top_s)
                n_per_q = keep.sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids, n_per_q),
                        "neighbor_id": cids[order][keep],
                        "sim": top_s[keep],
                    }
                )

        partials.append(c.mapInPandas(_partial_topk, schema))

    if not partials:
        empty = spark.createDataFrame([], schema + ", rank int")
        return empty
    partial = partials[0]
    for p in partials[1:]:
        partial = partial.unionByName(p)

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


#: Corpus projections persisted by cosine_pairs_above that no caller
#: has released yet. At most one is ever live: each new call evicts the
#: previous entry (sequential-materialization contract).
_ACTIVE_CORPUS_CACHES: list[DataFrame] = []


def release_corpus_caches() -> None:
    """Unpersist every corpus projection still pinned by
    :func:`cosine_pairs_above`. Safe to call at any time (double
    unpersist is a no-op); harnesses call it after materializing a
    pair-query result so the cache never outlives the query."""
    while _ACTIVE_CORPUS_CACHES:
        side = _ACTIVE_CORPUS_CACHES.pop()
        try:
            side.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def cosine_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = QUERY_CHUNK_ROWS,
    cache_corpus: bool = True,
) -> DataFrame:
    """EXACT all-pairs (id1 < id2) with cosine ≥ threshold — blocked
    matmul, no cross join in the plan.

    ``cache_corpus`` (default on) persists the 2-column corpus
    projection MEMORY_AND_DISK for the duration of the plan: the
    chunk loop re-scans the corpus |Q|/chunk_rows times, and each
    re-scan paying a fresh parquet decode was the dominant variance
    source in the 30× semantic-dedup band (r6; parquet decode
    pressure is scheduling/GC-sensitive, a cached columnar scan is
    not). The cached frame is attached to the returned DataFrame as
    ``_graft_cached_side`` so callers that materialize the result
    (e.g. q_semantic_dedup_keep via dup_clusters' eager checkpoint)
    can unpersist immediately. This is a size-bounded cache by
    CONTRACT: the exact-n² path is only routed to corpora small
    enough that n/chunk full scans are acceptable (see the LSH
    crossover in SCALING.md) — 2-column MEMORY_AND_DISK on such a
    corpus is strictly cheaper than re-decoding parquet per chunk.

    Same physical shape as :func:`cosine_topk_matmul`: one side
    streamed in bounded driver chunks + broadcast, the other scanned
    distributed; each (chunk × Arrow batch) block scores in one numpy
    matmul and emits only the (qid < cid, sim ≥ threshold) survivors.
    Every unordered pair is seen exactly once under qid < cid because
    the chunk loop covers all rows on the query side. Exact — unlike
    an LSH prefilter there is no recall loss, so results match the
    brute-force SQL oracle (same HALF_UP rounding, see ``_round6``;
    residual divergence limited to fp-summation-order ULPs feeding the
    6th decimal); the O(n²/block) work runs vectorized inside numpy
    instead of materializing pair rows. For corpora where even blocked
    n² is too much, the recall-trading path is :func:`lsh_bucket_topk`
    / minhash banding. ``id_col`` must be integral (int64-coerced,
    long output schema).
    """
    sc = df.sparkSession.sparkContext
    side = df.select(id_col, vec_col)
    if cache_corpus:
        from pyspark import StorageLevel

        # registry/bench callers run queries sequentially: a new call
        # means any prior result has been materialized (or abandoned),
        # so evict the previous projection before pinning a new one —
        # this bounds live cache to ONE projection per session even for
        # callers that never unpersist (the r6 leak in
        # q_embedding_neardup_pairs). Harness callers can also release
        # explicitly via release_corpus_caches().
        release_corpus_caches()
        side = side.persist(StorageLevel.MEMORY_AND_DISK)
        _ACTIVE_CORPUS_CACHES.append(side)
    schema = "id1 long, id2 long, sim double"

    partials: list[DataFrame] = []
    # iterate the SAME (cached) projection the partials scan: the
    # toLocalIterator pass populates the cache partition by partition,
    # so every chunk's corpus scan below hits memory
    for ids, vecs in _query_chunks(side, id_col, vec_col, chunk_rows):
        bc = sc.broadcast(_normalized(ids, vecs))

        _r6 = _make_round6()

        def _pairs(batches, _bc=bc):
            qids, qn = _bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cmat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
                cids = pdf[id_col].to_numpy(dtype=np.int64)
                sims = _r6(qn @ cmat.T)  # round BEFORE threshold (HALF_UP)
                mask = (sims >= threshold) & (qids[:, None] < cids[None, :])
                ii, jj = np.nonzero(mask)
                yield pd.DataFrame(
                    {"id1": qids[ii], "id2": cids[jj], "sim": sims[ii, jj]}
                )

        partials.append(side.mapInPandas(_pairs, schema))

    if not partials:
        if cache_corpus:
            side.unpersist()
        return df.sparkSession.createDataFrame([], schema)
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    if cache_corpus:
        out._graft_cached_side = side  # caller unpersists post-materialize
    return out


def cosine_self_topk_blocked(
    df: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
    n_rows: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors WITHIN one table (every row is both
    query and candidate), both sides fully distributed — the all-pairs
    sibling of :func:`cosine_topk_matmul` with ZERO driver
    participation: no collect, no toLocalIterator, no broadcast.

    Physical shape (the 100 TB path for nearest-neighbor-per-row):

    1. rows hash into B = ⌈n/block_rows⌉ coarse blocks; each block is
       packed into ONE (ids, matrix) row (one shuffle, block payload
       ≈ block_rows × dim × 8 B);
    2. the B×B block-pair cross join gives each task exactly two block
       payloads; the |C|² pair space exists only inside that task's
       numpy matmul, which emits ≤ block_rows·k candidate rows;
    3. a window re-rank merges partial top-ks per query.

    Network cost is B·|C| vector bytes (every block meets every other
    block) — the irreducible exact all-pairs shuffle, spread over B²
    independent tasks. Recall-trading alternative when even that is too
    much: :func:`lsh_bucket_topk` + exact re-rank of its candidates.

    Output/determinism identical to :func:`cosine_topk`: sim HALF_UP-
    rounded to 6 BEFORE ranking, ties by neighbor_id, self excluded.
    ``id_col`` must be integral (output schema pins long ids).

    The block grid is sized WITHOUT a full-scan action (at 100 TB a
    plan-construction ``count()`` is a whole extra pass): row count is
    estimated from Catalyst's sizeInBytes statistic divided by an
    estimated row width (vector dim from a bounded 1-row probe — the
    same class of driver action as the sanctioned 1-row header fetch).
    Grid granularity only shapes task sizing, never results: the
    algorithm is exact under ANY blocking, so a 2-4× row-estimate error
    just moves block payloads within the same order of magnitude. Pass
    ``n_rows`` (and ``dim``) to skip estimation entirely.
    """
    spark = df.sparkSession
    if n_rows is None:
        if dim is None:
            probe = df.select(vec_col).head(1)
            dim = len(probe[0][0]) if probe and probe[0][0] is not None else 0
        size_bytes = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        row_bytes = max(dim * 8 + 48, 64)
        n_rows = max(1, size_bytes // row_bytes)
        # stat-less sources (JDBC, RDD-backed frames) report the
        # defaultSizeInBytes sentinel (~Long.MaxValue): the derived
        # "row count" would put every row in its own singleton block
        # and the block cross join would degenerate to the exact n²
        # this blocking exists to prevent. Detect the absurd estimate
        # and fall back to ONE real count — a full pass, but a correct
        # grid (callers with known cardinality pass n_rows instead).
        if n_rows > 10**12:
            n_rows = max(1, df.count())
    n_blocks = max(1, math.ceil(n_rows / block_rows))
    src = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("__blk"),
        F.col(id_col).alias("__id"),
        _as_double(F.col(vec_col)).alias("__vec"),
    )
    # collect_list order is nondeterministic — harmless: scoring is
    # per-element and the output is (query, neighbor, sim) rows
    packed = src.groupBy("__blk").agg(
        F.collect_list("__id").alias("ids"),
        F.collect_list("__vec").alias("vecs"),
    )
    pairs = packed.select(
        F.col("ids").alias("qids_l"), F.col("vecs").alias("qvecs_l")
    ).crossJoin(
        packed.select(F.col("ids").alias("cids_l"), F.col("vecs").alias("cvecs_l"))
    )
    schema = "query_id long, neighbor_id long, sim double"

    _r6 = _make_round6()

    def _score(batches):
        for pdf in batches:
            for qi, qv, ci, cv in zip(
                pdf["qids_l"], pdf["qvecs_l"], pdf["cids_l"], pdf["cvecs_l"]
            ):
                qids = np.asarray(qi, dtype=np.int64)
                cids = np.asarray(ci, dtype=np.int64)
                qn = np.asarray([np.asarray(v) for v in qv], dtype=np.float64)
                cn = np.asarray([np.asarray(v) for v in cv], dtype=np.float64)
                qn /= np.linalg.norm(qn, axis=1, keepdims=True)
                cn /= np.linalg.norm(cn, axis=1, keepdims=True)
                sims = _r6(qn @ cn.T)
                sims[qids[:, None] == cids[None, :]] = -np.inf
                order = np.lexsort(
                    (np.broadcast_to(cids, sims.shape), -sims), axis=-1
                )[:, : min(k, sims.shape[1])]
                top_s = np.take_along_axis(sims, order, axis=1)
                keep = np.isfinite(top_s)
                n_per_q = keep.sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids, n_per_q),
                        "neighbor_id": cids[order][keep],
                        "sim": top_s[keep],
                    }
                )

    partial = pairs.mapInPandas(_score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _estimated_rows(df: DataFrame, vec_col: str, dim: int | None = None) -> int:
    """Row-count estimate from Catalyst's sizeInBytes statistic — the
    same no-full-scan sizing as the blocked-matmul grid above (and the
    same stat-less-source fallback to one real count)."""
    if dim is None:
        probe = df.select(vec_col).head(1)
        dim = len(probe[0][0]) if probe and probe[0][0] is not None else 0
    size_bytes = int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    row_bytes = max(dim * 8 + 48, 64)
    n_rows = max(1, size_bytes // row_bytes)
    if n_rows > 10**12:
        n_rows = max(1, df.count())
    return n_rows


def lsh_auto_params(
    n_rows: int,
    threshold: float,
    target_bucket_rows: int = 256,
    recall_target: float = 0.9,
    max_tables: int = 64,
) -> tuple[int, int]:
    """(n_planes, n_tables) sized for the corpus and the threshold.

    The fixed-b failure mode this exists to prevent (measured, r5 —
    SCALING.md dedup section): at b=3/T=16 a RANDOM pair is a
    candidate with probability 1−(1−2⁻³)¹⁶ ≈ 0.88, so past a few
    thousand vectors the "prefilter" admits ~all of n² and the LSH
    path measures slower than the exact blocked matmul (608 s vs
    ~19 s at n=20k). Sizing rule:

    - b = max(3, ⌈log₂(n / target_bucket_rows)⌉): expected bucket
      occupancy stays ~target_bucket_rows at every corpus size, so
      per-table candidate volume is ~n·target/2, linear in n.
    - T = ⌈ln(1/(1−recall)) / p₁ᵇ⌉ with p₁ = 1−arccos(θ)/π keeps
      1−(1−p₁ᵇ)ᵀ ≥ recall_target.

    T explodes when θ is low — sign-LSH's exponent ρ = ln p₁/ln ½
    approaches 1 as θ→0 and no (b, T) beats blocked-exact. Hitting
    ``max_tables`` logs that routing warning (→
    :func:`cosine_pairs_above`) and caps T, trading recall for
    boundedness. At θ ≥ 0.85 (the real near-dup regime) p₁ ≥ 0.86
    and T stays single-digit through b ≈ 12 (n ≈ 10⁶·target)."""
    import logging

    b = 3
    if n_rows > target_bucket_rows:
        b = max(3, min(24, math.ceil(math.log2(n_rows / target_bucket_rows))))
    p1 = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    need = math.log(1.0 / (1.0 - recall_target))
    t = max(1, math.ceil(need / max(p1**b, 1e-300)))
    if t > max_tables:
        achieved = 1.0 - (1.0 - p1**b) ** max_tables
        logging.getLogger("spark_graft").warning(
            "lsh_auto_params: recall %.2f at threshold %.2f needs %d "
            "tables at b=%d (capped to %d, achieved recall %.3f) — the "
            "router treats the cap as the low-θ wall (→ blocked exact) "
            "only when the capped recall collapses; a high-θ/huge-n cap "
            "with tolerable recall routes LSH best-effort instead of an "
            "infeasible n²/2 scan.",
            recall_target, threshold, t, b, max_tables, achieved,
        )
        t = max_tables
    return b, t


def lsh_neardup_pairs(
    df: DataFrame,
    threshold: float,
    n_planes: int | str = 3,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id1 < id2, cosine ≥ threshold) with an LSH
    prefilter — the recall-trading scale sibling of
    :func:`cosine_pairs_above` for corpora where even blocked-exact n²
    passes are too much.

    Shape: both "sides" are the SAME table; each row explodes to its
    (table, bucket) keys (ONE projection computes all tables' buckets),
    a single self-equi-join on (table, bucket) yields candidates
    (id1 < id2, deduped), and only candidates pay the exact cosine +
    threshold. Shuffle ∝ Σ bucket sizes; the n² pair space is never
    materialized. Recall = P(any-table collision) of a qualifying pair
    — 1-(1-p^b)^T with p = 1-θ/π; at the default b=3/T=16 measured
    ≥0.98 on the test corpus (see tests/test_queries_ext.py).

    The FIXED default (b=3, T=16) is only sane at small corpora and is
    kept for the oracle-checked registry contract; at scale pass
    ``n_planes="auto"`` to size (b, T) from the corpus cardinality and
    the threshold via :func:`lsh_auto_params` — and read its docstring
    for when LSH is the wrong route entirely (low θ → blocked exact).
    """
    if n_planes == "auto":
        if n_rows is None:
            n_rows = _estimated_rows(df, vec_col, dim)
        n_planes, n_tables = lsh_auto_params(n_rows, threshold)
    tables = [
        hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    buckets_fn = all_buckets_udf(tables)
    # r10: checkpoint the bucket index once — the self-join otherwise
    # plans the bucket UDF (T×b hyperplane projections per vector)
    # on BOTH sides (same fix as dedup_ml.lsh_candidate_pairs; the
    # index is n_tables small rows per vector, what a production LSH
    # build persists anyway).
    bucketed = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(buckets_fn(F.col(vec_col))).alias("__table", "__bucket"),
    ).localCheckpoint(eager=True)
    cand = (
        bucketed.select(F.col("__id").alias("id1"), "__table", "__bucket")
        .join(
            bucketed.select(F.col("__id").alias("id2"), "__table", "__bucket"),
            on=["__table", "__bucket"],
        )
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates()
    )
    v1 = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("__v1"))
    v2 = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("__v2"))
    # asNondeterministic: the threshold filter otherwise pushes below
    # the projection and the cosine UDF evaluates TWICE per candidate
    # (guide §4.4 — two ArrowEvalPython nodes in the r10 plan capture).
    # Values are unchanged: the UDF is pure; the marking only stops the
    # optimizer duplicating it.
    cos = cosine_udf().asNondeterministic()
    return (
        cand.join(v1, "id1")
        .join(v2, "id2")
        .withColumn("sim", F.round(cos(F.col("__v1"), F.col("__v2")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id1", "id2", "sim")
    )


#: Exact-route advantage margin for :func:`semantic_pairs_auto`: the
#: LSH path pays explode (T rows per vector), a shuffle self-join, a
#: distinct, and a per-candidate cosine verify, where blocked-exact
#: scores pairs inside one numpy matmul already resident in registers.
#: LSH is only routed when its estimated candidate volume beats exact
#: n²/2 by at least this factor. MEASURED, not guessed (r7): the
#: original 4.0 still misrouted — at n=20k, θ=0.85 the router picked
#: LSH and measured 16.2 s vs 1.3 s exact (12× wrong; exact's matmul
#: cost is nearly θ-independent, the threshold is just a mask). Unit
#: costs from that head-to-head: exact ≈ 208 ns/pair-score·core
#: (1.3 s × 32 / 2·10⁸ pairs) vs LSH ≈ 22 µs/candidate·core
#: (16.2 s × 32 / 2.3·10⁷ candidates) — a ~108× per-unit gap (the r5
#: θ=0.4 misroute, 608 s vs 19 s, implies the same order). 128 covers
#: both measurements and errs toward exact near the boundary, where a
#: wrong exact pick costs a small constant factor but a wrong LSH pick
#: measured 12-32×. At θ=0.85 the flip lands between n=500k and n=1M
#: (the router's candidate estimate grows n·T·target_bucket_rows/2
#: ≈ n·T·128, exact n²/2) — where the unit costs above say the true
#: crossover is.
LSH_ROUTE_MARGIN = 128.0

#: Estimate-drift guard around the exact-vs-LSH flip. The router's
#: input is Catalyst's sizeInBytes row estimate, which ROUTE_PROBE_r08
#: measured reading ~2.1× UNDER true n at both n=20k and n=200k on
#: this layout. Under-reads bias the margin rule toward exact — the
#: cheap-to-be-wrong side (a wrong exact pick near the flip costs a
#: small constant factor; a wrong LSH pick measured 12–32×) — but at
#: true n≈2M a 2.1× under-read lands right AT the ~1M flip, and any
#: layout/Spark-version change that widens the drift past the margin's
#: slack would hold exact into the regime where LSH wins 5×+. So when
#: the ESTIMATED decision lands within this factor of the boundary
#: (|log-ratio| ≤ log 4 between exact_pairs and margin-scaled LSH
#: candidate volume), the router pays ONE exact ``count()`` and
#: re-decides with the true n. At the n≥500k scales where the band can
#: be entered at all, a count() is noise against either route (both
#: are minutes-scale there; the count is a column-pruned scan). 4.0 =
#: measured 2.1× drift × ~2 safety; the calibration observation is
#: pinned in tests/test_similarity_blocked.py alongside the crossover
#: grid.
LSH_ROUTE_DRIFT_GUARD = 4.0

#: When the T-cap fires, the fraction of ``recall_target`` that capped-T
#: LSH must still achieve for the router to treat the cap as a recall
#:  TRADE rather than the low-θ wall. Two capped regimes exist and they
#: demand opposite routes:
#:
#: - **Low-θ wall** (the r5 lesson): sign-LSH's exponent ρ→1 as θ→0, so
#:   at θ=0.4, n=10M the capped 64 tables achieve ~4% recall — LSH is a
#:   lottery, not a prefilter. Route EXACT (blocked matmul), as before.
#: - **High-θ, huge-n cap**: at θ=0.85 the cap first fires near
#:   n≈34M (b=18 needs 77 tables), where capped-T recall is still
#:   ~0.80–0.86 — a modest, loggable trade — while "exact" means
#:   n²/2 ≈ 5.6×10¹⁴ pair-scores: ~10⁵ core-hours at the measured
#:   208 ns/pair, infeasible on any cluster. Routing exact here is the
#:   real scale bug; route LSH best-effort (capped T, recall logged).
#:
#: 0.75 separates them with headroom on both sides: θ=0.85 caps enter
#: at achieved/target ≈ 0.95 and stay above 0.75 through n≈10⁹, while
#: every low-θ wall case measured or derivable sits below 0.2.
LSH_CAPPED_RECALL_FLOOR = 0.75


def _route_inputs(
    n_rows: int,
    threshold: float,
    target_bucket_rows: int,
    recall_target: float,
    max_tables: int,
) -> tuple[int, int, bool, float, float, float]:
    """(b, t, capped, capped_recall, exact_pairs, lsh_candidates) for
    one candidate corpus size — the pure decision arithmetic of
    :func:`semantic_pairs_auto`, factored out so the drift guard can
    re-run it with a true ``count()`` without duplicating the formula
    the crossover test pins. ``capped_recall`` is the recall the capped
    table count actually achieves (1 when uncapped — the sizing met the
    target by construction)."""
    b, t = lsh_auto_params(
        n_rows,
        threshold,
        target_bucket_rows=target_bucket_rows,
        recall_target=recall_target,
        max_tables=max_tables,
    )
    p1 = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    need = math.log(1.0 / (1.0 - recall_target))
    capped = math.ceil(need / max(p1**b, 1e-300)) > max_tables
    capped_recall = 1.0 - (1.0 - p1**b) ** t if capped else 1.0
    exact_pairs = n_rows * (n_rows - 1) / 2.0
    lsh_candidates = t * n_rows * target_bucket_rows / 2.0
    return b, t, capped, capped_recall, exact_pairs, lsh_candidates


def semantic_pairs_auto(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    recall_target: float = 0.9,
    target_bucket_rows: int = 256,
    max_tables: int = 64,
    n_rows: int | None = None,
) -> DataFrame:
    """Cosine near-dup pairs (id1 < id2, sim ≥ threshold) with the
    scale regime chosen by the ENGINE, not the user — the auto-routing
    front end over :func:`cosine_pairs_above` (exact, O(n²) blocked
    matmul) and :func:`lsh_neardup_pairs` (recall-trading prefilter).

    Routing rule (the same Catalyst sizeInBytes row estimate as the
    blocked-matmul grid; no full scan EXCEPT within
    :data:`LSH_ROUTE_DRIFT_GUARD` of the flip boundary, where the
    measured ~2.1× estimate drift could cross the line and one exact
    ``count()`` — noise against either route at flip-scale n —
    re-decides with the true n):

    1. Size (b, T) for the corpus via :func:`lsh_auto_params`'
       occupancy model. If the recall target needs T > max_tables AND
       the capped-T recall collapses below
       :data:`LSH_CAPPED_RECALL_FLOOR`×target (low-θ wall: the LSH
       exponent ρ→1 as θ→0), LSH cannot be both selective and
       high-recall — route EXACT. A cap whose capped-T recall still
       clears the floor (high-θ, huge-n: first at θ=0.85 near n≈34M,
       recall ~0.86) is a recall TRADE, not a wall — exact there is an
       infeasible n²/2 scan, so fall through to the margin rule with
       the capped T.
    2. Estimated LSH candidate volume ≈ T·n·target_bucket_rows/2
       (each table's buckets hold ~target rows → ~n·target/2
       candidate pairs per table). Route LSH only when that volume
       times :data:`LSH_ROUTE_MARGIN` is still below exact's
       n(n−1)/2 — i.e. the prefilter is selective enough to pay for
       its explode + shuffle join + per-candidate verify.

    Crossover (measured — SCALING.md routing table): at θ=0.4 exact
    wins at every n — below n≈33k the margin rule rejects LSH (T≈58
    tables → more candidates than n²/2), above it the T-cap fires —
    matching the r5 measurement (LSH 608 s vs exact 19 s at n=20k);
    at θ=0.85 the margin rule holds exact through n=500k and flips to
    LSH by n=1M, where candidate volume (n·T·target_bucket_rows/2 ≈
    n·T·128, ~22 µs/candidate measured) finally undercuts the n²/2
    matmul (~208 ns/pair measured) — the r7 head-to-head at n=20k,
    θ=0.85 (LSH 16.2 s vs
    exact 1.3 s) is what recalibrated :data:`LSH_ROUTE_MARGIN` from 4
    to 128. The chosen route is attached as ``_graft_route``
    ("exact" | "lsh") for tests and audits; output schema is identical
    either way.
    """
    estimated = n_rows is None
    if estimated:
        n_rows = _estimated_rows(df, vec_col, dim)
    b, t, capped, capped_recall, exact_pairs, lsh_candidates = (
        _route_inputs(
            n_rows, threshold, target_bucket_rows, recall_target,
            max_tables,
        )
    )
    # Drift guard (ROUTE_PROBE_r08): the sizeInBytes estimate reads
    # ~2.1× under true n on this layout. When the estimated decision
    # lands within LSH_ROUTE_DRIFT_GUARD (4×) of the flip boundary —
    # on either side — resolve it with one exact count() and re-decide.
    # Only fires for estimated n (an explicit n_rows is the caller's
    # contract, e.g. the crossover-grid test) and never below the
    # guard's floor n, where exact is sub-second anyway and the flip
    # is unreachable.
    # exact_pairs ∝ n², lsh_candidates ∝ n·T (T near-constant in n), so
    # the decision ratio exact_pairs/margin_cost shifts ~linearly with
    # an n drift — a ±4× n guard is a ratio band of [1/4, 4].
    margin_cost = lsh_candidates * LSH_ROUTE_MARGIN
    drift_count_fired = (
        estimated
        and margin_cost > 0
        and exact_pairs / LSH_ROUTE_DRIFT_GUARD
        <= margin_cost
        <= exact_pairs * LSH_ROUTE_DRIFT_GUARD
    )
    if drift_count_fired:
        n_rows = max(1, df.count())
        b, t, capped, capped_recall, exact_pairs, lsh_candidates = (
            _route_inputs(
                n_rows, threshold, target_bucket_rows, recall_target,
                max_tables,
            )
        )
    # Cap disambiguation (LSH_CAPPED_RECALL_FLOOR): a cap with
    # collapsed recall is the low-θ wall → exact; a cap whose capped-T
    # recall still clears the floor is the high-θ/huge-n regime where
    # exact is n²/2-infeasible → fall through to the margin rule with
    # the capped T (and the recall trade already logged by
    # lsh_auto_params).
    wall = capped and capped_recall < LSH_CAPPED_RECALL_FLOOR * recall_target
    if wall or lsh_candidates * LSH_ROUTE_MARGIN >= exact_pairs:
        out = cosine_pairs_above(
            df, threshold, id_col=id_col, vec_col=vec_col
        )
        out._graft_route = "exact"
    else:
        out = lsh_neardup_pairs(
            df,
            threshold,
            n_planes=b,
            n_tables=t,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
            n_rows=n_rows,
        )
        out._graft_route = "lsh"
    # Audit surface (tests + ROUTE_PROBE): the n the decision actually
    # used and whether the drift guard paid the resolving count().
    out._graft_route_n = n_rows
    out._graft_drift_count = drift_count_fired
    return out


def kmeans_centroids(
    df: DataFrame,
    n_cells: int = 16,
    sample_rows: int = 8192,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF, trained driver-side
    on a DETERMINISTIC hash-ordered sample (``TakeOrdered`` by
    xxhash64(id) → distributed partial top-N, driver holds only the
    sample). At 100 TB the training set stays ``sample_rows`` no matter
    the corpus size; the centroid matrix (n_cells × dim doubles) ships
    to executors inside a closure. Returns L2-normalized centroids."""
    sample = (
        df.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_003)), F.col(id_col))
        .limit(sample_rows)
        .collect()
    )
    x = np.asarray([r[1] for r in sample], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):  # empty cell keeps its old centroid
                cents[c] = members.mean(axis=0)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    return cents


def _cell_assign_udf(cents: np.ndarray, nprobe: int):
    """Arrow-batched top-``nprobe`` cell ids per vector (one matmul per
    batch). nprobe=1 is corpus-side assignment; >1 is query-side
    probing."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<int>")
    def _cells(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0  # zero vector → sims all 0, cells 0..nprobe-1
        v /= norms
        sims = v @ cents.T  # (n, n_cells)
        # stable sort on -sims: exact dot-product ties resolve
        # cell-ascending, matching the oracle's ORDER BY s DESC, cell
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return _cells


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 6,
    n_assign: int = 3,
    sample_rows: int = 8192,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the
    data-dependent sibling of :func:`lsh_bucket_topk`.

    ``cents``: a pre-trained quantizer matrix (n_cells × dim). When
    given, the driver-side sampled Lloyd fit is skipped entirely —
    the production shape, where the quantizer is an offline-trained
    artifact reused across probes (and the oracle-exactness shape:
    q_ann_ivf_topk passes the committed
    functions.ivf_centroids.IVF_PINNED_CENTROIDS so the DuckDB twin
    re-derives every cell assignment from the same literals).

    Shape (the 100 TB path): a coarse spherical-k-means quantizer is
    trained on a bounded sample (:func:`kmeans_centroids`); the corpus
    is indexed under its ``n_assign`` nearest cells in ONE vectorized
    projection (multi-assignment — the IVF analogue of LSH's
    OR-amplification); each query probes its ``nprobe`` closest cells.
    Candidates come from a single (cell) equi-join — the corpus is
    hash-partitioned by cell, never cross-joined — deduped (a pair can
    meet in up to ``n_assign`` cells), then pay one exact re-rank.

    Cost ≈ ``nprobe · n_assign / n_cells`` of the corpus per query.
    The defaults are tuned for the UNIFORM synthetic test embeddings —
    the adversarial case, where neighbors are barely closer than random
    points so high coverage is required for recall. On real clustered
    embeddings drop ``nprobe``/``n_assign`` (e.g. 4/1 with many more
    cells) for sublinear probing at the same recall.

    Output contract identical to :func:`cosine_topk` (sim HALF_UP round
    6 before rank, ties by neighbor_id, self excluded).
    """
    if cents is None:
        cents = kmeans_centroids(
            corpus, n_cells=n_cells, sample_rows=sample_rows, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    c_cells = _cell_assign_udf(cents, n_assign)
    q_cells = _cell_assign_udf(cents, nprobe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.explode(c_cells(F.col(vec_col))).alias("__cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(q_cells(F.col(vec_col))).alias("__cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("sim", F.round(cosine_udf()(F.col("__qv"), F.col("__cv")), 6))
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


def all_buckets_udf(tables: list[list[list[float]]]):
    """Arrow-batched bucket computation: ONE numpy matmul per batch
    yields every table's bucket id. Higher-order array expressions are
    interpreted per-row (≈2 ms/row for 8×4 planes — unusable at scale);
    the vectorized path is ~100× faster and is the sanctioned
    Pandas-UDF use: embedding math the built-ins can't express
    efficiently. Sign convention matches :func:`bucket_expr`
    (proj ≥ 0 → bit set); fp-summation-order differences can flip a
    bucket only for vectors lying exactly on a hyperplane."""
    from pyspark.sql.pandas.functions import pandas_udf

    n_tables = len(tables)
    n_planes = len(tables[0])
    # (dim, n_tables*n_planes), column-major by table
    mat = np.asarray(
        [plane for table in tables for plane in table], dtype=np.float64
    ).T
    weights = (2 ** np.arange(n_planes, dtype=np.int64)).reshape(1, n_planes)

    @pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)  # (n, dim)
        bits = (v @ mat) >= 0.0  # (n, T*b)
        per_table = bits.reshape(len(v), n_tables, n_planes)
        ids = (per_table * weights).sum(axis=2)  # (n, T)
        return pd.Series(list(ids))

    return _buckets


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
    buckets_fn = all_buckets_udf(tables)

    def _bucketed(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(buckets_fn(F.col(vec_col))).alias(
                "__table", "__bucket"
            ),
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
        .withColumn("sim", F.round(cosine_udf()(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
