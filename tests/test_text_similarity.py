"""Text analysis + similarity search tests (north-star extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_ecommerce_etl_spark.functions.similarity import (
    cosine_topk,
    lsh_bucket_topk,
)
from kaggle_ecommerce_etl_spark.functions.text import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  ",), ("one",)], ["t"])
    out = [r.n for r in df.select(token_count_expr(F.col("t")).alias("n")).collect()]
    assert out == [3, 0, 0, 1]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog in the house",),
            ("le chat et la maison est un des les",),
            ("der hund und die katze ist ein",),
            ("xyzzy qwerty",),  # all-zero hits → first lang ('en')
        ],
        ["t"],
    )
    out = [r.x for r in df.select(lang_id_expr(F.col("t")).alias("x")).collect()]
    assert out == ["en", "fr", "de", "en"]


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("  hello world ",), ("different",)], ["t"]
    )
    fps = [r.f for r in df.select(fingerprint_expr(F.col("t")).alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(quality_score_expr(F.col("text")).alias("q"))
    bad = out.filter((F.col("q") < 0) | (F.col("q") > 1)).count()
    assert bad == 0


def test_cosine_topk_self_similarity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cosine_topk(emb.filter(F.col("vec_id") < 3), emb, k=4)
    rows = out.collect()
    per_query = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r)
    for qid, nbrs in per_query.items():
        assert len(nbrs) == 4
        assert all(n.neighbor_id != qid for n in nbrs)  # self excluded
        ranks = sorted(n.rank for n in nbrs)
        assert ranks == [1, 2, 3, 4]
        sims = [n.sim for n in sorted(nbrs, key=lambda x: x.rank)]
        assert sims == sorted(sims, reverse=True)


def test_lsh_bucket_topk_structure(spark, sf_dir):
    """LSH path returns well-formed per-bucket top-k. (Recall against
    exact top-k is data-dependent for random near-orthogonal vectors, so
    only structure is asserted; the scale property being tested is that
    candidates come from an equi-join, not a cross product.)"""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    approx = lsh_bucket_topk(queries, emb, k=5, n_planes=2).collect()
    assert len(approx) > 0
    for r in approx:
        assert r.query_id != r.neighbor_id
        assert 1 <= r.rank <= 5
        assert -1.0 <= r.sim <= 1.0


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee: documents sharing a run of >= n+w-1 (= 6)
    words share at least one fingerprint; disjoint docs share none."""
    from kaggle_ecommerce_etl_spark.functions.text import winnow_fingerprints

    shared = "the quick brown fox jumps over"  # 6-word shared run
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"one two three {shared} four"),
            (3, "entirely different words with no overlap here at all"),
            (4, "tiny doc"),  # < n words: no fingerprints
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 6-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    assert 4 not in by_doc
    # density: never more fingerprints than shingles
    for did, n_words in [(1, 10), (2, 10), (3, 9)]:
        assert 1 <= len(by_doc[did]) <= n_words - 2
