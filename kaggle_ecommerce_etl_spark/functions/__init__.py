from kaggle_ecommerce_etl_spark.functions.text import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
    tokens_expr,
)
from kaggle_ecommerce_etl_spark.functions.similarity import cosine_topk

__all__ = [
    "cosine_topk",
    "fingerprint_expr",
    "lang_id_expr",
    "quality_score_expr",
    "token_count_expr",
    "tokens_expr",
]
