from kaggle_ecommerce_etl_spark.operators.dedup import (
    conflict_split,
    dedup_full_rows,
    upsert_anti_join,
)
from kaggle_ecommerce_etl_spark.operators.filters import (
    add_audit_columns,
    align_columns,
    drop_missing_critical,
    filter_mostly_null_rows,
)
from kaggle_ecommerce_etl_spark.operators.structural import split_misaligned_rowgroups

__all__ = [
    "add_audit_columns",
    "align_columns",
    "conflict_split",
    "dedup_full_rows",
    "drop_missing_critical",
    "filter_mostly_null_rows",
    "split_misaligned_rowgroups",
    "upsert_anti_join",
]
