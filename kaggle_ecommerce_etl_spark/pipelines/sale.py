"""Sale Report pipeline (SURVEY.md §2f op 37; reference
ecommerce_s3_to_pg.py:298-335).

drop index → full-row dedup → <50%-NA row filter → transform →
rename design_no. → design_no.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kaggle_ecommerce_etl_spark.normalize.columns import drop_columns, rename_columns
from kaggle_ecommerce_etl_spark.normalize.transform import transform
from kaggle_ecommerce_etl_spark.operators.dedup import dedup_full_rows
from kaggle_ecommerce_etl_spark.operators.filters import filter_mostly_null_rows


def clean_sale(df: DataFrame) -> DataFrame:
    df = drop_columns(df, ["index"])
    df = dedup_full_rows(df)
    df = filter_mostly_null_rows(df, 0.5)
    df = transform(df)
    # header normalization leaves the trailing '.' (pg.py:324-326)
    df = rename_columns(df, {"design_no.": "design_no"})
    return df
