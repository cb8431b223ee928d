from kaggle_ecommerce_etl_spark.pipelines.amazon import clean_amazon_sale
from kaggle_ecommerce_etl_spark.pipelines.dispatch import classify_file
from kaggle_ecommerce_etl_spark.pipelines.international import clean_international_sale
from kaggle_ecommerce_etl_spark.pipelines.sale import clean_sale

__all__ = [
    "classify_file",
    "clean_amazon_sale",
    "clean_international_sale",
    "clean_sale",
]
