"""kaggle_ecommerce_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the data-processing semantics of the reference repo
``AshFallen/kaggle-ecommerce-etl`` (an eager pandas + psycopg2 Lambda
pipeline) as lazy, Catalyst-optimized Spark DataFrame plans, and extends
it with the operators a large-scale training-data pipeline needs
(dedup, similarity search, text analysis, multimodal columns).

Design rules (see SURVEY.md §7):
- DataFrame/SQL only; no RDDs; no Python row-at-a-time UDFs on hot paths.
- Data-dependent transforms (parse-rate gates, drop-all-null columns)
  run ONE batched profiling aggregation, then emit the final lazy plan.
- Every operator is written for 100 TB posture: shuffle only where the
  semantics require it, broadcast small sides, keep expressions inside
  whole-stage codegen.
"""

from kaggle_ecommerce_etl_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
