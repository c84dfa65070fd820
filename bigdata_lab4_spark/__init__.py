"""bigdata_lab4_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
repo IMZolin/bigdata-lab4 (a tweet-sentiment MLOps pipeline backed by
pandas/sklearn/ClickHouse), rebuilt Spark-first:

* relational core (scans, projections, joins, aggregations, windows,
  sorts, set-ops) as declarative DataFrame/SQL plans optimized by
  Catalyst,
* the reference's sentiment pipeline (clean-text → TF-IDF →
  MultinomialNB → predictions table → top-k read-back) on pyspark.ml,
* LLM-data-pipeline extensions (dedup, similarity search, multimodal
  column plumbing, text analysis) designed for 100 TB scale.

Every declared query lives in :mod:`bigdata_lab4_spark.queries` and
carries a DuckDB oracle SQL string for correctness checking.
"""

from bigdata_lab4_spark.session import get_spark
from bigdata_lab4_spark.catalog import TABLES, load_table, register_views
from bigdata_lab4_spark.engine import run_sql

__all__ = ["get_spark", "TABLES", "load_table", "register_views", "run_sql"]
__version__ = "0.1.0"
