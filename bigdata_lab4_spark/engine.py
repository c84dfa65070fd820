"""SQL entry point.

The reference's entire declarative-query surface is a SQL string
handed to ClickHouse (`/root/reference/src/database.py:41-51,80-88`).
The Spark-native equivalent is one line: ``spark.sql`` — parse
(ANTLR) → analyze (catalog binding) → Catalyst optimize → physical
plan → execute. ``run_sql`` is that entry point with the test tables
mounted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_lab4_spark.catalog import DEFAULT_SF_DIR, register_views


def run_sql(spark: SparkSession, sql: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Execute an arbitrary SQL string over the mounted test tables
    (SURVEY §2 S8 — generic SQL passthrough)."""
    register_views(spark, sf_dir)
    return spark.sql(sql)


def top_k_predictions(spark: SparkSession, table: str = "predictions", limit: int = 10) -> DataFrame:
    """The reference's one real query, parameterized (no string
    interpolation — SURVEY §7.5): last-k rows newest first
    (`/root/reference/src/database.py:80-88`). Spark plans this as
    TakeOrderedAndProject — no global sort materialized."""
    if not isinstance(limit, int) or limit < 0:
        raise ValueError("limit must be a non-negative int")
    return spark.table(table).orderBy("timestamp", ascending=False).limit(limit)
