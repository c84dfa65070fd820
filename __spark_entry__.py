"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape, SURVEY §2 A5) on
sf0.001. ``queries()`` / ``oracle_sql()`` — the declared-query
inventory from SURVEY §2, registered in
:mod:`bigdata_lab4_spark.registry` (each module under
``bigdata_lab4_spark/queries/`` maps to a SURVEY §2 subsection).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_lab4_spark.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from bigdata_lab4_spark.queries.aggregations import a05_tpch_q1

    return a05_tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted keys → rows-only check)."""
    return all_oracles()
