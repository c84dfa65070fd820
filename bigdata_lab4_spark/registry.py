"""Declared-query registry.

Every operator from SURVEY §2 registers here as a named query: a
Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent DuckDB oracle SQL. The driver's
correctness gate runs both sides and hash-compares.

Conventions that keep the hash comparison meaningful:

* every computed column is aliased identically on both sides;
* double-typed aggregates are ``round()``-ed on both sides (guards
  against summation-order last-bit drift between engines);
* timestamps leave the query as epoch integers or formatted strings
  (Spark session TZ is pinned UTC to match DuckDB's naive reading);
* any LIMIT/top-k carries a total tie-break order so the kept rows
  are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    import bigdata_lab4_spark.queries  # noqa: F401  (triggers registration)

    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    import bigdata_lab4_spark.queries  # noqa: F401

    return {name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle is not None}
