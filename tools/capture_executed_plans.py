#!/usr/bin/env python
"""Capture the EXECUTED (final AQE) plan for declared queries.

Usage: python tools/capture_executed_plans.py <tag> <suffix> query [query ...]
Writes plans/<tag>/<query><suffix>.txt. Unlike capture_plans.py (static
`explain`, which prints the pre-execution plan and therefore shows one
subtree per self-join branch), this executes the query's own
QueryExecution so AQE finalizes — ReusedExchange / query-stage reuse
and runtime join selections become visible. Needed because exchange
reuse is decided at runtime and the static plan cannot show it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_lab4_spark.session import get_spark
from bigdata_lab4_spark.registry import REGISTRY
import bigdata_lab4_spark.queries  # noqa: F401


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="executed-plan-capture")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        qe = df._jdf.queryExecution()
        qe.executedPlan().execute().count()  # run THIS QueryExecution
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(qe.executedPlan().toString())
        print(f"captured {name}")
    spark.stop()


if __name__ == "__main__":
    main()
