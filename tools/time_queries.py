#!/usr/bin/env python
"""Time individual declared queries with the noop sink (guide §1.4).

Usage: python tools/time_queries.py [runs] query [query ...]
Prints one JSON line {query: median_sec, ...} plus spreads. Same
methodology as bench.py (median of N noop-sink runs, warm session)
so numbers are comparable; used to measure operators outside the
headline set during optimization rounds.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_lab4_spark.session import get_spark
from bigdata_lab4_spark.registry import REGISTRY
import bigdata_lab4_spark.queries  # noqa: F401


def main() -> None:
    args = sys.argv[1:]
    runs = int(args.pop(0)) if args and args[0].isdigit() else 5
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="query-timing")

    from bigdata_lab4_spark.catalog import load_table

    load_table(spark, sf_dir, "lineitem").count()  # warmup

    timings, spreads = {}, {}
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spreads[name] = round(max(samples) - min(samples), 3)
    print(json.dumps({"timings": timings, "spreads": spreads, "runs": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
