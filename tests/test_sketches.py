"""Accuracy floors for the sketch-backed operators.

The sketch queries (a06b HyperLogLog++, a12 Greenwald-Khanna
quantiles) can't be hash-checked against DuckDB — sketch internals
are engine-specific — so the driver records rows-only for them. These
tests supply the missing half of the contract: the estimate must land
inside the sketch's published error bound of the EXACT answer
computed by the oracle-verified queries on the same data.
"""

from __future__ import annotations

import bisect

import pytest
from pyspark.sql import functions as F

from bigdata_lab4_spark.catalog import load_table
from bigdata_lab4_spark.registry import all_queries
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_hll_estimate_within_rsd_bound(spark, queries):
    """a06b (rsd=0.01) vs a06's exact count-distinct: HLL++ keeps the
    relative error well under 5×rsd per group (the 2σ bound is 2×rsd;
    5× leaves headroom without ever hiding a broken sketch)."""
    exact = {
        r["event_type"]: r["n_users"]
        for r in queries["a06_count_distinct"](spark, SF_DIR).collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in queries["a06b_approx_count_distinct"](spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact) and exact
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.05 * n), (k, approx[k], n)


def test_approx_quantiles_within_rank_error(spark, queries):
    """a12 (accuracy=10000 → rank error ε ≤ 1/10000) vs exact
    per-status percentiles: each estimate must be an actual data value
    whose rank is within ε·n + 1 positions of the target rank."""
    rows = {r["o_orderstatus"]: r for r in queries["a12_approx_quantiles"](spark, SF_DIR).collect()}
    o = load_table(spark, SF_DIR, "orders")
    vals = {
        s: sorted(
            x["o_totalprice"]
            for x in o.filter(F.col("o_orderstatus") == s)
            .select("o_totalprice")
            .collect()
        )
        for s in rows
    }
    assert rows and set(rows) == set(vals)
    for s, r in rows.items():
        v, n = vals[s], len(vals[s])
        eps_slack = max(2, int(n / 10000) + 1)
        for p in (0.25, 0.50, 0.75, 0.95):
            est = r[f"p{int(p * 100)}"]
            # rank of the estimate in the sorted data
            lo = bisect.bisect_left(v, est - 0.005)  # est was rounded to 2dp
            hi = bisect.bisect_right(v, est + 0.005)
            target = p * (n - 1)
            assert lo - eps_slack <= target <= hi + eps_slack, (s, p, est, lo, hi, target, n)
