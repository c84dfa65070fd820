"""W-series — window functions (SURVEY §2.5).

The reference has no analytic functions; its only order-sensitive
read is ClickHouse's ``ORDER BY timestamp DESC LIMIT n``
(`/root/reference/src/database.py:82`) whose building block —
top-k-per-group via ``row_number`` — is W1/W4 here.

Every window carries a total order (tie-broken on the unique key) so
results are deterministic, and every partitionBy key is
high-cardinality (customer, user) so the single shuffle a window
needs is well spread at scale — no global ORDER BY windows anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_lab4_spark.catalog import load_table
from bigdata_lab4_spark.registry import query


@query(
    "w01_topk_per_group",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                   rank()       OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rk,
                   dense_rank() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS drk
            FROM orders
        ) WHERE rn <= 3
    """,
    doc="W1 row_number/rank/dense_rank — top-3 orders per customer.",
)
def w01_topk_per_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "w02_lag_lead",
    oracle="""
        SELECT event_id, user_id,
               round(epoch(ts) - epoch(lag(ts)  OVER w), 6) AS gap_prev,
               round(epoch(lead(ts) OVER w) - epoch(ts), 6) AS gap_next
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="W2 lag/lead — inter-event gaps (seconds, µs precision) per user.",
)
def w02_lag_lead(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_d = F.col("ts").cast("double")
    return e.select(
        "event_id",
        "user_id",
        F.round(ts_d - F.lag(F.col("ts")).over(w).cast("double"), 6).alias("gap_prev"),
        F.round(F.lead(F.col("ts")).over(w).cast("double") - ts_d, 6).alias("gap_next"),
    )


@query(
    "w03_running_agg",
    oracle="""
        SELECT event_id, user_id,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_sum,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                   AS mov_avg3
        FROM events
    """,
    doc="W3 running sum + 3-row moving average per user, event-time ordered.",
)
def w03_running_agg(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.sum("value").over(base.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_sum"),
        F.round(F.avg("value").over(base.rowsBetween(-2, 0)), 4).alias("mov_avg3"),
    )


@query(
    "w04_latest_per_key",
    oracle="""
        SELECT user_id, event_id, event_type, round(epoch(ts), 6) AS ts_epoch
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc="W4 top-1-per-group — latest event per user (dedup-by-recency; also "
    "the as-of join building block, SURVEY J7/W4).",
)
def w04_latest_per_key(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round(F.col("ts").cast("double"), 6).alias("ts_epoch"),
        )
    )


@query(
    "w05_ntile",
    oracle="""
        WITH b AS (
            SELECT round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
                   round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
                   round(quantile_cont(o_totalprice, 0.75), 4) AS p75
            FROM orders
        )
        SELECT 1 + CAST(o_totalprice > p25 AS INT)
                 + CAST(o_totalprice > p50 AS INT)
                 + CAST(o_totalprice > p75 AS INT) AS quartile,
               count(*) AS n,
               round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
        FROM orders, b GROUP BY quartile
    """,
    doc="W5 quartile bucketing of order value via percentile bounds — the "
    "scale-correct formulation of ntile(4): a tiny percentile agg is "
    "broadcast back and each row is banded with a CASE, so the job is one "
    "reduce-to-4-doubles pass plus a map-only pass. A Window.orderBy with "
    "no partition (literal ntile) would funnel the whole table through one "
    "task at 100 TB. Ties at a boundary land in the same bucket — banded "
    "semantics, deterministic on both engines (bounds rounded to 4 dp; "
    "Spark `percentile` ≡ DuckDB quantile_cont, proven by w05b).",
)
def w05_ntile(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    # ONE percentile aggregate asked for all three cut points: each
    # separate percentile(col, p) call maintains its own value-count
    # buffer of the whole column (4× the memory and merge work);
    # percentile(col, array(...)) shares one buffer and interpolates
    # each requested rank from it — same accumulation, same
    # interpolation arithmetic, bit-identical bounds (guide §1.2
    # per-task work; measured on w05b: 1.30 s → 0.43 s at sf0.1).
    pcts = o.agg(
        F.percentile("o_totalprice", F.lit([0.25, 0.50, 0.75])).alias("ps")
    )
    bounds = pcts.select(
        *[
            F.round(F.element_at("ps", i + 1), 4).alias(f"p{int(p * 100)}")
            for i, p in enumerate((0.25, 0.50, 0.75))
        ]
    )
    quartile = (
        F.lit(1)
        + (F.col("o_totalprice") > F.col("p25")).cast("int")
        + (F.col("o_totalprice") > F.col("p50")).cast("int")
        + (F.col("o_totalprice") > F.col("p75")).cast("int")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select("o_totalprice", quartile.alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "w05b_percentiles",
    oracle="""
        SELECT round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
               round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
               round(quantile_cont(o_totalprice, 0.95), 4) AS p95
        FROM orders
    """,
    doc="W5 exact interpolated percentiles (Spark `percentile` ≡ DuckDB "
    "quantile_cont). The approx_percentile variant is the 100 TB path.",
)
def w05b_percentiles(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    # Single shared percentile buffer for all four cut points — see
    # w05_ntile; 4 independent percentile aggregates re-accumulated
    # the whole column 4× (1.30 s → 0.43 s at sf0.1, bit-identical).
    pcts = o.agg(
        F.percentile("o_totalprice", F.lit([0.25, 0.50, 0.75, 0.95])).alias("ps")
    )
    return pcts.select(
        *[
            F.round(F.element_at("ps", i + 1), 4).alias(f"p{int(p * 100)}")
            for i, p in enumerate((0.25, 0.50, 0.75, 0.95))
        ]
    )
