"""O-series — sorts, limits, top-k, set ops (SURVEY §2.6).

O1 is the reference's single real query — ``SELECT * FROM predictions
ORDER BY timestamp DESC LIMIT k`` (`/root/reference/src/database.py:82`)
— here over the `events` table. Spark plans order+limit as
TakeOrderedAndProject: each task keeps a k-heap, the driver merges —
no global sort is materialized, which is exactly the 100 TB-safe
shape (ClickHouse gets the same effect from MergeTree read-in-order).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_lab4_spark.catalog import load_table
from bigdata_lab4_spark.registry import query


@query(
    "o01_topk_by_timestamp",
    oracle="""
        SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, event_type, value
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 20
    """,
    doc="O1 top-k by timestamp (ref: src/database.py:80-88, the predictions "
    "read-back). TakeOrderedAndProject — per-partition heap, no full sort.",
)
def o01_topk_by_timestamp(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(20)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
            "event_type",
            "value",
        )
    )


@query(
    "o02_numeric_key_sort",
    oracle="""
        SELECT CAST(id_str AS INTEGER) AS id, id_str
        FROM (SELECT CAST(doc_id AS VARCHAR) AS id_str FROM documents)
        ORDER BY CAST(id_str AS INTEGER)
        LIMIT 25
    """,
    doc="O2 numeric sort of stringified keys (ref: sorted(X_dict.keys(), "
    "key=int), src/predict.py:147) — '10' sorts after '9'.",
)
def o02_numeric_key_sort(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.col("doc_id").cast("string").alias("id_str"))
        .select(F.col("id_str").cast("int").alias("id"), "id_str")
        .orderBy("id")
        .limit(25)
    )


@query(
    "o04_multikey_sort_nulls",
    oracle="""
        SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_n, o_totalprice
        FROM orders
        ORDER BY status_n ASC NULLS LAST, o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc="O4 multi-key sort with explicit null ordering (nullif derives nulls; "
    "asc_nulls_last matches DuckDB's NULLS LAST).",
)
def o04_multikey_sort_nulls(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_n"),
            "o_totalprice",
        )
        .orderBy(
            F.asc_nulls_last("status_n"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(100)
    )


@query(
    "o05_union_all",
    oracle="""
        WITH ids AS (
            SELECT c_custkey AS id, 'customer' AS src FROM customer
            UNION ALL
            SELECT s_suppkey AS id, 'supplier' AS src FROM supplier
        )
        SELECT id, count(*) AS n FROM ids GROUP BY id HAVING count(*) > 1
    """,
    doc="O5 UNION ALL (bag semantics) — keys present in both tables count 2.",
)
def o05_union_all(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.lit("customer").alias("src")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.lit("supplier").alias("src")
    )
    return (
        c.unionByName(s)
        .groupBy("id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


@query(
    "o05b_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
    """,
    doc="O5 UNION (set semantics) via unionByName + distinct.",
)
def o05b_union_distinct(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "o06_intersect",
    oracle="""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey FROM supplier
    """,
    doc="O6 INTERSECT (distinct) — nations present on both sides.",
)
def o06_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "o06b_except_all",
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        EXCEPT ALL
        SELECT c_custkey FROM customer
    """,
    doc="O6 EXCEPT ALL (multiset difference) — order custkeys minus customer "
    "keys with multiplicity.",
)
def o06b_except_all(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@query(
    "o03_deterministic_sample",
    oracle="""
        SELECT count(*) AS n_sampled,
               round(sum(o_totalprice), 2) AS total_sampled,
               min(o_orderkey) AS first_key
        FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    doc="O3 sampling — content-hash Bernoulli sample (~12.5%: md5 hex "
    "prefix in {0,1}), the reproducible alternative to "
    "df.sample()/TABLESAMPLE whose RNG differs per engine, partition "
    "count, and run. Hash-sampling is stable under repartitioning and "
    "re-execution — the property a 100 TB pipeline needs so a sample "
    "taken today joins consistently with one taken next week — and "
    "deterministic across engines, so the sample itself is "
    "oracle-checked. The predicate is map-only and combines with "
    "column pruning at the scan.",
)
def o03_deterministic_sample(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    keep = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    return o.filter(keep).agg(
        F.count("*").alias("n_sampled"),
        F.round(F.sum("o_totalprice"), 2).alias("total_sampled"),
        F.min("o_orderkey").alias("first_key"),
    )
