"""Local replica of the driver's oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares: row count, column-name set,
and order-insensitive values (columns sorted by name, rows sorted by
their stringified tuple; floats compared with a small absolute
tolerance — the driver hashes, we want actionable diffs).
"""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stable row order: stringify every cell, sort by the tuple
    key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
    return df.iloc[key.argsort(kind="stable").values].reset_index(drop=True)


def _values_equal(a, b, tol=1e-6) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or (isinstance(a, float) and math.isnan(a))) and (
            b is None or (isinstance(b, float) and math.isnan(b))
        )
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=0, abs_tol=tol)
        except (TypeError, ValueError):
            return str(a) == str(b)
    return a == b or str(a) == str(b)


def compare_query(spark, duck, name: str, sf_dir: str) -> None:
    from bigdata_lab4_spark.registry import REGISTRY
    import bigdata_lab4_spark.queries  # noqa: F401

    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    assert q.oracle is not None, f"{name} has no oracle"
    ddf = duck.execute(q.oracle).fetchdf()

    assert len(sdf) == len(ddf), f"{name}: row count spark={len(sdf)} duck={len(ddf)}"
    assert sorted(sdf.columns) == sorted(
        ddf.columns
    ), f"{name}: columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"

    a, b = _canon(sdf), _canon(ddf)
    mismatches = []
    for i in range(len(a)):
        for c in a.columns:
            va, vb = a[c].iloc[i], b[c].iloc[i]
            # normalize numpy scalars / pandas NA
            va = None if pd.isna(va) else (va.item() if hasattr(va, "item") else va)
            vb = None if pd.isna(vb) else (vb.item() if hasattr(vb, "item") else vb)
            if not _values_equal(va, vb):
                mismatches.append((i, c, va, vb))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"{name}: value mismatches (row, col, spark, duck): {mismatches}"
