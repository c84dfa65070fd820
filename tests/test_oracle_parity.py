"""Every registered query with an oracle must match DuckDB at sf0.01 —
the local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_util import compare_query


def _oracle_names():
    import bigdata_lab4_spark.queries  # noqa: F401
    from bigdata_lab4_spark.registry import REGISTRY

    return [n for n, q in sorted(REGISTRY.items()) if q.oracle is not None]


def _rows_only_names():
    import bigdata_lab4_spark.queries  # noqa: F401
    from bigdata_lab4_spark.registry import REGISTRY

    return [n for n, q in sorted(REGISTRY.items()) if q.oracle is None]


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(spark, duck, name):
    compare_query(spark, duck, name, SF_DIR)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_queries_run(spark, name):
    from bigdata_lab4_spark.registry import REGISTRY

    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
