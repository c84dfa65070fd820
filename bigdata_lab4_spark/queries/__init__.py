"""Declared-query inventory (SURVEY §2).

Importing this package registers every query into
:data:`bigdata_lab4_spark.registry.REGISTRY`. Module → SURVEY section
map:

* :mod:`.scans`       — §2.1 sources/sinks (S-series)
* :mod:`.projections` — §2.2 projections/filters/scalar maps (P)
* :mod:`.joins`       — §2.3 joins (J)
* :mod:`.aggregations`— §2.4 aggregations + ML-metric queries (A)
* :mod:`.windows`     — §2.5 window functions (W)
* :mod:`.sorts`       — §2.6 sorts/limits/set ops (O)
* :mod:`.scalars`     — §2.7 scalar function surface (F)
* :mod:`.events`      — §2.9 batch event-time windows (T)
* :mod:`.llm`         — §2.10 dedup/similarity/embedding ops (L)
* :mod:`.multimodal`  — §2.10 L5 multimodal asset columns
* :mod:`.textstats`   — text-analysis extensions (X)
"""

from bigdata_lab4_spark.queries import (  # noqa: F401
    scans,
    projections,
    joins,
    aggregations,
    windows,
    sorts,
    scalars,
    events,
    llm,
    multimodal,
    textstats,
)
