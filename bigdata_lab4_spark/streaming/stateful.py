"""Custom stateful streaming operator (SURVEY §2.9):
gap-based sessionization via ``applyInPandasWithState``.

``session_window`` (T3) covers fixed-gap sessions declaratively; this
operator is the *custom* path for session logic Catalyst can't
express (per-key gaps, value-dependent closing rules, session-level
derived features). It demonstrates the full state-machine surface:

* arbitrary per-key state (a pandas-side session accumulator),
* event-time timeouts bound to the watermark — a session closes
  either when a new event for the key arrives beyond the gap
  (in-band close) or when the watermark passes ``end + gap`` with no
  new data (timeout close),
* append-mode emission of each closed session exactly once.

Scale notes (100 TB/day): state lives in the state store, one entry
per ACTIVE key — O(live sessions), not O(events). Rows reach Python
via Arrow, grouped per key; the shuffle is the single
``groupBy(user_id)`` hash exchange that any sessionization needs.
The in-Python work is O(batch rows) with no cross-key access.

The reference has no streaming at all (SURVEY §2.9 preamble); this
is part of the mandated streaming extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

#: Emitted once per closed session.
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("session_start", LongType(), True),  # epoch seconds
        StructField("session_end", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("sum_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = "start LONG, end LONG, n LONG, sum_value DOUBLE"


def sessionize_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Close a (user_id) session when no event arrives within
    ``gap`` of the last one; emit one row per closed session.

    Input needs ``user_id``, ``ts`` (timestamp, with a watermark
    already applied upstream) and ``value``.
    """
    units = {
        "s": 1, "sec": 1, "second": 1,
        "min": 60, "minute": 60,
        "h": 3600, "hr": 3600, "hour": 3600,
        "d": 86400, "day": 86400,
    }
    try:
        n, unit = gap.split()
        gap_s = int(float(n) * units[unit.rstrip("s").lower()])
    except (ValueError, KeyError) as exc:
        raise ValueError(
            f"unparseable gap {gap!r}: expected '<number> <unit>' with a "
            f"unit among {sorted(set(units))} (e.g. '30 minutes', '1 day')"
        ) from exc
    if gap_s <= 0:
        raise ValueError(f"gap must be positive, got {gap!r}")

    # Self-contained closure (only `gap_s` captured): executors must
    # not need this package on their PYTHONPATH — see
    # functions/multimodal.py for the full rationale.
    def update(key, pdfs, state):
        import pandas as pd

        out = []
        if state.hasTimedOut:
            start, end, cnt, sv = state.get
            out.append((key[0], start, end, cnt, sv))
            state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            cur = state.get if state.exists else None
            for t, v in zip(rows["ts"], rows["value"]):
                epoch = int(t.timestamp())
                if cur is None:
                    cur = (epoch, epoch, 1, float(v))
                elif epoch - cur[1] > gap_s:
                    out.append((key[0], *cur))  # in-band close
                    cur = (epoch, epoch, 1, float(v))
                else:
                    cur = (cur[0], epoch, cur[2] + 1, cur[3] + float(v))
            state.update(cur)
            # timeout close: fires when the watermark passes end+gap
            state.setTimeoutTimestamp((cur[1] + gap_s) * 1000)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                    "sum_value",
                ],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
