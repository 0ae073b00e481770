"""Logical-round clock.

The reference gates everything on wall-clock deltas
(``is_alive``/``is_expediable``, /root/reference/src/Task.py:94-98).
A batch-iterative engine needs a deterministic clock, so one crawl
round == one hour of logical time starting at a fixed epoch; all
timestamp columns are derived from the round number, which makes
fixtures and the DuckDB oracle bit-reproducible.
"""

from __future__ import annotations

import datetime as _dt

T0 = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
ROUND_SECONDS = 3600
# SQL-literal form of the epoch for timestamp arithmetic in column
# expressions (single source of truth — do not re-hardcode the date).
EPOCH_SQL = T0.strftime("%Y-%m-%d %H:%M:%S")


def round_ts(round_no: int) -> _dt.datetime:
    return T0 + _dt.timedelta(seconds=round_no * ROUND_SECONDS)


def ts_round(ts: _dt.datetime) -> int:
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return int((ts - T0).total_seconds() // ROUND_SECONDS)
