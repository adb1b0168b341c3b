"""Tumbling-window assignment (W1, window.go:108-122).

The reference keeps ONE active processing-time window and rolls it over on
the first event past the boundary (window.go:73-105). Spark-first, windows
are pure event-time column arithmetic: every row is assigned its bucket
declaratively and *all* windows are processed in one pass — rollover,
"late across rollover", and multi-window state disappear as concepts.

``window_start_s`` is an epoch-second BIGINT (floor(epoch/W)*W) rather than
``F.window(...)`` struct so the value is bit-portable to the DuckDB oracle
(SURVEY.md §7.5); ``F.window`` alignment is identical (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def window_start_s(ts: "Column | str", duration_s: float) -> Column:
    ts = F.col(ts) if isinstance(ts, str) else ts
    d = int(duration_s)
    if abs(duration_s - d) > 1e-9 or d <= 0:
        raise ValueError("window duration must be a positive whole number of seconds")
    epoch = F.unix_timestamp(ts)  # session tz pinned to UTC in session.py
    return (F.floor(epoch / F.lit(d)) * F.lit(d)).cast("long")


def with_tumbling_window(
    df: DataFrame, ts_col: str = "ts", duration_s: float = 60.0, out_col: str = "window_start_s"
) -> DataFrame:
    return df.withColumn(out_col, window_start_s(ts_col, duration_s))


def duck_window_start_s(ts_sql: str, duration_s: float) -> str:
    """DuckDB fragment computing the identical bucket value."""
    d = int(duration_s)
    return f"cast(floor(epoch({ts_sql}) / {d}) * {d} as bigint)"
