"""Routing / fan-out: sampled vs overflow vs dlq (P2, L2, §2.9 late rows).

Reference behavior we deliberately upgrade (SURVEY.md §2.11.5, §7.7):
 - invalid ids were filtered silently (trace_buffer.go:80-85) -> here they
   route to dlq(reason='invalid_key');
 - LRU eviction silently dropped whole traces (trace_buffer.go:201-240)
   -> here capacity overflow is a *deterministic* ranking (most-active
   conversations kept, analog of "recently updated stays") and evicted
   conversations route WHOLE to overflow(reason='capacity');
 - late spans were silently rolled into the next window (window.go:75-105)
   -> here a turn arriving more than `late_tolerance_s` before its
   conversation's first turn routes to dlq(reason='late');
 - unsampled rows (reference: discarded at rollover) route to
   overflow(reason='unsampled') so per-sink counts conserve exactly:
   |sampled| + |overflow| + |dlq| == |input|  per run (metrics gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def split_invalid(df: DataFrame, conv_col: str = "conv_id", idx_col: str = "turn_idx"):
    """(valid, invalid) — invalid = NULL conversation id or turn index."""
    bad = F.col(conv_col).isNull() | F.col(idx_col).isNull()
    return df.filter(~bad), df.filter(bad)


def flag_late(
    df: DataFrame,
    tolerance_s: float,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
):
    """(on_time, late) — late = ts before the conversation's first-turn ts
    by more than tolerance.

    Conversation start is computed with groupBy + min-of-struct (map-side
    partial aggregation, deterministic on duplicate minimal turn_idx) and
    BROADCAST back to the fact — the conv-level set is orders of magnitude
    smaller than the fact, so the fact is never shuffled (the same
    unit-frame-broadcast shape as plans/pipeline; for corpora whose
    conversation count exceeds broadcast limits, use the pipeline's
    unit-level late classification, which never materializes per-row
    starts at all).
    """
    starts = df.groupBy(conv_col).agg(
        F.min(F.struct(F.col(idx_col), F.col(ts_col).alias("_t")))["_t"].alias(
            "_conv_start_ts"
        )
    )
    joined = df.join(F.broadcast(starts), on=conv_col, how="left")
    is_late = (
        F.unix_timestamp(F.col(ts_col))
        < F.unix_timestamp(F.col("_conv_start_ts")) - F.lit(float(tolerance_s))
    )
    on_time = joined.filter(~is_late).drop("_conv_start_ts")
    late = joined.filter(is_late).drop("_conv_start_ts")
    return on_time, late


def capacity_split(
    df: DataFrame,
    units: DataFrame,
    max_convs: "int | None",
    window_col: str = "window_start_s",
    conv_col: str = "conv_id",
):
    """(kept_turns, evicted_turns) by deterministic per-window capacity.

    Conversations ranked by activity (n_turns desc, conv_id asc); ranks
    beyond `max_convs` evict WHOLE conversations — the order-free
    replacement for LRU eviction (trace_buffer.go:107-110). `units` is the
    conv-level frame from reservoir.conversation_units.
    """
    if max_convs is None:
        return df, df.limit(0)
    wr = W.partitionBy(window_col).orderBy(F.col("n_turns").desc(), F.col(conv_col).asc())
    ranked = units.withColumn("_cap_rn", F.row_number().over(wr))
    evicted_keys = ranked.filter(F.col("_cap_rn") > max_convs).select(window_col, conv_col)
    kept = df.join(evicted_keys, on=[window_col, conv_col], how="left_anti")
    evicted = df.join(F.broadcast(evicted_keys), on=[window_col, conv_col], how="left_semi")
    return kept, evicted


def conservation_check(metrics: DataFrame, input_rows: int) -> bool:
    """sum of per-sink row counts == input rows (metrics.go:47-142 gate)."""
    total = metrics.agg(F.sum("rows").alias("t")).collect()[0]["t"] or 0
    return int(total) == int(input_rows)
