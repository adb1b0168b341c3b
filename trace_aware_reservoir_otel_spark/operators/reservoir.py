"""Deterministic distributed reservoir sampling (A1/A3/L1 — the core op).

Reference semantics: per tumbling window, keep a uniform k-sample of rows
via Algorithm R (reservoir.go:80-126); trace-aware mode buffers spans per
trace so traces are kept whole (trace_buffer.go:78-141). Upgraded here per
the north star to *weighted, conversation-atomic, mergeable, deterministic*
Efraimidis–Spirakis A-Res:

    key(conv, window) -> u = portable_hash01(seed, window:conv) in (0,1)
    ares = -ln(u) / w          (uniform w=1)
    winners(window) = k smallest ares (ties broken by conv_id)

Because ares is a pure function of (seed, window, conv, w), partial top-k
sets computed independently on any partitioning merge associatively to the
same global answer — the distributed replacement for the reference's
single-process RNG replacement loop (reservoir.go:106-121) with the same
marginal inclusion law for uniform weights, but reproducible and mergeable
(SURVEY.md §7.4; quirks §2.11.1-2 fixed by construction).

Scale design (100 TB posture):
 - turns -> conv-level units via groupBy(window, conv): map-side partial
   aggregation absorbs mega-conversation skew before any shuffle;
 - phase 1: top-k per (window, salt) — salting splits a window with many
   conversations across `salt_buckets` sort groups (never a single-node
   sort of all conv rows of a hot window);
 - phase 2: global top-k per window over <= salt_buckets*k candidate rows
   — bounded, tiny;
 - fan-out: winners (<= k * n_windows rows) broadcast-joined back to turns
   — no shuffle of the big side, no skew (a sampled mega-conversation
   never hashes to one reducer).

Two phase-1 implementations with identical output:
 - method='sql'   : window-function row_number (JVM whole-stage codegen);
 - method='pandas': applyInPandas partial reservoirs (Arrow-vectorized
   nsmallest per group) — the north-star-named formulation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

from trace_aware_reservoir_otel_spark.functions.hashing import ares_key, pbig


def conversation_units(
    df: DataFrame,
    window_col: str = "window_start_s",
    conv_col: str = "conv_id",
    weight_col: "str | None" = None,
    seed: int = 42,
) -> DataFrame:
    """One row per (window, conversation) with its deterministic A-Res key.

    Conversation weight = max(turn weight) within the window (documented
    choice; uniform when weight_col is None).
    """
    aggs = [F.count(F.lit(1)).alias("n_turns")]
    if weight_col is not None:
        aggs.append(F.max(F.col(weight_col).cast("double")).alias("_w"))
    units = df.groupBy(window_col, conv_col).agg(*aggs)
    prio_key = F.concat(
        F.col(window_col).cast("string"), F.lit(":"), F.col(conv_col).cast("string")
    )
    w = F.col("_w") if weight_col is not None else None
    units = units.withColumn("ares_key", ares_key(prio_key, seed, w)).withColumn(
        "prio_int", pbig(prio_key, seed)
    )
    return units.drop("_w") if weight_col is not None else units


def _order_cols(priority: str, conv_col: str):
    # 'ares': weighted A-Res key, keep smallest (general case).
    # 'int' : raw 52-bit integer priority, keep largest — identical
    #         inclusion law for uniform weights but exact (no
    #         transcendentals), used by DuckDB-oracle-checked contract
    #         queries (SURVEY.md §7.5).
    if priority == "ares":
        return [F.col("ares_key").asc(), F.col(conv_col).asc()]
    if priority == "int":
        return [F.col("prio_int").desc(), F.col(conv_col).asc()]
    raise ValueError(f"unknown priority mode {priority!r}")


def _phase1_sql(units, k, window_col, conv_col, salt_buckets, priority):
    salted = units.withColumn("_salt", F.pmod(F.xxhash64(F.col(conv_col)), F.lit(salt_buckets)))
    w1 = W.partitionBy(window_col, "_salt").orderBy(*_order_cols(priority, conv_col))
    return (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )


def _phase1_pandas(units, k, window_col, conv_col, salt_buckets, priority):
    salted = units.withColumn("_salt", F.pmod(F.xxhash64(F.col(conv_col)), F.lit(salt_buckets)))
    out_schema = units.schema
    by, asc = (
        (["ares_key", conv_col], [True, True])
        if priority == "ares"
        else (["prio_int", conv_col], [False, True])
    )

    def partial_reservoir(pdf: pd.DataFrame) -> pd.DataFrame:
        # per-(window, salt) partial reservoir: keep the k best priorities;
        # deterministic tie-break on the conversation id.
        kept = pdf.sort_values(by, ascending=asc, kind="mergesort").head(k)
        return kept.drop(columns=["_salt"])

    return salted.groupBy(window_col, "_salt").applyInPandas(partial_reservoir, schema=out_schema)


def topk_units(
    units: DataFrame,
    k: int,
    window_col: str = "window_start_s",
    conv_col: str = "conv_id",
    salt_buckets: int = 16,
    method: str = "sql",
    priority: str = "ares",
) -> DataFrame:
    """Two-phase deterministic top-k: salted partials, then global merge."""
    phase1 = _phase1_sql if method == "sql" else _phase1_pandas
    candidates = phase1(units, k, window_col, conv_col, salt_buckets, priority)
    w2 = W.partitionBy(window_col).orderBy(*_order_cols(priority, conv_col))
    return (
        candidates.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sample_conversations(
    df: DataFrame,
    k: int,
    window_col: str = "window_start_s",
    conv_col: str = "conv_id",
    weight_col: "str | None" = None,
    seed: int = 42,
    salt_buckets: int = 16,
    method: str = "sql",
    broadcast_winners: bool = True,
    priority: str = "ares",
) -> "tuple[DataFrame, DataFrame]":
    """Conversation-atomic reservoir: returns (turns_with_flag, winners).

    ``turns_with_flag`` is ``df`` plus a boolean ``sampled`` column — every
    turn of a winning (window, conv) is kept, every turn of a losing one
    dropped (all-or-nothing, trace_buffer.go semantics / FIXTURES.md §4).
    """
    units = conversation_units(df, window_col, conv_col, weight_col, seed)
    winners = topk_units(units, k, window_col, conv_col, salt_buckets, method, priority)
    win_small = winners.select(window_col, conv_col, "ares_key")
    if broadcast_winners:
        win_small = F.broadcast(win_small)
    flagged = df.join(
        win_small.withColumn("sampled", F.lit(True)),
        on=[window_col, conv_col],
        how="left",
    ).withColumn("sampled", F.coalesce(F.col("sampled"), F.lit(False)))
    return flagged, winners


def sample_rows(
    df: DataFrame,
    k: int,
    key_cols: "list[str]",
    window_col: str = "window_start_s",
    weight_col: "str | None" = None,
    seed: int = 42,
    salt_buckets: int = 16,
    method: str = "sql",
    priority: str = "ares",
) -> DataFrame:
    """Simple (non-trace-aware) per-window row reservoir
    (processor.go:265-288 consumeTracesSimple analog): the unit IS the row.
    """
    key = F.concat_ws("#", *[F.col(c).cast("string") for c in key_cols])
    prio_key = F.concat(F.col(window_col).cast("string"), F.lit(":"), key)
    w = F.col(weight_col) if weight_col else None
    with_key = (
        df.withColumn("_unit", key)
        .withColumn("ares_key", ares_key(prio_key, seed, w))
        .withColumn("prio_int", pbig(prio_key, seed))
    )
    return topk_units(with_key, k, window_col, "_unit", salt_buckets, method, priority).drop("_unit")
