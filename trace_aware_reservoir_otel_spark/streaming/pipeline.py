"""Structured Streaming variant of the engine (SURVEY.md §2.9).

The reference is a push-based streaming processor with processing-time
windows and a session-buffered trace map (window.go, trace_buffer.go).
Spark-first, the same semantics split into three composable pieces:

 - `stream_transcripts`      : file-stream source (stand-in for Kafka /
   Iceberg streaming read; maxFilesPerTrigger bounds batch size the way
   maxOffsetsPerTrigger would).
 - `streaming_window_counts` : event-time tumbling-window aggregation with
   a watermark (the A2/A6 counters as a live stream; late rows beyond the
   watermark are dropped by Spark — the dlq routing for them lives in the
   batch path).
 - `streaming_sessionize`    : applyInPandasWithState keyed by conv_id
   with an event-time inactivity timeout — the exact analog of the
   reference's trace buffer (accumulate spans per trace, emit on
   inactivity gap, trace_buffer.go:144-185), Arrow-batched, bounded state.
 - `run_incremental`         : foreachBatch incremental reservoir — each
   micro-batch writes its per-(window,conv) partial aggregates to a
   batch_id-keyed state path (overwrite: foreachBatch is at-least-once, so
   a replayed batch rewrites its own partition instead of double-counting),
   and the winner set is re-derived from merged state at any point.
   Because priorities are pure functions of (seed, window, conv), the
   incremental winner set after N batches equals the batch pipeline's
   winner set on the union of inputs — checkpoint/restart-safe by
   construction (fixes §2.11.3 double-count).
 - `run_incremental_routed`  : the full streaming fan-out — the analog of
   the reference's hot path, rollover export (processor.go:317-347). Rows
   buffer per window (spill, batch_id-keyed); when the event-time high
   watermark passes a window's end, that window's rows are routed with the
   merged state (winners/capacity/invalid via the SAME apply_routing as
   the batch plan) and written with per-window dynamic partition overwrite
   — idempotent under micro-batch replay. `flush_incremental` routes
   whatever windows remain open at stream end. Union of all rollover
   exports == the batch pipeline's routed output on the same input, with
   per-epoch conservation bookkeeping.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from trace_aware_reservoir_otel_spark import fsutil
from trace_aware_reservoir_otel_spark.config import PipelineConfig
from trace_aware_reservoir_otel_spark.schema import TRANSCRIPTS_SCHEMA


def stream_transcripts(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_window_counts(
    stream: DataFrame, window_s: float = 60.0, watermark: str = "10 minutes"
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{int(window_s)} seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "rows",
            "approx_convs",
        )
    )


_SESSION_OUT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)
_SESSION_STATE = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("first_ts_us", T.LongType(), True),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)


def streaming_sessionize(
    stream: DataFrame, gap_s: float = 30.0, watermark: str = "0 seconds"
) -> DataFrame:
    """Trace-buffer analog: accumulate per-conversation state, emit the
    completed conversation once no turn arrives for `gap_s` of event time
    (timeout driven by the watermark, so emission is deterministic given
    the batch sequence — unlike the reference's wall-clock ticker,
    processor.go:350-385)."""
    gap_us = int(gap_s * 1_000_000)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n],
                    "first_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return
        n, first_us, last_us = (state.get if state.exists else (0, None, None))
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("int64") // 1000
            n += len(pdf)
            mn, mx = int(ts_us.min()), int(ts_us.max())
            first_us = mn if first_us is None else min(first_us, mn)
            last_us = mx if last_us is None else max(last_us, mx)
        state.update((n, first_us, last_us))
        state.setTimeoutTimestamp(last_us // 1000 + int(gap_us // 1000))
        return
        yield  # pragma: no cover — make fn a generator

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _write_pre(batch_df: DataFrame, batch_id: int, cfg: PipelineConfig, state_dir: str) -> None:
    """One micro-batch's unit partials, written idempotently: the path is
    keyed by batch_id and overwritten, so an at-least-once foreachBatch
    replay rewrites identical content instead of double-appending."""
    from trace_aware_reservoir_otel_spark.operators.windows import with_tumbling_window
    from trace_aware_reservoir_otel_spark.plans.pipeline import _unit_pre_aggregate

    valid = batch_df.filter(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )
    pre = _unit_pre_aggregate(
        with_tumbling_window(valid, "ts", cfg.window_duration_s), cfg
    )
    pre.write.mode("overwrite").parquet(f"{state_dir}/pre/batch_id={batch_id}")


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    cfg: PipelineConfig,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Incremental reservoir state accumulation via foreachBatch.

    Each micro-batch overwrites its batch_id-keyed partial-aggregate
    partition; the merged state (see `merged_units`) reproduces the batch
    pipeline's sampling population exactly, at any prefix of the stream."""
    stream = stream_transcripts(spark, input_dir, max_files_per_trigger)

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_pre(batch_df, batch_id, cfg, state_dir)

    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merged_units(spark: SparkSession, state_dir: str, cfg: PipelineConfig) -> DataFrame:
    """Merge batch partials into the exact (window, conv) unit frame the
    batch pipeline would compute (associative combiners + the same
    cfg-driven priorities as plans/pipeline)."""
    from trace_aware_reservoir_otel_spark.plans.pipeline import (
        _merge_pre,
        _with_unit_priorities,
    )

    pre = spark.read.parquet(f"{state_dir}/pre").drop("batch_id")
    merged = _merge_pre(pre, cfg).withColumnRenamed("n_all", "n_turns")
    weighted = cfg.weight_col is not None
    keep = ["window_start_s", "conv_id", "n_turns", "min_ts_s", "max_ts_s",
            "min_turn", "ts_of_min_turn"] + (["_w"] if weighted else [])
    return _with_unit_priorities(merged.select(*keep), cfg, weighted)


def incremental_winners(
    spark: SparkSession, state_dir: str, cfg: PipelineConfig
) -> DataFrame:
    from trace_aware_reservoir_otel_spark.operators.reservoir import topk_units

    units = merged_units(spark, state_dir, cfg)
    return topk_units(
        units, cfg.size_k, "window_start_s", "conv_id",
        cfg.salt_buckets, cfg.method, cfg.priority,
    )


# --- streaming routed fan-out (rollover export) ------------------------------


def _exported_windows(state_dir: str) -> "dict":
    """window -> batch_id at whose roll it was exported (None = flush)."""
    out: "dict" = {}
    for rec in fsutil.read_jsonl(os.path.join(state_dir, "exported.jsonl")):
        if rec["window"] not in out:
            out[rec["window"]] = rec.get("batch_id")
    return out


def _mark_exported(state_dir: str, windows: "list", batch_id: "int | None") -> None:
    # atomic replace (fsutil): a crash between the sink write and this mark
    # leaves the previous manifest complete, so restart re-routes the same
    # windows onto the same per-window partitions — idempotent overwrite,
    # never a torn manifest line
    fsutil.append_jsonl_atomic(
        os.path.join(state_dir, "exported.jsonl"),
        [{"window": w, "batch_id": batch_id} for w in windows],
    )


def _prepared_batch(batch_df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    from trace_aware_reservoir_otel_spark.functions.parse import with_parsed_fields
    from trace_aware_reservoir_otel_spark.operators.enrich import enrich
    from trace_aware_reservoir_otel_spark.operators.windows import with_tumbling_window

    return with_tumbling_window(
        enrich(with_parsed_fields(batch_df)), "ts", cfg.window_duration_s
    )


def _route_windows(
    spark: SparkSession,
    cfg: PipelineConfig,
    state_dir: str,
    out_dir: str,
    windows: "list",
    batch_id: "int | None",
    late_source: "DataFrame | None" = None,
) -> None:
    """Route the spilled rows of the given (closed) windows using the
    merged state and write them with per-window dynamic partition
    overwrite — replay-idempotent. Shares apply_routing / winner
    derivation with the batch plan, so the paths cannot drift."""
    from trace_aware_reservoir_otel_spark.plans.pipeline import (
        _merge_pre,
        _units_from_pre,
        apply_routing,
        capacity_and_winners,
    )

    if not windows:
        return
    non_null = [w for w in windows if w is not None]
    has_null = any(w is None for w in windows)
    spill = spark.read.parquet(f"{state_dir}/spill")
    wcol = F.col("window_start_s")
    sel = wcol.isin(non_null) if non_null else F.lit(False)
    if has_null:
        sel = sel | wcol.isNull()
    rows = spill.filter(sel).drop("batch_id")

    pre_all = spark.read.parquet(f"{state_dir}/pre").drop("batch_id")
    merged = _merge_pre(pre_all, cfg)
    invalid = F.col("conv_id").isNull() | F.col("turn_idx").isNull()
    if cfg.late_tolerance_s is not None:
        # conv starts are global: classify over ALL windows' merged state,
        # then restrict to the windows being exported
        valid_rows = (late_source if late_source is not None else rows).filter(
            ~invalid
        )
        units_all, late_units = _units_from_pre(merged, valid_rows, cfg)
    else:
        units_all, late_units = _units_from_pre(merged, rows, cfg)
    units = units_all.filter(
        F.col("window_start_s").isin(non_null) if non_null else F.lit(False)
    )
    if late_units is not None:
        lsel = (
            late_units["window_start_s"].isin(non_null) if non_null else F.lit(False)
        )
        late_units = late_units.filter(lsel)

    kept_units, evicted_keys, winners = capacity_and_winners(units, cfg)
    routed = rows.join(
        F.broadcast(
            winners.select("window_start_s", "conv_id").withColumn(
                "_won", F.lit(True)
            )
        ),
        on=["window_start_s", "conv_id"],
        how="left",
    )
    routed = apply_routing(routed, invalid, late_units, evicted_keys)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        routed.withColumn(
            "window_part", F.coalesce(F.col("window_start_s"), F.lit(-1))
        ).write.mode("overwrite").partitionBy("window_part").parquet(
            f"{out_dir}/routed"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    _mark_exported(state_dir, windows, batch_id)


def _roll(
    spark: SparkSession,
    cfg: PipelineConfig,
    state_dir: str,
    out_dir: str,
    batch_id: int,
    watermark_s: float,
) -> None:
    pre = spark.read.parquet(f"{state_dir}/pre")
    hwm_row = pre.agg(F.max("max_ts_s").alias("h")).first()
    if hwm_row is None or hwm_row["h"] is None:
        return
    hwm = float(hwm_row["h"]) - watermark_s
    w = float(cfg.window_duration_s)
    done = _exported_windows(state_dir)
    closed = [
        r["window_start_s"]
        for r in pre.select("window_start_s").distinct().collect()
        if r["window_start_s"] is not None
        and r["window_start_s"] + w <= hwm
        and r["window_start_s"] not in done
    ]
    _route_windows(spark, cfg, state_dir, out_dir, sorted(closed), batch_id)


def run_incremental_routed(
    spark: SparkSession,
    input_dir: str,
    cfg: PipelineConfig,
    state_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
    watermark_s: float = 0.0,
) -> None:
    """Streaming fan-out with rollover export (processor.go:317-347).

    Per micro-batch: unit partials + parsed/enriched/windowed rows spill to
    batch_id-keyed paths (overwrite — replay-idempotent); windows whose end
    passed the event-time high watermark (minus `watermark_s` tolerance)
    are routed with the merged state and written per-window. When
    cfg.late_tolerance_s is set, mid-stream rollover is skipped (lateness
    needs global conversation starts) and `flush_incremental` routes
    everything at stream end — same output, one pass later.

    State volume: spill holds only OPEN windows' rows in a real continuous
    run (exported windows' spill can be vacuumed); partials are
    O(conv-windows)."""
    stream = stream_transcripts(spark, input_dir, max_files_per_trigger)
    rolling = cfg.late_tolerance_s is None

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_pre(batch_df, batch_id, cfg, state_dir)
        prepared = _prepared_batch(batch_df, cfg)
        prepared.write.mode("overwrite").parquet(
            f"{state_dir}/spill/batch_id={batch_id}"
        )
        n = batch_df.count()
        spark.createDataFrame(
            [(int(n),)], "rows_in long"
        ).write.mode("overwrite").parquet(f"{state_dir}/epoch/batch_id={batch_id}")
        if rolling:
            _roll(spark, cfg, state_dir, out_dir, batch_id, watermark_s)

    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def flush_incremental(
    spark: SparkSession, cfg: PipelineConfig, state_dir: str, out_dir: str
) -> None:
    """Route every window not yet exported (open windows at stream end,
    plus the null-window rows of invalid-ts input).

    Stragglers — rows that arrived AFTER their window was already exported
    (watermark-contract violators) — cannot be merged into the closed
    window's output without re-exporting it (the reference silently rolls
    them into the next window, window.go:75-105 — its documented quirk).
    They route explicitly to dlq(reason='late_arrival') under
    `routed_stragglers` (overwritten wholesale at flush, so a repeated
    flush stays idempotent), and they count in
    `incremental_conservation`."""
    spill = spark.read.parquet(f"{state_dir}/spill")
    done = _exported_windows(state_dir)
    remaining = [
        r["window_start_s"]
        for r in spill.select("window_start_s").distinct().collect()
        if r["window_start_s"] not in done
    ]
    _route_windows(
        spark, cfg, state_dir, out_dir, remaining, None,
        late_source=spill.drop("batch_id"),
    )
    exported_rows = [
        (w, b) for w, b in done.items() if w is not None and b is not None
    ]
    if not exported_rows:
        return
    exp_df = spark.createDataFrame(
        exported_rows, "window_start_s long, _exported_at long"
    )
    stragglers = (
        spill.join(F.broadcast(exp_df), on="window_start_s", how="inner")
        .filter(F.col("batch_id") > F.col("_exported_at"))
        .drop("_exported_at")
    )
    (
        stragglers.withColumn("sink", F.lit("dlq"))
        .withColumn("reason", F.lit("late_arrival"))
        .withColumn(
            "window_part", F.coalesce(F.col("window_start_s"), F.lit(-1))
        )
        .drop("batch_id")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/routed_stragglers")
    )


def incremental_conservation(spark: SparkSession, state_dir: str, out_dir: str) -> "tuple[int, int]":
    """(rows_in, rows_routed) — per-epoch input bookkeeping vs routed
    output; equal iff every row was routed exactly once (the metrics gate,
    metrics.go:47-142)."""
    rows_in = int(
        spark.read.parquet(f"{state_dir}/epoch").agg(F.sum("rows_in")).first()[0]
    )
    rows_out = spark.read.parquet(f"{out_dir}/routed").count()
    strag_dir = f"{out_dir}/routed_stragglers"
    if os.path.exists(strag_dir):
        rows_out += spark.read.parquet(strag_dir).count()
    return rows_in, rows_out
