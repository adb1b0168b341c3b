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
   micro-batch appends its per-(window,conv) partial aggregates to a
   state table (associative: sum/min/min_by merges), and the winner set is
   re-derived from merged state at any point. Because priorities are pure
   functions of (seed, window, conv), the incremental winner set after N
   batches equals the batch pipeline's winner set on the union of inputs —
   checkpoint/restart-safe by construction (fixes §2.11.3 double-count).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    cfg: PipelineConfig,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Incremental reservoir state accumulation via foreachBatch.

    Each micro-batch appends per-(window, conv) partial aggregates; the
    merged state (see `merged_units`) reproduces the batch pipeline's
    sampling population exactly, at any prefix of the stream."""
    stream = stream_transcripts(spark, input_dir, max_files_per_trigger)

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        from trace_aware_reservoir_otel_spark.operators.windows import (
            with_tumbling_window,
        )

        valid = batch_df.filter(
            F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
        )
        pre = (
            with_tumbling_window(valid, "ts", cfg.window_duration_s)
            .groupBy("window_start_s", "conv_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_all"),
                F.min(F.unix_timestamp("ts")).alias("min_ts_s"),
                F.max(F.unix_timestamp("ts")).alias("max_ts_s"),
                F.min("turn_idx").alias("min_turn"),
                F.min(
                    F.struct(F.col("turn_idx"), F.unix_timestamp("ts").alias("_ts_s"))
                )["_ts_s"].alias("ts_of_min_turn"),
            )
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )
        pre.write.mode("append").parquet(f"{state_dir}/pre")

    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merged_units(spark: SparkSession, state_dir: str, cfg: PipelineConfig) -> DataFrame:
    """Merge batch partials into the exact (window, conv) unit frame the
    batch pipeline would compute (associative combiners)."""
    from trace_aware_reservoir_otel_spark.functions.hashing import ares_key, pbig

    pre = spark.read.parquet(f"{state_dir}/pre")
    merged = pre.groupBy("window_start_s", "conv_id").agg(
        F.sum("n_all").cast("long").alias("n_turns"),
        F.min("min_ts_s").alias("min_ts_s"),
        F.max("max_ts_s").alias("max_ts_s"),
        F.min("min_turn").alias("min_turn"),
        F.min(F.struct(F.col("min_turn"), F.col("ts_of_min_turn").alias("_t")))[
            "_t"
        ].alias("ts_of_min_turn"),
    )
    prio_key = F.concat(
        F.col("window_start_s").cast("string"), F.lit(":"), F.col("conv_id")
    )
    return merged.withColumn("ares_key", ares_key(prio_key, cfg.seed)).withColumn(
        "prio_int", pbig(prio_key, cfg.seed)
    )


def incremental_winners(
    spark: SparkSession, state_dir: str, cfg: PipelineConfig
) -> DataFrame:
    from trace_aware_reservoir_otel_spark.operators.reservoir import topk_units

    units = merged_units(spark, state_dir, cfg)
    return topk_units(
        units, cfg.size_k, "window_start_s", "conv_id",
        cfg.salt_buckets, cfg.method, cfg.priority,
    )
