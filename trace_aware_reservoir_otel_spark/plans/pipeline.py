"""The flagship end-to-end plan: parse -> enrich -> window -> sample -> route.

One declarative DataFrame chain per BASELINE.json north_star — the Spark
re-expression of the reference's hot path ConsumeTraces
(processor.go:239-347, SURVEY.md §3.1):

    transcripts
      -> parse tool-call fields   (F7, vectorized regex — JVM codegen)
      -> broadcast enrich dims    (§2.3 — zero fact-side shuffle)
      -> tumbling window          (W1 — pure column arithmetic)
      -> conversation-start join  (session semantics for late detection)
      -> conv units + capacity    (A3/L2)
      -> A-Res reservoir winners  (A1, two-phase salted merge)
      -> ONE routed frame with a `sink` column:
           dlq(invalid_key) | dlq(late) | overflow(capacity)
           | sampled_traces | overflow(unsampled)

Routing produces a SINGLE frame so all three sinks materialize in ONE pass
(write partitioned by sink/window) instead of three scans with semi/anti
joins — at 100 TB that is the difference between one shuffle-free scan and
three.

Shuffle inventory (what survives a 1000-executor run):
 - conv_starts: two-level aggregation — per-(window,conv) partial agg
   (map-side combine absorbs mega-conversation skew) then tiny conv-level
   merge; the raw fact is aggregated, never row-shuffled;
 - the fact<-conv_starts join for per-row late flags: the one inherent
   shuffle of session semantics (AQE skew-join handles hot conversations);
   disabled entirely when cfg.late_tolerance_s is None;
 - winners/capacity keys: conv-level two-phase top-k (bounded), broadcast
   back to the fact — the fact table is never shuffled for sampling.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from trace_aware_reservoir_otel_spark.config import PipelineConfig
from trace_aware_reservoir_otel_spark.functions.parse import (
    with_parsed_fields,
    with_parsed_fields_pandas,
)
from trace_aware_reservoir_otel_spark.operators.enrich import enrich
from trace_aware_reservoir_otel_spark.operators.reservoir import (
    conversation_units,
    sample_rows,
    topk_units,
)
from trace_aware_reservoir_otel_spark.operators.windows import with_tumbling_window


@dataclass
class PipelineResult:
    routed: DataFrame  # unified frame: enriched cols + window + sink + reason
    sampled_traces: DataFrame
    overflow: DataFrame
    dlq: DataFrame
    metrics: DataFrame
    winners: DataFrame  # conv-level (window, conv_id, priorities) for state


def _conv_starts(valid: DataFrame) -> DataFrame:
    """Per-conversation first-turn timestamp via two-level aggregation
    (never shuffles fact rows: partial agg to (window, conv), then conv)."""
    pre = valid.groupBy("window_start_s", "conv_id").agg(
        F.min("turn_idx").alias("_win_min_turn"),
        F.min_by("ts", "turn_idx").alias("_win_min_ts"),
    )
    return pre.groupBy("conv_id").agg(
        F.min_by("_win_min_ts", "_win_min_turn").alias("_conv_start_ts")
    )


def build_routed(
    transcripts: DataFrame,
    cfg: PipelineConfig,
    dim_role: "DataFrame | None" = None,
    dim_tool: "DataFrame | None" = None,
    use_pandas_parse: bool = False,
) -> "tuple[DataFrame, DataFrame]":
    """Returns (routed, winners): the single routed frame plus the
    conv-level winner set (for state checkpointing)."""
    parse = with_parsed_fields_pandas if use_pandas_parse else with_parsed_fields
    enriched = enrich(parse(transcripts), dim_role, dim_tool)
    windowed = with_tumbling_window(enriched, "ts", cfg.window_duration_s)

    invalid = F.col("conv_id").isNull() | F.col("turn_idx").isNull()
    valid = windowed.filter(~invalid)

    if cfg.late_tolerance_s is not None:
        starts = _conv_starts(valid)
        flagged = windowed.join(starts, on="conv_id", how="left")
        late = (
            F.col("_conv_start_ts").isNotNull()
            & (
                F.unix_timestamp("ts")
                < F.unix_timestamp("_conv_start_ts") - F.lit(float(cfg.late_tolerance_s))
            )
        )
    else:
        flagged = windowed
        late = F.lit(False)

    on_time = flagged.filter(~invalid & ~late)

    units = conversation_units(
        on_time, "window_start_s", "conv_id", cfg.weight_col, cfg.seed
    )

    # deterministic capacity: conversations beyond the per-window cap are
    # evicted whole (replacement for LRU, trace_buffer.go:107-110)
    if cfg.buffer_max_convs is not None:
        from pyspark.sql import Window as W

        wr = W.partitionBy("window_start_s").orderBy(
            F.col("n_turns").desc(), F.col("conv_id").asc()
        )
        ranked = units.withColumn("_cap_rn", F.row_number().over(wr))
        evicted_keys = ranked.filter(F.col("_cap_rn") > cfg.buffer_max_convs).select(
            "window_start_s", "conv_id"
        )
        kept_units = ranked.filter(F.col("_cap_rn") <= cfg.buffer_max_convs).drop("_cap_rn")
    else:
        evicted_keys = None
        kept_units = units

    if cfg.trace_aware:
        winners = topk_units(
            kept_units, cfg.size_k, "window_start_s", "conv_id",
            cfg.salt_buckets, cfg.method, cfg.priority,
        )
        win_keys = winners.select("window_start_s", "conv_id").withColumn(
            "_won", F.lit(True)
        )
        routed = flagged.join(
            F.broadcast(win_keys), on=["window_start_s", "conv_id"], how="left"
        )
    else:
        winners = sample_rows(
            on_time, cfg.size_k, ["conv_id", "turn_idx"], "window_start_s",
            cfg.weight_col, cfg.seed, cfg.salt_buckets, cfg.method, cfg.priority,
        )
        win_keys = winners.select(
            "window_start_s", "conv_id", "turn_idx"
        ).withColumn("_won", F.lit(True))
        routed = flagged.join(
            F.broadcast(win_keys),
            on=["window_start_s", "conv_id", "turn_idx"],
            how="left",
        )
        winners = winners.select(
            "window_start_s", "conv_id", "ares_key", "prio_int",
            F.lit(1).cast("long").alias("n_turns"),
        )

    if evicted_keys is not None:
        routed = routed.join(
            F.broadcast(evicted_keys.withColumn("_evicted", F.lit(True))),
            on=["window_start_s", "conv_id"],
            how="left",
        )
    else:
        routed = routed.withColumn("_evicted", F.lit(None).cast("boolean"))

    sink = (
        F.when(invalid, F.lit("dlq"))
        .when(late, F.lit("dlq"))
        .when(F.col("_evicted"), F.lit("overflow"))
        .when(F.col("_won"), F.lit("sampled_traces"))
        .otherwise(F.lit("overflow"))
    )
    reason = (
        F.when(invalid, F.lit("invalid_key"))
        .when(late, F.lit("late"))
        .when(F.col("_evicted"), F.lit("capacity"))
        .when(F.col("_won"), F.lit(None).cast("string"))
        .otherwise(F.lit("unsampled"))
    )
    routed = (
        routed.withColumn("sink", sink)
        .withColumn("reason", reason)
        .drop("_won", "_evicted", "_conv_start_ts")
    )
    return routed, winners


def run_pipeline(
    transcripts: DataFrame,
    cfg: PipelineConfig,
    dim_role: "DataFrame | None" = None,
    dim_tool: "DataFrame | None" = None,
    use_pandas_parse: bool = False,
    persist: bool = False,
) -> PipelineResult:
    raw_cols = transcripts.columns
    routed, winners = build_routed(
        transcripts, cfg, dim_role, dim_tool, use_pandas_parse
    )
    if persist:
        routed = routed.persist()

    sampled = routed.filter(F.col("sink") == "sampled_traces").drop("sink", "reason")
    overflow = routed.filter(F.col("sink") == "overflow").drop("sink")
    dlq = routed.filter(F.col("sink") == "dlq").select(*raw_cols, "reason")

    metrics = (
        routed.groupBy(
            F.when(F.col("sink") == "dlq", F.lit(None).cast("long"))
            .otherwise(F.col("window_start_s"))
            .alias("window_start_s"),
            "sink",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.countDistinct("conv_id").cast("long").alias("convs"),
        )
        .select(
            "window_start_s", "sink", "rows", "convs", F.lit(cfg.run_id).alias("run_id")
        )
    )

    # Stable (conv_id, turn_idx) ordering for the equality gate is applied
    # at comparison/write time — a global orderBy here would be a full sort
    # of the sampled fact table at 100 TB.
    return PipelineResult(
        routed=routed,
        sampled_traces=sampled.sortWithinPartitions("conv_id", "turn_idx"),
        overflow=overflow,
        dlq=dlq,
        metrics=metrics,
        winners=winners,
    )


def write_sinks(result: PipelineResult, out_dir: str) -> "dict[str, int]":
    """Single-pass fan-out: the routed frame is written ONCE partitioned by
    (sink, window bucket) — Iceberg-shaped layout, one scan of the fact."""
    spark = result.routed.sparkSession
    (
        result.routed.withColumn(
            "window_part", F.coalesce(F.col("window_start_s"), F.lit(-1))
        )
        .write.mode("overwrite")
        .partitionBy("sink", "window_part")
        .parquet(f"{out_dir}/routed")
    )
    result.metrics.write.mode("overwrite").parquet(f"{out_dir}/metrics")
    routed = spark.read.parquet(f"{out_dir}/routed")
    counts = {
        r["sink"]: r["n"]
        for r in routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    counts["metrics"] = spark.read.parquet(f"{out_dir}/metrics").count()
    return counts
