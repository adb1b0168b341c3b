"""The flagship end-to-end plan: parse -> enrich -> window -> sample -> route.

One declarative DataFrame chain per BASELINE.json north_star — the Spark
re-expression of the reference's hot path ConsumeTraces
(processor.go:239-347, SURVEY.md §3.1):

    transcripts
      -> split invalid            (P2  -> dlq 'invalid_key')
      -> parse tool-call fields   (F7, vectorized regex)
      -> broadcast enrich dims    (§2.3)
      -> tumbling window          (W1)
      -> late-row split           (§2.9 -> dlq 'late')
      -> conv units + capacity    (A3/L2 -> overflow 'capacity')
      -> A-Res reservoir          (A1, two-phase salted merge)
      -> route                    (sampled_traces / overflow 'unsampled')
      -> metrics                  (A6: per-window per-sink rows/convs)

Everything stays lazy; callers materialize via .count()/write. The only
shuffles are: conv-level partial aggregation (combiner-absorbed), the two
bounded top-k phases over conv-level rows, and the dlq-late conv-start
join — the turn-level fact table itself is never shuffled (winners are
broadcast back). That is the property that survives a 1000-executor 100 TB
run.
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
from trace_aware_reservoir_otel_spark.operators.route import (
    capacity_split,
    flag_late,
    split_invalid,
)
from trace_aware_reservoir_otel_spark.operators.windows import with_tumbling_window


@dataclass
class PipelineResult:
    sampled_traces: DataFrame
    overflow: DataFrame
    dlq: DataFrame
    metrics: DataFrame
    winners: DataFrame  # conv-level (window, conv_id, ares_key, n_turns) for state


def _with_reason(df: DataFrame, reason: str, cols: "list[str]") -> DataFrame:
    out = df.withColumn("reason", F.lit(reason))
    return out.select(*[c for c in cols if c in out.columns], "reason")


def run_pipeline(
    transcripts: DataFrame,
    cfg: PipelineConfig,
    dim_role: "DataFrame | None" = None,
    dim_tool: "DataFrame | None" = None,
    use_pandas_parse: bool = False,
) -> PipelineResult:
    raw_cols = transcripts.columns

    valid, invalid = split_invalid(transcripts)
    dlq_invalid = _with_reason(invalid, "invalid_key", raw_cols)

    parse = with_parsed_fields_pandas if use_pandas_parse else with_parsed_fields
    parsed = parse(valid)
    enriched = enrich(parsed, dim_role, dim_tool)
    windowed = with_tumbling_window(enriched, "ts", cfg.window_duration_s)

    on_time, late = flag_late(windowed, cfg.late_tolerance_s)
    dlq_late = _with_reason(late, "late", raw_cols)
    dlq = dlq_invalid.unionByName(dlq_late)

    units = conversation_units(
        on_time, "window_start_s", "conv_id", cfg.weight_col, cfg.seed
    )
    kept, evicted = capacity_split(on_time, units, cfg.buffer_max_convs)
    enriched_cols = windowed.columns

    if cfg.buffer_max_convs is not None:
        kept_units = conversation_units(
            kept, "window_start_s", "conv_id", cfg.weight_col, cfg.seed
        )
    else:
        kept_units = units

    if cfg.trace_aware:
        winners = topk_units(
            kept_units, cfg.size_k, "window_start_s", "conv_id",
            cfg.salt_buckets, cfg.method, cfg.priority,
        )
        win_keys = F.broadcast(winners.select("window_start_s", "conv_id"))
        sampled = kept.join(win_keys, on=["window_start_s", "conv_id"], how="left_semi")
        unsampled = kept.join(win_keys, on=["window_start_s", "conv_id"], how="left_anti")
    else:
        winners = sample_rows(
            kept, cfg.size_k, ["conv_id", "turn_idx"], "window_start_s",
            cfg.weight_col, cfg.seed, cfg.salt_buckets, cfg.method, cfg.priority,
        )
        win_keys = F.broadcast(
            winners.select("window_start_s", "conv_id", "turn_idx")
        )
        sampled = kept.join(
            win_keys, on=["window_start_s", "conv_id", "turn_idx"], how="left_semi"
        )
        unsampled = kept.join(
            win_keys, on=["window_start_s", "conv_id", "turn_idx"], how="left_anti"
        )
        winners = winners.select(
            "window_start_s", F.col("conv_id"), "ares_key",
            F.lit(1).cast("long").alias("n_turns"),
        )

    overflow = _with_reason(evicted, "capacity", enriched_cols).unionByName(
        _with_reason(unsampled, "unsampled", enriched_cols)
    )

    def sink_metrics(df: DataFrame, name: str, has_window: bool) -> DataFrame:
        g = df.groupBy(
            (F.col("window_start_s") if has_window else F.lit(None).cast("long")).alias(
                "window_start_s"
            )
        )
        return g.agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.countDistinct("conv_id").cast("long").alias("convs"),
        ).select(
            "window_start_s",
            F.lit(name).alias("sink"),
            "rows",
            "convs",
            F.lit(cfg.run_id).alias("run_id"),
        )

    metrics = (
        sink_metrics(sampled, "sampled_traces", True)
        .unionByName(sink_metrics(overflow, "overflow", True))
        .unionByName(sink_metrics(dlq, "dlq", False))
    )

    # Stable (conv_id, turn_idx) ordering for the equality gate is applied
    # at comparison/write time (sortWithinPartitions) — a global orderBy
    # here would be a full sort of the sampled fact table at 100 TB.
    return PipelineResult(
        sampled_traces=sampled.sortWithinPartitions("conv_id", "turn_idx"),
        overflow=overflow,
        dlq=dlq,
        metrics=metrics,
        winners=winners,
    )


def write_sinks(result: PipelineResult, out_dir: str) -> "dict[str, int]":
    """Fan-out parquet writes (Iceberg-shaped: partitioned by window)."""
    counts = {}
    for name, df, part in (
        ("sampled_traces", result.sampled_traces, "window_start_s"),
        ("overflow", result.overflow, "window_start_s"),
        ("dlq", result.dlq, None),
        ("metrics", result.metrics, None),
    ):
        w = df.write.mode("overwrite")
        if part and part in df.columns:
            w = w.partitionBy(part)
        w.parquet(f"{out_dir}/{name}")
        counts[name] = df.sparkSession.read.parquet(f"{out_dir}/{name}").count()
    return counts
