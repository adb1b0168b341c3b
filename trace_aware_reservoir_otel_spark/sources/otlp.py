"""Nested OTLP-shaped ingest/egress (P1 flatten, A5 re-group).

The reference's input is the nested OTLP batch
ResourceSpans[] -> ScopeSpans[] -> Spans[] which it flattens with 3-level
Go loops (processor.go:265-288) and re-nests on export with scope-name
matching (span_utils.go:87-151 — resource matching left TODO there). The
Spark-native equivalents are two `explode`s and a
groupBy + collect_list(struct(...)), both fully declarative (Catalyst
pushes column pruning through the explodes).

The engine's primary input is the already-flat transcripts relation; this
module exists so a user with genuinely nested OTLP parquet/JSON can round-
trip it through the same pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), True),
        T.StructField("span_id", T.StringType(), True),
        T.StructField("parent_span_id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("start_unix_nano", T.LongType(), True),
        T.StructField("end_unix_nano", T.LongType(), True),
    ]
)

NESTED_TRACES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resource",
            T.StructType([T.StructField("service_name", T.StringType(), True)]),
            True,
        ),
        T.StructField(
            "scope_spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("scope_name", T.StringType(), True),
                        T.StructField("spans", T.ArrayType(SPAN_SCHEMA), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

FLAT_COLS = [
    "service_name",
    "scope_name",
    "trace_id",
    "span_id",
    "parent_span_id",
    "name",
    "start_unix_nano",
    "end_unix_nano",
]


def flatten_traces(nested: DataFrame) -> DataFrame:
    """P1: ResourceSpans -> row-per-span with (resource, scope) context
    attached — two explodes instead of three nested loops."""
    return (
        nested.select(
            F.col("resource.service_name").alias("service_name"),
            F.explode("scope_spans").alias("ss"),
        )
        .select(
            "service_name",
            F.col("ss.scope_name").alias("scope_name"),
            F.explode("ss.spans").alias("sp"),
        )
        .select("service_name", "scope_name", "sp.*")
    )


def nest_traces(flat: DataFrame) -> DataFrame:
    """A5: re-group flat spans under (resource, scope) for nested export.

    Unlike the reference (which merges every span under the FIRST resource
    — the TODO at span_utils.go:98-99), grouping keys here are exact, and
    span order inside a scope is pinned to (trace_id, span_id) so the
    round-trip is deterministic."""
    span_struct = F.struct(
        "trace_id", "span_id", "parent_span_id", "name",
        "start_unix_nano", "end_unix_nano",
    )
    per_scope = (
        flat.groupBy("service_name", "scope_name")
        .agg(
            F.array_sort(F.collect_list(span_struct)).alias("spans")
        )
    )
    return (
        per_scope.groupBy("service_name")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("scope_name", "spans"))
            ).alias("scope_spans")
        )
        .select(
            F.struct(F.col("service_name")).alias("resource"),
            "scope_spans",
        )
    )


def flat_spans_to_transcripts(flat: DataFrame) -> DataFrame:
    """Adapter: flat span rows -> the transcripts relation the engine
    samples (trace ↔ conversation, span ↔ turn; turn order = start time)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("trace_id").orderBy("start_unix_nano", "span_id")
    return flat.select(
        F.col("trace_id").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.coalesce(F.col("scope_name"), F.lit("span")).alias("role"),
        F.col("name").alias("text"),
        F.col("service_name").alias("tool"),
        F.timestamp_seconds(F.col("start_unix_nano") / F.lit(1e9)).alias("ts"),
    )
