"""Lineage metrics via Spark's Observation API (A6, metrics.go:43-145).

The reference exports 7 gauges/counters through the OTel meter
(spans-in-window, sampled spans, reservoir size, evictions, checkpoint
age/size/compactions). The Spark-native analog attaches `observe()`
aggregates to the routed frame so the counters are computed DURING the
sink write — zero extra passes — and conservation
(|sampled| + |overflow| + |dlq| == |input|) is checked from the observed
values, mirroring the per-sink counter gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def observed_routed(routed: DataFrame) -> "tuple[DataFrame, Observation]":
    """Attach the reference's counter set to the routed frame; read the
    Observation after the frame's first action (e.g. the sink write)."""
    obs = Observation("taro_metrics")
    observed = routed.observe(
        obs,
        F.count(F.lit(1)).alias("rows_total"),
        F.sum((F.col("sink") == "sampled_traces").cast("long")).alias("rows_sampled"),
        F.sum((F.col("sink") == "overflow").cast("long")).alias("rows_overflow"),
        F.sum((F.col("sink") == "dlq").cast("long")).alias("rows_dlq"),
        F.sum((F.col("reason") == "capacity").cast("long")).alias("rows_evicted"),
        F.sum((F.col("reason") == "late").cast("long")).alias("rows_late"),
        F.approx_count_distinct("conv_id").alias("approx_convs"),
    )
    return observed, obs


def conservation_ok(obs_values: dict) -> bool:
    return (
        obs_values["rows_sampled"] + obs_values["rows_overflow"] + obs_values["rows_dlq"]
        == obs_values["rows_total"]
    )
