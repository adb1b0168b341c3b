"""Batch-resumable checkpoint state (S3/S4: checkpoint.go:82-375, SURVEY §7.6).

The reference snapshots (window state + reservoir rows) to BadgerDB every
10s and restores on start (with the quirks catalogued in SURVEY §2.11.3-4).
The Spark-native analog:

 - work is split into deterministic conv-granular UNITS
   (unit = pmod(xxhash64(conv_id), n_units)) — a conversation's whole
   session state lives in exactly one unit;
 - per unit, the engine appends its bounded CANDIDATE sets to a state
   table: top-k-by-priority units (sampling candidates), top-cap-by-
   activity units (capacity candidates), and its late-unit set; then
   appends a manifest row marking the unit done;
 - because A-Res priorities are pure functions of (seed, window, conv),
   the global winner set over any union of per-unit candidates equals the
   winner set of an uninterrupted run — merge is associative and
   replay-order-free (this is what fixes the reference's restore
   double-count, §2.11.3, by construction);
 - resume = read manifest, skip done units, compute the rest, finalize:
   global capacity kept-set -> global winners -> one routed pass over the
   full input with broadcast winner/kept/late sets -> sinks + metrics.

State volume is O(n_units * windows * (k + cap) + late_units) — bounded,
never O(rows).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from trace_aware_reservoir_otel_spark.config import PipelineConfig
from trace_aware_reservoir_otel_spark.functions.parse import with_parsed_fields
from trace_aware_reservoir_otel_spark.operators.enrich import enrich
from trace_aware_reservoir_otel_spark.operators.windows import with_tumbling_window
from trace_aware_reservoir_otel_spark.plans.pipeline import _build_units_and_late


def _prepared(transcripts: DataFrame, cfg: PipelineConfig) -> DataFrame:
    return with_tumbling_window(
        enrich(with_parsed_fields(transcripts)), "ts", cfg.window_duration_s
    )


def unit_of(conv_col: str, n_units: int):
    return F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_units)).cast("int")


def _manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "manifest.jsonl")


def read_manifest(state_dir: str) -> "set[int]":
    done = set()
    path = _manifest_path(state_dir)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("status") == "done":
                    done.add(rec["unit"])
    return done


def _append_manifest(state_dir: str, rec: dict) -> None:
    with open(_manifest_path(state_dir), "a") as f:
        f.write(json.dumps(rec) + "\n")


def process_unit(
    transcripts: DataFrame,
    cfg: PipelineConfig,
    state_dir: str,
    unit: int,
    n_units: int,
) -> None:
    """Compute and persist one unit's bounded candidate state."""
    prepared = _prepared(transcripts, cfg)
    mine = prepared.filter(
        F.col("conv_id").isNotNull()
        & F.col("turn_idx").isNotNull()
        & (unit_of("conv_id", n_units) == unit)
    )
    units, late_units = _build_units_and_late(mine, cfg)

    wprio = W.partitionBy("window_start_s").orderBy(
        F.col("ares_key").asc()
        if cfg.priority == "ares"
        else F.col("prio_int").desc(),
        F.col("conv_id").asc(),
    )
    prio_cand = (
        units.withColumn("_rn", F.row_number().over(wprio))
        .filter(F.col("_rn") <= cfg.size_k)
        .drop("_rn")
    )
    if cfg.buffer_max_convs is not None:
        wcap = W.partitionBy("window_start_s").orderBy(
            F.col("n_turns").desc(), F.col("conv_id").asc()
        )
        cap_cand = (
            units.withColumn("_rn", F.row_number().over(wcap))
            .filter(F.col("_rn") <= cfg.buffer_max_convs)
            .drop("_rn")
        )
        candidates = prio_cand.unionByName(cap_cand).dropDuplicates(
            ["window_start_s", "conv_id"]
        )
    else:
        candidates = prio_cand

    out = candidates.select(
        F.lit(cfg.run_id).alias("run_id"),
        F.lit(unit).cast("int").alias("unit_id"),
        "window_start_s",
        "conv_id",
        "ares_key",
        "prio_int",
        F.col("n_turns").cast("long").alias("n_turns"),
    )
    out.write.mode("overwrite").parquet(f"{state_dir}/candidates/unit={unit}")
    if late_units is not None:
        late_units.select(
            F.lit(unit).cast("int").alias("unit_id"),
            "window_start_s",
            "conv_id",
            "status",
            "cutoff_s",
        ).write.mode("overwrite").parquet(f"{state_dir}/late/unit={unit}")
    _append_manifest(
        state_dir, {"unit": unit, "status": "done", "run_id": cfg.run_id}
    )


def finalize(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig,
    state_dir: str,
    out_dir: str,
) -> "dict[str, int]":
    """Merge all units' candidate state into global winners and run the
    single routed pass. Pure function of the state table — replay order of
    units never matters."""
    cand = spark.read.parquet(f"{state_dir}/candidates")
    late_dir = f"{state_dir}/late"
    late_units = (
        spark.read.parquet(late_dir)
        if os.path.exists(late_dir)
        else None
    )

    if cfg.buffer_max_convs is not None:
        wcap = W.partitionBy("window_start_s").orderBy(
            F.col("n_turns").desc(), F.col("conv_id").asc()
        )
        kept = (
            cand.withColumn("_rn", F.row_number().over(wcap))
            .filter(F.col("_rn") <= cfg.buffer_max_convs)
            .drop("_rn")
        )
    else:
        kept = cand

    wprio = W.partitionBy("window_start_s").orderBy(
        F.col("ares_key").asc()
        if cfg.priority == "ares"
        else F.col("prio_int").desc(),
        F.col("conv_id").asc(),
    )
    winners = (
        kept.withColumn("_rn", F.row_number().over(wprio))
        .filter(F.col("_rn") <= cfg.size_k)
        .drop("_rn")
    )

    prepared = _prepared(transcripts, cfg)
    invalid = F.col("conv_id").isNull() | F.col("turn_idx").isNull()
    routed = prepared.join(
        F.broadcast(
            winners.select("window_start_s", "conv_id").withColumn("_won", F.lit(True))
        ),
        on=["window_start_s", "conv_id"],
        how="left",
    )
    if late_units is not None:
        routed = routed.join(
            F.broadcast(
                late_units.select(
                    "window_start_s", "conv_id",
                    F.col("status").alias("_late_status"), "cutoff_s",
                )
            ),
            on=["window_start_s", "conv_id"],
            how="left",
        )
        late = F.coalesce(
            (F.col("_late_status") == "all_late")
            | (
                (F.col("_late_status") == "boundary")
                & (F.unix_timestamp("ts") < F.col("cutoff_s"))
            ),
            F.lit(False),
        )
    else:
        late = F.lit(False)

    if cfg.buffer_max_convs is not None:
        routed = routed.join(
            F.broadcast(
                kept.select("window_start_s", "conv_id").withColumn(
                    "_kept", F.lit(True)
                )
            ),
            on=["window_start_s", "conv_id"],
            how="left",
        )
        capacity_evicted = ~F.coalesce(F.col("_kept"), F.lit(False))
    else:
        capacity_evicted = F.lit(False)

    sink = (
        F.when(invalid, F.lit("dlq"))
        .when(late, F.lit("dlq"))
        .when(F.col("_won"), F.lit("sampled_traces"))
        .when(capacity_evicted, F.lit("overflow"))
        .otherwise(F.lit("overflow"))
    )
    reason = (
        F.when(invalid, F.lit("invalid_key"))
        .when(late, F.lit("late"))
        .when(F.col("_won"), F.lit(None).cast("string"))
        .when(capacity_evicted, F.lit("capacity"))
        .otherwise(F.lit("unsampled"))
    )
    routed = routed.withColumn("sink", sink).withColumn("reason", reason)
    drop_cols = [c for c in ("_won", "_kept", "_late_status", "cutoff_s") if c in routed.columns]
    routed = routed.drop(*drop_cols)

    routed.withColumn(
        "window_part", F.coalesce(F.col("window_start_s"), F.lit(-1))
    ).write.mode("overwrite").partitionBy("sink").parquet(f"{out_dir}/routed")

    metrics = (
        spark.read.parquet(f"{out_dir}/routed")
        .groupBy("sink")
        .agg(F.count(F.lit(1)).cast("long").alias("rows"))
        .withColumn("run_id", F.lit(cfg.run_id))
    )
    metrics.write.mode("overwrite").parquet(f"{out_dir}/metrics")
    return {
        r["sink"]: r["rows"]
        for r in spark.read.parquet(f"{out_dir}/metrics").collect()
    }


def run_with_checkpoint(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig,
    state_dir: str,
    out_dir: str,
    n_units: int = 8,
    fail_after_unit: "int | None" = None,
) -> "dict[str, int] | None":
    """Process all pending units (skipping manifest-complete ones), then
    finalize. `fail_after_unit` simulates a mid-run crash for tests."""
    os.makedirs(state_dir, exist_ok=True)
    done = read_manifest(state_dir)
    for unit in range(n_units):
        if unit in done:
            continue
        process_unit(transcripts, cfg, state_dir, unit, n_units)
        if fail_after_unit is not None and unit >= fail_after_unit:
            return None  # simulated crash (manifest already has this unit)
    return finalize(spark, transcripts, cfg, state_dir, out_dir)
