#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Default mode: times the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the flagship
transcripts pipeline at bench scale (synthetic transcripts, cached to
parquet so generation cost is excluded), and prints:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...}

--scaling mode: runs the flagship pipeline in two fresh subprocesses at
local[N] and local[4N] (default 8 and 32) on the SAME cached input and
reports throughput at both plus scaling efficiency — the sandbox proxy for
the north rule's two-cluster-size criterion (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("TARO_BENCH_CONVS", "300000"))
CACHE_DIR = os.environ.get("TARO_BENCH_CACHE", "/tmp/taro_bench_transcripts")


def _spark(cores: int):
    from trace_aware_reservoir_otel_spark.session import get_spark

    return get_spark(
        app_name=f"taro-bench-{cores}",
        cores=cores,
        shuffle_partitions=max(32, cores),
    )


def _ensure_bench_transcripts(spark) -> str:
    """Generate-once, read-many synthetic transcripts at bench scale."""
    path = f"{CACHE_DIR}_{BENCH_CONVS}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        from trace_aware_reservoir_otel_spark.synth import generate_transcripts

        df = generate_transcripts(spark, n_convs=BENCH_CONVS, seed=42, span_s=7200)
        df.repartition(128).write.mode("overwrite").parquet(path)
    return path


def _flagship(spark, transcripts_path: str) -> "tuple[float, int]":
    """Run the full parse->enrich->window->sample->route chain; returns
    (seconds, input rows). Forces all three sinks + metrics."""
    from pyspark.sql import functions as F

    from trace_aware_reservoir_otel_spark.config import PipelineConfig
    from trace_aware_reservoir_otel_spark.plans.pipeline import build_routed

    tr = spark.read.parquet(transcripts_path)
    cfg = PipelineConfig(size_k=64, window_duration_s=60, seed=42)
    t0 = time.time()
    routed, _ = build_routed(tr, cfg)
    counts = {
        r["sink"]: r["n"]
        for r in routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sec = time.time() - t0
    n_input = sum(counts.values())
    assert set(counts) >= {"sampled_traces", "overflow"}, counts
    return sec, n_input


def run_headline(spark) -> "tuple[dict, dict]":
    from trace_aware_reservoir_otel_spark.contract import contract_queries

    names = [
        "flagship_pipeline",
        "lib_reservoir_events",
        "lib_trace_sample_events",
        "reservoir_simple",
        "trace_aware_reservoir",
        "routing_counts",
        "session_window",
        "pricing_summary",
        "top_revenue_orders",
        "nation_revenue",
        "token_count",
        "dedup_exact",
        "doc_fingerprint",
    ]
    qs = contract_queries()
    times: dict = {}
    extras: dict = {}
    for name in names:
        if name not in qs:
            continue
        t0 = time.time()
        n = qs[name](spark, SF_DIR).groupBy().count().collect()[0][0]
        times[name] = round(time.time() - t0, 3)
        extras[f"rows_{name}"] = int(n)
    # flagship at bench scale (synthetic transcripts)
    path = _ensure_bench_transcripts(spark)
    sec, n_input = _flagship(spark, path)
    times["flagship_bench_scale"] = round(sec, 3)
    extras["bench_turns"] = int(n_input)
    extras["turns_per_sec"] = round(n_input / sec, 1)
    return times, extras


def main_bench() -> None:
    spark = _spark(CPUS)
    times, extras = run_headline(spark)
    total = round(sum(times.values()), 3)
    out = {
        "metric": "end_to_end_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


def main_scaling_child(cores: int) -> None:
    spark = _spark(cores)
    path = _ensure_bench_transcripts(spark)
    _flagship(spark, path)  # warm-up (codegen, file listing)
    sec, n = _flagship(spark, path)
    print(json.dumps({"cores": cores, "sec": sec, "turns": n, "tps": n / sec}))
    spark.stop()


def main_scaling(n_small: int = 8, n_big: int = 32) -> None:
    results = {}
    for cores in (n_small, n_big):
        env = dict(os.environ)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child", str(cores)],
            capture_output=True,
            text=True,
            env=env,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    tps_small = results[n_small]["tps"]
    tps_big = results[n_big]["tps"]
    eff = (tps_big / tps_small) / (n_big / n_small)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "small": results[n_small],
                "big": results[n_big],
                "turns_per_sec_small": round(tps_small, 1),
                "turns_per_sec_big": round(tps_big, 1),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        main_scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        main_scaling_child(int(sys.argv[2]))
    else:
        main_bench()
