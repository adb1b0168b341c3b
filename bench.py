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
_CACHE_BASE = (
    "/dev/shm/taro_bench_transcripts"
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)
    else "/tmp/taro_bench_transcripts"
)
CACHE_DIR = os.environ.get("TARO_BENCH_CACHE", _CACHE_BASE)


def _spark(cores: int):
    from trace_aware_reservoir_otel_spark.session import get_spark

    # 16MB splits: the bench inputs are a few GB, and the 128MB default
    # yields fewer scan tasks than cores (measured 0.37 -> 0.45 trivial-
    # scan efficiency). A real cluster reading 100 TB keeps the default.
    extra = {"spark.sql.files.maxPartitionBytes": "16m"}
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        # shuffle/scratch on tmpfs: keeps measurements CPU-bound instead of
        # at the mercy of the sandbox's shared disk
        extra["spark.local.dir"] = "/dev/shm/taro-spark-local"
    return get_spark(
        app_name=f"taro-bench-{cores}",
        cores=cores,
        shuffle_partitions=max(32, cores),
        extra_conf=extra,
    )


def _ensure_bench_transcripts(spark) -> str:
    """Generate-once, read-many synthetic transcripts at bench scale."""
    path = f"{CACHE_DIR}_{BENCH_CONVS}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        from trace_aware_reservoir_otel_spark.synth import generate_transcripts

        # no repartition: range partitioning is already even (LLN over
        # hash-driven conv sizes) and skipping the shuffle makes 10^8-row
        # generation feasible
        df = generate_transcripts(spark, n_convs=BENCH_CONVS, seed=42, span_s=7200)
        df.write.mode("overwrite").parquet(path)
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
    # overflow may legitimately be empty (k >= conversations per window)
    assert "sampled_traces" in counts and n_input > 0, counts
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


def _steal_pct(seconds: float = 3.0) -> float:
    """Hypervisor CPU steal %% under full load — the sandbox is a noisy
    multi-tenant VM; this contextualizes any scaling measurement."""
    import multiprocessing as mp

    def read():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:9]))

    def burn(sec):
        t0 = time.time()
        x = 0
        while time.time() - t0 < sec:
            x += 1

    a = read()
    procs = [mp.Process(target=burn, args=(seconds,)) for _ in range(os.cpu_count() or 8)]
    [p.start() for p in procs]
    [p.join() for p in procs]
    b = read()
    d = [y - x for x, y in zip(a, b)]
    return round(100.0 * d[7] / max(sum(d), 1), 1)


def main_scaling_child(cores: int) -> None:
    spark = _spark(cores)
    # 4 waves of shuffle tasks: smaller per-task sort state (fewer spills
    # at high thread counts) without losing parallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(32, 4 * cores)))
    path = _ensure_bench_transcripts(spark)
    if os.environ.get("TARO_SCALING_WARMUP", "1") != "0":
        _flagship(spark, path)  # warm-up (codegen, file listing)
    sec, n = _flagship(spark, path)
    print(json.dumps({"cores": cores, "sec": sec, "turns": n, "tps": n / sec}))
    spark.stop()


def main_scaling(n_small: int = 8, n_big: int = 32, reps: int = 3) -> None:
    """Interleaved min-of-N: the sandbox shows double-digit CPU steal that
    drifts over minutes, so small/big runs alternate and each config keeps
    its best observation."""
    best: dict = {}
    turns = None
    errs: list = []
    for _ in range(reps):
        for cores in (n_small, n_big):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scaling-child", str(cores)],
                capture_output=True,
                text=True,
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not lines:
                errs.append(f"[cores={cores} rc={p.returncode}] {p.stderr[-2000:]}")
                continue
            r = json.loads(lines[-1])
            turns = r["turns"]
            if cores not in best or r["sec"] < best[cores]["sec"]:
                best[cores] = r
    for cores in (n_small, n_big):
        if cores not in best:
            sys.exit(
                f"scaling: every child run at cores={cores} failed; "
                "captured child stderr:\n" + "\n---\n".join(errs)
            )
    tps_small = best[n_small]["tps"]
    tps_big = best[n_big]["tps"]
    eff = (tps_big / tps_small) / (n_big / n_small)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "small": best[n_small],
                "big": best[n_big],
                "turns": turns,
                "turns_per_sec_small": round(tps_small, 1),
                "turns_per_sec_big": round(tps_big, 1),
                "cpu_steal_pct_under_load": _steal_pct(),
                "note": "multi-tenant sandbox; steal>0 caps achievable efficiency",
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
