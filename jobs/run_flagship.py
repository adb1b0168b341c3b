#!/usr/bin/env python
"""spark-submit entrypoint for the flagship pipeline (BASELINE.json north
rule: `spark-submit --py-files` on a multi-executor cluster).

The script takes no master/executor settings of its own — cluster shape
comes from spark-submit (--master, --num-executors, --executor-cores), so
the SAME invocation runs at N and 4N executors for the scaling gate:

    scripts/package.sh                                   # builds dist/taro_spark.zip
    spark-submit --py-files dist/taro_spark.zip \\
        [--num-executors N | --master local[N]] \\
        jobs/run_flagship.py --input IN.parquet --out OUT_DIR \\
        [--mode batch|checkpoint|streaming] [--config CONFIG.json]

Output: the routed table + metrics under --out (batch/checkpoint modes
land through the atomic snapshot commit — read with
plans.commit.read_committed), and ONE JSON line of per-sink counts on
stdout (the conservation evidence, metrics.go:47-142 analog).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="transcripts parquet path")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument(
        "--mode",
        choices=("batch", "checkpoint", "streaming"),
        default="batch",
        help="execution mode (all three produce the same routed output)",
    )
    p.add_argument("--config", help="PipelineConfig overrides as a JSON file")
    p.add_argument("--state-dir", help="state dir (checkpoint/streaming modes)")
    p.add_argument("--n-units", type=int, default=8, help="checkpoint units")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from trace_aware_reservoir_otel_spark.config import PipelineConfig

    # master/executors come from spark-submit; only job-level conf here
    spark = (
        SparkSession.builder.appName("taro-flagship")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    overrides = {}
    if args.config:
        with open(args.config) as f:
            overrides = json.load(f)
    cfg = PipelineConfig.from_dict(overrides)

    if args.mode == "batch":
        from trace_aware_reservoir_otel_spark.plans.pipeline import (
            run_pipeline,
            write_sinks,
        )

        tr = spark.read.parquet(args.input)
        counts = write_sinks(run_pipeline(tr, cfg), args.out)
    elif args.mode == "checkpoint":
        from trace_aware_reservoir_otel_spark.plans.state import run_with_checkpoint

        if not args.state_dir:
            p.error("--state-dir is required for checkpoint mode")
        tr = spark.read.parquet(args.input)
        counts = run_with_checkpoint(
            spark, tr, cfg, args.state_dir, args.out, n_units=args.n_units
        )
    else:
        from trace_aware_reservoir_otel_spark.streaming.pipeline import (
            flush_incremental,
            incremental_conservation,
            run_incremental_routed,
        )

        if not args.state_dir:
            p.error("--state-dir is required for streaming mode")
        run_incremental_routed(
            spark,
            args.input,
            cfg,
            args.state_dir,
            f"{args.state_dir}/_spark_checkpoint",
            args.out,
        )
        flush_incremental(spark, cfg, args.state_dir, args.out)
        rows_in, rows_out = incremental_conservation(spark, args.state_dir, args.out)
        counts = {"rows_in": rows_in, "rows_routed": rows_out}

    print(json.dumps({"mode": args.mode, "counts": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
