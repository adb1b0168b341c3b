"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a 1000-executor cluster deployment would
set per-executor: AQE on (runtime skew-join/coalesce), Arrow for every
pandas UDF boundary, UTC session time so epoch arithmetic is portable to
the DuckDB oracle, shuffle partitions sized to cores (not the 200 default,
which thrashes small local runs and under-partitions big ones — on a real
cluster this would be ~2-3x total cores or AQE-advisory driven).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "trace_aware_reservoir_otel_spark",
    cores: "int | None" = None,
    shuffle_partitions: "int | None" = None,
    extra_conf: "dict | None" = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # scan-parallelism floor: a byte-packed table a few multiples of
        # maxPartitionBytes wide otherwise scans on a fraction of the
        # cores (sf1.0 lineitem: 8 splits on 32 cores). At real scale
        # scans exceed the core count and the floor is a no-op — the same
        # guard rationale as operators.dedup.scale_out.
        .config("spark.sql.files.minPartitionNum", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # broadcast decisions: the STATIC planner sees only size estimates
        # (file size x column-pruning ratio), which at sf1.0 made it
        # broadcast-build multi-million-row fact sides (lineitem in the Q3
        # shape, orders in Q5 — measured 3-4s of driver hash-relation
        # build per query). Keep the static threshold small so estimates
        # can only pick truly tiny sides, and let AQE convert sort-merge
        # to broadcast from RUNTIME shuffle sizes, where 64 MB is safe.
        # Library operators that know a side is small keep their explicit
        # F.broadcast hints, which ignore both thresholds.
        .config("spark.sql.autoBroadcastJoinThreshold", str(4 * 1024 * 1024))
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(64 * 1024 * 1024),
        )
        # HotSpot refuses to JIT methods over ~8000 bytecodes
        # (DontCompileHugeMethods default on): whole-stage-codegen'd wide
        # expressions — the unrolled fixed-dim vector math in
        # operators/similarity.py — then run JVM-INTERPRETED (measured 22x
        # on the SemDeDup within-cell pair stage: 22s -> 1s once JIT'd).
        # Same flag on both roles so a real cluster's executors match
        # local-mode behavior.
        .config("spark.driver.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        # v2 commit: task outputs move at task commit instead of one
        # serial job-commit rename pass — the streaming spill/pre/routed
        # writes commit many small bucket-partition files per micro-batch
        # and the serial pass was measurable. Durability is unchanged for
        # this engine: batch sinks land behind the snapshot-pointer commit
        # (plans/commit.py) and streaming state writes are batch_id-keyed
        # overwrite-idempotent, so a torn v2 job never becomes visible.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
