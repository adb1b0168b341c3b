"""Streaming semantics: watermark window counts, stateful sessionization
(trace-buffer analog), and incremental-reservoir equivalence with the
batch pipeline."""

import os

import pytest
from pyspark.sql import functions as F

from trace_aware_reservoir_otel_spark.config import PipelineConfig
from trace_aware_reservoir_otel_spark.operators.reservoir import (
    conversation_units,
    topk_units,
)
from trace_aware_reservoir_otel_spark.operators.windows import with_tumbling_window
from trace_aware_reservoir_otel_spark.streaming.pipeline import (
    incremental_winners,
    run_incremental,
    stream_transcripts,
    streaming_sessionize,
    streaming_window_counts,
)
from trace_aware_reservoir_otel_spark.synth import generate_transcripts

# hash_impl='md5' because test_incremental_reservoir_equals_batch compares
# against conversation_units (portable-md5 priorities); merged_units honors
# cfg.hash_impl, so both sides must pin the same scheme
CFG = PipelineConfig(
    size_k=5, window_duration_s=60, seed=42, late_tolerance_s=None, hash_impl="md5"
)


def _write_stream_file(df, in_dir, name):
    """Materialize df as a single plain parquet FILE (the file-stream
    source lists files, not nested dataset directories)."""
    import glob
    import shutil

    tmp = os.path.join(in_dir, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.makedirs(in_dir, exist_ok=True)
    shutil.move(part, os.path.join(in_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


def _write_batches(spark, base, n_convs=120):
    df = generate_transcripts(spark, n_convs=n_convs, seed=42).filter(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )
    a = df.filter(F.xxhash64("conv_id") % 2 == 0)
    b = df.filter(F.xxhash64("conv_id") % 2 != 0)
    in_dir = os.path.join(base, "in")
    _write_stream_file(a, in_dir, "000")
    _write_stream_file(b, in_dir, "001")
    return df, in_dir


def test_streaming_window_counts(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream_wc"))
    df, in_dir = _write_batches(spark, base)
    stream = stream_transcripts(spark, in_dir, max_files_per_trigger=1)
    q = (
        streaming_window_counts(stream, 60.0, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("wc")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(base, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["window_start_s"]: r["rows"]
        for r in spark.sql("select * from wc").collect()
    }
    exp = {
        r["window_start_s"]: r["count"]
        for r in with_tumbling_window(df, "ts", 60)
        .groupBy("window_start_s")
        .count()
        .collect()
    }
    assert got == exp


def test_streaming_sessionize_emits_on_watermark(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream_sess"))
    rows_a = [("conv-a", i, "user", "t", None, f"2024-01-01 00:00:{10 + i:02d}") for i in range(3)]
    rows_b = [("conv-b", 0, "user", "t", None, "2024-01-01 03:00:00")]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, s string"
    fa = spark.createDataFrame(rows_a, schema).withColumn("ts", F.col("s").cast("timestamp")).drop("s")
    fb = spark.createDataFrame(rows_b, schema).withColumn("ts", F.col("s").cast("timestamp")).drop("s")
    in_dir = os.path.join(base, "in")
    _write_stream_file(fa, in_dir, "000")
    _write_stream_file(fb, in_dir, "001")

    stream = stream_transcripts(spark, in_dir, max_files_per_trigger=1)
    q = (
        streaming_sessionize(stream, gap_s=30.0)
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(base, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["conv_id"]: r["n_turns"] for r in spark.sql("select * from sess").collect()}
    # conv-a completed (file2's 03:00 watermark passed its 30s gap);
    # conv-b still open at stream end
    assert got.get("conv-a") == 3
    assert "conv-b" not in got


def test_incremental_reservoir_equals_batch(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream_inc"))
    df, in_dir = _write_batches(spark, base)
    run_incremental(
        spark, in_dir, CFG,
        state_dir=os.path.join(base, "state"),
        checkpoint_dir=os.path.join(base, "ck"),
    )
    inc = incremental_winners(spark, os.path.join(base, "state"), CFG)
    batch_units = conversation_units(
        with_tumbling_window(df, "ts", 60), seed=CFG.seed
    )
    batch = topk_units(batch_units, CFG.size_k)
    w_inc = {(r["window_start_s"], r["conv_id"]) for r in inc.collect()}
    w_batch = {(r["window_start_s"], r["conv_id"]) for r in batch.collect()}
    assert w_inc == w_batch
    # restart-safety: re-running the stream (same checkpoint) adds nothing
    run_incremental(
        spark, in_dir, CFG,
        state_dir=os.path.join(base, "state"),
        checkpoint_dir=os.path.join(base, "ck"),
    )
    inc2 = incremental_winners(spark, os.path.join(base, "state"), CFG)
    assert {(r["window_start_s"], r["conv_id"]) for r in inc2.collect()} == w_inc


# --- streaming routed fan-out (rollover export) ------------------------------

from trace_aware_reservoir_otel_spark.plans.pipeline import run_pipeline  # noqa: E402
from trace_aware_reservoir_otel_spark.streaming.pipeline import (  # noqa: E402
    _write_pre,
    flush_incremental,
    incremental_conservation,
    run_incremental_routed,
)


def _routed_histogram(df):
    out = {}
    for r in (
        df.groupBy("conv_id", "turn_idx", "sink", "reason").count().collect()
    ):
        out[(r["conv_id"], r["turn_idx"], r["sink"], r["reason"])] = r["count"]
    return out


def _write_time_ordered_batches(spark, base, cfg, n_convs=150):
    """Two files split at a window-aligned time cut: event time is ordered
    across files (the streaming watermark contract), so a window's rows
    never arrive after it closed."""
    df = generate_transcripts(spark, n_convs=n_convs, seed=7)
    w = int(cfg.window_duration_s)
    lo, hi = df.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    cut = (int((lo + hi) // 2) // w) * w
    sec = F.unix_timestamp("ts")
    in_dir = os.path.join(base, "in")
    _write_stream_file(df.filter(sec < cut), in_dir, "000")
    _write_stream_file(df.filter(sec >= cut), in_dir, "001")
    return df, in_dir


def test_streaming_routed_equals_batch_rollover(spark, tmp_path_factory):
    """The reference's hot path IS streaming export at window rollover
    (processor.go:317-347): union of per-rollover routed outputs must equal
    the batch pipeline on the same input."""
    cfg = PipelineConfig(
        size_k=5, window_duration_s=60, seed=42,
        late_tolerance_s=None, buffer_max_convs=8,
    )
    base = str(tmp_path_factory.mktemp("stream_routed"))
    df, in_dir = _write_time_ordered_batches(spark, base, cfg)
    state = os.path.join(base, "state")
    out = os.path.join(base, "out")
    run_incremental_routed(
        spark, in_dir, cfg, state, os.path.join(base, "ck"), out
    )
    # some windows must have been exported mid-stream (true rollover)
    from trace_aware_reservoir_otel_spark.streaming.pipeline import _exported_buckets

    assert len(_exported_buckets(state)) > 0
    flush_incremental(spark, cfg, state, out)
    got = _routed_histogram(
        spark.read.parquet(f"{out}/routed")
    )
    exp = _routed_histogram(run_pipeline(df, cfg).routed)
    assert got == exp
    rows_in, rows_out = incremental_conservation(spark, state, out)
    assert rows_in == rows_out == df.count()


def test_streaming_routed_late_tolerance_flush(spark, tmp_path_factory):
    """With late tolerance configured, routing defers to flush (conv starts
    are global) but still equals the batch pipeline."""
    cfg = PipelineConfig(
        size_k=5, window_duration_s=60, seed=42,
        late_tolerance_s=120.0, buffer_max_convs=8,
    )
    base = str(tmp_path_factory.mktemp("stream_routed_late"))
    df, in_dir = _write_time_ordered_batches(spark, base, cfg)
    state = os.path.join(base, "state")
    out = os.path.join(base, "out")
    run_incremental_routed(
        spark, in_dir, cfg, state, os.path.join(base, "ck"), out
    )
    flush_incremental(spark, cfg, state, out)
    got = _routed_histogram(spark.read.parquet(f"{out}/routed"))
    exp = _routed_histogram(run_pipeline(df, cfg).routed)
    assert got == exp


def test_batch_replay_is_idempotent(spark, tmp_path_factory):
    """foreachBatch is at-least-once: re-delivering a batch with the same
    batch_id must not change merged state (the batch_id-keyed overwrite)."""
    import glob

    base = str(tmp_path_factory.mktemp("stream_replay"))
    df, in_dir = _write_batches(spark, base)
    state = os.path.join(base, "state")
    run_incremental(
        spark, in_dir, CFG, state_dir=state,
        checkpoint_dir=os.path.join(base, "ck"),
    )
    before = {
        (r["window_start_s"], r["conv_id"])
        for r in incremental_winners(spark, state, CFG).collect()
    }
    n_before = spark.read.parquet(f"{state}/pre").count()
    # replay batch 0 (same content, same id) — simulated mid-write failure retry
    f0 = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))[0]
    _write_pre(spark.read.parquet(f0), 0, CFG, state)
    assert spark.read.parquet(f"{state}/pre").count() == n_before
    after = {
        (r["window_start_s"], r["conv_id"])
        for r in incremental_winners(spark, state, CFG).collect()
    }
    assert after == before


def test_straggler_rows_route_to_late_arrival_dlq(spark, tmp_path_factory):
    """A row arriving AFTER its window was exported (watermark violation)
    must not vanish: it routes to dlq(late_arrival) and conservation holds."""
    cfg = PipelineConfig(
        size_k=5, window_duration_s=60, seed=42, late_tolerance_s=None
    )
    base = str(tmp_path_factory.mktemp("stream_straggler"))
    df, in_dir = _write_time_ordered_batches(spark, base, cfg, n_convs=80)
    # file 002: one row whose ts lies back in file 000's first window
    first = df.orderBy("ts", "turn_idx").limit(1).collect()[0]
    straggler = spark.createDataFrame(
        [(
            "conv-straggler", 0, "user", "late straggler row", None, first["ts"],
        )],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).select(*df.columns)
    _write_stream_file(straggler, in_dir, "002")

    state = os.path.join(base, "state")
    out = os.path.join(base, "out")
    run_incremental_routed(
        spark, in_dir, cfg, state, os.path.join(base, "ck"), out
    )
    from trace_aware_reservoir_otel_spark.streaming.pipeline import (
        _bucket_of,
        _exported_buckets,
        flush_incremental,
        incremental_conservation,
    )

    first_w = (
        int(first["ts"].timestamp()) // 60
    ) * 60
    assert _exported_buckets(state).get(_bucket_of(first_w, cfg)) is not None  # bucket rolled
    flush_incremental(spark, cfg, state, out)
    strag = spark.read.parquet(f"{out}/routed_stragglers").collect()
    assert len(strag) == 1
    assert strag[0]["conv_id"] == "conv-straggler"
    assert strag[0]["reason"] == "late_arrival"
    rows_in, rows_out = incremental_conservation(spark, state, out)
    assert rows_in == rows_out == df.count() + 1


def test_streaming_restart_with_new_data_equals_batch(spark, tmp_path_factory):
    """Continuous-deployment story: process two files, stop, new data
    arrives, restart on the SAME checkpoint — only the new file is
    processed, already-exported windows are not re-exported, and the final
    union still equals the batch pipeline over all data."""
    cfg = PipelineConfig(
        size_k=5, window_duration_s=60, seed=42,
        late_tolerance_s=None, buffer_max_convs=8,
    )
    base = str(tmp_path_factory.mktemp("stream_restart"))
    df = generate_transcripts(spark, n_convs=120, seed=9)
    w = int(cfg.window_duration_s)
    lo, hi = df.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    cut1 = (int(lo + (hi - lo) / 3) // w) * w
    cut2 = (int(lo + 2 * (hi - lo) / 3) // w) * w
    sec = F.unix_timestamp("ts")
    in_dir = os.path.join(base, "in")
    _write_stream_file(df.filter(sec < cut1), in_dir, "000")
    _write_stream_file(df.filter((sec >= cut1) & (sec < cut2)), in_dir, "001")

    state = os.path.join(base, "state")
    ck = os.path.join(base, "ck")
    out = os.path.join(base, "out")
    run_incremental_routed(spark, in_dir, cfg, state, ck, out)
    from trace_aware_reservoir_otel_spark.streaming.pipeline import _exported_buckets

    exported_before = dict(_exported_buckets(state))
    assert exported_before  # something rolled in phase 1

    # new data lands; restart on the same checkpoint
    _write_stream_file(df.filter(sec >= cut2), in_dir, "002")
    run_incremental_routed(spark, in_dir, cfg, state, ck, out)
    exported_after = _exported_buckets(state)
    for bkt, bid in exported_before.items():
        assert exported_after[bkt] == bid  # phase-1 exports untouched
    flush_incremental(spark, cfg, state, out)

    got = _routed_histogram(spark.read.parquet(f"{out}/routed"))
    exp = _routed_histogram(run_pipeline(df, cfg).routed)
    assert got == exp
    rows_in, rows_out = incremental_conservation(spark, state, out)
    assert rows_in == rows_out == df.count()
