"""Resume semantics (SURVEY.md §5.3.5): a crashed-and-resumed run must
produce byte-identical sinks to an uninterrupted run — the associative
candidate-merge fixes the reference's restore double-count (§2.11.3)."""

import pytest
from pyspark.sql import functions as F

from trace_aware_reservoir_otel_spark.config import PipelineConfig
from trace_aware_reservoir_otel_spark.plans.pipeline import run_pipeline
from trace_aware_reservoir_otel_spark.plans.state import (
    read_manifest,
    run_with_checkpoint,
)
from trace_aware_reservoir_otel_spark.synth import generate_transcripts

CFG = PipelineConfig(size_k=5, window_duration_s=60, seed=42, run_id="state-test")


@pytest.fixture(scope="module")
def data(spark):
    return generate_transcripts(spark, n_convs=200, seed=42).cache()


def _sampled_set(spark, out_dir):
    routed = spark.read.parquet(f"{out_dir}/routed")
    return {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in routed.filter(F.col("sink") == "sampled_traces")
        .select("conv_id", "turn_idx", "text")
        .collect()
    }


def test_resume_equals_uninterrupted(spark, data, tmp_path_factory):
    base = tmp_path_factory.mktemp("state")
    # uninterrupted
    s1 = str(base / "s1")
    o1 = str(base / "o1")
    counts1 = run_with_checkpoint(spark, data, CFG, s1, o1, n_units=4)
    # crash after unit 1, then resume
    s2 = str(base / "s2")
    o2 = str(base / "o2")
    crashed = run_with_checkpoint(
        spark, data, CFG, s2, o2, n_units=4, fail_after_unit=1
    )
    assert crashed is None
    assert read_manifest(s2) == {0, 1}
    counts2 = run_with_checkpoint(spark, data, CFG, s2, o2, n_units=4)
    assert counts1 == counts2
    assert _sampled_set(spark, o1) == _sampled_set(spark, o2)


def test_checkpoint_matches_direct_pipeline(spark, data, tmp_path_factory):
    base = tmp_path_factory.mktemp("state_direct")
    out = str(base / "out")
    counts = run_with_checkpoint(
        spark, data, CFG, str(base / "st"), out, n_units=3
    )
    res = run_pipeline(data, CFG)
    direct = {
        (r["conv_id"], r["turn_idx"])
        for r in res.sampled_traces.select("conv_id", "turn_idx").collect()
    }
    via_state = {(c, t) for c, t, _ in _sampled_set(spark, out)}
    assert direct == via_state
    total = sum(counts.values())
    assert total == data.count()


def test_state_table_bounded(spark, data, tmp_path_factory):
    base = tmp_path_factory.mktemp("state_bounded")
    run_with_checkpoint(spark, data, CFG, str(base / "st"), str(base / "o"), n_units=4)
    cand = spark.read.parquet(str(base / "st" / "candidates"))
    n_windows = cand.select("window_start_s").distinct().count()
    # bounded: <= n_units * k per window (no cap configured)
    assert cand.count() <= 4 * CFG.size_k * n_windows
    per = cand.groupBy("unit_id", "window_start_s").count().collect()
    assert all(r["count"] <= CFG.size_k for r in per)
