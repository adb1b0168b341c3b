"""P1/A5 parity: nested OTLP-shaped flatten + re-nest round-trip."""

from pyspark.sql import functions as F

from trace_aware_reservoir_otel_spark.sources.otlp import (
    NESTED_TRACES_SCHEMA,
    flat_spans_to_transcripts,
    flatten_traces,
    nest_traces,
)


def _nested(spark):
    def span(t, s, parent, name, start):
        return (t, s, parent, name, start, start + 1000)

    rows = [
        (
            ("svc-a",),
            [
                ("scope-1", [span("t1", "s1", None, "root", 1_000_000_000),
                             span("t1", "s2", "s1", "child", 2_000_000_000)]),
                ("scope-2", [span("t2", "s3", None, "other-root", 3_000_000_000)]),
            ],
        ),
        (
            ("svc-b",),
            [("scope-1", [span("t3", "s4", None, "b-root", 4_000_000_000)])],
        ),
    ]
    return spark.createDataFrame(rows, NESTED_TRACES_SCHEMA)


def test_flatten_shape(spark):
    flat = flatten_traces(_nested(spark))
    rows = flat.collect()
    assert len(rows) == 4
    assert {r["service_name"] for r in rows} == {"svc-a", "svc-b"}
    r = {r["span_id"]: r for r in rows}
    assert r["s2"]["parent_span_id"] == "s1"
    assert r["s3"]["scope_name"] == "scope-2"


def test_roundtrip_flatten_nest_flatten(spark):
    flat1 = flatten_traces(_nested(spark))
    flat2 = flatten_traces(nest_traces(flat1))
    key = lambda r: (r["service_name"], r["scope_name"], r["trace_id"], r["span_id"])
    assert sorted(map(key, flat1.collect())) == sorted(map(key, flat2.collect()))


def test_spans_to_transcripts(spark):
    tr = flat_spans_to_transcripts(flatten_traces(_nested(spark)))
    rows = {(r["conv_id"], r["turn_idx"]): r for r in tr.collect()}
    assert rows[("t1", 0)]["text"] == "root"
    assert rows[("t1", 1)]["text"] == "child"
    assert rows[("t2", 0)]["tool"] == "svc-a"
    assert set(tr.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_simple_mode_pipeline_runs(spark):
    # non-trace-aware (row-level) reservoir end-to-end (processor.go:265-288)
    from trace_aware_reservoir_otel_spark.config import PipelineConfig
    from trace_aware_reservoir_otel_spark.plans.pipeline import run_pipeline
    from trace_aware_reservoir_otel_spark.synth import generate_transcripts

    df = generate_transcripts(spark, n_convs=100, seed=42)
    cfg = PipelineConfig(size_k=7, window_duration_s=60, seed=42, trace_aware=False)
    res = run_pipeline(df, cfg)
    per_win = (
        res.sampled_traces.groupBy("window_start_s").count().collect()
    )
    assert all(r["count"] <= 7 for r in per_win)
    n = res.routed.count()
    assert n == df.count()