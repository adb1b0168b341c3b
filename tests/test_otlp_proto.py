"""OTLP protobuf wire-format ingest: encoder/decoder round-trip, Spark
mapInPandas flatten, and hand-built byte-level fixtures (so the decoder is
checked against the protobuf spec, not just against our own encoder)."""

import pytest

from trace_aware_reservoir_otel_spark.functions.protowire import (
    iter_fields,
    read_varint,
    write_varint,
)
from trace_aware_reservoir_otel_spark.sources.otlp_proto import (
    decode_export_request,
    decode_otlp_traces,
    encode_export_request,
)


def test_varint_round_trip():
    for v in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        assert read_varint(write_varint(v), 0) == (v, len(write_varint(v)))


def test_known_bytes_decode():
    # spec examples: field 1 varint 150 -> 08 96 01; field 2 string "testing"
    buf = bytes([0x08, 0x96, 0x01]) + bytes([0x12, 0x07]) + b"testing"
    got = list(iter_fields(buf))
    assert got == [(1, 0, 150), (2, 2, b"testing")]


def _mk_spans(n, trace="ab" * 16):
    return [
        {
            "trace_id_hex": trace,
            "span_id_hex": f"{i:016x}",
            "parent_span_id_hex": None if i == 0 else f"{i - 1:016x}",
            "name": f"op-{i}",
            "kind": 2,
            "start_unix_nano": 1_700_000_000_000_000_000 + i * 1_000,
            "end_unix_nano": 1_700_000_000_000_000_000 + i * 1_000 + 500,
            "attrs": {"turn": str(i), "role": "user" if i % 2 == 0 else "assistant"},
        }
        for i in range(n)
    ]


def test_export_request_round_trip():
    spans = _mk_spans(4)
    payload = encode_export_request(spans, service_name="telemetry-gw", scope_name="sdk")
    rows = decode_export_request(payload)
    assert len(rows) == 4
    for exp, got in zip(spans, rows):
        assert got["service_name"] == "telemetry-gw"
        assert got["scope_name"] == "sdk"
        for k in ("trace_id_hex", "span_id_hex", "parent_span_id_hex", "name",
                  "kind", "start_unix_nano", "end_unix_nano", "attrs"):
            assert got[k] == exp[k], k


def test_spark_decode_otlp_traces(spark):
    payloads = [
        (i, encode_export_request(_mk_spans(3, trace=f"{i:032x}"), service_name=f"svc-{i}"))
        for i in range(5)
    ]
    df = spark.createDataFrame(payloads, "req_id long, payload binary")
    out = decode_otlp_traces(df)
    rows = out.collect()
    assert len(rows) == 15
    services = {r["service_name"] for r in rows}
    assert services == {f"svc-{i}" for i in range(5)}
    r0 = [r for r in rows if r["service_name"] == "svc-0" and r["name"] == "op-0"][0]
    assert r0["parent_span_id_hex"] is None  # the root span (P4 input)
    assert r0["attrs"]["role"] == "user"
    assert r0["end_unix_nano"] - r0["start_unix_nano"] == 500


def test_decode_skips_null_payloads(spark):
    good = encode_export_request(_mk_spans(2))
    df = spark.createDataFrame(
        [(0, None), (1, good)], "req_id long, payload binary"
    )
    assert decode_otlp_traces(df).count() == 2


def test_otlp_payloads_through_flagship_pipeline(spark):
    """End-to-end: protobuf wire payloads -> decode -> transcripts adapter
    -> the flagship routed pipeline, with conservation and trace-atomic
    sampling intact."""
    from pyspark.sql import functions as F

    from trace_aware_reservoir_otel_spark.config import PipelineConfig
    from trace_aware_reservoir_otel_spark.plans.pipeline import run_pipeline
    from trace_aware_reservoir_otel_spark.sources.otlp_proto import (
        transcripts_from_spans,
    )

    payloads = [
        (i, encode_export_request(_mk_spans(4, trace=f"{i:032x}"), service_name=f"svc-{i % 3}"))
        for i in range(12)
    ]
    df = spark.createDataFrame(payloads, "req_id long, payload binary")
    tr = transcripts_from_spans(decode_otlp_traces(df))
    assert tr.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    res = run_pipeline(
        tr, PipelineConfig(size_k=5, window_duration_s=60, seed=42)
    )
    sinks = {r["sink"]: r["count"] for r in res.routed.groupBy("sink").count().collect()}
    assert sum(sinks.values()) == 48  # conservation: 12 requests x 4 spans
    # trace-atomic: every sampled conversation keeps all 4 turns
    per_conv = (
        res.sampled_traces.groupBy("conv_id").count().collect()
    )
    assert per_conv and all(r["count"] == 4 for r in per_conv)


def test_negative_varint_encodes_as_two_complement():
    """proto varints carry negative int64 as 64-bit two's complement (a
    10-byte varint); the writer must mask rather than loop forever on
    Python's sign-preserving right shift."""
    enc = write_varint(-1)
    assert len(enc) == 10
    assert read_varint(enc, 0) == ((1 << 64) - 1, 10)
    enc2 = write_varint(-2)
    assert read_varint(enc2, 0)[0] == (1 << 64) - 2
