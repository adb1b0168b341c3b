"""OTLP protobuf traces ingest (S1/P1 for the reference's native wire
format).

The reference consumes OTLP protobuf via the collector's pdata
(factory.go:12-18, go.mod:10); sources/otlp.py handles OTLP-SHAPED
parquet/JSON. This module closes the remaining gap: actual
`ExportTraceServiceRequest` protobuf payloads carried as a binary column
(e.g. a Kafka `value`, an object-store blob) are flattened to span rows.

Message structure follows the public opentelemetry-proto schema
(trace/v1/trace.proto, common/v1/common.proto):

  ExportTraceServiceRequest: resource_spans=1
  ResourceSpans : resource=1, scope_spans=2
  Resource      : attributes=1 (KeyValue)
  ScopeSpans    : scope=1, spans=2
  InstrumentationScope: name=1
  Span          : trace_id=1(bytes) span_id=2 parent_span_id=4 name=5
                  kind=6(varint) start_time_unix_nano=7(fixed64)
                  end_time_unix_nano=8(fixed64) attributes=9
  KeyValue      : key=1, value=2 (AnyValue: string=1 bool=2 int=3 double=4)

Decoding runs as an Arrow-batched mapInPandas (partition-local, zero
shuffle; the standard UDF escape hatch since neither the spark-protobuf
jar nor python google.protobuf exists in this container — on a cluster
with the connector, swap `decode_otlp_traces` for `from_protobuf` and keep
the identical output schema). The flattened frame feeds the same
transcripts pipeline as every other source. `encode_export_request` is
the matching encoder used for round-trip tests and payload synthesis.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

from trace_aware_reservoir_otel_spark.functions.protowire import (
    field_bytes,
    field_fixed64,
    field_varint,
    iter_fields,
)

OTLP_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("service_name", T.StringType(), True),
        T.StructField("scope_name", T.StringType(), True),
        T.StructField("trace_id_hex", T.StringType(), True),
        T.StructField("span_id_hex", T.StringType(), True),
        T.StructField("parent_span_id_hex", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("kind", T.IntegerType(), True),
        T.StructField("start_unix_nano", T.LongType(), True),
        T.StructField("end_unix_nano", T.LongType(), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _decode_any_value(buf: bytes) -> str:
    for field, wire, val in iter_fields(buf):
        if field == 1:  # string_value
            return val.decode("utf-8", "replace")
        if field == 2:  # bool_value
            return "true" if val else "false"
        if field == 3:  # int_value (zigzag NOT used; plain varint per proto3)
            return str(val if val < 1 << 63 else val - (1 << 64))
        if field == 4:  # double_value (fixed64 raw bits)
            import struct

            return repr(struct.unpack("<d", struct.pack("<Q", val))[0])
    return ""


def _decode_attrs(kv_blobs: "list[bytes]") -> "dict[str, str]":
    out = {}
    for blob in kv_blobs:
        key, value = None, ""
        for field, wire, val in iter_fields(blob):
            if field == 1:
                key = val.decode("utf-8", "replace")
            elif field == 2:
                value = _decode_any_value(val)
        if key is not None:
            out[key] = value
    return out


def _decode_span(buf: bytes) -> dict:
    span = {
        "trace_id_hex": None,
        "span_id_hex": None,
        "parent_span_id_hex": None,
        "name": None,
        "kind": None,
        "start_unix_nano": None,
        "end_unix_nano": None,
    }
    kvs: "list[bytes]" = []
    for field, wire, val in iter_fields(buf):
        if field == 1:
            span["trace_id_hex"] = bytes(val).hex()
        elif field == 2:
            span["span_id_hex"] = bytes(val).hex()
        elif field == 4:
            span["parent_span_id_hex"] = bytes(val).hex()
        elif field == 5:
            span["name"] = val.decode("utf-8", "replace")
        elif field == 6:
            span["kind"] = int(val)
        elif field == 7:
            span["start_unix_nano"] = int(val)
        elif field == 8:
            span["end_unix_nano"] = int(val)
        elif field == 9:
            kvs.append(bytes(val))
    span["attrs"] = _decode_attrs(kvs)
    return span


def decode_export_request(payload: bytes) -> "list[dict]":
    """Pure-Python decode of one ExportTraceServiceRequest → span dicts."""
    rows = []
    for f_rs, _w, rs in iter_fields(bytes(payload)):
        if f_rs != 1:
            continue
        service = None
        scopes = []
        for f, _w2, val in iter_fields(rs):
            if f == 1:  # resource
                for f2, _w3, v2 in iter_fields(val):
                    if f2 == 1:
                        attrs = _decode_attrs([bytes(v2)])
                        service = attrs.get("service.name", service)
            elif f == 2:
                scopes.append(val)
        for ss in scopes:
            scope_name = None
            spans = []
            for f, _w2, val in iter_fields(ss):
                if f == 1:
                    for f2, _w3, v2 in iter_fields(val):
                        if f2 == 1:
                            scope_name = v2.decode("utf-8", "replace")
                elif f == 2:
                    spans.append(val)
            for sp in spans:
                row = _decode_span(sp)
                row["service_name"] = service
                row["scope_name"] = scope_name
                rows.append(row)
    return rows


def decode_otlp_traces(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Flatten a binary column of OTLP ExportTraceServiceRequest payloads
    into one row per span (the P1 flatten for the native wire format).

    Partition-local mapInPandas: payload bytes never shuffle; predicates on
    the OUTPUT columns cannot push below the decode (same as any protobuf
    source), so filter on payload-side metadata first where possible."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in OTLP_SPAN_SCHEMA.fields]
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                if payload is None:
                    continue
                out.extend(decode_export_request(payload))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(decode, schema=OTLP_SPAN_SCHEMA)


# --- encoder (round-trip tests / payload synthesis) ---------------------------


def _encode_any_string(s: str) -> bytes:
    return field_bytes(1, s.encode())


def _encode_kv(key: str, value: str) -> bytes:
    return field_bytes(1, key.encode()) + field_bytes(2, _encode_any_string(value))


def encode_span(row: dict) -> bytes:
    out = b""
    if row.get("trace_id_hex"):
        out += field_bytes(1, bytes.fromhex(row["trace_id_hex"]))
    if row.get("span_id_hex"):
        out += field_bytes(2, bytes.fromhex(row["span_id_hex"]))
    if row.get("parent_span_id_hex"):
        out += field_bytes(4, bytes.fromhex(row["parent_span_id_hex"]))
    if row.get("name") is not None:
        out += field_bytes(5, row["name"].encode())
    if row.get("kind") is not None:
        out += field_varint(6, row["kind"])
    if row.get("start_unix_nano") is not None:
        out += field_fixed64(7, row["start_unix_nano"])
    if row.get("end_unix_nano") is not None:
        out += field_fixed64(8, row["end_unix_nano"])
    for k, v in (row.get("attrs") or {}).items():
        out += field_bytes(9, _encode_kv(k, v))
    return out


def encode_export_request(
    spans: "list[dict]", service_name: str = "svc", scope_name: str = "scope"
) -> bytes:
    resource = field_bytes(1, _encode_kv("service.name", service_name))
    scope = field_bytes(1, field_bytes(1, scope_name.encode()))
    span_fields = b"".join(field_bytes(2, encode_span(s)) for s in spans)
    scope_spans = scope + span_fields
    resource_spans = field_bytes(1, resource) + field_bytes(2, scope_spans)
    return field_bytes(1, resource_spans)


def transcripts_from_spans(spans: DataFrame) -> DataFrame:
    """Adapt decoded OTLP spans to the engine's transcripts schema
    (span ↔ turn, trace ↔ conversation — the same mapping the whole engine
    is built on, SURVEY §1.1).

    turn_idx = rank of the span within its trace by (start time, span id)
    — one conv-keyed window pass, an adapter-level shuffle exactly like
    sources/tables.transcripts_from_events (the pipeline proper never
    shuffles the fact again)."""
    from pyspark.sql import Window as W, functions as F

    w = W.partitionBy("trace_id_hex").orderBy("start_unix_nano", "span_id_hex")
    return spans.select(
        F.col("trace_id_hex").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.coalesce(F.col("attrs")["role"], F.lit("tool")).alias("role"),
        F.concat_ws(
            " ",
            F.col("name"),
            F.concat(F.lit("service="), F.coalesce("service_name", F.lit("?"))),
        ).alias("text"),
        F.col("attrs")["tool"].alias("tool"),
        F.timestamp_micros((F.col("start_unix_nano") / 1000).cast("long")).alias(
            "ts"
        ),
    )
