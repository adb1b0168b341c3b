"""Vectorized extraction of tool-call / span-like fields from `text` (F7).

North-star addition (no Go analog — the reference receives already
structured OTLP spans; here the structure is embedded in transcript text):

    "... <tool_call name=search dur_ms=123> trace=<hex16> span=<hex8>"

Two implementations with identical output:
 - `with_parsed_fields`  : built-in `regexp_extract` Column expressions —
   JVM-side, whole-stage codegen, the production hot path;
 - `with_parsed_fields_pandas` : Arrow-batched pandas UDF (grok-style) —
   the escape hatch for patterns Spark's regex can't express; kept
   output-equal by tests (never per-row Python, per input_hint).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

TOOL_CALL_RE = r"<tool_call name=(\w+) dur_ms=(\d+)> trace=([0-9a-f]{16}) span=([0-9a-f]{8})"

_PARSED_STRUCT = T.StructType(
    [
        T.StructField("p_tool", T.StringType(), True),
        T.StructField("p_dur_ms", T.LongType(), True),
        T.StructField("p_trace_hex", T.StringType(), True),
        T.StructField("p_span_hex", T.StringType(), True),
    ]
)


def _nullif_empty(c):
    return F.when(c == "", F.lit(None)).otherwise(c)


def with_parsed_fields(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    # cheap literal pre-filter: rows without a tool-call marker (the
    # majority) never run the regex — `when` evaluates lazily per row in
    # codegen, so this skips 4 regex executions on the cold path
    has_marker = t.isNotNull() & t.contains("<tool_call name=")

    def ext(group: int):
        return F.when(
            has_marker, _nullif_empty(F.regexp_extract(t, TOOL_CALL_RE, group))
        )

    return (
        df.withColumn("p_tool", ext(1))
        .withColumn("p_dur_ms", ext(2).cast("long"))
        .withColumn("p_trace_hex", ext(3))
        .withColumn("p_span_hex", ext(4))
    )


@F.pandas_udf(_PARSED_STRUCT)
def _parse_tool_call_udf(text: pd.Series) -> pd.DataFrame:
    pat = re.compile(TOOL_CALL_RE)
    ext = text.str.extract(pat)
    ext.columns = ["p_tool", "p_dur_ms", "p_trace_hex", "p_span_hex"]
    ext["p_dur_ms"] = pd.to_numeric(ext["p_dur_ms"], errors="coerce").astype("Int64")
    return ext


def with_parsed_fields_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    parsed = _parse_tool_call_udf(F.col(text_col))
    return df.withColumn("_p", parsed).select("*", "_p.*").drop("_p")
