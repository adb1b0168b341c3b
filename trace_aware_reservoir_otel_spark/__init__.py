"""PySpark-native analytics engine with the query/data-processing
capabilities of ``deepaucksharma/trace-aware-reservoir-otel``.

A from-scratch, Spark-first reimplementation (NOT a port): the reference's
push-based Go dataflow (OTLP span stream -> trace buffer -> tumbling-window
reservoir sample -> export) is re-expressed as a declarative DataFrame
pipeline over a transcripts relation
``(conv_id, turn_idx, role, text, tool, ts)``:

    read -> filter(invalid->dlq) -> parse(vectorized regex) ->
    enrich(broadcast dims) -> tumbling window -> deterministic
    conversation-atomic A-Res reservoir (salted two-phase merge) ->
    route(sampled/overflow/dlq) -> fan-out sinks + metrics + state

See SURVEY.md for the operator-by-operator mapping to the reference
(file:line citations into /root/reference).
"""

__version__ = "0.1.0"
