"""Streaming incremental ingest dedup — the continuous form of the
committed MinHash index pattern (operators/dedup.minhash_index family):
a file stream of document batches where each micro-batch is deduplicated
against the index AS OF its processing time and its survivors are
appended to both the survivor sink and the index itself.

No analog in the reference (its streaming state is the span reservoir,
processor.go:61-118); this is the ingestion topology a training-data
pipeline actually runs: history is immutable, new data dedups against
everything accepted before it, and acceptance itself extends history.

Semantics: batch i's survivors are computed against
(initial index) ∪ (survivors of batches processed before i) — exactly the
sequential fold a nightly ingest job performs. Within-batch duplicates
are out of scope here as in the batch operator (compose dedup_survivors
on the batch first if needed).

Replay safety (foreachBatch is at-least-once): index appends are NOT
naturally idempotent (a replayed batch would append its survivor bucket
rows twice — harmless for existence semantics but unbounded growth), so
applied batch_ids are recorded in a crash-safe JSONL manifest AFTER the
append commits; a replayed batch whose id is already marked only rewrites
its (batch_id-keyed, overwrite — idempotent) parquet sinks and skips the
append. Crash between append and mark ⇒ one duplicate delta of bucket
rows: survivors are unchanged (existence), and the next compaction/rebuild
absorbs it — fail-safe in the correct direction.

Scale shape per batch: one probe (SEMI join of batch band rows against
the committed index — see incremental_dedup_survivors) + one O(batch)
delta append. Driver-side cost is O(1) per batch (manifest read of
applied ids). The index grows by survivors only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, types as T

from trace_aware_reservoir_otel_spark import fsutil
from trace_aware_reservoir_otel_spark.operators.dedup import (
    incremental_dedup_survivors,
    minhash_index_append,
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_APPLIED = "applied.jsonl"


def _applied_ids(state_dir: str) -> set:
    return {r["batch_id"] for r in fsutil.read_jsonl(os.path.join(state_dir, _APPLIED))}


def stream_documents(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def run_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Drive the stream to completion (availableNow). Requires an index
    already built with minhash_index (the initial corpus; may be empty —
    build on an empty frame to accept everything).

    Sinks under out_dir, both batch_id-keyed and overwrite-idempotent:
      seen/batch_id=K       every input doc id of batch K (lineage /
                            conservation: seen = survivors ∪ dropped)
      survivors/batch_id=K  the accepted rows of batch K
    """
    stream = stream_documents(spark, input_dir, max_files_per_trigger)

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        # one job for the whole batch body: survivors feed two sinks and
        # the index append, so pin them once
        batch_df = batch_df.localCheckpoint(eager=True)
        batch_df.select(id_col).write.mode("overwrite").parquet(
            f"{out_dir}/seen/batch_id={batch_id}"
        )
        surv = incremental_dedup_survivors(
            batch_df, index_dir, text_col, id_col
        ).localCheckpoint(eager=True)
        surv.write.mode("overwrite").parquet(
            f"{out_dir}/survivors/batch_id={batch_id}"
        )
        if batch_id in _applied_ids(out_dir):
            return  # replay: sinks rewritten (idempotent), index already grown
        minhash_index_append(surv, index_dir, text_col, id_col)
        fsutil.append_jsonl_atomic(
            os.path.join(out_dir, _APPLIED), [{"batch_id": batch_id}]
        )

    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_survivors(spark: SparkSession, out_dir: str) -> DataFrame:
    """All accepted rows across the stream so far (batch_id carried)."""
    return spark.read.option("basePath", f"{out_dir}/survivors").parquet(
        f"{out_dir}/survivors/batch_id=*"
    )


def read_seen(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", f"{out_dir}/seen").parquet(
        f"{out_dir}/seen/batch_id=*"
    )
