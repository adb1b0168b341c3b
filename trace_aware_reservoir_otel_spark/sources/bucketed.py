"""Bucketed tables for co-located (exchange-free) joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Spark's
answer is bucketing: both sides are written pre-hash-partitioned AND
sorted by the join key (`bucketBy` + `sortBy`), so a later equi-join on
that key is planned as a zero-Exchange sort-merge over co-located buckets
— the scan IS the shuffle, paid once at write time and amortized over
every subsequent join.

This is the parquet/catalog analog of the Iceberg bucket-partition layout
SURVEY §1.4 maps the sink tables to. Use it for the relations that join
repeatedly on a stable key (e.g. routed output joined back to
conversation-level aggregates by conv_id).

Caveats (all standard):
 - bucketed tables live in the session catalog (`saveAsTable`), not bare
   directories — `spark.sql.warehouse.dir` controls placement;
 - both sides must agree on bucket count (or be multiples under AQE);
 - `spark.sql.sources.bucketing.enabled` (default true) must stay on, and
   the join key must equal the bucket key exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: "list[str]",
    n_buckets: int = 8,
    sort_cols: "list[str] | None" = None,
) -> None:
    """Persist `df` as a bucketed+sorted catalog table (overwrite)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
