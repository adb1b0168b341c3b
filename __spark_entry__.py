"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse -> enrich -> window -> sample ->
route pipeline on transcripts derived from /root/testdata/sf0.001 events.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (registry lives in
trace_aware_reservoir_otel_spark/contract.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_aware_reservoir_otel_spark.contract import (  # noqa: E402
    contract_oracles,
    contract_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = contract_queries()["flagship_pipeline"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract_queries()


def oracle_sql() -> dict[str, str]:
    return contract_oracles()
