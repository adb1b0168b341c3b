"""Self-check of the driver contract: every queries() entry must match its
oracle_sql() on DuckDB at sf0.001 — row count, column names, and full
(order-insensitive) value equality. This replays the driver's
CORRECTNESS_r{N} gate locally before the driver ever runs it at sf0.01."""

import datetime
import decimal
import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from trace_aware_reservoir_otel_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v) if v != int(v) else int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _rows(res):
    return sorted(tuple(_norm(v) for v in row) for row in res)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_every_query_has_oracle():
    # every contract query now carries a DuckDB oracle (round 2 closed the
    # multimodal gap by making synthesize_media hash-portable)
    assert set(QUERIES) - set(ORACLES) == set()


def test_no_oracle_queries_still_run(spark):
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() > 0, name


@pytest.mark.parametrize("name", sorted(set(QUERIES) & set(ORACLES)))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    ores = duck.execute(ORACLES[name])
    duck_cols = [c[0].lower() for c in ores.description]
    orows = ores.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    assert len(srows) > 0, f"{name}: empty result (trivial pass)"
    got, exp = _rows(srows), _rows(orows)
    mism = [(g, e) for g, e in zip(got, exp) if g != e][:3]
    assert got == exp, f"{name}: value mismatch, first diffs: {mism}"
