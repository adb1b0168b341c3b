"""Bit-parity of the portable priority functions between Spark and DuckDB —
the foundation of every oracle-checked sampling query (SURVEY.md §7.5)."""

import hashlib
import math

import duckdb
from pyspark.sql import functions as F

from trace_aware_reservoir_otel_spark.functions import hashing as H
from trace_aware_reservoir_otel_spark.operators.windows import (
    duck_window_start_s,
    window_start_s,
)


def py_pbig(key: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:13], 16)


def py_u(key: str, seed: int) -> float:
    return (py_pbig(key, seed) + 0.5) / 2**52


def _quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def test_pbig_parity_spark_duckdb_python(spark):
    keys = [f"conv-{i:08d}" for i in range(200)] + ["x", "1704067260:conv-7"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {
        r["key"]: (r["h"], r["u"], r["a"])
        for r in df.select(
            "key",
            H.pbig("key", 42).alias("h"),
            H.u01("key", 42).alias("u"),
            H.ares_key("key", 42).alias("a"),
        ).collect()
    }
    con = duckdb.connect()
    for k in keys:
        q = _quote(k)
        dh, du = con.execute(
            f"select {H.duck_pbig(q, 42)}, {H.duck_u(q, 42)}"
        ).fetchone()
        assert got[k][0] == dh == py_pbig(k, 42)
        assert got[k][1] == du == py_u(k, 42)
        # JVM vs libm log may differ in the last ulp; integer/u parity is
        # exact (and contract queries order by the exact integer priority).
        assert math.isclose(got[k][2], -math.log(py_u(k, 42)), rel_tol=1e-14)


def test_window_bucket_parity(spark):
    stamps = ["2024-01-01 00:09:58.778549", "2024-03-05 13:00:00"]
    df = spark.createDataFrame([(s,) for s in stamps], "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    got = sorted(r[0] for r in df.select(window_start_s("ts", 60)).collect())
    con = duckdb.connect()
    exp = sorted(
        con.execute(
            "select " + duck_window_start_s(f"TIMESTAMP '{s}'", 60)
        ).fetchone()[0]
        for s in stamps
    )
    assert got == exp


def test_row_key_hash_is_xxhash64(spark):
    df = spark.createDataFrame([("a", 1)], "c string, i int")
    r = df.select(
        H.row_key_hash("c", "i").alias("h"), F.xxhash64("c", "i").alias("x")
    ).collect()[0]
    assert r["h"] == r["x"]
