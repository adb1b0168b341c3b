from pyspark.sql import functions as F

from trace_aware_reservoir_otel_spark.synth import LATE_SHIFT_S, generate_transcripts


def test_synth_deterministic(spark):
    a = generate_transcripts(spark, n_convs=200, seed=7).orderBy("conv_id", "turn_idx")
    b = generate_transcripts(spark, n_convs=200, seed=7).orderBy("conv_id", "turn_idx")
    assert a.collect() == b.collect()


def test_synth_shape_and_tags(spark):
    df = generate_transcripts(spark, n_convs=300, seed=42).cache()
    total = df.count()
    assert total > 300

    # mega-conversation holds >= 8% of all rows (skew fixture)
    mega = df.filter(F.col("conv_id") == "conv-00000000").count()
    assert mega / total >= 0.08

    # invalid rows present, NULL-keyed
    inv = df.filter(F.col("conv_id").isNull() | F.col("turn_idx").isNull())
    assert inv.count() >= 2

    # late rows: last turn of tagged convs precedes conversation start
    firsts = df.filter(F.col("turn_idx") == 0).select(
        "conv_id", F.col("ts").alias("t0")
    )
    joined = df.join(firsts, "conv_id")
    late = joined.filter(
        F.unix_timestamp("ts") < F.unix_timestamp("t0") - LATE_SHIFT_S + 60
    )
    assert late.count() >= 1

    # tool-call turns carry the grok-parsable pattern
    tooled = df.filter(F.col("tool").isNotNull())
    assert tooled.count() > 0
    assert tooled.filter(~F.col("text").rlike("<tool_call name=")).count() == 0
    df.unpersist()


def test_synth_seed_changes_output(spark):
    a = generate_transcripts(spark, n_convs=100, seed=1)
    b = generate_transcripts(spark, n_convs=100, seed=2)
    ta = {r["conv_id"] for r in a.select("conv_id").distinct().collect()}
    tb = {r["conv_id"] for r in b.select("conv_id").distinct().collect()}
    # same id universe, different timestamps/sizes
    assert ta == tb
    assert a.orderBy("conv_id", "turn_idx").collect() != b.orderBy(
        "conv_id", "turn_idx"
    ).collect()
