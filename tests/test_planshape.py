"""Physical-plan regression guards: the properties that make the engine
scale are plan shapes, not outputs — assert them so a refactor that
silently reintroduces a fact-side shuffle or a cartesian product fails CI,
not a 100-TB run."""

import io
import re
from contextlib import redirect_stdout

import pytest

from trace_aware_reservoir_otel_spark.config import PipelineConfig
from trace_aware_reservoir_otel_spark.plans.pipeline import build_routed
from trace_aware_reservoir_otel_spark.synth import generate_transcripts


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def flagship_plan(spark):
    tr = generate_transcripts(spark, n_convs=500, seed=42)
    cfg = PipelineConfig(
        size_k=16, window_duration_s=60, seed=42, buffer_max_convs=50
    )
    routed, _ = build_routed(tr, cfg)
    return _plan_of(routed)


def test_no_sort_merge_join_or_cartesian(flagship_plan):
    # every join in the routed plan must be a broadcast of a conv-level set
    assert "SortMergeJoin" not in flagship_plan
    assert "Cartesian" not in flagship_plan
    assert "BroadcastHashJoin" in flagship_plan


def test_no_fact_side_hash_exchange(flagship_plan):
    # shuffle exchanges are allowed only above the (window, conv) unit
    # aggregation — i.e. every hashpartitioning key set must include
    # conv-level grouping keys, never raw per-turn columns like turn_idx
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", flagship_plan):
        keys = m.group(1)
        assert "turn_idx" not in keys, f"fact-side shuffle: {keys}"


def test_similarity_near_pairs_plan_is_bucketed(spark):
    from pyspark.sql import functions as F

    from trace_aware_reservoir_otel_spark.operators.similarity import (
        embedding_near_pairs,
    )

    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(8)]).cast("array<float>").alias(
            "embedding"
        ),
    )
    plan = _plan_of(embedding_near_pairs(emb, threshold=0.9))
    assert "Cartesian" not in plan  # bucket equi-join, never all-pairs


def test_unit_branch_prunes_text_column(spark, tmp_path):
    """The unit-aggregation branch must scan only the narrow key columns —
    a plan whose every scan reads `text` ships the whole corpus through
    the aggregation at 100 TB."""
    from pyspark.sql import functions as F

    df = generate_transcripts(spark, n_convs=300, seed=3)
    path = str(tmp_path / "tr")
    df.write.mode("overwrite").parquet(path)
    tr = spark.read.parquet(path)
    cfg = PipelineConfig(size_k=8, window_duration_s=60, seed=42)
    routed, _ = build_routed(tr, cfg)
    plan = _plan_of(routed)
    schemas = [
        line.split("ReadSchema:", 1)[1]
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]
    assert schemas, "expected parquet scans in the plan"
    narrow = [s for s in schemas if "text" not in s]
    wide = [s for s in schemas if "text" in s]
    assert narrow, f"no pruned scan found: {schemas}"
    assert wide, "the routed output scan must still carry text"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join: two tables bucketed on the join key must join with
    ZERO shuffle exchanges — the write-once/join-many layout for repeated
    fact-fact joins at scale."""
    from pyspark.sql import functions as F

    from trace_aware_reservoir_otel_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    df = generate_transcripts(spark, n_convs=300, seed=5).filter(
        F.col("conv_id").isNotNull()
    )
    units = df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    write_bucketed(df.select("conv_id", "turn_idx", "ts"), "b_turns", ["conv_id"], 8)
    write_bucketed(units, "b_units", ["conv_id"], 8)
    try:
        joined = read_bucketed(spark, "b_turns").join(
            read_bucketed(spark, "b_units").hint("merge"), on="conv_id"
        )
        plan = _plan_of(joined)
        shuffle_exchanges = [
            l for l in plan.splitlines()
            if "Exchange hashpartitioning" in l
        ]
        assert not shuffle_exchanges, shuffle_exchanges
        assert joined.count() == df.count()
    finally:
        spark.sql("drop table if exists b_turns")
        spark.sql("drop table if exists b_units")


def test_ivf_assign_plan_has_no_join_or_exchange(spark):
    """ivf_assign must be a single projection (literal-fold argmax): a
    join/explode/groupBy shape would materialize rows x n_centroids
    intermediates through the aggregation machinery at scale."""
    from pyspark.sql import functions as F

    from trace_aware_reservoir_otel_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(8)]).cast("array<float>").alias(
            "embedding"
        ),
    )
    plan = _plan_of(ivf_assign(emb, ivf_centroids(emb, n_centroids=4, seed=42)))
    for node in ("Join", "Cartesian", "Generate", "Expand", "Exchange", "Aggregate"):
        assert node not in plan, f"{node} in ivf_assign plan:\n{plan}"


def test_parquet_dims_join_stays_broadcast(spark, tmp_path):
    """Dimension tables loaded from parquet files (the production lookup
    layout) must still enrich via BroadcastHashJoin — never a fact-side
    shuffle or SortMergeJoin."""
    from trace_aware_reservoir_otel_spark.operators.enrich import (
        enrich,
        load_dims,
        write_dims,
    )

    write_dims(spark, str(tmp_path / "dims"))
    dim_role, dim_tool = load_dims(spark, str(tmp_path / "dims"))
    tr = generate_transcripts(spark, n_convs=300, seed=11)
    plan = _plan_of(enrich(tr, dim_role, dim_tool))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan

    # end-to-end: file dims drive the full pipeline identically
    cfg = PipelineConfig(size_k=8, window_duration_s=60, seed=42)
    routed, _ = build_routed(tr, cfg, dim_role=dim_role, dim_tool=dim_tool)
    assert "SortMergeJoin" not in _plan_of(routed)


def test_corpus_prep_dedup_has_no_join(spark):
    """corpus_prep's survivor selection must stay a single window over the
    content hash — a refactor that reintroduces a survivor-table join
    (broadcast of O(corpus) rows) would not survive 100 TB."""
    from trace_aware_reservoir_otel_spark.contract import _q_corpus_prep

    plan = _plan_of(_q_corpus_prep(spark, "/root/testdata/sf0.001"))
    assert "Join" not in plan, plan
    assert "WindowExec" in plan or "Window" in plan


def test_decontaminate_bench_join_stays_broadcast(spark):
    """The benchmark gram set is fixed-size (eval suites don't grow with
    the corpus): its join against the exploded train grams must be a
    BroadcastHashJoin — a sort-merge join here would shuffle the full
    corpus-gram stream at 100 TB."""
    from trace_aware_reservoir_otel_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(i, f"doc {i} alpha beta gamma delta epsilon zeta") for i in range(50)],
        "doc_id long, text string",
    )
    plan = _plan_of(decontaminate(train, bench, n=5))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # groupBy(doc_id) count aggregation must have a map-side partial pass
    assert "partial_count" in plan or "HashAggregate" in plan


def test_repetition_features_single_scan_no_join(spark):
    """repetition_features covers every n in ONE pass: exactly one
    explode of the input (no per-n re-read), hash aggregation (map-side
    partial pass collapses duplicate grams before the shuffle), and NO
    join of any kind — the gn=0 sentinel row replaces the doc-id
    re-join a naive zeros-fill would need (both sides O(docs))."""
    from trace_aware_reservoir_otel_spark.functions.text import repetition_features

    docs = spark.createDataFrame(
        [(i, "a b c a b c a b") for i in range(20)], "doc_id long, text string"
    )
    plan = _plan_of(repetition_features(docs))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "HashAggregate" in plan
    assert len(re.findall(r"Generate \(\d+\)", plan)) == 1, (
        "n-gram explode must appear exactly once in the plan tree"
    )


def test_corpus_prep_full_gates_are_broadcast_anti_joins(spark, sf_dir):
    """corpus_prep_full's repetition + contamination gates anti-join the
    corpus against SMALL flagged-id sets: both must be broadcast (the
    dedup_survivors pattern) — the corpus itself shuffles exactly once,
    for the content-hash survivor window."""
    from trace_aware_reservoir_otel_spark.contract_quality import (
        q_corpus_prep_full,
    )

    plan = _plan_of(q_corpus_prep_full(spark, sf_dir))
    assert "CartesianProduct" not in plan
    n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
    assert n_bhj >= 2, f"expected >=2 broadcast anti-joins, plan has {n_bhj}"
    # the only sort-merge allowed would be none at all: flagged-id sets ride
    # broadcast, survivor selection is a window (Sort+Exchange, not a join)
    assert "SortMergeJoin" not in plan


def test_training_mix_pipeline_two_downstream_exchanges_no_smj(spark, sf_dir):
    """The capstone composition's final-stage plan: the checkpointed
    clean-corpus subtree leaves AT MOST the two per-source window
    exchanges (mix, pack) downstream — zero when the checkpoint's
    preserved source partitioning satisfies them outright — with zero
    sort-merge joins. Without the checkpoint the same plan carried 19
    exchanges (the gate+decontamination subtree re-ran per consumer)."""
    from trace_aware_reservoir_otel_spark.contract_quality import (
        q_training_mix_pipeline,
    )

    plan = _plan_of(q_training_mix_pipeline(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex <= 2, f"expected <=2 window exchanges, plan has {n_ex}:\n{plan}"


def test_incremental_dedup_probe_shape(spark, tmp_path):
    """The index probe must be a LEFT SEMI join (existence only — no pair
    fan-out) and the final survivor drop a broadcast anti-join; the batch
    never sort-merge joins the index."""
    from trace_aware_reservoir_otel_spark.operators.dedup import (
        incremental_dedup_survivors,
        minhash_index,
    )

    hist = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} q{i}") for i in range(20)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mhidx")
    minhash_index(hist, idx, num_hashes=8, n=3, bands=4, seed=7)
    batch = spark.createDataFrame(
        [(100 + i, f"a{i} b{i} c{i} d{i} e{i}") for i in range(10)],
        "doc_id long, text string",
    )
    plan = _plan_of(incremental_dedup_survivors(batch, idx))
    assert "LeftSemi" in plan, plan
    assert re.search(r"BroadcastHashJoin.*LeftAnti", plan), plan
