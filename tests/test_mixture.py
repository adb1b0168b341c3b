"""token_budget_mix: budget-crossing inclusion rule, progress guarantee,
zero-budget edge, and determinism."""

from pyspark.sql import functions as F

from trace_aware_reservoir_otel_spark.operators.mixture import token_budget_mix


def _mix(spark, rows, budgets):
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budget = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(b)) for s, b in budgets.items()]
    )
    return token_budget_mix(
        df,
        budget_col=budget,
        tokens_col=F.size(F.split(F.trim("text"), r"\s+")),
    )


def test_budget_crossing_doc_is_included(spark):
    # source s: five 4-token docs, budget 10 -> cum_before 0,4,8 select;
    # the doc at cum_before=8 CROSSES the budget and is included.
    rows = [(i, "s", "w w w w") for i in range(5)]
    out = _mix(spark, rows, {"s": 10}).collect()
    assert len(out) == 3
    assert max(r["cum_tokens"] for r in out) == 12


def test_first_doc_larger_than_budget_still_selected(spark):
    rows = [(0, "t", " ".join(["w"] * 50))]
    out = _mix(spark, rows, {"t": 10}).collect()
    assert [(r["doc_id"], r["n_tokens"], r["cum_tokens"]) for r in out] == [(0, 50, 50)]


def test_zero_budget_selects_nothing(spark):
    rows = [(i, "u", "w w") for i in range(3)]
    assert _mix(spark, rows, {"u": 0}).count() == 0


def test_mixture_is_deterministic_and_per_source(spark):
    rows = [(i, f"s{i % 3}", "w w w") for i in range(30)]
    budgets = {"s0": 9, "s1": 15, "s2": 3}
    a = sorted(map(tuple, _mix(spark, rows, budgets).collect()))
    b = sorted(map(tuple, _mix(spark, rows, budgets).collect()))
    assert a == b
    per = {}
    for src, _doc, _nt, cum in a:
        per[src] = max(per.get(src, 0), cum)
    # every 3-token doc: budgets 9/15/3 -> last-selected cum = 9/15/3
    assert per == {"s0": 9, "s1": 15, "s2": 3}


# --- split_long_docs ---------------------------------------------------------

from trace_aware_reservoir_otel_spark.operators.mixture import split_long_docs


def _split(spark, token_counts, seq, stride=None):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return split_long_docs(
        df,
        seq_tokens=seq,
        tokens_col=F.size(F.split(F.trim("text"), r"\s+")),
        stride=stride,
    )


def test_split_covers_every_token_with_overlap(spark):
    # n=11, seq=4, stride=3 -> 1 + ceil(7/3) = 4 pieces at 0,3,6,9;
    # the last is the short tail (tokens 9..10)
    out = sorted(
        _split(spark, [11], 4, 3).collect(), key=lambda r: r.piece_idx
    )
    assert [(r.tok_start, r.tok_len) for r in out] == [
        (0, 4),
        (3, 4),
        (6, 4),
        (9, 2),
    ]
    # union of [start, start+len) covers 0..10 exactly
    covered = set()
    for r in out:
        covered.update(range(r.tok_start, r.tok_start + r.tok_len))
    assert covered == set(range(11))
    # n=10 lands exactly on the last full window: ceil(6/3)=2 -> 3 pieces,
    # full coverage with no redundant tail piece
    out10 = sorted(
        (r.tok_start, r.tok_len) for r in _split(spark, [10], 4, 3).collect()
    )
    assert out10 == [(0, 4), (3, 4), (6, 4)]


def test_split_short_doc_single_piece_and_empty_doc_dropped(spark):
    rows = [(1, "a b c"), (2, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_long_docs(
        df,
        seq_tokens=8,
        tokens_col=F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
            F.size(F.split(F.trim("text"), r"\s+"))
        ),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.piece_idx, r.tok_start, r.tok_len) == (1, 0, 0, 3)


def test_split_exact_multiple_no_empty_tail(spark):
    # n=12, seq=4, stride=4 -> exactly 3 disjoint pieces, no 0-length tail
    out = _split(spark, [12], 4).collect()
    assert sorted((r.tok_start, r.tok_len) for r in out) == [
        (0, 4),
        (4, 4),
        (8, 4),
    ]


def test_split_rejects_bad_stride(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _split(spark, [10], 4, 5)
    with _pytest.raises(ValueError):
        _split(spark, [10], 4, 0)


def test_split_plan_has_zero_shuffles(spark):
    plan = (
        _split(spark, [10, 300, 7], 64, 48)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# --- top_quality_per_source --------------------------------------------------

from trace_aware_reservoir_otel_spark.operators.mixture import (
    top_quality_per_source,
)


def test_top_quality_keeps_ceil_fraction_best_ties_to_smallest_id(spark):
    # source s: qualities 5,4,4,2,1 over ids 1..5 -> keep ceil(5*2/5)=2:
    # q=5 (id 1) and the q=4 TIE breaks to id 2.
    rows = [
        (1, "s", 5),
        (2, "s", 4),
        (3, "s", 4),
        (4, "s", 2),
        (5, "s", 1),
        (6, "t", 7),  # singleton source: ceil(1*2/5)=1 -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, q long")
    out = top_quality_per_source(df, F.col("q"), keep_num=2, keep_den=5)
    got = sorted((r.source, r.doc_id, r.q_rank) for r in out.collect())
    assert got == [("s", 1, 1), ("s", 2, 2), ("t", 6, 1)]


def test_top_quality_rank_window_input_is_prefiltered(spark):
    """Mega-source guard (round-5 verdict #2): on a skewed fixture the
    rank window's input is O(selected), not O(source) — asserted directly
    on the pre-filter helper — and the end-to-end output is identical to
    the unfiltered semantics."""
    from trace_aware_reservoir_otel_spark.operators.mixture import (
        _QUALITY_BUCKET_SHIFT,
        _prefix_prefilter,
    )

    # one mega-source: 9000 rows with distinct qualities, keep top 1/10
    rows = [(i, "mega", i) for i in range(9000)] + [
        (10_000 + i, "tiny", i % 7) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, q long")
    base = df.select(
        "source", "doc_id", F.col("q").cast("long").alias("quality")
    )
    filtered = _prefix_prefilter(
        base,
        F.shiftright(F.col("quality"), _QUALITY_BUCKET_SHIFT),
        F.lit(1).cast("long"),
        limit_from_total=lambda tot: F.floor((tot * 1 + 9) / 10),
        carry_total="_n_total",
    )
    per_src = {
        r["source"]: r["n"]
        for r in filtered.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # mega keeps ceil(9000/10)=900 selected; the filter passes at most one
    # extra boundary bucket (64 qualities) — O(selected), not 9000
    assert per_src["mega"] <= 900 + (1 << _QUALITY_BUCKET_SHIFT)
    assert per_src["tiny"] == 10  # under-limit source untouched

    out = sorted(
        (r.source, r.doc_id, r.quality, r.q_rank)
        for r in top_quality_per_source(df, F.col("q"), 1, 10).collect()
    )
    # brute-force expected: per source, top ceil(n/10) by (q desc, id asc)
    expected = []
    for src, n in (("mega", 9000), ("tiny", 10)):
        items = sorted(
            ((q, i) for i, s, q in rows if s == src),
            key=lambda t: (-t[0], t[1]),
        )
        k = -(-n // 10)
        expected += [
            (src, i, q, rk + 1) for rk, (q, i) in enumerate(items[:k])
        ]
    assert out == sorted(expected)


def test_null_source_rows_survive_the_prefilter(spark):
    """A NULL source is a legitimate window partition (windows group nulls
    together); the prefilter's threshold join must be null-safe or those
    rows silently vanish."""
    rows = [(1, None, 5), (2, None, 4), (3, "s", 7)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q long")
    got = {
        (r.source, r.doc_id, r.q_rank)
        for r in top_quality_per_source(df, F.col("q"), 1, 2).collect()
    }
    # null source: 2 rows -> keep ceil(2/2)=1 (q=5, id 1); source s: 1 row
    assert got == {(None, 1, 1), ("s", 3, 1)}

    mix = token_budget_mix(
        spark.createDataFrame(
            [(1, None, "w w w"), (2, "s", "w w")],
            "doc_id long, source string, text string",
        ),
        budget_col=F.lit(100),
        tokens_col=F.size(F.split(F.trim("text"), r"\s+")),
    )
    assert {(r.source, r.doc_id) for r in mix.collect()} == {
        (None, 1),
        ("s", 2),
    }


def test_token_budget_mix_window_input_is_prefiltered(spark):
    """Same guard for the budget mix: provably-unselected priority buckets
    never reach the running-sum window, and the selection is unchanged."""
    from trace_aware_reservoir_otel_spark.functions.hashing import pbig
    from trace_aware_reservoir_otel_spark.operators.mixture import (
        _PRIO_BUCKET_SHIFT,
        _prefix_prefilter,
    )

    rows = [(i, "mega", "w w w w") for i in range(8000)] + [
        (100_000 + i, "tiny", "w w") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budgets = {"mega": 100, "tiny": 1000}
    out = _mix(spark, rows, budgets)
    got = sorted(map(tuple, out.collect()))
    # budget 100 over 4-token docs -> exactly 25 mega selections; tiny all
    assert sum(1 for r in got if r[0] == "mega") == 25
    assert sum(1 for r in got if r[0] == "tiny") == 5
    # determinism + inclusion rule unchanged vs a second evaluation
    assert got == sorted(map(tuple, _mix(spark, rows, budgets).collect()))

    prio = pbig(
        F.concat_ws(":", F.lit("mix"), F.col("source"), F.col("doc_id").cast("string")),
        42,
    )
    base = df.select(
        "source",
        "doc_id",
        F.lit(4).cast("long").alias("n_tokens"),
        F.when(F.col("source") == "mega", F.lit(100))
        .otherwise(F.lit(1000))
        .cast("long")
        .alias("_budget"),
        prio.alias("_prio"),
    )
    filtered = _prefix_prefilter(
        base,
        F.shiftright(F.col("_prio"), _PRIO_BUCKET_SHIFT),
        F.col("n_tokens"),
        limit_col=F.col("_budget"),
    )
    n_mega = filtered.filter(F.col("source") == "mega").count()
    # 25 selected out of 8000; the filter passes the selected prefix plus
    # at most the boundary bucket's expected handful (8000/4096 ≈ 2 docs
    # per bucket) — assert well under the full source
    assert n_mega < 400, n_mega
