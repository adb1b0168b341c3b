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
