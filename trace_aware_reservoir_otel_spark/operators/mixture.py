"""Token-budget data mixing — the last step of a training-data pipeline:
given a per-source token budget (the "data mixture" of a training run),
select documents deterministically until each source's budget is filled.

No analog in the reference (its sampling is row-reservoir by trace,
reservoir.go:92-135); this is the corpus-composition step that sits after
dedup/quality/decontamination in an LLM prep pipeline: mixtures are
specified in TOKENS, not documents, so a per-source doc-count reservoir
(see ``contract._q_stratified_doc_sample``) cannot express them.

Semantics: within each source, documents are ordered by a deterministic
portable hash (uniform-random but reproducible and oracle-checkable, same
priority scheme as the flagship reservoir, functions/hashing.pbig); a doc
is selected while the running token total BEFORE it is below the budget —
so the doc that crosses the budget is included (budgets are floors, and a
first doc larger than the whole budget is still taken, guaranteeing
progress for every non-empty source).

Shape at scale: ONE shuffle — the window partitionBy(source) — and the
running sum is a spill-safe sort-based window, never a collect. The fact
table is scanned once with only (id, source, n_tokens-bearing) columns.
With a skewed mega-source, the cumulative window sorts that source on one
task chain; callers can bound it by pre-filtering on priority (budgets
are fixed while the corpus grows, so at 100 TB the selected prefix is a
vanishing fraction — a cheap ``prio >= t`` pre-pass with a conservative
threshold t from a sampled token-rate estimate keeps the sort O(selected)
rather than O(source); the exact window below then runs on survivors
only and semantics are unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from trace_aware_reservoir_otel_spark.functions.hashing import pbig


def token_budget_mix(
    df: DataFrame,
    budget_col: Column,
    tokens_col: Column,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Select docs per source until its token budget fills (see module
    docstring for the inclusion rule). ``budget_col``/``tokens_col`` are
    expressions over ``df``'s row (budgets are usually a literal map or a
    broadcast-joined config; tokens a precomputed column or
    functions.text.n_tokens).

    Returns (source, id, n_tokens, cum_tokens) for selected docs, where
    cum_tokens is the running total INCLUDING the row — the caller can
    read each source's realized mixture straight off max(cum_tokens)."""
    # "mix:" salt decorrelates this ordering from the per-source doc-count
    # reservoir (contract stratified_doc_sample), which hashes the same
    # (source, id) pair — the two samples must not select nested prefixes.
    prio = pbig(
        F.concat_ws(":", F.lit("mix"), F.col(source_col), F.col(id_col).cast("string")),
        seed,
    )
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias(id_col),
        tokens_col.cast("long").alias("n_tokens"),
        budget_col.cast("long").alias("_budget"),
        prio.alias("_prio"),
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.col("_prio").desc(), F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.filter(
        (F.col("cum_tokens") - F.col("n_tokens")) < F.col("_budget")
    ).select(
        "source",
        F.col(id_col).cast("long").alias(id_col),
        "n_tokens",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


def pack_chunks(
    df: DataFrame,
    seq_tokens: int,
    tokens_col: Column,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Sequence packing — the step that turns a selected corpus into
    fixed-token training sequences: within each source, documents are laid
    end-to-end in a deterministic pseudo-random order (pbig priority, same
    scheme as token_budget_mix with a distinct salt) and cut into
    seq_tokens-sized chunks; a document's chunk is the one its FIRST token
    falls in (chunk = floor(tokens-before-it / seq_tokens)), the standard
    concatenate-then-split packing where long docs may straddle a chunk
    boundary.

    Returns (source, id, n_tokens, chunk_id, chunk_off) — chunk_off is the
    doc's start offset within its chunk, so a loader can reconstruct the
    exact packed layout from this assignment alone.

    Shape at scale: identical to token_budget_mix — ONE shuffle (the
    window partitionBy(source)), spill-safe running sum, no collect. The
    all-integer output keeps the oracle exact."""
    prio = pbig(
        F.concat_ws(":", F.lit("pack"), F.col(source_col), F.col(id_col).cast("string")),
        seed,
    )
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias(id_col),
        tokens_col.cast("long").alias("n_tokens"),
        prio.alias("_prio"),
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.col("_prio").desc(), F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        base.withColumn("_before", before)
        .select(
            "source",
            F.col(id_col).cast("long").alias(id_col),
            "n_tokens",
            F.floor(F.col("_before") / seq_tokens).cast("long").alias("chunk_id"),
            (F.col("_before") % seq_tokens).cast("long").alias("chunk_off"),
        )
    )
