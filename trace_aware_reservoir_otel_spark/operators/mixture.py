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


def split_long_docs(
    df: DataFrame,
    seq_tokens: int,
    tokens_col: Column,
    stride: "int | None" = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window split of long documents into training pieces — the
    complement of pack_chunks: where packing concatenates SHORT docs up to
    the context window, splitting cuts LONG docs down to it. Pieces start
    at 0, stride, 2*stride, ...; the number of pieces is
    1 + ceil(max(n_tokens - seq_tokens, 0) / stride), so every token is
    covered, consecutive pieces overlap by seq_tokens - stride, and the
    final piece may be shorter (it ends at the document's end).
    stride defaults to seq_tokens (disjoint pieces). Zero-token docs emit
    no row.

    Returns (id_col, n_tokens, piece_idx, tok_start, tok_len) — all
    integers, so the oracle is exact and a loader can slice its own
    tokenization by (tok_start, tok_len) alone.

    Shape at 100 TB: ZERO shuffles — one projection + one Generate
    (explode of an int sequence, fan-out = pieces per doc, bounded by
    doc length / stride). Catalyst prunes the scan to (id, tokens_col
    inputs); integer ceil via (g + stride - 1) floor-div stride is exact
    in both engines (< 2^53 tokens/doc)."""
    if stride is None:
        stride = seq_tokens
    if not (0 < stride <= seq_tokens):
        raise ValueError(f"stride must be in (0, seq_tokens]; got {stride}")
    n = tokens_col.cast("long")
    extra = F.floor(
        (F.greatest(n - seq_tokens, F.lit(0)) + (stride - 1)) / stride
    ).cast("long")
    base = df.select(F.col(id_col), n.alias("n_tokens"), extra.alias("_k"))
    out = base.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("_k"))).alias(
            "piece_idx"
        ),
    )
    start = F.col("piece_idx") * stride
    return out.select(
        F.col(id_col).cast("long").alias(id_col),
        "n_tokens",
        F.col("piece_idx").cast("long").alias("piece_idx"),
        start.cast("long").alias("tok_start"),
        F.least(F.lit(seq_tokens).cast("long"), F.col("n_tokens") - start)
        .cast("long")
        .alias("tok_len"),
    )


def top_quality_per_source(
    df: DataFrame,
    quality_col: Column,
    keep_num: int,
    keep_den: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    carry_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Per-source quality-percentile selection: within each source keep
    the ceil(n * keep_num / keep_den) highest-quality documents (ties ->
    smallest id) — the "top 30% by quality per domain" gate real corpus
    prep applies between scoring and mixing. The fraction is a RATIONAL
    (keep_num/keep_den) so the cutoff is integer-exact in both engines
    (a float frac*n ceil is off-by-one prone: ceil(0.3*10) can be 4).

    Returns (source, id_col, quality, q_rank [, carry_cols...]) for kept
    docs — `carry_cols` rides payload columns (e.g. text) through the
    gate so pipeline compositions need no join back to the corpus.

    Shape at 100 TB: ONE shuffle — both window functions (rank and
    per-source count) share the partitionBy(source) Exchange; the sort is
    spill-safe. Mega-source note: rank-based selection per source is a
    full per-source sort; when a single source dominates the corpus,
    pre-filter with an approximate quantile cutoff first and rank only
    the survivors (same pattern as token_budget_mix's priority
    pre-filter)."""
    if keep_num < 0 or keep_den <= 0:
        raise ValueError(f"keep fraction must be >=0/'>0'; got {keep_num}/{keep_den}")
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias(id_col),
        quality_col.cast("long").alias("quality"),
        *[F.col(c) for c in carry_cols],
    )
    w_rank = W.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    w_all = W.partitionBy("source")
    ranked = base.withColumn("q_rank", F.row_number().over(w_rank)).withColumn(
        "_n", F.count(F.lit(1)).over(w_all)
    )
    # ceil(n*num/den) via integer floor-div (exact below 2^53)
    cutoff = F.floor((F.col("_n") * keep_num + (keep_den - 1)) / keep_den)
    return ranked.filter(F.col("q_rank") <= cutoff).select(
        "source",
        F.col(id_col).cast("long").alias(id_col),
        "quality",
        F.col("q_rank").cast("long").alias("q_rank"),
        *[F.col(c) for c in carry_cols],
    )
