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

Mega-source guard (round-5 verdict #2, IMPLEMENTED here as
``_prefix_prefilter``): a per-source window sort is serial in one task
chain, so a source owning half a 100-TB corpus would make that task the
job. Both selection operators therefore run a cheap exact pre-pass first:
bucket the ordering key coarsely, aggregate the per-(source, bucket)
token/row mass (map-side combined, O(sources x buckets) output), and drop
every bucket whose strictly-better buckets already exhaust the
budget/keep-count — provably unselected rows never reach the window, so
the sort is O(selected + one boundary bucket) instead of O(source).
Bucket granularity keeps ties whole, so the surviving set is a superset
of the selected set and the exact window below is semantically unchanged
(oracle rows identical; asserted by tests/test_mixture.py's skewed
fixtures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from trace_aware_reservoir_otel_spark.functions.hashing import pbig


def _prefix_prefilter(
    base: DataFrame,
    bucket_col: Column,
    mass_col: Column,
    limit_col: "Column | None" = None,
    limit_from_total=None,
    carry_total: "str | None" = None,
) -> DataFrame:
    """Drop rows that provably cannot be in the per-source top prefix.

    ``bucket_col``: coarse ordering bucket (HIGHER bucket = strictly
    earlier in the selection order for every row of a lower bucket).
    ``mass_col``: each row's contribution to the prefix limit (tokens for
    budget mixes, 1 for rank gates). ``limit_col``: the per-source limit.
    A bucket B of source s survives iff the total mass of buckets > B is
    still below s's limit — any row of a dropped bucket has at least that
    mass strictly before it, so the exact window's filter would drop it
    anyway. `limit_col` is a row-level limit expression (max-aggregated —
    exact for per-source-constant budgets, conservative otherwise);
    `limit_from_total` instead derives the limit from the source's TOTAL
    mass (rank gates: K = f(n)). With `carry_total`, the per-source total
    mass is broadcast-joined back under that column name (rank gates need
    the full n after filtering). Cost: one map-side-combined aggregation
    at (source, bucket) grain + a broadcast of O(sources) thresholds."""
    tagged = base.withColumn("_pfb", bucket_col)
    aggs = [F.sum(mass_col).alias("_m")]
    if limit_col is not None:
        aggs.append(F.max(limit_col).alias("_lim"))
    stats = tagged.groupBy("source", "_pfb").agg(*aggs)
    # both windows share the partitionBy(source) exchange; threshold and
    # total fold into ONE per-source frame broadcast once (each extra
    # stage/broadcast here is a fixed per-query job cost)
    wtot = W.partitionBy("source")
    wb = (
        W.partitionBy("source")
        .orderBy(F.col("_pfb").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    s2 = stats.withColumn("_tot", F.sum("_m").over(wtot)).withColumn(
        "_before", F.coalesce(F.sum("_m").over(wb), F.lit(0))
    )
    if limit_from_total is not None:
        s2 = s2.withColumn("_lim", limit_from_total(F.col("_tot")))
    thr = s2.filter(F.col("_before") < F.col("_lim")).groupBy("source").agg(
        F.min("_pfb").alias("_pf_thr"), F.max("_tot").alias("_pf_tot")
    )
    # null-safe join: a NULL source is a legitimate window partition in the
    # exact operators (windows group nulls together), so the threshold
    # lookup must not drop it the way an equi-join would
    thr = thr.withColumnRenamed("source", "_pf_src")
    out = (
        tagged.join(
            F.broadcast(thr), F.col("source").eqNullSafe(F.col("_pf_src"))
        )
        .filter(F.col("_pfb") >= F.col("_pf_thr"))
        .drop("_pfb", "_pf_thr", "_pf_src")
    )
    if carry_total is not None:
        out = out.withColumn(carry_total, F.col("_pf_tot"))
    return out.drop("_pf_tot")


_PRIO_BUCKET_SHIFT = 40  # 52-bit priority -> 4096 coarse buckets
_QUALITY_BUCKET_SHIFT = 6


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
    # mega-source guard: drop priority buckets whose better buckets already
    # exhaust the budget, so the window sorts O(selected) rows, not
    # O(source) — exact (bucket granularity keeps ties whole; see
    # _prefix_prefilter) and a near-no-op when every row is selected.
    # (The stats pre-pass re-evaluates the base projection rather than
    # materializing it: a narrow-base localCheckpoint was measured SLOWER
    # at bench scale, and at 100 TB the extra narrow scan is the cheaper
    # side of the trade too.)
    base = _prefix_prefilter(
        base,
        F.shiftright(F.col("_prio"), _PRIO_BUCKET_SHIFT),
        F.col("n_tokens"),
        limit_col=F.col("_budget"),
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
    # mega-source guard: drop quality buckets whose better buckets already
    # hold >= K rows (K = ceil(n*num/den), derived from the SAME pre-pass
    # totals), so the rank window sorts O(selected) rows instead of
    # O(source). Ranks of surviving rows equal their global ranks (every
    # row ordered before a survivor also survives — bucket granularity),
    # so the output is bit-identical; the per-source n rides along as
    # _n_total, replacing the former count-over-window.
    base = _prefix_prefilter(
        base,
        F.shiftright(F.col("quality"), _QUALITY_BUCKET_SHIFT),
        F.lit(1).cast("long"),
        limit_from_total=lambda tot: F.floor(
            (tot * keep_num + (keep_den - 1)) / keep_den
        ),
        carry_total="_n_total",
    )
    w_rank = W.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    ranked = base.withColumn("q_rank", F.row_number().over(w_rank))
    # ceil(n*num/den) via integer floor-div (exact below 2^53)
    cutoff = F.floor((F.col("_n_total") * keep_num + (keep_den - 1)) / keep_den)
    return ranked.filter(F.col("q_rank") <= cutoff).select(
        "source",
        F.col(id_col).cast("long").alias(id_col),
        "quality",
        F.col("q_rank").cast("long").alias("q_rank"),
        *[F.col(c) for c in carry_cols],
    )
