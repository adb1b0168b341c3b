"""Language-model-driven data selection: corpus unigram statistics
(CCNet-style perplexity-proxy quality signal) and DSIR hashed n-gram
importance scoring (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling").

No analog in the reference (its selection is trace-reservoir sampling,
reservoir.go:92-135); these are the corpus-level selection signals an LLM
prep pipeline computes between dedup and mixing.

Design note on oracle exactness: each operator has an INTEGER-exact form
(counts, dot products — what the contract queries check bit-for-bit
against DuckDB) and a real-valued form (mean -ln p, log-likelihood-ratio
weights) for runtime ranking. The split exists because summed libm logs
are not bit-portable across engines; the integer form carries the same
ordering information for thresholding, and the float form is unit-tested
against numpy instead of the SQL oracle.

Shape at 100 TB (both families):
- token/feature strings are hashed to 64 bits / bucket ids BEFORE any
  shuffle — raw text never crosses an exchange;
- per-doc partial counts use groupBy with map-side combine, so exploded
  token rows collapse executor-side;
- corpus-wide totals come from a window sum over the hash key (unigram
  stats) or a FIXED-width bucket table (DSIR: n_buckets rows regardless
  of corpus size — always broadcastable), never a self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from trace_aware_reservoir_otel_spark.functions.hashing import pbig
from trace_aware_reservoir_otel_spark.operators.dedup import (
    _hash64,
    scale_out,
    tokens_col,
)


def _doc_token_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    portable: bool,
    seed: int,
) -> DataFrame:
    """(id_col, h, c): per-doc counts of 64-bit-hashed tokens. One explode
    + one map-side-combined groupBy; explode_outer + isNotNull so the
    size()>0 filter cannot be pushed below scale_out's exchange (the
    dup_span_stats lesson)."""
    per = (
        scale_out(df)
        .select(F.col(id_col), F.explode_outer(tokens_col(text_col)).alias("tok"))
        .filter(F.col("tok").isNotNull())
        .select(id_col, _hash64(F.col("tok"), "unigram", portable, seed).alias("h"))
    )
    return per.groupBy("h", id_col).agg(F.count(F.lit(1)).alias("c"))


def doc_unigram_stats(
    df: DataFrame,
    rare_max: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Per-document corpus-frequency (rarity) stats — the integer-exact
    perplexity proxy: a document of corpus-rare tokens is exactly the
    document a unigram LM assigns high perplexity.

    Returns (id_col, n_tokens, sum_tok_freq, n_rare_tokens, min_tok_freq):
    - sum_tok_freq: sum over token POSITIONS of that token's corpus-wide
      occurrence count (so sum_tok_freq / n_tokens is the mean corpus
      frequency the float path takes -ln of);
    - n_rare_tokens: positions whose token occurs <= rare_max times
      corpus-wide;
    - min_tok_freq: the rarest token's corpus count.
    Docs with zero tokens emit no row.

    Shape: groupBy(h, doc) map-side combine -> window sum over h for the
    corpus total (no self-join) -> groupBy(doc). Three shuffles, all at
    hash/id grain."""
    perdoc = _doc_token_counts(df, text_col, id_col, portable, seed)
    tot = perdoc.withColumn("tot", F.sum("c").over(W.partitionBy("h")))
    return tot.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * F.col("tot")).cast("long").alias("sum_tok_freq"),
        F.sum(F.when(F.col("tot") <= rare_max, F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_rare_tokens"),
        F.min("tot").cast("long").alias("min_tok_freq"),
    )


def doc_unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    MLE unigram model — the runtime ranking form of doc_unigram_stats
    (float; ordering-tested vs numpy, not oracle-hashed; see module
    docstring). Returns (id_col, n_tokens, mean_neg_logp)."""
    perdoc = _doc_token_counts(df, text_col, id_col, portable=False, seed=seed)
    tot = perdoc.withColumn("tot", F.sum("c").over(W.partitionBy("h")))
    # corpus token total: a window over the empty frame would repartition
    # to 1; aggregate the per-doc counts and cross-join the single row in
    # (broadcast, 1 row — not a driver collect).
    n_total = perdoc.agg(F.sum("c").cast("double").alias("_n")).select("_n")
    return (
        tot.crossJoin(F.broadcast(n_total))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            (
                F.sum(F.col("c") * -F.log(F.col("tot") / F.col("_n")))
                / F.sum("c")
            ).alias("mean_neg_logp"),
        )
    )


# --- DSIR: hashed n-gram importance scoring ---------------------------------


def hashed_ngram_features(
    df: DataFrame,
    n: int = 2,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
    seed: int = 42,
) -> DataFrame:
    """(id_col, bucket, c): per-doc counts of word n-grams hashed into
    n_buckets — DSIR's feature map (unigrams+bigrams hashed to 10k buckets
    in the paper; n-gram size and width are knobs here). Positional (no
    dedup): feature vectors are counts, as in the paper.

    pmod(hash, B) keeps buckets non-negative in both engines (Spark's %
    takes the dividend's sign; DuckDB's % likewise — pmod sidesteps both)."""
    toks = tokens_col(text_col)
    n_grams = F.size(toks) - (n - 1)
    grams = F.when(n_grams <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    per = (
        scale_out(df)
        .select(F.col(id_col), F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(
            id_col,
            F.pmod(
                _hash64(F.col("g"), f"dsir{n}", portable, seed), F.lit(n_buckets)
            ).alias("bucket"),
        )
    )
    return per.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("c"))


def _bucket_table(tfeat: DataFrame, rfeat: DataFrame) -> DataFrame:
    """(bucket, t, r): corpus-wide target/raw counts per hashed bucket —
    at most n_buckets rows whatever the corpus size, hence always
    broadcastable. Assembled join-free (tagged union + one groupBy): a
    full-outer join here would force a sort-merge join, since Spark
    cannot broadcast full-outer sides."""
    parts = tfeat.select(
        "bucket", F.col("c").alias("t"), F.lit(0).alias("r")
    ).unionByName(rfeat.select("bucket", F.lit(0).alias("t"), F.col("c").alias("r")))
    return parts.groupBy("bucket").agg(
        F.sum("t").cast("long").alias("t"), F.sum("r").cast("long").alias("r")
    )


def dsir_feature_scores(
    train: DataFrame,
    target: DataFrame,
    n: int = 2,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Integer-exact DSIR scores: per train doc, the dot products of its
    hashed-feature count vector with the target and raw bucket-count
    vectors, cross-normalized to a common denominator so they compare as
    integers:

        target_mass = sum_b c_doc[b] * target[b] * raw_total
        raw_mass    = sum_b c_doc[b] * raw[b]    * target_total
        target_like = (target_mass > raw_mass)

    target_like is exactly "the doc's features sit in buckets where the
    target's (normalized) mass exceeds the raw corpus's" — the linear
    integer analog of the paper's log-ratio sign. The float log-ratio
    itself (resampling weights) is dsir_logratio_weights.

    Shape: the two bucket tables are <= n_buckets rows — broadcast joins;
    the train corpus is touched by exactly one explode + one groupBy
    (inside hashed_ngram_features) + one broadcast join + one groupBy(id).
    Buckets empty on either side contribute 0 to that side's mass (the
    float path smooths instead)."""
    tfeat = hashed_ngram_features(
        target, n, n_buckets, text_col, id_col, portable, seed
    )
    rfeat = hashed_ngram_features(
        train, n, n_buckets, text_col, id_col, portable, seed
    )
    bt = _bucket_table(tfeat, rfeat)
    # totals as a 1-row broadcastable aggregate (never a driver collect)
    tots = bt.agg(F.sum("t").alias("_ttot"), F.sum("r").alias("_rtot"))
    buckets = bt.crossJoin(F.broadcast(tots))
    scored = rfeat.join(F.broadcast(buckets), "bucket", "left")
    return scored.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_features"),
        F.sum(F.col("c") * F.col("t") * F.col("_rtot"))
        .cast("long")
        .alias("target_mass"),
        F.sum(F.col("c") * F.col("r") * F.col("_ttot"))
        .cast("long")
        .alias("raw_mass"),
        (
            F.sum(F.col("c") * F.col("t") * F.col("_rtot"))
            > F.sum(F.col("c") * F.col("r") * F.col("_ttot"))
        )
        .cast("long")
        .alias("target_like"),
    )


def dsir_logratio_weights(
    train: DataFrame,
    target: DataFrame,
    n: int = 2,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """The paper's importance weights: log w(doc) = sum_b c_doc[b] *
    (ln p_target[b] - ln p_raw[b]) with add-alpha smoothing over
    n_buckets. Float (runtime form — see module docstring); sampling
    against these weights is Gumbel top-k, which composes with
    functions.hashing.pbig for determinism. Same plan shape as
    dsir_feature_scores."""
    tfeat = hashed_ngram_features(target, n, n_buckets, text_col, id_col, False, seed)
    rfeat = hashed_ngram_features(train, n, n_buckets, text_col, id_col, False, seed)
    bt = _bucket_table(tfeat, rfeat)
    tots = bt.agg(
        (F.sum("t") + alpha * n_buckets).alias("_ttot"),
        (F.sum("r") + alpha * n_buckets).alias("_rtot"),
    )
    buckets = bt.crossJoin(F.broadcast(tots)).select(
        "bucket",
        (
            F.log((F.col("t") + alpha) / F.col("_ttot"))
            - F.log((F.col("r") + alpha) / F.col("_rtot"))
        ).alias("lr"),
    )
    scored = rfeat.join(F.broadcast(buckets), "bucket", "left")
    return scored.groupBy(id_col).agg(
        F.sum(F.col("c") * F.col("lr")).alias("log_weight")
    )
