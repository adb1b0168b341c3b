"""Text analysis functions for training-data pipelines (SURVEY §2 training
ops): language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure Column expressions (JVM codegen — no Python in
the hot path); the contract SQL versions in contract.py compute the same
values (kept aligned by tests/test_contract.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from trace_aware_reservoir_otel_spark.functions.hashing import pbig

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# BPE-ish token approximation: word pieces, numbers, or single
# non-space symbols — the standard cheap proxy for tokenizer counts.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def n_tokens(text: "Column | str") -> Column:
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    return (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )


def n_tokens_bpe_ish(text: "Column | str") -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_RE), 0)).cast("long")


def stopword_hits(text: "Column | str", stopwords=EN_STOPWORDS) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    pat = r"\b(" + "|".join(stopwords) + r")\b"
    return F.regexp_count(F.concat(F.lit(" "), t, F.lit(" ")), F.lit(pat)).cast("long")


def lang_pred(text: "Column | str") -> Column:
    """'en_like' when stopword density clears the threshold (the contract
    query's integer-arithmetic rule: hits * 12 >= tokens)."""
    return F.when(
        stopword_hits(text) * 12 >= n_tokens(text), F.lit("en_like")
    ).otherwise(F.lit("other"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-density quality signals."""
    t = F.col(text_col)
    nt = n_tokens(t)
    punct = F.regexp_count(t, F.lit(r"[^\w\s]")).cast("long")
    return (
        df.withColumn("n_chars_m", F.length(t).cast("long"))
        .withColumn("n_tokens", nt)
        .withColumn("n_tokens_bpe_ish", n_tokens_bpe_ish(t))
        .withColumn("sw_hits", stopword_hits(t))
        .withColumn("n_punct", punct)
        .withColumn(
            "avg_token_len_x100",
            F.when(nt == 0, F.lit(0)).otherwise(
                F.round(
                    100.0 * F.length(F.replace(t, F.lit(" "), F.lit(""))) / nt
                )
            ).cast("long"),
        )
        .withColumn("lang_pred", lang_pred(t))
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", gram: int = 8, seed: int = 42
) -> DataFrame:
    """Rolling-hash fingerprint: min over all `gram`-char substrings of the
    portable 52-bit hash (winnowing-lite; equal for equal content)."""
    t = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (gram - 1), F.lit(1))),
        lambda i: F.substring(t, i, gram),
    )
    hashes = F.transform(grams, lambda g: pbig(g, seed))
    return df.select(
        F.col(id_col), F.array_min(hashes).alias("fingerprint")
    )


# --- PII redaction (training-data scrubbing) ----------------------------------

# RE2-safe patterns (no backrefs / lookaround), so Spark's Java regex and
# the DuckDB oracle's RE2 agree match-for-match
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# whitespace spelled explicitly ([ \t]) rather than \s: Java's \s includes
# vertical tab (\x0B) while RE2's does not, and both engines must match
# identically for the oracle to agree
PHONE_RE = r"\+?[0-9][0-9()\- \t]{7,}[0-9]"

# replacement order matters: the earlier replacements' tokens contain no
# digits, so they cannot create or destroy later matches
PII_RULES = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def redact_pii(text: "Column | str") -> Column:
    """Replace emails / IPv4s / phone-shaped runs with typed placeholder
    tokens — the standard scrub step before corpus text reaches a training
    set. Pure JVM regexp_replace chain: whole-stage codegen, no UDF."""
    out = F.col(text) if isinstance(text, str) else text
    for _, pattern, token in PII_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row counts of each PII kind (pre-redaction) — the audit metric
    that accompanies a scrub pass."""
    out = df
    for kind, pattern, _ in PII_RULES:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pattern)).cast("long")
        )
    return out


# --- repetition / boilerplate quality (Gopher-style rules) --------------------

# Count-fraction analogs of the Gopher repetition thresholds (the published
# rules use character fractions; counts keep the whole computation in exact
# integer arithmetic so the DuckDB oracle agrees bit-for-bit):
#   top 2-gram fraction  > 0.20  ->  top_2gram_count * 100 > 20 * n_2grams
#   dup 3-gram fraction  > 0.18  ->  (n_3grams - distinct_3grams) * 100
#                                        > 18 * n_3grams
REP_TOP_BIGRAM_PCT = 20
REP_DUP_TRIGRAM_PCT = 18


def _ngram_arr(toks: Column, n: int) -> Column:
    """All word n-grams (with multiplicity — unlike dedup's shingles,
    repetition stats NEED duplicate grams); empty array below n tokens."""
    count = F.size(toks) - (n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    grams: "tuple[int, ...]" = (2, 3),
) -> DataFrame:
    """Per-document repetition statistics for corpus quality filtering —
    the Gopher-style "repetitious document" rules over word n-grams:
    total / distinct / top-frequency counts per n, plus a `repetitive`
    0/1 flag from the integer thresholds above.

    Shape at scale: ONE tagged explode covers every n in `grams` in a
    single pass over the text (no per-n re-scan), then a cascade of
    aggregations — (id, n, gram) -> (id, n) -> id — each with map-side
    partial aggregation, so the post-shuffle volume collapses to
    O(distinct grams), then O(docs * len(grams)), then O(docs). NO join
    anywhere: docs too short for any n-gram survive via a sentinel row
    (gn=0) emitted in the same explode — a doc-id join here would be a
    sort-merge of two O(docs) sides at 100 TB, strictly worse than one
    extra exploded row per doc."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    # NB: a one-parameter lambda, built by a closure helper — a default-arg
    # capture (`lambda g, n=n:`) reads as two-parameter to F.transform,
    # which then passes the ARRAY INDEX as the second argument.
    def _tag(n: int):
        return lambda g: F.struct(F.lit(n).alias("gn"), g.alias("g"))

    # gn=0 sentinel: guarantees one exploded row per doc, so zero-gram docs
    # flow through the aggregation cascade instead of needing a join back
    tagged = F.concat(
        F.array(F.struct(F.lit(0).alias("gn"), F.lit("").alias("g"))),
        *[F.transform(_ngram_arr(toks, n), _tag(n)) for n in grams],
    )
    ex = df.select(F.col(id_col), F.explode(tagged).alias("s")).select(
        id_col, "s.gn", "s.g"
    )
    cnt = ex.groupBy(id_col, "gn", "g").agg(F.count("*").alias("c"))
    stats = cnt.groupBy(id_col, "gn").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_count"),
    )
    cols = []
    for n in grams:
        for src, out in (
            ("n_grams", f"n_{n}grams"),
            ("n_distinct", f"distinct_{n}grams"),
            ("top_count", f"top_{n}gram_count"),
        ):
            cols.append(
                F.coalesce(
                    F.max(F.when(F.col("gn") == n, F.col(src))), F.lit(0)
                ).cast("long").alias(out)
            )
    out = stats.groupBy(id_col).agg(*cols)
    if not {2, 3} <= set(grams):
        return out  # the flag is defined on 2/3-gram stats only
    rep = (
        F.col("top_2gram_count") * 100 > REP_TOP_BIGRAM_PCT * F.col("n_2grams")
    ) | (
        (F.col("n_3grams") - F.col("distinct_3grams")) * 100
        > REP_DUP_TRIGRAM_PCT * F.col("n_3grams")
    )
    return out.withColumn("repetitive", rep.cast("long"))
