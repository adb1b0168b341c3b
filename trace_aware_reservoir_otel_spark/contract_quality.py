"""Contract queries for corpus-quality / decontamination operators, with
generated DuckDB oracle SQL.

Two training-data-pipeline operators beyond the dedup family:

- ``repetition_stats``: Gopher-style repetition rules (top-bigram count
  fraction, duplicate-trigram count fraction) via
  ``functions.text.repetition_features`` — the quality gate that drops
  boilerplate/templated documents before training.
- ``benchmark_decontaminate``: train/test-overlap scrub via
  ``operators.dedup.decontaminate`` — flags training docs sharing any
  word n-gram with a held-out benchmark set. The benchmark here is a
  deterministic slice of the documents table (doc_id % 10 == 0); the
  train side additionally carries perturbed copies of the benchmark docs
  (first token replaced, id+2_000_000) so contamination is non-trivial at
  every scale factor — the same fixture pattern as contract_dedup's
  near-dup copies.

All integer arithmetic (counts, 0/1 flags) so the oracle agrees exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from trace_aware_reservoir_otel_spark.functions.text import (
    REP_DUP_TRIGRAM_PCT,
    REP_TOP_BIGRAM_PCT,
)

DECON_N = 5  # word n-gram size for the overlap scrub (13 in prod recipes)


# --- repetition_stats ---------------------------------------------------------

def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trace_aware_reservoir_otel_spark.functions.text import repetition_features
    from trace_aware_reservoir_otel_spark.operators.dedup import scale_out

    docs = scale_out(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return repetition_features(docs, grams=(2, 3))


def _rep_gram_branch(n: int) -> str:
    n1 = n - 1
    return (
        f"select doc_id, {n} as gn, array_to_string(tk[i:i+{n1}], ' ') as g\n"
        "      from toks cross join unnest(range(1, "
        f"greatest(len(tk) - {n1}, 0) + 1)) as t(i)"
    )


def oracle_repetition_stats() -> str:
    wide_cols = ",\n             ".join(
        f"max(case when gn = {n} then {src} end) as {out}"
        for n in (2, 3)
        for src, out in (
            ("n_grams", f"n_{n}grams"),
            ("n_distinct", f"distinct_{n}grams"),
            ("top_count", f"top_{n}gram_count"),
        )
    )
    final_cols = ",\n           ".join(
        f"cast(coalesce({c}, 0) as bigint) as {c}"
        for n in (2, 3)
        for c in (f"n_{n}grams", f"distinct_{n}grams", f"top_{n}gram_count")
    )
    flag = (
        f"(coalesce(top_2gram_count, 0) * 100 > "
        f"{REP_TOP_BIGRAM_PCT} * coalesce(n_2grams, 0))\n"
        "            or ((coalesce(n_3grams, 0) - coalesce(distinct_3grams, 0)) "
        f"* 100 > {REP_DUP_TRIGRAM_PCT} * coalesce(n_3grams, 0))"
    )
    return f"""
    with toks as (
      select doc_id, regexp_split_to_array(trim(text), '\\s+') as tk
      from documents
    ),
    grams as (
      {_rep_gram_branch(2)}
      union all
      {_rep_gram_branch(3)}
    ),
    cnt as (
      select doc_id, gn, g, count(*) as c from grams group by doc_id, gn, g
    ),
    stats as (
      select doc_id, gn, sum(c) as n_grams, count(*) as n_distinct,
             max(c) as top_count
      from cnt group by doc_id, gn
    ),
    wide as (
      select doc_id,
             {wide_cols}
      from stats group by doc_id
    )
    select d.doc_id,
           {final_cols},
           cast(({flag}) as bigint) as repetitive
    from (select doc_id from documents) d
    left join wide using (doc_id)
    """


# --- benchmark_decontaminate --------------------------------------------------

def _bench_train(spark: SparkSession, sf_dir: str) -> "tuple[DataFrame, DataFrame]":
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    leaked = bench.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+", "xyzzy").alias("text"),
    )
    train = docs.filter(F.col("doc_id") % 10 != 0).unionByName(leaked)
    return bench, train


def q_benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trace_aware_reservoir_otel_spark.operators.dedup import decontaminate

    bench, train = _bench_train(spark, sf_dir)
    return decontaminate(train, bench, n=DECON_N)


def _decon_shingles(src: str, with_id: bool) -> str:
    n1 = DECON_N - 1
    id_sel = "doc_id, " if with_id else ""
    return (
        f"select distinct {id_sel}array_to_string(tk[i:i+{n1}], ' ') as sh\n"
        f"      from (select doc_id, regexp_split_to_array(trim(text), '\\s+') as tk\n"
        f"            from {src} where length(trim(text)) > 0) tt\n"
        f"      cross join unnest(range(1, greatest(len(tk) - {n1}, 0) + 1)) as t(i)"
    )


def oracle_benchmark_decontaminate() -> str:
    return f"""
    with bench as (
      select doc_id, text from documents where doc_id % 10 = 0
    ),
    train as (
      select doc_id, text from documents where doc_id % 10 <> 0
      union all
      select doc_id + 2000000 as doc_id,
             regexp_replace(text, '^\\S+', 'xyzzy') as text
      from documents where doc_id % 10 = 0
    ),
    bsh as (
      {_decon_shingles('bench', with_id=False)}
    ),
    tsh as (
      {_decon_shingles('train', with_id=True)}
    )
    select t.doc_id,
           cast(count(*) as bigint) as n_grams,
           cast(count(b.sh) as bigint) as n_shared
    from tsh t left join bsh b using (sh)
    group by t.doc_id
    having count(b.sh) > 0
    """


# --- corpus_prep_full ---------------------------------------------------------

def q_corpus_prep_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete training-data prep composition: benchmark holdout
    (eval slice excluded from the corpus) → quality/language gate →
    repetition gate → decontamination gate → exact-dedup survivor →
    PII scrub. Extends `corpus_prep` with the two round-5 gates.

    100-TB shape: the repetitive and contaminated doc sets are SMALL
    (filters drop a few percent), so both gates are broadcast ANTI-joins
    — the corpus-pattern from dedup_survivors: the fact stream is never
    shuffled except the one content-hash window for survivor selection.
    The heavy work (repetition stats, gram overlap) happens on slim
    id+stat aggregates, not on the corpus rows."""
    from trace_aware_reservoir_otel_spark.functions.text import (
        quality_features,
        redact_pii,
        repetition_features,
    )
    from trace_aware_reservoir_otel_spark.operators.dedup import (
        decontaminate,
        scale_out,
    )
    from pyspark.sql import Window as W

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)

    rep_ids = (
        repetition_features(scale_out(train))
        .filter(F.col("repetitive") == 1)
        .select("doc_id")
    )
    cont_ids = decontaminate(train, bench, n=DECON_N).select("doc_id")

    q = quality_features(train).filter(
        (F.col("n_tokens") >= 5) & (F.col("lang_pred") == "en_like")
    )
    kept = q.join(F.broadcast(rep_ids), "doc_id", "left_anti").join(
        F.broadcast(cont_ids), "doc_id", "left_anti"
    )
    wdup = W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    surv = (
        kept.withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return surv.select(
        "doc_id",
        F.md5(redact_pii(F.col("text"))).alias("redacted_md5"),
        "n_tokens",
    )


def oracle_corpus_prep_full() -> str:
    from trace_aware_reservoir_otel_spark.contract import DUCK
    from trace_aware_reservoir_otel_spark.functions.text import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
    )

    nt = DUCK.ntokens("text")
    hits = DUCK.regexp_count(
        "(' ' || text || ' ')", r"\b(the|a|of|and|to|in|is)\b"
    )
    wide_cols = ",\n             ".join(
        f"max(case when gn = {n} then {src} end) as {out}"
        for n in (2, 3)
        for src, out in (
            ("n_grams", f"n_{n}grams"),
            ("n_distinct", f"distinct_{n}grams"),
            ("top_count", f"top_{n}gram_count"),
        )
    )
    return f"""
    with train as (
      select doc_id, text from documents where doc_id % 10 <> 0
    ),
    bench as (
      select doc_id, text from documents where doc_id % 10 = 0
    ),
    toks as (
      select doc_id, regexp_split_to_array(trim(text), '\\s+') as tk
      from train
    ),
    grams as (
      {_rep_gram_branch(2)}
      union all
      {_rep_gram_branch(3)}
    ),
    cnt as (
      select doc_id, gn, g, count(*) as c from grams group by doc_id, gn, g
    ),
    stats as (
      select doc_id, gn, sum(c) as n_grams, count(*) as n_distinct,
             max(c) as top_count
      from cnt group by doc_id, gn
    ),
    wide as (
      select doc_id,
             {wide_cols}
      from stats group by doc_id
    ),
    rep_ids as (
      select doc_id from wide
      where (coalesce(top_2gram_count, 0) * 100
                 > {REP_TOP_BIGRAM_PCT} * coalesce(n_2grams, 0))
         or ((coalesce(n_3grams, 0) - coalesce(distinct_3grams, 0)) * 100
                 > {REP_DUP_TRIGRAM_PCT} * coalesce(n_3grams, 0))
    ),
    bsh as (
      {_decon_shingles('bench', with_id=False)}
    ),
    tsh as (
      {_decon_shingles('train', with_id=True)}
    ),
    cont_ids as (
      select distinct t.doc_id from tsh t join bsh b using (sh)
    ),
    kept as (
      select doc_id, text, {nt} as n_tokens
      from train
      where {nt} >= 5
        and cast({hits} as bigint) * 12 >= {nt}
        and doc_id not in (select doc_id from rep_ids)
        and doc_id not in (select doc_id from cont_ids)
    ),
    surv as (
      select doc_id, text, n_tokens from (
        select *, row_number() over (
          partition by md5(text) order by doc_id) as rn
        from kept)
      where rn = 1
    )
    select doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IPV4_RE}', '<IP>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g')) as redacted_md5,
           n_tokens
    from surv
    """


# --- dup_spans ----------------------------------------------------------------

SPAN_K = 5  # word-window span size for substring-level dedup
SPAN_SEED = 42


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication stats over the augmented corpus (the
    contract_dedup near-dup fixture guarantees duplicated spans at every
    sf: each of the 50 copies shares every span not touching token 1)."""
    from trace_aware_reservoir_otel_spark.contract_dedup import _aug_docs
    from trace_aware_reservoir_otel_spark.operators.dedup import dup_span_stats

    aug = _aug_docs(spark, sf_dir)
    return dup_span_stats(aug, k=SPAN_K, portable=True, seed=SPAN_SEED)


def oracle_dup_spans() -> str:
    from trace_aware_reservoir_otel_spark.contract_dedup import AUG_DOCS_SQL

    k1 = SPAN_K - 1
    h = (
        f"cast('0x' || substr(md5('{SPAN_SEED}:span{SPAN_K}:' || sp), 1, 13) "
        "as bigint)"
    )
    return f"""
    with aug as (
      {AUG_DOCS_SQL}
    ),
    toks as (
      select doc_id, regexp_split_to_array(trim(text), '\\s+') as tk
      from aug where length(trim(text)) > 0
    ),
    spans as (
      select doc_id, {h} as h
      from (select doc_id, array_to_string(tk[i:i+{k1}], ' ') as sp
            from toks
            cross join unnest(range(1, greatest(len(tk) - {k1}, 0) + 1)) as t(i))
    ),
    perdoc as (
      select doc_id, h, count(*) as c from spans group by doc_id, h
    ),
    tot as (
      select h, sum(c) as t from perdoc group by h
    )
    select p.doc_id,
           cast(sum(c) as bigint) as n_spans,
           cast(sum(case when t >= 2 then c else 0 end) as bigint) as n_dup_spans
    from perdoc p join tot using (h)
    group by p.doc_id
    """


# --- token_budget_mix -----------------------------------------------------------

MIX_SEED = 42


def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing over documents: per-source budget =
    400 + 100 * (portable-hash(source) % 4) tokens — a fixed absolute
    budget (mixtures are specified in tokens, independent of corpus
    growth), varied across sources so the mix is non-uniform at every
    sf."""
    from trace_aware_reservoir_otel_spark.functions.hashing import pbig
    from trace_aware_reservoir_otel_spark.functions.text import n_tokens
    from trace_aware_reservoir_otel_spark.operators.mixture import token_budget_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = F.lit(400) + F.lit(100) * (
        pbig(F.concat(F.lit("budget:"), F.col("source")), MIX_SEED) % 4
    )
    return token_budget_mix(
        docs, budget_col=budget, tokens_col=n_tokens("text"), seed=MIX_SEED
    )


def oracle_token_budget_mix() -> str:
    prio = (
        f"cast('0x' || substr(md5('{MIX_SEED}:mix:' || source || ':' || "
        "cast(doc_id as varchar)), 1, 13) as bigint)"
    )
    budget = (
        f"400 + 100 * (cast('0x' || substr(md5('{MIX_SEED}:budget:' || source), "
        "1, 13) as bigint) % 4)"
    )
    ntok = (
        "(case when length(trim(text)) = 0 then 0 "
        "else len(regexp_split_to_array(trim(text), '\\s+')) end)"
    )
    return f"""
    with pri as (
      select source, doc_id,
             {prio} as _prio,
             cast({ntok} as bigint) as n_tokens,
             {budget} as _budget
      from documents
    ),
    cum as (
      select source, doc_id, n_tokens, _budget,
             sum(n_tokens) over (partition by source
                                 order by _prio desc, doc_id asc
                                 rows between unbounded preceding
                                          and current row) as cum_tokens
      from pri
    )
    select source,
           cast(doc_id as bigint) as doc_id,
           n_tokens,
           cast(cum_tokens as bigint) as cum_tokens
    from cum
    where cum_tokens - n_tokens < _budget
    """


# --- unigram_rarity -------------------------------------------------------------

RARE_MAX = 2
LM_SEED = 42


def q_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram rarity stats — the integer-exact perplexity proxy
    (see operators.lm.doc_unigram_stats); the float mean -ln p form is
    doc_unigram_logprob, unit-tested vs numpy in tests/test_lm.py."""
    from trace_aware_reservoir_otel_spark.operators.lm import doc_unigram_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return doc_unigram_stats(docs, rare_max=RARE_MAX, portable=True, seed=LM_SEED)


def oracle_unigram_rarity() -> str:
    h = f"cast('0x' || substr(md5('{LM_SEED}:unigram:' || tok), 1, 13) as bigint)"
    return f"""
    with toks as (
      select doc_id, regexp_split_to_array(trim(text), '\\s+') as tk
      from documents where length(trim(text)) > 0
    ),
    per as (
      select doc_id, {h} as h
      from toks cross join unnest(tk) as t(tok)
    ),
    perdoc as (
      select doc_id, h, count(*) as c from per group by doc_id, h
    ),
    tot as (
      select *, sum(c) over (partition by h) as tot from perdoc
    )
    select doc_id,
           cast(sum(c) as bigint) as n_tokens,
           cast(sum(c * tot) as bigint) as sum_tok_freq,
           cast(sum(case when tot <= {RARE_MAX} then c else 0 end) as bigint)
               as n_rare_tokens,
           cast(min(tot) as bigint) as min_tok_freq
    from tot group by doc_id
    """


# --- dsir_scores ----------------------------------------------------------------

DSIR_N = 2
DSIR_BUCKETS = 256
DSIR_SEED = 42


def q_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance scores over documents with the 'en'
    slice as the target distribution — integer cross-normalized
    target/raw masses (see operators.lm.dsir_feature_scores); the float
    log-ratio resampling weights are dsir_logratio_weights, unit-tested
    vs numpy."""
    from trace_aware_reservoir_otel_spark.operators.lm import dsir_feature_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_feature_scores(
        docs,
        docs.filter(F.col("lang") == "en"),
        n=DSIR_N,
        n_buckets=DSIR_BUCKETS,
        portable=True,
        seed=DSIR_SEED,
    )


def oracle_dsir_scores() -> str:
    n1 = DSIR_N - 1
    h = (
        f"cast('0x' || substr(md5('{DSIR_SEED}:dsir{DSIR_N}:' || g), 1, 13) "
        f"as bigint) % {DSIR_BUCKETS}"
    )
    return f"""
    with toks as (
      select doc_id, lang, regexp_split_to_array(trim(text), '\\s+') as tk
      from documents where length(trim(text)) > 0
    ),
    grams as (
      select doc_id, lang, array_to_string(tk[i:i+{n1}], ' ') as g
      from toks
      cross join unnest(range(1, greatest(len(tk) - {n1}, 0) + 1)) as t(i)
    ),
    feat as (
      select doc_id, lang, {h} as bucket, count(*) as c
      from grams group by doc_id, lang, bucket
    ),
    tb as (
      select bucket, sum(c) as t from feat where lang = 'en' group by bucket
    ),
    rb as (
      select bucket, sum(c) as r from feat group by bucket
    ),
    buckets as (
      select coalesce(tb.bucket, rb.bucket) as bucket,
             coalesce(t, 0) as t, coalesce(r, 0) as r,
             (select sum(t) from tb) as ttot,
             (select sum(r) from rb) as rtot
      from tb full outer join rb on tb.bucket = rb.bucket
    )
    select f.doc_id,
           cast(sum(f.c) as bigint) as n_features,
           cast(sum(f.c * b.t * b.rtot) as bigint) as target_mass,
           cast(sum(f.c * b.r * b.ttot) as bigint) as raw_mass,
           cast((sum(f.c * b.t * b.rtot) > sum(f.c * b.r * b.ttot)) as bigint)
               as target_like
    from feat f left join buckets b using (bucket)
    group by f.doc_id
    """


# --- pack_chunks ----------------------------------------------------------------

PACK_SEQ_TOKENS = 256
PACK_SEED = 42


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing of documents into 256-token training chunks per
    source (concatenate-in-deterministic-order, split at fixed token
    boundaries — operators.mixture.pack_chunks)."""
    from trace_aware_reservoir_otel_spark.functions.text import n_tokens
    from trace_aware_reservoir_otel_spark.operators.mixture import pack_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_chunks(
        docs, seq_tokens=PACK_SEQ_TOKENS, tokens_col=n_tokens("text"), seed=PACK_SEED
    )


def oracle_pack_chunks() -> str:
    prio = (
        f"cast('0x' || substr(md5('{PACK_SEED}:pack:' || source || ':' || "
        "cast(doc_id as varchar)), 1, 13) as bigint)"
    )
    ntok = (
        "(case when length(trim(text)) = 0 then 0 "
        "else len(regexp_split_to_array(trim(text), '\\s+')) end)"
    )
    return f"""
    with pri as (
      select source, doc_id,
             {prio} as _prio,
             cast({ntok} as bigint) as n_tokens
      from documents
    ),
    cum as (
      select source, doc_id, n_tokens,
             sum(n_tokens) over (partition by source
                                 order by _prio desc, doc_id asc
                                 rows between unbounded preceding
                                          and current row) - n_tokens as _before
      from pri
    )
    select source,
           cast(doc_id as bigint) as doc_id,
           n_tokens,
           cast(floor(_before / {PACK_SEQ_TOKENS}) as bigint) as chunk_id,
           cast(_before % {PACK_SEQ_TOKENS} as bigint) as chunk_off
    from cum
    """


# --- split_long_docs --------------------------------------------------------------

SPLIT_SEQ_TOKENS = 64
SPLIT_STRIDE = 48


def q_split_long_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window split of long documents into overlapping 64-token
    training pieces at stride 48 (operators.mixture.split_long_docs)."""
    from trace_aware_reservoir_otel_spark.functions.text import n_tokens
    from trace_aware_reservoir_otel_spark.operators.mixture import split_long_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return split_long_docs(
        docs,
        seq_tokens=SPLIT_SEQ_TOKENS,
        tokens_col=n_tokens("text"),
        stride=SPLIT_STRIDE,
    )


def oracle_split_long_docs() -> str:
    seq, stride = SPLIT_SEQ_TOKENS, SPLIT_STRIDE
    ntok = (
        "(case when length(trim(text)) = 0 then 0 "
        "else len(regexp_split_to_array(trim(text), '\\s+')) end)"
    )
    return f"""
    with t as (
      select doc_id, cast({ntok} as bigint) as n from documents
    ),
    k as (
      select doc_id, n,
             cast(floor((greatest(n - {seq}, 0) + {stride - 1}) / {stride})
                  as bigint) as k
      from t where n > 0
    )
    select cast(doc_id as bigint) as doc_id,
           n as n_tokens,
           cast(i as bigint) as piece_idx,
           cast(i * {stride} as bigint) as tok_start,
           cast(least({seq}, n - i * {stride}) as bigint) as tok_len
    from k cross join unnest(range(0, k + 1)) as u(i)
    """


# --- top_quality_per_source --------------------------------------------------------

KEEP_NUM, KEEP_DEN = 3, 10


def q_top_quality_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality gate: keep the top 3/10 of documents by token
    count within each source (operators.mixture.top_quality_per_source;
    rational cutoff keeps the rank arithmetic integer-exact)."""
    from trace_aware_reservoir_otel_spark.functions.text import n_tokens
    from trace_aware_reservoir_otel_spark.operators.mixture import (
        top_quality_per_source,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return top_quality_per_source(
        docs, n_tokens("text"), keep_num=KEEP_NUM, keep_den=KEEP_DEN
    )


def oracle_top_quality_per_source() -> str:
    ntok = (
        "(case when length(trim(text)) = 0 then 0 "
        "else len(regexp_split_to_array(trim(text), '\\s+')) end)"
    )
    return f"""
    with q as (
      select source, doc_id, cast({ntok} as bigint) as quality from documents
    ),
    r as (
      select source, doc_id, quality,
             row_number() over (partition by source
                                order by quality desc, doc_id asc) as q_rank,
             count(*) over (partition by source) as n
      from q
    )
    select source, cast(doc_id as bigint) as doc_id, quality,
           cast(q_rank as bigint) as q_rank
    from r
    where q_rank <= (n * {KEEP_NUM} + {KEEP_DEN - 1}) // {KEEP_DEN}
    """


# --- training_mix_pipeline ----------------------------------------------------
#
# The round-5 capstone composition: every selection/mixing operator this
# round added, chained end-to-end into the thing a training run actually
# consumes — packed fixed-token chunk assignments.

MIX_KEEP_NUM, MIX_KEEP_DEN = 4, 5  # per-source quality gate: keep top 4/5
MIX_BUDGET_TOKENS = 3000           # per-source token budget for the mixture
MIX_PACK_SEQ = 256                 # training context window (tokens)


def q_training_mix_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data mixing pipeline, every stage the real
    operator: benchmark holdout (doc_id%10==0) → per-source quality
    percentile gate (top 4/5 by token count, text carried through) →
    benchmark n-gram decontamination (broadcast anti-join) → quality-aware
    near-dup survivor selection (MinHash-LSH pairs → CC → keep the
    longest copy; broadcast anti-join) → per-source token-budget mixing
    (3000 tokens/source, one window shuffle) → sequence packing into
    256-token chunks (one window shuffle).

    100-TB shape: the corpus is never joined fact-to-fact — every gate is
    a broadcast anti-join of a small flagged id set; the only
    corpus-grain shuffles are the three per-source windows (gate, mix,
    pack), each spill-safe."""
    from trace_aware_reservoir_otel_spark.contract_dedup import (
        BANDS,
        MAX_BUCKET,
        MINHASHES,
        SEED,
        SHINGLE_N,
    )
    from trace_aware_reservoir_otel_spark.operators.dedup import (
        decontaminate,
        dedup_survivors_by_quality,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from trace_aware_reservoir_otel_spark.functions.text import n_tokens
    from trace_aware_reservoir_otel_spark.operators.mixture import (
        pack_chunks,
        token_budget_mix,
        top_quality_per_source,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)

    gated = top_quality_per_source(
        train,
        n_tokens("text"),
        keep_num=MIX_KEEP_NUM,
        keep_den=MIX_KEEP_DEN,
        carry_cols=("text",),
    )
    cont_ids = decontaminate(gated, bench, n=DECON_N).select("doc_id")
    clean = gated.join(F.broadcast(cont_ids), "doc_id", "left_anti")
    # `clean` feeds THREE consumers (signatures, survivor quality rank,
    # survivor anti-join) and Catalyst does not reuse the gated-corpus
    # subtree across them — without a materialization the quality-gate
    # window + decontamination rerun per consumer (4x gate exchanges in
    # the measured plan). Lazy localCheckpoint computes it once into
    # executor block storage — the shingle-set pattern from
    # ngram_jaccard_pairs.
    clean = clean.localCheckpoint(eager=False)

    sig = minhash_signatures(
        clean, MINHASHES, SHINGLE_N, portable=True, seed=SEED
    )
    pairs = lsh_candidate_pairs(sig, BANDS, max_bucket=MAX_BUCKET)
    kept = dedup_survivors_by_quality(clean, pairs, n_tokens("text"))

    mixed = token_budget_mix(
        kept,
        budget_col=F.lit(MIX_BUDGET_TOKENS),
        tokens_col=n_tokens("text"),
    )
    return pack_chunks(
        mixed, seq_tokens=MIX_PACK_SEQ, tokens_col=F.col("n_tokens")
    )


def oracle_training_mix_pipeline() -> str:
    from trace_aware_reservoir_otel_spark.contract_dedup import (
        MAX_BUCKET,
        _duck_pbig,
        _inc_band_rows_ctes,
    )

    ntok = (
        "(case when length(trim(text)) = 0 then 0 "
        "else len(regexp_split_to_array(trim(text), '\\s+')) end)"
    )
    mix_prio = _duck_pbig(
        "'42:mix:' || source || ':' || cast(doc_id as varchar)"
    )
    pack_prio = _duck_pbig(
        "'42:pack:' || source || ':' || cast(doc_id as varchar)"
    )
    return (
        "with recursive bench as (\n"
        "      select doc_id, text from documents where doc_id % 10 = 0\n"
        "    ),\n"
        "    train as (\n"
        "      select doc_id, source, text from documents where doc_id % 10 <> 0\n"
        "    ),\n"
        # stage 1: per-source quality gate (top 4/5 by token count)
        f"    tq as (select doc_id, source, text, cast({ntok} as bigint) as quality from train),\n"
        "    tr as (\n"
        "      select *, row_number() over (partition by source\n"
        "                 order by quality desc, doc_id asc) as q_rank,\n"
        "             count(*) over (partition by source) as nsrc\n"
        "      from tq\n"
        "    ),\n"
        "    gated as (\n"
        f"      select doc_id, source, text, quality from tr\n"
        f"      where q_rank <= (nsrc * {MIX_KEEP_NUM} + {MIX_KEEP_DEN - 1}) // {MIX_KEEP_DEN}\n"
        "    ),\n"
        # stage 2: benchmark n-gram decontamination
        "    bsh as (\n      " + _decon_shingles("bench", with_id=False) + "\n    ),\n"
        "    gsh as (\n      " + _decon_shingles("gated", with_id=True) + "\n    ),\n"
        "    cont as (select distinct g.doc_id from gsh g join bsh b using (sh)),\n"
        "    clean as (\n"
        "      select * from gated where doc_id not in (select doc_id from cont)\n"
        "    ),\n"
        # stage 3: MinHash-LSH pairs over the clean set (contract knobs)
        + _inc_band_rows_ctes("select doc_id, text, 1 as grp from clean") + ",\n"
        "    brc as (\n"
        "      select doc_id, band, bucket\n"
        "      from (select *, row_number() over (\n"
        "                   partition by band, bucket order by doc_id) as rn\n"
        "            from br)\n"
        f"      where rn <= {MAX_BUCKET}\n"
        "    ),\n"
        "    tpairs as (\n"
        "      select distinct a.doc_id as doc_a, b.doc_id as doc_b\n"
        "      from brc a join brc b\n"
        "        on a.band = b.band and a.bucket = b.bucket\n"
        "      where a.doc_id < b.doc_id\n"
        "    ),\n"
        # stage 3b: connected components + keep the highest-quality member
        "    tedges as (\n"
        "      select doc_a as a, doc_b as b from tpairs\n"
        "      union all\n"
        "      select doc_b, doc_a from tpairs\n"
        "    ),\n"
        "    tverts as (select distinct a as id from tedges),\n"
        "    twalk(id, dst) as (\n"
        "      select id, id from tverts\n"
        "      union\n"
        "      select w.id, e.b from twalk w join tedges e on e.a = w.dst\n"
        "    ),\n"
        "    tcomp as (select id, min(dst) as comp from twalk group by id),\n"
        "    tmemq as (\n"
        "      select c.id, c.comp, cl.quality as q\n"
        "      from tcomp c join clean cl on cl.doc_id = c.id\n"
        "    ),\n"
        "    tranked as (\n"
        "      select id, row_number() over (\n"
        "        partition by comp order by q desc, id asc) as rk\n"
        "      from tmemq\n"
        "    ),\n"
        "    tlosers as (select id from tranked where rk > 1),\n"
        "    kept as (\n"
        "      select * from clean where doc_id not in (select id from tlosers)\n"
        "    ),\n"
        # stage 4: per-source token-budget mix (3000 tokens/source)
        "    mpri as (\n"
        f"      select source, doc_id, quality as n_tokens, {mix_prio} as mp\n"
        "      from kept\n"
        "    ),\n"
        "    mcum as (\n"
        "      select source, doc_id, n_tokens,\n"
        "             sum(n_tokens) over (partition by source\n"
        "                 order by mp desc, doc_id asc\n"
        "                 rows between unbounded preceding and current row)\n"
        "               as cum_tokens\n"
        "      from mpri\n"
        "    ),\n"
        "    mixed as (\n"
        f"      select source, doc_id, n_tokens from mcum\n"
        f"      where cum_tokens - n_tokens < {MIX_BUDGET_TOKENS}\n"
        "    ),\n"
        # stage 5: sequence packing into 256-token chunks
        "    ppri as (\n"
        f"      select source, doc_id, n_tokens, {pack_prio} as pp from mixed\n"
        "    ),\n"
        "    pcum as (\n"
        "      select source, doc_id, n_tokens,\n"
        "             sum(n_tokens) over (partition by source\n"
        "                 order by pp desc, doc_id asc\n"
        "                 rows between unbounded preceding and current row)\n"
        "               - n_tokens as _before\n"
        "      from ppri\n"
        "    )\n"
        "    select source, cast(doc_id as bigint) as doc_id, n_tokens,\n"
        f"           cast(floor(_before / {MIX_PACK_SEQ}) as bigint) as chunk_id,\n"
        f"           cast(_before % {MIX_PACK_SEQ} as bigint) as chunk_off\n"
        "    from pcum"
    )


QUALITY_QUERIES = {
    "repetition_stats": q_repetition_stats,
    "benchmark_decontaminate": q_benchmark_decontaminate,
    "corpus_prep_full": q_corpus_prep_full,
    "dup_spans": q_dup_spans,
    "token_budget_mix": q_token_budget_mix,
    "unigram_rarity": q_unigram_rarity,
    "dsir_scores": q_dsir_scores,
    "pack_chunks": q_pack_chunks,
    "split_long_docs": q_split_long_docs,
    "top_quality_per_source": q_top_quality_per_source,
    "training_mix_pipeline": q_training_mix_pipeline,
}


def quality_oracles() -> "dict[str, str]":
    return {
        "repetition_stats": oracle_repetition_stats(),
        "benchmark_decontaminate": oracle_benchmark_decontaminate(),
        "corpus_prep_full": oracle_corpus_prep_full(),
        "dup_spans": oracle_dup_spans(),
        "token_budget_mix": oracle_token_budget_mix(),
        "unigram_rarity": oracle_unigram_rarity(),
        "dsir_scores": oracle_dsir_scores(),
        "pack_chunks": oracle_pack_chunks(),
        "split_long_docs": oracle_split_long_docs(),
        "top_quality_per_source": oracle_top_quality_per_source(),
        "training_mix_pipeline": oracle_training_mix_pipeline(),
    }
