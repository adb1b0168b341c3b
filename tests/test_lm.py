"""Unit tests for operators/lm.py (unigram LM stats, DSIR importance
scoring) and operators/mixture.pack_chunks — the float forms are checked
against numpy here (their integer siblings are oracle-checked in
test_contract.py), plus plan-shape assertions for the 100-TB posture."""

import collections
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from trace_aware_reservoir_otel_spark.functions.text import n_tokens
from trace_aware_reservoir_otel_spark.operators.lm import (
    doc_unigram_logprob,
    doc_unigram_stats,
    dsir_feature_scores,
    dsir_logratio_weights,
    hashed_ngram_features,
)
from trace_aware_reservoir_otel_spark.operators.mixture import pack_chunks

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_unigram_logprob_matches_numpy(spark, docs):
    pdf = docs.select("doc_id", "text").toPandas()
    cnt = collections.Counter()
    toks = {}
    for _, r in pdf.iterrows():
        t = r.text.strip().split()
        toks[r.doc_id] = t
        cnt.update(t)
    n = sum(cnt.values())
    exp = {
        d: -float(np.mean([math.log(cnt[t] / n) for t in tk]))
        for d, tk in toks.items()
        if tk
    }
    got = {r.doc_id: r.mean_neg_logp for r in doc_unigram_logprob(docs).collect()}
    assert set(got) == set(exp)
    assert max(abs(got[d] - exp[d]) for d in exp) < 1e-9


def test_unigram_stats_consistent_with_logprob_ordering(spark, docs):
    """sum_tok_freq/n_tokens (mean corpus frequency) must order documents
    the same direction as mean -ln p: rarer tokens -> higher neg-logp."""
    stats = {
        r.doc_id: r.sum_tok_freq / r.n_tokens
        for r in doc_unigram_stats(docs).collect()
    }
    lp = {r.doc_id: r.mean_neg_logp for r in doc_unigram_logprob(docs).collect()}
    ids = sorted(stats)
    mean_freq = np.array([stats[d] for d in ids])
    neg_logp = np.array([lp[d] for d in ids])
    # negative rank correlation (Jensen gap keeps it from -1 exactly)
    r = np.corrcoef(
        np.argsort(np.argsort(mean_freq)), np.argsort(np.argsort(neg_logp))
    )[0, 1]
    assert r < -0.8


def test_unigram_stats_xxhash_default_equals_portable(spark, docs):
    """The production hash path (xxhash64) must produce identical stats to
    the md5-portable path — counts depend only on hash collisions, and
    neither collides at this vocabulary size."""
    a = sorted(map(tuple, doc_unigram_stats(docs, portable=False).collect()))
    b = sorted(map(tuple, doc_unigram_stats(docs, portable=True).collect()))
    assert a == b


def test_dsir_logratio_separates_target_slice(spark, docs):
    target = docs.filter(F.col("lang") == "en")
    w = dsir_logratio_weights(docs, target, n=2, n_buckets=256)
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    rows = j.groupBy((F.col("lang") == "en").alias("is_en")).agg(
        F.avg("log_weight").alias("m")
    ).collect()
    m = {r.is_en: r.m for r in rows}
    assert m[True] > 0 > m[False]


def test_dsir_logratio_matches_numpy(spark, docs):
    target = docs.filter(F.col("lang") == "en")
    B, alpha = 64, 1.0
    feats = {
        r.doc_id: (r.bucket, r.c)
        for r in []
    }
    rf = hashed_ngram_features(docs, n=2, n_buckets=B).collect()
    tf = hashed_ngram_features(target, n=2, n_buckets=B).collect()
    t = np.zeros(B)
    r_ = np.zeros(B)
    per = collections.defaultdict(dict)
    for row in rf:
        r_[row.bucket] += row.c
        per[row.doc_id][row.bucket] = row.c
    for row in tf:
        t[row.bucket] += row.c
    lr = np.log((t + alpha) / (t.sum() + alpha * B)) - np.log(
        (r_ + alpha) / (r_.sum() + alpha * B)
    )
    exp = {d: sum(c * lr[b] for b, c in f.items()) for d, f in per.items()}
    got = {
        row.doc_id: row.log_weight
        for row in dsir_logratio_weights(docs, target, n=2, n_buckets=B, alpha=alpha).collect()
    }
    assert set(got) == set(exp)
    assert max(abs(got[d] - exp[d]) for d in exp) < 1e-9


def test_dsir_feature_scores_sign_agrees_with_logratio_mostly(spark, docs):
    """The integer surrogate's target_like flag and the float log-ratio
    sign are different linearizations of the same mass comparison
    (count-linear vs log-linear), so they disagree near the decision
    boundary — measured 0.78 at sf0.001; the test pins a floor well above
    chance (0.5)."""
    target = docs.filter(F.col("lang") == "en")
    ints = dsir_feature_scores(docs, target, n=2, n_buckets=256, portable=False)
    fl = dsir_logratio_weights(docs, target, n=2, n_buckets=256, alpha=0.01)
    j = ints.join(fl, "doc_id").select(
        (F.col("target_like") == (F.col("log_weight") > 0).cast("long")).alias("agree")
    )
    frac = j.agg(F.avg(F.col("agree").cast("double"))).collect()[0][0]
    assert frac > 0.7


def test_dsir_plan_broadcasts_bucket_table(spark, docs):
    """The bucket log-ratio table is <= n_buckets rows whatever the corpus
    size; the join back to per-doc features must be broadcast (never a
    fact-side sort-merge join)."""
    target = docs.filter(F.col("lang") == "en")
    plan = dsir_feature_scores(
        docs, target, n=2, n_buckets=256
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_chunks_layout_reconstructs(spark, docs):
    """chunk_id/chunk_off must describe the exact concatenate-then-split
    layout: per source, sorting docs by (chunk_id, chunk_off) recovers the
    pack order, offsets advance by n_tokens mod seq, and every chunk
    except the last covers the full seq window."""
    seq = 128
    out = pack_chunks(docs, seq_tokens=seq, tokens_col=n_tokens("text")).collect()
    per_src = collections.defaultdict(list)
    for r in out:
        assert 0 <= r.chunk_off < seq
        per_src[r.source].append(r)
    n_docs = docs.count()
    assert sum(len(v) for v in per_src.values()) == n_docs
    for src, rows in per_src.items():
        rows.sort(key=lambda r: (r.chunk_id, r.chunk_off, r.doc_id))
        before = 0
        for r in rows:
            assert r.chunk_id == before // seq
            assert r.chunk_off == before % seq
            before += r.n_tokens
        total = sum(r.n_tokens for r in rows)
        assert rows[-1].chunk_id == (total - rows[-1].n_tokens) // seq


def test_pack_chunks_single_shuffle(spark, docs):
    """ONE exchange (the per-source window partitioning) in the whole
    plan — packing must not add shuffles beyond the window sort."""
    plan = pack_chunks(
        docs, seq_tokens=128, tokens_col=n_tokens("text")
    )._jdf.queryExecution().executedPlan().toString()
    import re

    exchanges = [
        ln for ln in plan.splitlines() if re.search(r"\bExchange hashpartitioning", ln)
    ]
    assert len(exchanges) == 1, plan
