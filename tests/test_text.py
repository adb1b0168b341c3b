"""Text-analysis library functions agree with the contract SQL versions
and behave sensibly on the driver's documents table."""

from pyspark.sql import functions as F

from trace_aware_reservoir_otel_spark.contract import SPARK, q_lang_stopword, q_token_count
from trace_aware_reservoir_otel_spark.functions.text import (
    doc_fingerprint,
    lang_pred,
    n_tokens,
    n_tokens_bpe_ish,
    quality_features,
    stopword_hits,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_n_tokens_matches_contract_sql(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    docs.createOrReplaceTempView("documents")
    lib = {
        r["doc_id"]: r["nt"]
        for r in docs.select("doc_id", n_tokens("text").alias("nt")).collect()
    }
    sql = {
        r["doc_id"]: r["n_tokens"] for r in spark.sql(q_token_count(SPARK)).collect()
    }
    assert lib == sql


def test_lang_pred_matches_contract_sql(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    docs.createOrReplaceTempView("documents")
    lib = {
        r["doc_id"]: (r["sw"], r["lp"])
        for r in docs.select(
            "doc_id",
            stopword_hits("text").alias("sw"),
            lang_pred("text").alias("lp"),
        ).collect()
    }
    sql = {
        r["doc_id"]: (r["sw_hits"], r["lang_pred"])
        for r in spark.sql(q_lang_stopword(SPARK)).collect()
    }
    assert lib == sql


def test_lang_pred_separates_english(spark):
    # NOTE: the driver's synthetic documents use one shared vocabulary for
    # every `lang` label, so language is not recoverable there; the
    # heuristic is validated on real sentences instead.
    rows = [
        (0, "the cat sat on the mat and looked out of the window"),
        (1, "a quick overview of the design and the goals of the project"),
        (2, "der schnelle braune fuchs springt ueber den faulen hund heute"),
        (3, "le renard brun rapide saute par dessus le chien paresseux"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lp"] for r in df.select("doc_id", lang_pred("text").alias("lp")).collect()}
    assert got[0] == "en_like" and got[1] == "en_like"
    assert got[2] == "other" and got[3] == "other"


def test_quality_features_shape(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    q = quality_features(docs)
    rows = q.collect()
    for r in rows:
        assert r["n_chars_m"] >= 0 and r["n_tokens"] >= 0
        assert r["n_tokens_bpe_ish"] >= r["n_tokens"] or r["n_tokens"] <= 1
    assert "lang_pred" in q.columns


def test_doc_fingerprint_deterministic_and_content_keyed(spark):
    df = spark.createDataFrame(
        [(0, "abcdefghij"), (1, "abcdefghij"), (2, "zzzzzzzzzz")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(df).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
