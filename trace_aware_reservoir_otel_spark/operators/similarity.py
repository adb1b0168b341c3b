"""Similarity search over embedding columns (array<float>).

Training-data-pipeline ops (no reference analog): brute-force cosine
top-k as the exact baseline, and a deterministic LSH-bucketed variant as
the scale path. All arithmetic uses F.zip_with / F.aggregate (sequential
fold — deterministic summation order, reproducible across partitionings)
rather than exploded sums.

Scale notes: brute-force against a single query vector is a narrow scan
(no shuffle, TakeOrderedAndProject top-k). Pairwise near-dup uses sign-bit
LSH buckets so the self-join is bucket-local; at 10^9 vectors you shard
buckets further (more planes) — plane count is the knob.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: "list[float]",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: "int | None" = 6,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a constant query.

    Rounding the similarity (default 6 digits) before ranking makes the
    result robust to last-ulp float summation differences across engines
    (ties broken by id)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = _to_double(F.col(vec_col))
    sim = cosine(emb, q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = df.select(F.col(id_col), sim.alias("sim"))
    return scored.orderBy(F.col("sim").desc(), F.col(id_col).asc()).limit(k)


def signbit_bucket(
    vec_col: Column, dims: "list[int]"
) -> Column:
    """Deterministic LSH bucket id: sign bits of selected dimensions
    (axis-aligned hyperplanes — fully portable, no random planes)."""
    out = F.lit(0)
    for i, d in enumerate(dims):
        bit = F.when(vec_col[d].cast("double") >= 0, F.lit(1)).otherwise(F.lit(0))
        out = out + bit * F.lit(1 << i)
    return out.cast("int")


def ann_topk_lsh(
    df: DataFrame,
    query_vec: "list[float]",
    k: int = 10,
    bucket_dims: "list[int]" = (0, 8, 16, 24),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: "int | None" = 6,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign-bit
    bucket (the 1/2^planes candidate slice), then exact cosine rank."""
    dims = list(bucket_dims)
    qbucket = sum((1 << i) for i, d in enumerate(dims) if query_vec[d] >= 0)
    cand = df.filter(signbit_bucket(F.col(vec_col), dims) == qbucket)
    return cosine_topk(cand, query_vec, k, vec_col, id_col, round_digits)


def embedding_near_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bucket_dims: "list[int]" = (0, 8, 16, 24),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: "int | None" = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets.

    Recall caveat (standard LSH tradeoff): pairs straddling a bucket
    boundary are missed; raise recall with multiple bucket tables."""
    dims = list(bucket_dims)
    with_b = df.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_v"),
        signbit_bucket(F.col(vec_col), dims).alias("_bucket"),
    )
    a = with_b.select(
        F.col("_bucket"), F.col(id_col).alias("id_a"), F.col("_v").alias("va")
    )
    b = with_b.select(
        F.col("_bucket"), F.col(id_col).alias("id_b"), F.col("_v").alias("vb")
    )
    sim = cosine(F.col("va"), F.col("vb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        a.join(b, on="_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
