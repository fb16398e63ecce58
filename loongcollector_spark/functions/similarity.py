"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: the correctness baseline — broadcast the query
  vector, one narrow pass + a k-row takeOrdered;
* LSH-bucketed top-k: the scale path — deterministic sign-buckets prune
  the candidate set before scoring; at 100 TB the bucket column is a
  partition key so a query touches one partition family.

All arithmetic in double with sequential accumulation so results are
bit-reproducible against the DuckDB oracle; scores rounded to 4 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_expr(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    df: DataFrame, query_vec_id: int = 0, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k vs one stored vector. The query side is a
    1-row broadcast — zero shuffle of the corpus."""
    q = df.filter(F.col(id_col) == query_vec_id).select(
        _as_double(F.col(vec_col)).alias("qe")
    )
    corpus = df.filter(F.col(id_col) != query_vec_id).select(
        id_col, _as_double(F.col(vec_col)).alias("emb")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        id_col, F.round(cosine_expr(F.col("emb"), F.col("qe")), 4).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def sign_bucket(vec_col, n_bits: int = 3):
    """Deterministic LSH bucket: sign bits of the first n dims (an
    IVF-coarse-quantizer stand-in that both engines reproduce exactly)."""
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(F.element_at(vec_col, i + 1) > 0, 2 ** (n_bits - 1 - i)).otherwise(0)
    return b.cast("int")


def embedding_near_dup_pairs(
    df: DataFrame, min_cos_1e4: int = 9000,
    vec_col: str = "embedding", id_col: str = "vec_id", n_bits: int = 3,
) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs: block on the sign-bucket
    (two near-identical vectors share it unless a blocked dim sits at ~0),
    self-join within buckets, keep pairs with cosine ≥ threshold.

    Scale shape: the self-join shuffles on the bucket key only; within a
    bucket the candidate set is ~corpus/2^n_bits. Threshold kept as an
    integer 1e4 score so the DuckDB oracle hashes identically.
    """
    emb = _as_double(F.col(vec_col))
    # hoist the per-vector norm OUT of the pair loop: computed once per
    # row here, the per-pair work inside the join is a single dot product
    # (was 3 interpreted array-folds per candidate pair)
    e = df.select(
        id_col,
        emb.alias("emb"),
        F.sqrt(_dot(emb, emb)).alias("norm"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    a, b = e.alias("a"), e.alias("b")
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.floor(cos * 10000).cast("int").alias("cos_1e4"),
        )
        .filter(F.col("cos_1e4") >= min_cos_1e4)
    )


def lsh_bucketed_topk(
    df: DataFrame, query_vec_id: int = 0, k: int = 5,
    vec_col: str = "embedding", id_col: str = "vec_id", n_bits: int = 3,
) -> DataFrame:
    """ANN: score only the query's sign-bucket. At corpus scale the bucket
    is the partition key, so the scan prunes to ~1/2^n_bits of the data."""
    e = df.select(
        id_col,
        _as_double(F.col(vec_col)).alias("emb"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    q = e.filter(F.col(id_col) == query_vec_id).select(
        F.col("emb").alias("qe"), F.col("bucket").alias("qb")
    )
    cand = e.filter(F.col(id_col) != query_vec_id).crossJoin(F.broadcast(q)).filter(
        F.col("bucket") == F.col("qb")
    )
    return (
        cand.select(
            id_col, "bucket",
            F.round(cosine_expr(F.col("emb"), F.col("qe")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
