"""Hashed n-gram linear text classifier — the fastText-style quality
scorer of production LLM-data pipelines (Joulin et al. 2016, "Bag of
Tricks for Efficient Text Classification"; CCNet/Gopher-style corpus
quality gating applies exactly this shape with a trained weight vector).

Spark-first layout, built for the 100 TB case:

* featurize: unigrams + word bigrams, each hashed into one of
  ``n_buckets`` via md5 (the fastText hashing trick) — pure codegen, no
  vocabulary state, shuffle rows carry (doc_id, bucket, count) ints
  only, never text;
* model: the weight vector is a ``n_buckets``-row frame BROADCAST to
  the feature stream (a real trained model drops in as a parquet file
  of (bucket, weight_milli) rows — here weights derive deterministically
  from the bucket hash so the DuckDB oracle can replay them bit-equal);
* score: one map-side-combinable (doc, bucket) count aggregation, the
  broadcast weight join, then a per-doc integer dot product.
  Weights/scores are INTEGER milli-units so the sum is
  aggregation-order-free (the lm.py trick) and hash-oracle-able; the
  logistic squash happens once per doc at the end.

Two shuffles total, both carrying small ints; the corpus text never
leaves the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(gram, n_buckets: int):
    """md5-based feature hashing: first 8 hex chars → uint32 → bucket.
    DuckDB twin: ('0x' || substr(md5(g), 1, 8))::UBIGINT % n."""
    return (F.conv(F.substring(F.md5(gram), 1, 8), 16, 10)
            .cast("long") % n_buckets)


def weight_frame(spark, n_buckets: int = 4096) -> DataFrame:
    """The model: (bucket, weight_milli) with weight_milli in
    [-1000, 1000], derived from md5 of the bucket id — a deterministic
    stand-in with the exact schema a trained fastText/logistic model
    exports to."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("w:"),
                                              F.col("id").cast("string"))),
                               1, 8), 16, 10).cast("long") % 2001 - 1000
        ).alias("weight_milli"),
    )


def hashed_ngram_scores(
    df: DataFrame,
    weights: DataFrame | None = None,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document linear score over hashed uni+bigram features:
    (doc_id, n_grams, score_milli, prob). ``prob`` is the logistic
    squash of the milli-score normalized per gram (a length-invariant
    quality probability)."""
    spark = df.sparkSession
    if weights is None:
        weights = weight_frame(spark, n_buckets)

    # materialize the word array ONCE in its own projection — referencing
    # a raw split() inside the bigram transform would re-evaluate it per
    # element (the documented O(words^2) trap)
    words = df.where(F.col(text_col).isNotNull()).select(
        id_col,
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_w"),
    )
    grams = words.select(
        id_col,
        F.explode(
            F.concat(
                F.col("_w"),
                F.when(
                    F.size("_w") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_w") - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at("_w", i),
                            F.element_at("_w", i + 1)),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("gram"),
    )
    counts = (
        grams.select(id_col, _bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scored = (
        counts.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("n") * F.col("weight_milli")).alias("score_milli"),
        )
    )
    return scored.select(
        id_col, "n_grams", "score_milli",
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(
                -(F.col("score_milli").cast("double")
                  / (F.col("n_grams").cast("double") * 1000.0))))
        ).alias("prob"),
    )
