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


def featurize(df: DataFrame, n_buckets: int = 4096,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bucket, n) hashed uni+bigram counts — the shared feature
    stream for scoring AND training."""
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
    return (
        grams.select(id_col, _bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_perceptron(df: DataFrame, label_col: str = "label",
                     n_buckets: int = 4096, iters: int = 3, lr: int = 1,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """IN-ENGINE training for the hashed-feature linear classifier: a
    batch perceptron (Rosenblatt rule, batch form) over the same
    uni+bigram hashed counts ``hashed_ngram_scores`` consumes — so the
    quality gate can be fit on in-corpus labels (e.g. wiki-vs-crawl, the
    CCNet/fastText recipe) without leaving Spark.

    Update rule, ``iters`` rounds from w=0: margin_d = Σ_b n_db·w_b;
    doc d is misclassified iff y_d·margin_d ≤ 0 (y ∈ {-1,+1});
    w_b += lr · Σ_{misclassified d} y_d·n_db. Every quantity is an
    INTEGER, so the result is exactly reproducible regardless of
    aggregation order — the property that lets a DuckDB oracle replay
    training to hash equality (floating-point SGD cannot cross engines).

    Scale shape: the feature stream is computed once and persisted;
    each round is one broadcast join of the CURRENT weights against it
    (model rows ≤ n_buckets — parameters broadcast, data stays put,
    exactly the distributed-training layout), one per-doc margin
    aggregate, one gradient aggregate collected to the driver (bounded
    by n_buckets, it is the MODEL, not data). Returns (bucket, weight)
    for the non-zero weights."""
    spark = df.sparkSession
    feats = (
        featurize(df, n_buckets, text_col, id_col)
        .join(
            df.select(
                id_col,
                (F.col(label_col).cast("long") * 2 - 1).alias("_y")),
            id_col,
        )
        .localCheckpoint()
    )
    weights: dict[int, int] = {}
    for _ in range(iters):
        if weights:
            wdf = spark.createDataFrame(
                list(weights.items()), "bucket long, _wt long")
            margins = (
                feats.join(F.broadcast(wdf), "bucket", "left")
                .groupBy(id_col, "_y")
                .agg(F.sum(F.col("n") * F.coalesce("_wt", F.lit(0)))
                     .alias("_margin"))
            )
        else:  # w = 0 → every margin is 0
            margins = feats.select(id_col, "_y").distinct().withColumn(
                "_margin", F.lit(0))
        mis = margins.filter(
            F.col("_y") * F.col("_margin") <= 0).select(id_col)
        grad = (
            feats.join(mis, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("_y") * F.col("n")).alias("_g"))
            .collect()
        )
        if not grad:
            break
        for r in grad:
            weights[r["bucket"]] = weights.get(r["bucket"], 0) + lr * r["_g"]
    rows = [(b, w) for b, w in sorted(weights.items()) if w != 0]
    return spark.createDataFrame(rows, "bucket long, weight long")


def dsir_scores(raw: DataFrame, target: DataFrame, n_buckets: int = 4096,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
    arXiv:2302.03169): score every raw document by its hashed-n-gram
    importance weight toward a small target corpus,
    log w(doc) = Σ_b c_b · log( p̂_target(b) / p̂_raw(b) ), with add-one
    smoothed bucket distributions — the method behind "sample the crawl
    to look like Wikipedia" selection.

    Returns (doc_id, n_grams, dsir_score_1e3): the per-bucket log10
    ratio is quantized to an integer (floor(1000·log10((t_b+1)(R+B) /
    (r_b+1)(T+B)) + 1e-9)) BEFORE the per-doc sum — the lm.py trick:
    the ratio argument is the correctly-rounded double of the same
    rational in both engines, and integer sums are aggregation-order-
    free. log10 itself is only ~1-ulp accurate (not correctly rounded)
    in either engine, so a bare floor could flip at an integer boundary
    — the structured case being ratios that are exact powers of ten;
    the +1e-9 guard (far above the ~1e-12 cross-engine log error, far
    below the quantization step) pins those, so the score hash-matches
    a DuckDB replay. Higher = more target-like.

    Scale shape: both corpora stream through the shared ``featurize``
    (uni+bigram md5 hashing, no vocabulary state); the bucket ratio
    table is ≤ n_buckets rows — the MODEL — and broadcasts to the raw
    feature stream; one (doc, bucket) aggregate + one broadcast join +
    one per-doc integer sum. The target corpus is read once."""
    # materialize the raw feature stream ONCE (train_perceptron's
    # pattern): the bucket totals, the ratio build, and the probe side
    # of the scoring join have differently-keyed aggregates, so without
    # this the md5 featurize scan — the dominant cost — runs three times
    rf = featurize(raw, n_buckets, text_col, id_col).localCheckpoint()
    rb = rf.groupBy("bucket").agg(F.sum("n").alias("r_n"))
    tb = (
        featurize(target, n_buckets, text_col, id_col)
        .groupBy("bucket").agg(F.sum("n").alias("t_n"))
        .localCheckpoint()  # ≤ n_buckets rows; read twice (totals + join)
    )
    totals_r = rb.agg(F.sum("r_n")).first()[0] or 0
    totals_t = tb.agg(F.sum("t_n")).first()[0] or 0
    ratio = (
        rb.join(tb, "bucket", "full_outer")
        .select(
            "bucket",
            F.floor(
                F.lit(1000.0)
                * F.log10(
                    ((F.coalesce(F.col("t_n"), F.lit(0)) + 1)
                     * F.lit(float(totals_r + n_buckets)))
                    / ((F.coalesce(F.col("r_n"), F.lit(0)) + 1)
                       * F.lit(float(totals_t + n_buckets)))
                )
                + F.lit(1e-9)
            ).alias("lr_1e3"),
        )
    )
    return (
        rf.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("n") * F.col("lr_1e3")).alias("dsir_score_1e3"),
        )
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

    # featurize materializes the word array ONCE in its own projection —
    # referencing a raw split() inside the bigram transform would
    # re-evaluate it per element (the documented O(words^2) trap)
    counts = featurize(df, n_buckets, text_col, id_col)
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
