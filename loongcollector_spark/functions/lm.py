"""CCNet-style language-model quality filtering (Wenzek et al. 2020,
arXiv:1911.00359): score every document by the perplexity of a small
n-gram LM and gate on it — the classic "does this read like language"
filter of web-scale training-data pipelines (CCNet uses a KenLM 5-gram;
here a word-bigram model with add-one smoothing, trained ON the corpus
itself, stands in with the same pipeline shape).

Spark shape (all codegen, no Python on the data path):
  1. tokenize: one projection (lower + regex split);
  2. TRAIN: bigram and context counts — two partial-aggregated shuffles
     keyed on (w1, w2) / w1, plus one scalar distinct-vocab agg;
  3. SCORE: join each document's bigrams to the counts and average.

At test scale the count tables broadcast; at 100 TB the LM is trained
once, written as a table bucketed by its key, and scoring is a
bucket-co-located join — the plan here keeps the join keyed on the
bigram so that swap is a storage decision, not a rewrite.

Hash-oracle trick: floating-point SUMS are aggregation-order-dependent,
so the per-bigram log-probability is quantized to an INTEGER
(floor(1000*log10 p)) BEFORE summing — integer sums are order-free, and
each p is the correctly-rounded double of the same rational in both
engines, so the quantized score matches DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _doc_bigrams(df: DataFrame, text_col: str):
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    docs = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select("doc_id", words.alias("words"))
        .filter(F.size("words") >= 2)
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("words") - 1),
        lambda i: F.struct(
            F.element_at("words", i).alias("w1"),
            F.element_at("words", i + 1).alias("w2"),
        ),
    )
    return docs.select("doc_id", F.explode(pairs).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_lm_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quantized bigram log10-probability average.

    Returns (doc_id, n_bigrams, lm_score_1e3) where lm_score_1e3 =
    floor(avg over bigrams of floor(1000 * log10((c2+1)/(c1+V)) + 1e-9))
    — closer to 0 reads more like the corpus; a quality gate keeps
    documents above a threshold (CCNet's head/middle/tail split). The
    +1e-9 inside the inner floor guards the quantization against the
    ~1-ulp cross-engine log10 difference (JVM vs libm): without it an
    exact-power-of-ten probability ratio could floor differently in the
    DuckDB oracle and flip the hash.
    """
    # materialize the exploded (doc, w1, w2) frame ONCE: c2, c1 and the
    # probe side of the score join all consume it, and their exchanges
    # differ in key so Catalyst cannot reuse one — without this the
    # scan+split+sequence+explode subtree (the most expensive projection
    # here) runs three times (same trap ngram_hash_frame documents)
    bg = _doc_bigrams(df, text_col).localCheckpoint(eager=False)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("n1"))
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    vocab = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(words).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    li = F.floor(
        F.lit(1000.0)
        * F.log10((F.col("n2") + F.lit(1.0))
                  / (F.col("n1") + F.col("v").cast("double")))
        + F.lit(1e-9)
    )
    scored = (
        bg.join(c2, ["w1", "w2"])      # keyed on the bigram: bucket-able
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))  # one scalar
        .select("doc_id", li.alias("li"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.floor(F.avg("li")).alias("lm_score_1e3"),
    )
