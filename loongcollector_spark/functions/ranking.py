"""Corpus relevance scoring: BM25 query search and per-document TF-IDF
top terms — the ranking layer a training-data/search pipeline puts on
top of the documents table.

Scale shape: corpus statistics (N, average length) come from ONE
aggregate over un-exploded docs; the token explode for a BM25 query is
filtered to the query's terms BEFORE the (doc, term) shuffle, so the
exchange carries a few rows per matching doc, never the token stream.
TF-IDF top-terms necessarily aggregates the full (term) domain — one
partial-aggregating shuffle of (term, doc) counts, the same floor as
the dedup family's gram statistics.

Scores are emitted quantized (round(score * 1000) as BIGINT) so an
independent SQL engine reproduces them bit-exactly; ranking ties break
on the quantized score then term/doc id, keeping row_number stable
across engines.

Formulas (Robertson/Sparck Jones BM25, the standard public form):
  idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
  tfc(t, d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len_d / avg_len))
  score     = Σ_{t ∈ query} idf(t) * tfc(t, d)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_search", "tfidf_top_terms"]

_TOKEN_SPLIT = r"\s+"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    words = F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
    return (
        df.select(id_col, F.explode(words).alias("term"))
        .filter(F.col("term") != "")
    )


def _doc_lengths(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    words = F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
    n = F.size(F.filter(words, lambda w: w != ""))
    return df.select(id_col, n.cast("double").alias("dl"))


def bm25_search(df: DataFrame, query_terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Score every document containing at least one query term.

    Returns (id, n_terms_matched, score_milli) — score quantized to
    integer thousandths. The token explode filters to ``query_terms``
    immediately (codegen IN over the exploded term), so the (doc, term)
    aggregate shuffles only matching tokens; corpus stats N / avg_len
    are one scan with no explode, broadcast as a 1-row frame.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = [t.lower() for t in query_terms]
    lens = _doc_lengths(df, text_col, id_col)
    stats = lens.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
    )
    tf = (
        _tokens(df, text_col, id_col)
        .filter(F.col("term").isin(q))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.countDistinct(id_col).cast("double").alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .join(lens, id_col)
        .withColumn(
            "_s",
            idf * F.col("tf") * (k1 + 1)
            / (F.col("tf")
               + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.round(F.sum("_s") * 1000).cast("long").alias("score_milli"),
        )
    )


def tfidf_top_terms(df: DataFrame, top_k: int = 3,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The ``top_k`` highest-TF-IDF terms per document (plain
    tf * ln(N/df) — the smoothed-idf variant every vectorizer defaults
    to), ranked by quantized score then term so the order is total and
    engine-independent. Returns (id, rank, term, tfidf_milli)."""
    toks = _tokens(df, text_col, id_col)
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf"))
    # N as a broadcast 1-row frame, not a driver-side count() at plan
    # build — the whole computation stays one lazy plan
    n_docs = df.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(
        F.countDistinct(id_col).cast("double").alias("df"))
    # dfreq spans the FULL term vocabulary — unbounded at corpus scale
    # (unlike bm25_search's, which is capped at |query_terms|), so no
    # broadcast hint: the join stays keyed on term (AQE still converts
    # to broadcast at runtime when the table is actually small)
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf_milli",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
                    * 1000).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_milli").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "rank", "term", "tfidf_milli")
    )
