"""Deduplication primitives for training-data pipelines.

* exact: hash-groupBy on a normalized fingerprint — one shuffle on the
  16-byte hash, the canonical 100 TB exact-dedup plan;
* MinHash + LSH: shingle → k portable hashes (md5, engine-reproducible)
  → band buckets → equality self-join on (band, band_idx). At scale the
  join shuffles only (doc_id, band) pairs, never text;
* SimHash: 64-bit near-dup signature via an Arrow-vectorized pandas UDF
  (bit-level majority vote isn't expressible as a cheap SQL expression);
* n-gram Jaccard: set-similarity over distinct word arrays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from loongcollector_spark.functions.text import with_fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: (fp, canonical_doc_id, n_dups).
    Keep-min-id is the deterministic survivor rule."""
    return (
        with_fingerprint(df, text_col)
        .groupBy(F.col("fingerprint").alias("fp"))
        .agg(
            F.min(id_col).alias(f"canonical_{id_col}"),
            F.count("*").alias("n_dups"),
        )
    )


def _shingles(text_col: str, shingle: int):
    """Word-shingle array. IMPORTANT: evaluate on a frame where the word
    array is already a materialized column (see _with_shingles) — a raw
    split() expression captured inside the transform lambda is re-evaluated
    per shingle (O(words²) per document, measured 10x slower)."""
    words = F.col("_words")
    n = F.size(words)
    return F.when(
        n >= shingle,
        F.transform(
            F.sequence(F.lit(1), n - shingle + 1),
            lambda i: F.array_join(F.slice(words, i, shingle), " "),
        ),
    ).otherwise(F.array(F.array_join(words, " ")))


def _with_shingles(df: DataFrame, text_col: str, shingle: int,
                   id_col: str) -> DataFrame:
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.select(id_col, words.alias("_words"))
        .select(id_col, _shingles(text_col, shingle).alias("_shingles"))
    )


def minhash_signatures(
    df: DataFrame, n_hashes: int = 4, shingle: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """One-permutation-style MinHash: each shingle is md5-hashed ONCE and
    the k signature rows take the min over k disjoint 8-hex-char windows
    of that digest (k ≤ 4). Portable (DuckDB reproduces it byte-equal) and
    4x fewer hash calls than per-salt hashing — higher-order-function
    lambdas are interpreted, not codegen, so the md5 count is the cost."""
    assert n_hashes <= 4, "one md5 digest yields 4 independent 8-char windows"
    shingled = _with_shingles(df, text_col, shingle, id_col)
    digests = F.transform(F.col("_shingles"), lambda s: F.md5(s.cast("binary")))
    out = shingled.select(id_col, digests.alias("_digests"))
    def window(i):
        # NOTE: the transform lambda must take exactly ONE parameter — a
        # second parameter (even a defaulted one) makes Spark pass the
        # array index into it
        return lambda d: F.substring(d, 8 * i + 1, 8)

    for i in range(n_hashes):
        out = out.withColumn(
            f"mh{i}", F.array_min(F.transform(F.col("_digests"), window(i)))
        )
    return out.drop("_digests")


def minhash_lsh_pairs(
    df: DataFrame, n_hashes: int = 4, shingle: int = 3, bands: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: hash rows of the signature into ``bands``
    buckets; docs sharing any band bucket are candidates.

    Scale shape: explode to (doc_id, band_idx, band_hash), self-join on
    the 16-byte hash — the shuffle carries ids + hashes only.
    """
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, n_hashes, shingle, text_col, id_col)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat(*parts).cast("binary")).alias("band"))
        )
    exploded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("b")
    ).select(id_col, "b.band_idx", "b.band")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens — Arrow-vectorized pandas UDF
    (per-batch numpy bit matrix, no per-row Python in the hot loop)."""
    import hashlib

    import numpy as np

    @pandas_udf("long")
    def simhash(s: pd.Series) -> pd.Series:
        out = np.zeros(len(s), dtype=np.int64)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for row_i, text in enumerate(s):
            if not text:
                continue
            # one numpy pass per doc: concat all word digests, unpack to a
            # (n_words, 64) bit matrix, majority-vote per bit column
            digests = b"".join(
                hashlib.md5(w.encode()).digest()[:8] for w in text.split()
            )
            bits = np.unpackbits(
                np.frombuffer(digests, dtype=np.uint8).reshape(-1, 8),
                axis=1, bitorder="big",
            )
            n_words = bits.shape[0]
            # column j of the big-endian bit matrix is bit (63-j) of the
            # uint64 value h: votes[j] > n/2  <=>  bit (63-j) majority-set
            votes = bits.sum(axis=0)
            set_bits = votes * 2 > n_words
            sig = np.uint64(weights[63 - np.arange(64)][set_bits].sum(dtype=np.uint64))
            out[row_i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.select(id_col, simhash(F.col(text_col)).alias("simhash64"))


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ k: block on 16-bit
    chunks (a pair within hamming 3 of 4 chunks shares ≥1 exact chunk —
    pigeonhole), then verify with bit_count. Join carries ids + chunks."""
    sig = simhash_signatures(df, text_col, id_col)
    chunks = sig.select(
        id_col, "simhash64",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk_idx"),
                    F.shiftright("simhash64", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select(id_col, "simhash64", "c.chunk_idx", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash64").alias("sig_a"),
            F.col("b.simhash64").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


def ngram_jaccard_adjacent(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Word-set Jaccard between (doc_id, doc_id+1) pairs — the oracle-
    checkable slice of pairwise n-gram similarity (integer ‰)."""
    w = df.select(
        id_col, F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+")).alias("words")
    )
    a, b = w.alias("a"), w.alias("b")
    inter = F.size(F.array_intersect(F.col("a.words"), F.col("b.words")))
    union = F.size(F.array_union(F.col("a.words"), F.col("b.words")))
    return (
        a.join(b, F.col(f"b.{id_col}") == F.col(f"a.{id_col}") + 1)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.floor(1000.0 * inter / union).cast("int").alias("jaccard_1e3"),
        )
    )
