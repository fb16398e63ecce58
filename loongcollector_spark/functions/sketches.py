"""Deterministic distinct-count sketching — KMV / bottom-k (Bayer &
Haas lineage; Beyer et al., SIGMOD'07 "On synopses for distinct-value
estimation"): keep the k minimum hash values of a column per group and
estimate |distinct| = (k-1) / kth_min_fraction.

Why KMV here instead of Spark's built-in HLL (approx_count_distinct):
the KMV estimator is a PURE function of the data — md5 order is
engine-independent — so the estimate is exactly reproducible in DuckDB
and hash-checkable by the correctness gate, while HLL sketches are
implementation-specific blobs no oracle can replay. Same O(k) state per
group, same mergeability story (union of bottom-k sets = bottom-k of
union), which is what a 100 TB rollup needs: per-partition partial
bottom-k, one merge per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 12 hex digits: fractions live in [0, 16^12); (k-1)*16^12 stays far
# inside BIGINT for any practical k (but EXCEEDS 2^53 for k=64, so the
# division must be true integer `div`, not `/` — both Spark and DuckDB
# route `/` through double and would lose low bits). The kth hash is
# clamped to >= 1: an all-zero 12-hex prefix (probability 16^-12 per
# value, but possible) would otherwise divide by zero and null the
# estimate.
_HASH_SPACE = 16 ** 12


def kmv_distinct(df: DataFrame, group_cols, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group KMV distinct estimate: ``(group_cols..., n_rows,
    n_hashes, kmv_estimate)``. ``kmv_estimate`` is exact (= n_hashes)
    when a group holds fewer than ``k`` distinct values, else
    floor((k-1) · 16^12 / kth_min_hash).

    Plan: one distinct over (group, 12-hex md5 prefix) — map-side
    combinable — then one rank window per group ordered by the hash
    (the distributed bottom-k), then a per-group aggregate. The rank
    sort carries (group, 12-byte hash) rows only, never values."""
    group_cols = list(group_cols)
    h = F.substring(F.md5(F.col(value_col).cast("string").cast("binary")),
                    1, 12)
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("_h"))
        .distinct()
    )
    rn = F.row_number().over(
        Window.partitionBy(*group_cols).orderBy("_h"))
    bottom = hashes.withColumn("_rn", rn).filter(F.col("_rn") <= k)
    kth = F.max(F.when(F.col("_rn") == k, F.col("_h")))
    counts = df.filter(F.col(value_col).isNotNull()).groupBy(
        *group_cols).agg(F.count("*").alias("n_rows"))
    num = (k - 1) * _HASH_SPACE
    sk = (
        bottom.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_hashes"),
            F.conv(kth, 16, 10).cast("long").alias("_kth"),
        )
        .select(
            *group_cols,
            "n_hashes",
            F.when(F.col("n_hashes") < k, F.col("n_hashes"))
            .otherwise(F.expr(f"{num}L div greatest(_kth, 1L)"))
            .alias("kmv_estimate"),
        )
    )
    return counts.join(sk, group_cols)
