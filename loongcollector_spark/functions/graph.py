"""Graph analytics over log-derived edge lists — integer-exact PageRank.

PageRank (Brin & Page 1998) over a weighted transition graph (e.g. the
tool-handoff edges of agent transcripts). Floating-point PageRank sums
are aggregation-order-dependent; this variant quantizes at every step —
per-edge contribution = (p_src · w) DIV out_src, per-node update =
base + (damping · Σ) DIV 1000, all in exact integer arithmetic — so the
result is independent of partitioning/aggregation order and a DuckDB
oracle replays the iterations to equality (the train_perceptron / lm.py
pattern applied to an iterative graph algorithm).

Scale shape: the edge list (with per-source out-weights) is the big
frame, materialized once; each round is one join of the current rank
frame against it keyed on the source plus one per-destination
aggregate — the standard edge-cut iteration, O(E) rows shuffled per
round, ranks localCheckpointed so round N's plan never replays rounds
1..N-1. Dangling nodes (no out-edges) leak their mass, the common
simplification — documented, and replayed identically by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MASS = 1_000_000  # rank unit: micro-mass per node


def pagerank_int(edges: DataFrame, iters: int = 3,
                 damping_milli: int = 850,
                 src: str = "src", dst: str = "dst",
                 weight: str = "c") -> DataFrame:
    """(node, rank_micro) after ``iters`` quantized PageRank rounds from
    a uniform start of ``MASS`` per node."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    out = edges.groupBy(src).agg(F.sum(weight).alias("_out"))
    e = (
        edges.join(out, src)
        .select(F.col(src).alias("_s"), F.col(dst).alias("_d"),
                F.col(weight).alias("_w"), "_out")
        .localCheckpoint()
    )
    base = (1000 - damping_milli) * MASS // 1000
    p = nodes.select("node", F.lit(MASS).cast("long").alias("rank_micro"))
    for _ in range(iters):
        contrib = (
            e.join(p.withColumnRenamed("node", "_s"), "_s")
            .select(
                F.col("_d").alias("node"),
                F.expr("(rank_micro * _w) DIV _out").alias("_ct"),
            )
        )
        s = contrib.groupBy("node").agg(F.sum("_ct").alias("_sum"))
        p = (
            nodes.join(s, "node", "left")
            .select(
                "node",
                (F.lit(base)
                 + F.expr(f"({damping_milli} * coalesce(_sum, 0)) DIV 1000")
                 ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint()
        )
    return p
