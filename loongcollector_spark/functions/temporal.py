"""Temporal operators a log/training-data pipeline needs that Spark has
no builtin for: as-of (point-in-time) join and gap-based sessionization.

Both are single-shuffle window plans — the canonical distributed shapes:

* ``asof_join``: enrich each fact row with the most recent dimension
  snapshot at-or-before its timestamp. Implemented as union + last
  (ignorenulls) running window — NOT a range join (a range join
  explodes to |facts| x |snapshots| candidate pairs before filtering;
  the union-window shape shuffles each row exactly once on the key and
  sorts within partitions, which is the floor for as-of semantics).
  DuckDB's native ``ASOF JOIN`` is the oracle.
* ``sessionize``: split each key's event stream into sessions separated
  by more than ``gap_s`` seconds of silence (the classic 30-minute web
  session rule) — lag + running sum over one ordered window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "sessionize"]


def asof_join(facts: DataFrame, snapshots: DataFrame, on: str,
              time_col: str = "ts", how: str = "inner") -> DataFrame:
    """For every fact row, attach the snapshot row with the largest
    ``time_col`` <= the fact's ``time_col`` for the same ``on`` key
    (DuckDB/Presto ASOF JOIN semantics; at equal timestamps the
    snapshot matches). Snapshot value columns come back with their own
    names; ``how="inner"`` drops facts with no preceding snapshot,
    ``how="left"`` keeps them with nulls.

    Plan shape: one exchange on ``on`` for the unioned frame, one
    in-partition sort on (key, time, side) — no range-join candidate
    explosion, no per-key collect. Skewed keys sort-stream; AQE can
    split oversized partitions.
    """
    dim_cols = [c for c in snapshots.columns if c not in (on, time_col)]
    if not dim_cols:
        raise ValueError("snapshots must carry at least one value column")
    fact_cols = [c for c in facts.columns if c not in (on, time_col)]

    lhs = facts.select(
        F.col(on), F.col(time_col),
        F.lit(1).alias("_side"),
        F.struct(*fact_cols).alias("_fact"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{snapshots.schema[c].dataType.simpleString()}"
                for c in dim_cols) + ">"
        ).alias("_dim"),
    )
    rhs = snapshots.select(
        F.col(on), F.col(time_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{facts.schema[c].dataType.simpleString()}"
                for c in fact_cols) + ">"
        ).alias("_fact"),
        F.struct(*dim_cols).alias("_dim"),
    )
    # snapshots sort BEFORE facts at equal timestamps (_side 0 < 1) so
    # an equal-ts snapshot is visible to the fact row
    w = (Window.partitionBy(on).orderBy(time_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = lhs.unionByName(rhs).withColumn(
        "_asof", F.last("_dim", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col("_asof").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r}")
    return out.select(
        F.col(on), F.col(time_col),
        *[F.col(f"_fact.{c}").alias(c) for c in fact_cols],
        *[F.col(f"_asof.{c}").alias(c) for c in dim_cols],
    )


def sessionize(df: DataFrame, key: str = "user_id", time_col: str = "ts",
               gap_s: int = 1800, order_tiebreak: str | None = None)\
        -> DataFrame:
    """Assign every row a per-key session index: a new session starts
    when the gap to the previous event of the same key exceeds
    ``gap_s`` seconds. ``order_tiebreak`` makes the ordering total when
    timestamps can collide (required for a deterministic oracle).

    One exchange on the key, one in-partition sort — lag + running sum,
    all codegen window expressions.
    """
    order = [F.col(time_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # microsecond-exact integer arithmetic (unix_timestamp would
    # truncate to seconds and disagree with an epoch_us oracle on
    # sub-second boundaries); TIMESTAMP_NTZ columns are cast to
    # TIMESTAMP for unix_micros — the gap is a *difference* of two
    # values under the same interpretation, so the session-timezone
    # shift cancels out
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_session = (
        prev_us.isNull() | (us - prev_us > gap_s * 1_000_000)
    ).cast("long")
    return df.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
