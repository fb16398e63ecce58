"""Temporal operators a log/training-data pipeline needs that Spark has
no builtin for: as-of (point-in-time) join, gap-based sessionization,
bucketed interval (range) join, time-bucket rollup, and gap-fill with
last-observation-carried-forward.

All are bounded-shuffle plans — the canonical distributed shapes:

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

__all__ = ["asof_join", "sessionize", "range_join", "rollup_time_bucket",
           "gapfill_locf"]


def _us(col):
    """Microseconds since epoch as BIGINT; TIMESTAMP_NTZ is interpreted
    in the session timezone (UTC everywhere in this repo)."""
    return F.unix_micros(col.cast("timestamp"))


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
    clash = set(fact_cols) & set(dim_cols)
    if clash:
        raise ValueError(
            f"fact/snapshot value columns collide: {sorted(clash)}; "
            "rename one side before asof_join")

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
    # an equal-ts snapshot is visible to the fact row; _dim breaks ties
    # BETWEEN snapshots sharing a timestamp (struct compare, greatest
    # value wins) — without it which duplicate snapshot attaches would
    # vary with shuffle arrival order run to run
    w = (Window.partitionBy(on).orderBy(time_col, "_side", "_dim")
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


def range_join(facts: DataFrame, intervals: DataFrame,
               time_col: str = "ts", start_col: str = "t_start",
               end_col: str = "t_end", bucket_s: int = 3600,
               broadcast_intervals: bool = True) -> DataFrame:
    """Join each fact row to every interval row with
    ``start_col <= fact.time_col < end_col`` (half-open, the telemetry
    convention) — WITHOUT the nested-loop join Spark plans for a raw
    inequality predicate.

    Plan shape: intervals explode to the fixed-width time buckets they
    overlap (``sequence`` + ``explode``, all codegen), facts compute
    their single bucket, and the match becomes a bucket EQUI-join with
    the range predicate as a cheap residual. Each (fact, interval) pair
    meets in exactly one bucket — the fact's own — so no post-join
    dedup is needed. With ``broadcast_intervals`` (the common case:
    maintenance windows / deploy markers / experiment arms are tiny
    next to the fact stream) the facts NEVER shuffle; otherwise both
    sides hash-partition on the bucket id, and ``bucket_s`` is the skew
    knob: it should be sized so a bucket holds a bounded slice of the
    fact stream.

    Column names must be disjoint (only the join plumbing is renamed
    internally); intervals keep their start/end columns in the output.
    """
    overlap = set(facts.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"facts/intervals column collision: {sorted(overlap)}")
    bucket_us = bucket_s * 1_000_000
    iv = intervals.filter(
        # empty/inverted intervals match nothing; dropping them up front
        # also keeps sequence() ascending (sequence(a, b) with b < a
        # generates a DESCENDING range — phantom buckets, not an error)
        F.col(start_col) < F.col(end_col)
    ).withColumn(
        "_bkt",
        F.explode(F.sequence(
            F.floor(_us(F.col(start_col)) / bucket_us),
            # end is EXCLUSIVE: the last covered instant is end - 1us
            F.floor((_us(F.col(end_col)) - 1) / bucket_us),
        )),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    fx = facts.withColumn("_bkt", F.floor(_us(F.col(time_col)) / bucket_us))
    return (
        fx.join(iv, ["_bkt"])
        .filter((F.col(start_col) <= F.col(time_col))
                & (F.col(time_col) < F.col(end_col)))
        .drop("_bkt")
    )


def rollup_time_bucket(df: DataFrame, key: str, time_col: str,
                       value_col: str, bucket_s: int,
                       tiebreak: str | None = None) -> DataFrame:
    """Hypertable-style downsampling: one candlestick row per
    (key, fixed-width time bucket) — count / min / max / sum plus
    first and last value in time order (``min_by``/``max_by`` on the
    event time, optionally made total with ``tiebreak``).

    One partial-aggregating shuffle on (key, bucket); the continuous
    rollup a 100 TB telemetry table is stored as. ``bucket_ts`` is the
    bucket's start instant (TIMESTAMP_NTZ, UTC session semantics).
    """
    bucket_us = bucket_s * 1_000_000
    bkt = F.floor(_us(F.col(time_col)) / bucket_us)
    order = (F.struct(F.col(time_col), F.col(tiebreak)) if tiebreak
             else F.col(time_col))
    v = F.col(value_col)
    return (
        df.groupBy(F.col(key), bkt.alias("_bkt"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.sum(v).alias("v_sum"),
            F.min_by(v, order).alias("v_first"),
            F.max_by(v, order).alias("v_last"),
        )
        .withColumn(
            "bucket_ts",
            F.timestamp_micros(F.col("_bkt") * bucket_us)
            .cast("timestamp_ntz"),
        )
        .drop("_bkt")
    )


def gapfill_locf(df: DataFrame, key: str, time_col: str, value_col: str,
                 bucket_s: int) -> DataFrame:
    """Dense per-key time series: every bucket between a key's first and
    last observation gets a row; empty buckets carry the last observed
    value forward (LOCF — the standard telemetry gap-fill).

    Shape: one (key, bucket) aggregate shuffle; the per-key bucket grid
    comes from a second key-level aggregate whose ``sequence`` +
    ``explode`` generates grid rows (bounded by time-range/bucket_s per
    key, never by row count); a left join pins actuals onto the grid
    and one ordered window carries values forward. No driver-side
    loops, no per-row Python.
    """
    bucket_us = bucket_s * 1_000_000
    bkt = F.floor(_us(F.col(time_col)) / bucket_us)
    actual = (
        df.groupBy(F.col(key), bkt.alias("_bkt"))
        .agg(F.count("*").alias("n_events"),
             F.max_by(F.col(value_col), F.col(time_col)).alias("_v_last"))
    )
    grid = (
        df.groupBy(key)
        .agg(F.min(bkt).alias("_b0"), F.max(bkt).alias("_b1"))
        .select(key, F.explode(F.sequence("_b0", "_b1")).alias("_bkt"))
    )
    w = (Window.partitionBy(key).orderBy("_bkt")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(actual, [key, "_bkt"], "left")
        .select(
            F.col(key),
            F.timestamp_micros(F.col("_bkt") * bucket_us)
            .cast("timestamp_ntz").alias("bucket_ts"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("_v_last", ignorenulls=True).over(w).alias("value_locf"),
        )
    )
