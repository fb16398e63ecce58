"""Routing: tag-equality router, regex first-match-wins router, shardhash.

Semantics matched:

* ``Router`` (core/collection_pipeline/route/Router.cpp:50-82): each sink
  has an optional condition; unconditioned sinks receive EVERYTHING; a row
  matching multiple sinks goes to ALL of them (the reference deep-copies on
  fan-out). ``Condition`` is tag equality (Condition.cpp:105-111), here any
  boolean Column; ``DiscardingTag`` drops the tag column on that branch.
* ``aggregator_logstore_router`` (aggregator_router.go:97-111): ordered
  regex rules over SourceKey, FULL match, FIRST match wins, non-match →
  default sink or dropped (DropDisMatch).
* ``aggregator_shardhash`` (aggregator_shardhash.go:157-161):
  ``bucket = xxhash64(concat_ws('_', SourceKeys)) % ShardCount`` — plus the
  skew-salting extension the 10^12-turn posture needs: hot conv_ids get a
  per-turn salt so one conversation can't pin a partition.

Scale design: routing is ONE pass — boolean sink columns are computed on a
single cached upstream frame; every sink write is a filter over that frame
(one scan, N writes — the copy-minimization analog of Router.cpp:60-80
'move to last consumer').
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators.common import anchored

SINK_PREFIX = "_to_"


@dataclass
class SinkRule:
    """One flusher's routing condition.

    kind: 'tag'   → Key == Value equality (Condition.cpp:105-111)
          'expr'  → arbitrary SQL boolean expression string
          'always'→ unconditioned flusher (receives everything)
    """

    name: str
    kind: str = "always"
    key: str | None = None
    value: str | None = None
    expr: str | None = None
    discarding_tag: bool = False

    def condition(self) -> Column:
        if self.kind == "always":
            return F.lit(True)
        if self.kind == "tag":
            return F.col(self.key).isNotNull() & (
                F.col(self.key).cast("string") == F.lit(self.value)
            )
        if self.kind == "expr":
            return F.expr(self.expr)
        raise ValueError(f"unknown sink rule kind {self.kind!r}")


def apply_router(df: DataFrame, rules: list[SinkRule]) -> DataFrame:
    """Stamp one boolean column per sink (``_to_<name>``) on the frame.

    The multi-sink copy fan-out becomes: a row with k true sink bits is
    written k times — by k filtered writes over one cached frame, never by
    k scans of the source.
    """
    for r in rules:
        df = df.withColumn(SINK_PREFIX + r.name, r.condition())
    return df


def sink_frame(routed: DataFrame, rule: SinkRule, all_rules: list[SinkRule]) -> DataFrame:
    """The branch DataFrame for one sink: filter on its bit, drop all
    internal routing bits, apply DiscardingTag."""
    out = routed.filter(F.col(SINK_PREFIX + rule.name))
    out = out.drop(*[SINK_PREFIX + r.name for r in all_rules])
    if rule.discarding_tag and rule.key and rule.key in out.columns:
        out = out.drop(rule.key)
    return out


def logstore_router_column(
    source_key: str,
    rules: list[tuple[str, str]],
    default: str | None = "default",
) -> Column:
    """Ordered (regex, sink) rules → one sink-name column; full-match,
    first-match-wins (aggregator_router.go:97-111). default=None means
    DropDisMatch (caller filters nulls)."""
    expr = None
    c = F.col(source_key).cast("string")
    for rx, sink in rules:
        cond = c.isNotNull() & c.rlike(anchored(rx))
        expr = F.when(cond, sink) if expr is None else expr.when(cond, sink)
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default)) if default is not None else expr


def shardhash_bucket(source_keys: list[str], shard_count: int = 32,
                     connector: str = "_") -> Column:
    """bucket = xxhash64(join(keys, '_')) mod shard_count
    (aggregator_shardhash.go:157-161). shard_count ≤ 512, power of two
    in the reference; we only require > 0."""
    joined = F.concat_ws(connector, *[F.col(k).cast("string") for k in source_keys])
    return F.pmod(F.xxhash64(joined), F.lit(shard_count)).cast("int")


def salted_repartition(
    df: DataFrame,
    key: str = "conv_id",
    num_partitions: int | None = None,
    salt_mod: int = 16,
    order_within: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """THE one shuffle of the pipeline.

    Partition by (conv_id, salt) where salt = xxhash64(turn_idx) % salt_mod
    — a hot conversation (30% of all turns in the skew fixture) spreads
    over ``salt_mod`` partitions instead of pinning one executor, the
    explicit-salting requirement of the north star (AQE fixes skewed joins,
    not skewed writes). Rows are then sorted within partitions to restore
    the stable (conv_id, turn_idx) ordering contract.
    """
    # salt from the within-key order columns (turn_idx in the transcript
    # schema) so a hot key spreads deterministically; hardcoding turn_idx
    # would break any caller using the advertised key/order_within params
    salt_cols = [c for c in order_within if c != key] or [key]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_mod))
    args = [F.col(key), salt]
    out = (
        df.repartition(num_partitions, *args)
        if num_partitions
        else df.repartition(*args)
    )
    return out.sortWithinPartitions(*order_within)
