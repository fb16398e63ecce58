"""Event splitting & multiline merging.

* split: 1 log → N logs (processor_split_log_string /
  ProcessorSplitLogStringNative) — ``posexplode(split(...))`` keeps
  relative line order (the reference's file-offset metadata analog).
* merge: N logs → 1 (ProcessorMergeMultilineLogNative BY_REGEX; and the
  transcript-specific conversation merge) — sessionization via a windowed
  cumulative-sum group id, then ``collect_list`` ordered by the stable
  sort key. This is the lag/cumsum pattern, shuffle-partitioned on the
  session key only.
"""

from __future__ import annotations

import re

from pyspark.sql import Window, functions as F

from loongcollector_spark.operators import register
from loongcollector_spark.operators.common import PARSE_OK


@register("processor_split_log_string", keys={"SourceKey", "SplitChar", "KeepingEmptyLines"})
def split_log_string(cfg: dict):
    """Split one event into N on SplitChar (default newline)
    (ProcessorSplitLogStringNative.cpp:42-74). Emits ``line_idx`` — the
    within-event order column standing in for the reference's file-offset
    metadata (cpp:169)."""
    src = cfg.get("SourceKey", "text")
    split_char = cfg.get("SplitChar", "\n")
    keep_empty = cfg.get("KeepingEmptyLines", False)

    def run(df):
        parts = F.split(F.col(src), re.escape(split_char))
        others = [c for c in df.columns if c != src]
        out = df.select(*others, F.posexplode(parts).alias("line_idx", src))
        if not keep_empty:
            out = out.filter(F.col(src) != "")
        return out

    return run


@register("processor_split_log_regex",
          keys={"SourceKey", "SplitKey", "SplitRegex", "OrderKeys",
                "PreserveOthers", "NoKeyError", "EnableLogPositionMeta"})
def split_log_regex(cfg: dict):
    """1 log → N logs split where SplitRegex matches line starts
    (split_log_regex.go:27-35): split the blob on newlines, then merge
    lines that do NOT start a new record back onto the previous one —
    the start-regex multiline state machine, expressed as a cumulative-sum
    group id over the exploded lines (no Python state).

    ``SplitKey`` is the Go name for the source field; ``PreserveOthers``
    copies the original log's other fields onto every split log (they
    are constant within a source row, so ``first()`` per group is
    exact). ``EnableLogPositionMeta`` is accepted (file offset meta is
    the provenance pair input_file already attaches)."""
    src = cfg.get("SplitKey") or cfg.get("SourceKey", "text")
    start_rx = cfg["SplitRegex"]
    order_cols = cfg.get("OrderKeys", ["conv_id", "turn_idx"])
    preserve = cfg.get("PreserveOthers", False)

    def run(df):
        others = [c for c in df.columns if c != src]
        order = [c for c in order_cols if c in df.columns] or others
        lines = df.select(
            *others, F.posexplode(F.split(F.col(src), "\n")).alias("line_idx", src)
        )
        w = Window.partitionBy(*order).orderBy("line_idx")
        # Go fullMatch (split_log_regex.go:52-55): the WHOLE line must
        # match (rst[0]==0 && rst[1]==len) — anchor both ends
        starts = F.col(src).rlike("^(?:" + start_rx + ")$")
        gid = F.sum(F.when(starts, 1).otherwise(0)).over(w)
        extra = [
            F.first(c).alias(c) for c in others
            if preserve and c not in order
        ]
        merged = (
            lines.withColumn("_gid", gid)
            .groupBy(*order, "_gid")
            .agg(
                F.concat_ws(
                    "\n", F.transform(F.array_sort(
                        F.collect_list(F.struct("line_idx", src))
                    ), lambda s: s[src])
                ).alias(src),
                F.min("line_idx").alias("line_idx"),
                *extra,
            )
            .drop("_gid")
        )
        if not preserve:
            merged = merged.select(*order, src, "line_idx")
        return merged

    return run


@register("processor_merge_conversation", keys={"Joiner", "GroupKey", "OrderKey", "SourceKey"})
def merge_conversation(cfg: dict):
    """Transcript-native analog of processor_merge_multiline_log_native:
    merge all turns of a conversation into one document, text joined in
    stable (turn_idx) order — ``sort_array(collect_list(struct(...)))``
    guarantees the ordering contract regardless of partitioning
    (the reference guarantees per-file order; ours is per-conv order)."""
    joiner = cfg.get("Joiner", "\n")
    group_key = cfg.get("GroupKey", "conv_id")
    order_key = cfg.get("OrderKey", "turn_idx")
    src = cfg.get("SourceKey", "text")

    def run(df):
        return df.groupBy(group_key).agg(
            F.concat_ws(
                joiner,
                F.transform(
                    F.array_sort(F.collect_list(F.struct(order_key, src))),
                    lambda s: s[src],
                ),
            ).alias("merged_text"),
            F.count("*").alias("n_turns"),
            F.min("ts").alias("ts_first"),
            F.max("ts").alias("ts_last"),
        )

    return run
