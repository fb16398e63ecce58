"""Filter operators.

The reference's filters are regex full-matches over field values composed
with And/Or/Not; Spark-side they're one boolean Column — Catalyst pushes
them down to the scan when they reference scan columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from loongcollector_spark.operators import register
from loongcollector_spark.operators.common import anchored


def _leaf(key: str, rx: str) -> Column:
    # full-match semantics: ProcessorFilterNative 'match the whole value'
    return F.col(key).isNotNull() & F.col(key).cast("string").rlike(anchored(rx))


def compile_condition(node: dict) -> Column:
    """EXPRESSION-mode AST (ProcessorFilterNative.h:28-146):
    ``{"operator": "and"|"or"|"not", "operands": [...]}`` over leaves
    ``{"key": .., "exp": ..}``."""
    if "key" in node:
        return _leaf(node["key"], node["exp"])
    op = node["operator"].lower()
    subs = [compile_condition(n) for n in node["operands"]]
    if op == "and":
        out = subs[0]
        for s in subs[1:]:
            out = out & s
        return out
    if op == "or":
        out = subs[0]
        for s in subs[1:]:
            out = out | s
        return out
    if op == "not":
        return ~subs[0]
    raise ValueError(f"unknown operator {op!r}")


@register("processor_filter", keys={"ConditionExp", "Include", "DiscardingNonUTF8"})
def filter_native(cfg: dict):
    """3 modes (ProcessorFilterNative.cpp:66-144): EXPRESSION
    (ConditionExp AST), RULE (Include map key→regex, ANDed full matches),
    BYPASS (keep everything). ``DiscardingNonUTF8``
    (ProcessorFilterNative.h:28-146) drops rows whose string columns are
    not valid UTF-8: Spark strings are always valid UTF-16 internally, so
    the byte-level check is encode→decode stability — a string that came
    from invalid bytes carries U+FFFD replacement chars, the decode
    round-trip of which is the identity, so we test for U+FFFD directly
    (the marker Spark's CSV/text readers emit for undecodable bytes)."""
    cond_exp = cfg.get("ConditionExp")
    include = cfg.get("Include")
    drop_non_utf8 = cfg.get("DiscardingNonUTF8", False)

    def run(df: DataFrame) -> DataFrame:
        if drop_non_utf8:
            for c, typ in df.dtypes:
                if typ == "string":
                    df = df.filter(
                        F.col(c).isNull() | ~F.col(c).contains("�")
                    )
        if cond_exp:
            return df.filter(compile_condition(cond_exp))
        if include:
            cond = F.lit(True)
            for k, rx in include.items():
                cond = cond & _leaf(k, rx)
            return df.filter(cond)
        return df  # BYPASS

    return run


@register("processor_filter_regex", keys={"Include", "Exclude"})
def filter_regex(cfg: dict):
    """Keep iff all Include[k]~v full-match AND no Exclude[k]~v matches
    (processor_filter_regex.go:33-41, 82, 101)."""
    include = cfg.get("Include", {})
    exclude = cfg.get("Exclude", {})

    def run(df):
        cond = F.lit(True)
        for k, rx in include.items():
            cond = cond & _leaf(k, rx)
        for k, rx in exclude.items():
            cond = cond & ~(F.col(k).isNotNull() & F.col(k).cast("string").rlike(anchored(rx)))
        return df.filter(cond)

    return run


@register("processor_filter_key_regex", keys={"Include"})
def filter_key_regex(cfg: dict):
    """Filter on key NAMES (processor_filter_key_regex.go:28). With a fixed
    schema this is a plan-time projection: keep rows only if the schema has
    a column matching every Include regex — schema-level, so it either
    passes everything or nothing; honored at plan time."""
    import re as _re

    include = cfg.get("Include", [])

    def run(df):
        for rx in include:
            if not any(_re.fullmatch(rx, c) for c in df.columns):
                return df.limit(0)
        return df

    return run


@register("processor_timestamp_filter", keys={"SourceKey", "LowerBound", "UpperBound"})
def timestamp_filter(cfg: dict):
    """Keep events with time ∈ [LowerBound, UpperBound]
    (ProcessorTimestampFilterNative.cpp:36-119)."""
    key = cfg.get("SourceKey", "ts")
    lo = cfg.get("LowerBound")
    hi = cfg.get("UpperBound")

    def run(df):
        c = F.col(key)
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (c <= F.lit(hi).cast("timestamp"))
        return df.filter(cond)

    return run
