"""Conditional field manipulation — the switch-case processor.

Reference: plugins/processor/fieldswithcondition/
processor_fields_with_condition.go:31-74 — ordered ``Switch`` of cases;
each case has a ``Condition`` (``LogicalOperator`` and|or over
``FieldConditions`` with ``ComparisonOperator`` equals|regexp|contains|
startwith) and ``Actions`` (add_fields / drop). FIRST matching case wins;
``DropIfNotMatchCondition`` discards rows no case matched.

Spark: one when().when()...) priority chain per produced column — the
coalesce-cascade that preserves case order, fully codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from loongcollector_spark.operators import register
from loongcollector_spark.operators.common import anchored


def _field_cond(key: str, op: str, value: str) -> Column:
    c = F.col(key).cast("string")
    if op == "equals":
        return c == F.lit(value)
    if op == "regexp":
        return c.rlike(anchored(value))
    if op == "contains":
        return c.contains(value)
    if op == "startwith":
        return c.startswith(value)
    raise ValueError(f"unknown ComparisonOperator {op!r}")


def compile_case_condition(cond: dict) -> Column:
    logic = cond.get("LogicalOperator", "and").lower()
    parts = [
        _field_cond(fc["Key"], fc.get("ComparisonOperator", "equals"), fc["Value"])
        for fc in cond["FieldConditions"]
    ]
    out = parts[0]
    for p in parts[1:]:
        out = (out & p) if logic == "and" else (out | p)
    return out


@register("processor_fields_with_condition", keys={"Switch", "DropIfNotMatchCondition"})
def fields_with_condition(cfg: dict):
    switch = cfg["Switch"]
    drop_no_match = cfg.get("DropIfNotMatchCondition", False)

    conds = [compile_case_condition(case["Condition"]) for case in switch]

    def run(df):
        # 'first match wins': matched_idx = when(c0,0).when(c1,1)...
        matched = None
        for i, c in enumerate(conds):
            matched = F.when(c, i) if matched is None else matched.when(c, i)
        df = df.withColumn("_case_idx", matched)
        if drop_no_match:
            df = df.filter(F.col("_case_idx").isNotNull())

        # union of all fields any case adds
        add_targets: dict[str, list[tuple[int, str]]] = {}
        drop_targets: dict[str, list[int]] = {}
        for i, case in enumerate(switch):
            for act in case.get("Actions", []):
                if act["type"] == "processor_add_fields":
                    for k, v in act["Fields"].items():
                        add_targets.setdefault(k, []).append((i, v))
                elif act["type"] == "processor_drop":
                    for k in act["DropKeys"]:
                        drop_targets.setdefault(k, []).append(i)
        for k, pairs in add_targets.items():
            expr = None
            for i, v in pairs:
                w = F.col("_case_idx") == i
                expr = F.when(w, F.lit(v)) if expr is None else expr.when(w, F.lit(v))
            if k in df.columns:
                expr = F.coalesce(expr, F.col(k))
            df = df.withColumn(k, expr)
        for k, idxs in drop_targets.items():
            if k in df.columns:
                keep = ~F.col("_case_idx").isin(idxs) | F.col("_case_idx").isNull()
                df = df.withColumn(k, F.when(keep, F.col(k)))
        return df.drop("_case_idx")

    return run
