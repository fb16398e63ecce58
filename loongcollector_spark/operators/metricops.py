"""Log→metric reshaping and value-group aggregation.

* processor_log_to_sls_metric (processor_log_to_sls_metric.go:32-51):
  log → metric event with ``__name__/__labels__/__value__/__time_nano__``,
  labels sorted by key and joined ``k1#$#v1|k2#$#v2`` — we use the sorted
  ``|``-joined convention with ``=`` (documented deviation: separator is
  config-able).
* aggregator_content_value_group (aggregator_content_value_group.go:66-80):
  group logs by the values of GroupKeys → per-group counts/tags.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from loongcollector_spark.operators import register


@register("processor_log_to_metric", keys={"MetricLabelKeys", "MetricValues", "LabelSeparator", "TsKey"})
def log_to_metric(cfg: dict):
    label_keys = sorted(cfg.get("MetricLabelKeys", []))
    values = cfg["MetricValues"]  # {name_literal_or_key: value_key}
    label_sep = cfg.get("LabelSeparator", "|")
    ts_key = cfg.get("TsKey", "ts")

    def run(df):
        labels = F.concat_ws(
            label_sep,
            *[F.concat(F.lit(k + "="), F.col(k).cast("string")) for k in label_keys],
        )
        # ONE pass: a per-name union would duplicate the whole upstream
        # subtree (scan + parse + any window) once per metric — explode
        # an inline (name, value) array instead (measured 3.2 s → half
        # on the sf0.1 suite for two metrics)
        metric = F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("__name__"),
                    F.col(value_key).try_cast("double").alias("__value__"),
                )
                for name, value_key in values.items()
            ])
        )
        return df.select(
            metric.alias("_m"),
            labels.alias("__labels__"),
            # cast: unix_micros rejects TIMESTAMP_NTZ inputs (UTC
            # session, so ntz->tz is identity)
            (F.unix_micros(F.col(ts_key).cast("timestamp")) * 1000
             ).alias("__time_nano__"),
        ).select(
            F.col("_m.__name__").alias("__name__"),
            "__labels__",
            F.col("_m.__value__").alias("__value__"),
            "__time_nano__",
        )

    return run


@register("aggregator_content_value_group", keys={"GroupKeys"})
def content_value_group(cfg: dict):
    """Count per distinct GroupKeys combo; the per-group tags of the
    reference become the grouping columns themselves."""
    keys = cfg["GroupKeys"]

    def run(df):
        return df.groupBy(*keys).agg(F.count("*").alias("group_count"))

    return run
