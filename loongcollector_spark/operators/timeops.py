"""Time parsing/formatting operators (processor_gotime / processor_strptime).

Reference: plugins/processor/gotime/processor_gotime.go:34-51 (parse
SourceFormat — Go layout or seconds/milliseconds/microseconds — with tz
offset, format DestFormat, SetTime sets event time);
plugins/processor/strptime/strptime.go:59-72 (strptime → event time,
EnablePreciseTimestamp emits an epoch-millis key).

We use Spark datetime patterns directly (configs written for this engine
use Spark/JDK patterns — the Go-layout translation is a config concern,
not a runtime one).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from loongcollector_spark.operators import register

_EPOCH_UNITS = {"seconds": 1, "milliseconds": 1_000, "microseconds": 1_000_000}


@register("processor_gotime")
def gotime(cfg: dict):
    src = cfg["SourceKey"]
    src_fmt = cfg.get("SourceFormat", "yyyy-MM-dd HH:mm:ss")
    dest = cfg.get("DestKey", src)
    dest_fmt = cfg.get("DestFormat")
    src_tz = cfg.get("SourceLocation")  # e.g. 'GMT+08:00'
    set_time = cfg.get("SetTime", False)

    def run(df):
        c = F.col(src)
        if src_fmt in _EPOCH_UNITS:
            unit = _EPOCH_UNITS[src_fmt]
            parsed = F.timestamp_micros(
                (c.try_cast("decimal(20,0)") * (1_000_000 // unit)).try_cast("long")
            )
        else:
            parsed = F.try_to_timestamp(c, F.lit(src_fmt))
            if src_tz:
                parsed = F.to_utc_timestamp(parsed, src_tz)
        out = F.date_format(parsed, dest_fmt) if dest_fmt else parsed
        df = df.withColumn(dest, out)
        if set_time:
            df = df.withColumn("ts", parsed)
        return df

    return run


@register("processor_strptime")
def strptime(cfg: dict):
    src = cfg["SourceKey"]
    fmt = cfg.get("Format", "yyyy-MM-dd HH:mm:ss")
    adjust_h = cfg.get("AdjustUTCOffsetHours", 0)
    precise = cfg.get("EnablePreciseTimestamp", False)
    precise_key = cfg.get("PreciseTimestampKey", "precise_timestamp")

    def run(df):
        parsed = F.try_to_timestamp(F.col(src), F.lit(fmt))
        if adjust_h:
            parsed = parsed + F.expr(f"INTERVAL {int(adjust_h)} HOURS")
        df = df.withColumn("ts", parsed)
        if precise:
            df = df.withColumn(precise_key, F.unix_millis(parsed))
        return df

    return run
