"""Time parsing/formatting operators (processor_gotime / processor_strptime).

Reference: plugins/processor/gotime/processor_gotime.go:34-51 (parse
SourceFormat — Go layout or seconds/milliseconds/microseconds — with tz
offset, format DestFormat, SetTime sets event time);
plugins/processor/strptime/strptime.go:59-72 (strptime → event time,
EnablePreciseTimestamp emits an epoch-millis key).

Go reference-time layouts (``2006-01-02 15:04:05``) are translated to JDK
patterns at plan time, mirroring processor_gotime.go:34-51; formats with
no Go tokens pass through as Spark/JDK patterns, so configs written for
either convention work.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from loongcollector_spark.operators import register

_EPOCH_UNITS = {"seconds": 1, "milliseconds": 1_000, "microseconds": 1_000_000}

# Go reference-time tokens → JDK pattern letters, longest-first so "2006"
# wins over "06" and ".000000" over ".000" (processor_gotime.go parses with
# Go layouts; this table is the public time.Layout vocabulary)
_GO_TOKENS = [
    ("2006", "yyyy"), ("January", "MMMM"), ("Monday", "EEEE"),
    ("Jan", "MMM"), ("Mon", "EEE"),
    (".000000000", ".SSSSSSSSS"), (".000000", ".SSSSSS"), (".000", ".SSS"),
    (".999999999", ".SSSSSSSSS"), (".999999", ".SSSSSS"), (".999", ".SSS"),
    ("Z07:00", "XXX"), ("Z0700", "XX"), ("-07:00", "xxx"), ("-0700", "xx"),
    ("MST", "zzz"),
    ("15", "HH"), ("01", "MM"), ("02", "dd"), ("03", "hh"), ("04", "mm"),
    ("05", "ss"), ("06", "yy"), ("PM", "a"), ("pm", "a"), ("_2", "d"),
    ("1", "M"), ("2", "d"), ("3", "h"), ("4", "m"), ("5", "s"),
]


def go_layout_to_jdk(layout: str) -> str | None:
    """Translate a Go time layout to a JDK datetime pattern; returns None
    when the string contains no Go tokens (i.e. it is already a JDK
    pattern). Literal letters are single-quoted for the JDK parser."""
    out, i, found = [], 0, False
    while i < len(layout):
        for tok, jdk in _GO_TOKENS:
            if layout.startswith(tok, i):
                out.append(jdk)
                i += len(tok)
                found = True
                break
        else:
            ch = layout[i]
            if ch.isalpha():
                out.append(f"'{ch}'")
            elif ch == "'":
                out.append("''")
            else:
                out.append(ch)
            i += 1
    return "".join(out) if found else None


@register("processor_gotime", keys={"SourceKey", "SourceFormat", "DestKey", "DestFormat", "SourceLocation", "SetTime"})
def gotime(cfg: dict):
    src = cfg["SourceKey"]
    src_fmt = cfg.get("SourceFormat", "yyyy-MM-dd HH:mm:ss")
    dest = cfg.get("DestKey", src)
    dest_fmt = cfg.get("DestFormat")
    src_tz = cfg.get("SourceLocation")  # e.g. 'GMT+08:00'
    set_time = cfg.get("SetTime", False)
    # plan-time Go-layout translation (processor_gotime.go:34-51)
    src_fmt = go_layout_to_jdk(src_fmt) or src_fmt
    if dest_fmt:
        dest_fmt = go_layout_to_jdk(dest_fmt) or dest_fmt

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


@register("processor_strptime", keys={"SourceKey", "Format", "AdjustUTCOffsetHours", "EnablePreciseTimestamp", "PreciseTimestampKey"})
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
