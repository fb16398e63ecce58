"""service_skywalking (v3) log receivers — the LogReportService and
browser-error conversions (plugins/input/skywalkingv3/
logging_handle.go).

The gRPC/HTTP transport (`Collect` stream loop, logging_handle.go:72-86)
is deployment-side; what the handler computes per received record is
``convertFormat`` / ``convertBrowserErrorLog``
(logging_handle.go:96-141), modeled here as codegen projections over
LogData-shaped frames:

* ``SetLogTimeWithNano(ts/1000, (ts*1e6)%1e9)`` — epoch-ms input,
  second + nanosecond outputs (sls_logs.pb.helper.go:28-31);
* the fixed content keys in order: ``otlp.name`` (constant
  ``apache-skywalking``), ``attribute`` (Go ``json.Marshal`` of
  endpoint + tag pairs — sorted keys, HTML escapes), ``service``,
  ``content`` (TEXT/JSON/YAML body switch, logging_handle.go:155-163),
  ``traceID``/``spanID`` (``segmentId.spanId``) only when a trace
  context is present, ``resource`` (``{"serviceInstance": ...}``),
  ``timeUnixNano`` (the raw ms value printed as-is — the reference
  prints ``data.Timestamp`` under that key without scaling);
* ``convertBrowserErrorLog`` verbatim — including two reference quirks
  kept deliberately for parity: ``line``/``col`` print as
  ``string(int32)`` which in Go is a RUNE conversion (the value is the
  UTF-8 character at that codepoint, U+FFFD for invalid codepoints),
  and ``errorUrl`` takes ``data.Col`` (logging_handle.go:134-136).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register
from loongcollector_spark.operators.canalops import _go_json_obj


def go_rune(n: Column) -> Column:
    """Go ``string(int32)``: the UTF-8 encoding of codepoint ``n``;
    invalid codepoints (negative, surrogates, > U+10FFFF) become
    U+FFFD.  Pure codegen: the 1-4 UTF-8 bytes are closed-form
    shift/mask expressions decoded from hex."""
    n = n.cast("bigint")

    def h(b: Column) -> Column:
        return F.lpad(F.hex(b.cast("bigint")), 2, "0")

    def orr(a: int, c: Column) -> Column:
        return F.lit(a).cast("bigint").bitwiseOR(c.cast("bigint"))

    one = h(n)
    two = F.concat(h(orr(0xC0, F.floor(n / 64))),
                   h(orr(0x80, n % 64)))
    three = F.concat(h(orr(0xE0, F.floor(n / 4096))),
                     h(orr(0x80, F.floor(n / 64) % 64)),
                     h(orr(0x80, n % 64)))
    four = F.concat(h(orr(0xF0, F.floor(n / 262144))),
                    h(orr(0x80, F.floor(n / 4096) % 64)),
                    h(orr(0x80, F.floor(n / 64) % 64)),
                    h(orr(0x80, n % 64)))
    invalid = (n < 0) | (n > 0x10FFFF) | n.between(0xD800, 0xDFFF)
    hexed = (
        F.when(invalid, F.lit("EFBFBD"))          # U+FFFD
        .when(n < 0x80, one)
        .when(n < 0x800, two)
        .when(n < 0x10000, three)
        .otherwise(four))
    return F.decode(F.unhex(hexed), "UTF-8")


def _with_time(ts_ms: Column) -> list[Column]:
    return [
        (ts_ms / 1000).cast("long").alias("time"),
        ((ts_ms % 1000) * 1_000_000).cast("long").alias("time_ns"),
    ]


def skywalking_log_rows(
    df: DataFrame, ts_col: str = "timestamp",
) -> DataFrame:
    """``convertFormat`` (logging_handle.go:96-117): LogData frame →
    (time, time_ns, contents map).  Expects columns ``timestamp`` (ms),
    ``service``, ``service_instance``, ``endpoint``, ``body_type``,
    ``body_text``, ``trace_id``, ``trace_segment_id``, ``span_id``,
    ``tags map<string,string>``."""
    ts = F.col(ts_col).cast("bigint")
    tags = F.coalesce(
        F.col("tags"), F.create_map().cast("map<string,string>"))
    # Go sets attribute["endpoint"] FIRST, then copies tag pairs over it
    # (logging_handle.go:165-172) — so a tag named "endpoint" wins.
    endpoint_entry = F.when(
        F.map_contains_key(tags, "endpoint"),
        F.create_map().cast("map<string,string>"),
    ).otherwise(F.create_map(
        F.lit("endpoint"), F.coalesce(F.col("endpoint"), F.lit(""))))
    attr = _go_json_obj(F.map_concat(endpoint_entry, tags))
    # body switch (logging_handle.go:155-163): TEXT/JSON/YAML all carry
    # their payload in body_text here; the proto's oneof admits nothing
    # else on the wire, so the Go default (body.String()) has no analog
    # row shape to model.
    content = F.coalesce(F.col("body_text"), F.lit(""))
    resource = _go_json_obj(F.create_map(
        F.lit("serviceInstance"),
        F.coalesce(F.col("service_instance"), F.lit(""))))
    has_trace = F.col("trace_id").isNotNull()
    base = F.create_map(
        F.lit("otlp.name"), F.lit("apache-skywalking"),
        F.lit("attribute"), attr,
        F.lit("service"), F.coalesce(F.col("service"), F.lit("")),
        F.lit("content"), content,
        F.lit("resource"), resource,
        F.lit("timeUnixNano"), ts.cast("string"),
    )
    trace_part = F.create_map(
        F.lit("traceID"), F.coalesce(F.col("trace_id"), F.lit("")),
        F.lit("spanID"), F.concat(
            F.coalesce(F.col("trace_segment_id"), F.lit("")), F.lit("."),
            F.coalesce(F.col("span_id"), F.lit(0)).cast("string")),
    )
    contents = F.when(has_trace, F.map_concat(base, trace_part)) \
        .otherwise(base)
    return df.select(*_with_time(ts), contents.alias("contents"))


def skywalking_browser_error_rows(df: DataFrame) -> DataFrame:
    """``convertBrowserErrorLog`` (logging_handle.go:119-137) verbatim,
    quirks included: ``line``/``col`` are Go rune conversions of the
    int32 values, ``errorUrl`` repeats ``col``.  Expects columns
    ``time`` (ms), ``service``, ``unique_id``, ``service_version``,
    ``category``, ``page_path``, ``grade``, ``message``, ``line``,
    ``col``, ``stack``, ``first_reported_error`` (boolean)."""
    ts = F.col("time").cast("bigint")
    col_rune = go_rune(F.coalesce(F.col("col"), F.lit(0)))
    s = (lambda c: F.coalesce(F.col(c), F.lit("")))
    contents = F.create_map(
        F.lit("otlp.name"), F.lit("apache-skywalking"),
        F.lit("service"), s("service"),
        F.lit("uniqueId"), s("unique_id"),
        F.lit("serviceVersion"), s("service_version"),
        F.lit("category"), s("category"),
        F.lit("pagePath"), s("page_path"),
        F.lit("grade"), s("grade"),
        F.lit("message"), s("message"),
        F.lit("line"), go_rune(F.coalesce(F.col("line"), F.lit(0))),
        F.lit("col"), col_rune,
        F.lit("stack"), s("stack"),
        F.lit("errorUrl"), col_rune,     # reference quirk, verbatim
        F.lit("firstReportedError"),
        F.when(F.coalesce(F.col("first_reported_error"), F.lit(False)),
               F.lit("true")).otherwise(F.lit("false")),
    )
    return df.select(*_with_time(ts), contents.alias("contents"))


@register("service_skywalking", keys={"Mode", "TimeKey"})
def service_skywalking(cfg: dict):
    """Registry twin: ``Mode`` = ``logging`` (default) or
    ``browser_error``."""
    mode = str(cfg.get("Mode", "logging")).lower()
    if mode not in ("logging", "browser_error"):
        raise ValueError(f"service_skywalking: unknown Mode {mode!r}")

    def run(df: DataFrame) -> DataFrame:
        if mode == "browser_error":
            return skywalking_browser_error_rows(df)
        return skywalking_log_rows(
            df, ts_col=cfg.get("TimeKey", "timestamp"))

    return run
