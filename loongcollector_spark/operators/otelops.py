r"""processor_otel_trace / processor_otel_metric — OTLP → SLS log rows.

Reference: plugins/processor/otel/processor_otel_trace.go:31-100 (per-log
OTLP payload parse, Format json/protobuf/protojson) with the field
mapping in pkg/protocol/decoder/opentelemetry/:

* otlp_trace_parser.go:132-215 — one SLS log per span with contents
  host/service/resource (resource attrs minus host.name+service.name as
  sorted-key JSON), otlp.name/otlp.version (scope), traceID/spanID/
  parentSpanID, kind + statusCode as short strings (:220-250), name,
  links/logs as JSON arrays (:258-283), traceState, start/end/duration
  in MICROseconds, attribute JSON; Log.Time = endNano/1e9.
* otlp_metric_parser.go + otlpDataToSLSProto.go — gauge/sum/summary/
  histogram datapoints become ``__name__/__time_nano__/__labels__/
  __value__`` metric logs (helper.NewMetricLogStringVal,
  pkg/helper/log_helper.go:270-290): labels sorted ``k#$#v|...``,
  sum appends otlp.metric.ismonotonic, histogram emits CUMULATIVE
  ``_bucket`` counts with ``le`` labels (+Inf last) plus _sum/_min/_max
  (non-zero only) and _count, summary emits per-quantile rows.

Spark shape: the OTLP JSON payload parses with ``from_json`` against an
explicit schema, then nested ``explode`` generators walk resourceSpans →
scopeSpans → spans (resourceMetrics → scopeMetrics → metrics →
dataPoints) — every mapping below is a codegen/HOF expression, no Python
on the data path. Per-span/per-datapoint work never shuffles; the
operator composes with whatever pipeline surrounds it.

Documented divergences: Format="protobuf" (binary OTLP) decodes via
``pbwire.decode_otlp_traces``/``_metrics`` transcoding into this same
JSON plan (see ``otlp_pb_to_json``); float rendering matches Go's %g for integral
and plain-decimal values (the ``_go_float_str`` exponent rewrite covers
the e±NN form for the magnitudes tests exercise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register

_ATTR = ("array<struct<key:string,value:struct<stringValue:string,"
         "intValue:string,doubleValue:double,boolValue:boolean>>>")

_SPAN = (
    "struct<traceId:string,spanId:string,parentSpanId:string,name:string,"
    "kind:int,traceState:string,startTimeUnixNano:string,"
    "endTimeUnixNano:string,attributes:" + _ATTR + ","
    "events:array<struct<name:string,timeUnixNano:string,attributes:"
    + _ATTR + ">>,"
    "links:array<struct<traceId:string,spanId:string,attributes:"
    + _ATTR + ">>,"
    "status:struct<code:int,message:string>>"
)

OTLP_TRACE_DDL = (
    "resourceSpans array<struct<resource:struct<attributes:" + _ATTR + ">,"
    "scopeSpans:array<struct<scope:struct<name:string,version:string>,"
    "spans:array<" + _SPAN + ">>>>>"
)

_EXEMPLAR = (
    "array<struct<filteredAttributes:" + _ATTR + ",timeUnixNano:string,"
    "asDouble:double,asInt:string,spanId:string,traceId:string>>"
)

_DP = (
    "struct<attributes:" + _ATTR + ",timeUnixNano:string,asDouble:double,"
    "asInt:string,count:string,sum:double,min:double,max:double,"
    "explicitBounds:array<double>,bucketCounts:array<string>,"
    "quantileValues:array<struct<quantile:double,value:double>>,"
    "exemplars:" + _EXEMPLAR + ">"
)

# exponential-histogram datapoint (metrics/v1 ExponentialHistogramDataPoint)
_EDP = (
    "struct<attributes:" + _ATTR + ",timeUnixNano:string,count:string,"
    "sum:double,min:double,max:double,scale:int,zeroCount:string,"
    "positive:struct<offset:int,bucketCounts:array<string>>,"
    "negative:struct<offset:int,bucketCounts:array<string>>,"
    "exemplars:" + _EXEMPLAR + ">"
)

OTLP_METRIC_DDL = (
    "resourceMetrics array<struct<resource:struct<attributes:" + _ATTR + ">,"
    "scopeMetrics:array<struct<scope:struct<name:string,version:string>,"
    "metrics:array<struct<name:string,"
    "gauge:struct<dataPoints:array<" + _DP + ">>,"
    "sum:struct<dataPoints:array<" + _DP + ">,isMonotonic:boolean>,"
    "histogram:struct<dataPoints:array<" + _DP + ">>,"
    "summary:struct<dataPoints:array<" + _DP + ">>,"
    "exponentialHistogram:struct<dataPoints:array<" + _EDP + ">>>>>>>>"
)


OTLP_LOG_DDL = (
    "resourceLogs array<struct<resource:struct<attributes:" + _ATTR + ">,"
    "scopeLogs:array<struct<scope:struct<name:string,version:string>,"
    "logRecords:array<struct<timeUnixNano:string,severityNumber:int,"
    "severityText:string,body:struct<stringValue:string,intValue:string,"
    "doubleValue:double,boolValue:boolean>,attributes:" + _ATTR + ","
    "traceId:string,spanId:string>>>>>>"
)


def _div_long(n: Column, divisor: int) -> Column:
    """Exact truncating integer division of a long expression — plain
    ``/`` routes through double and loses precision above 2^53."""
    return F.floor(n.cast("decimal(38,0)") / divisor).cast("long")


def _expr_template(fn):
    from loongcollector_spark.operators.common import expr_template

    return expr_template(fn)


def _go_float_str(d: Column) -> Column:
    """Go strconv 'g' formatting of a double: integral values print with
    no fraction; exponent form is e±NN (two digits)."""
    base = d.cast("string")
    exp = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(base, r"E-(\d)$", r"e-0$1"),
                r"E-(\d\d+)$", r"e-$1"),
            r"E(\d)$", r"e+0$1"),
        r"E(\d\d+)$", r"e+$1")
    # the regex chain only matters for exponent-form strings; gate it so
    # the common plain-decimal case skips 4 regex evaluations per value
    fixed = F.when(base.contains("E"), exp).otherwise(base)
    return F.when(
        (d == F.floor(d)) & (F.abs(d) < F.lit(1e15)),
        d.cast("long").cast("string"),
    ).otherwise(fixed)


def _attr_str(v: Column) -> Column:
    """anyValueToString (otlp_metric_parser.go:26-46), string/int/double/
    bool subset."""
    return F.coalesce(
        v["stringValue"],
        v["intValue"],
        F.when(v["doubleValue"].isNotNull(), _go_float_str(v["doubleValue"])),
        F.when(v["boolValue"].isNotNull(),
               F.when(v["boolValue"], F.lit("true")).otherwise(F.lit("false"))),
        F.lit(""),
    )


def _entries(attrs: Column) -> Column:
    """attributes array → array<struct<k,v>> (stringified values). The
    explicit cast pins the field names — aliases inside lambda structs
    are dropped by the analyzer."""
    return F.transform(
        F.coalesce(attrs, F.array()),
        lambda a: F.struct(a["key"], _attr_str(a["value"]))
        .cast("struct<k:string,v:string>"),
    )


def _labels_str(entries: Column) -> Column:
    """helper.MetricLabels.String(): sort by key, join ``k#$#v`` with |."""
    return F.array_join(
        F.transform(
            F.array_sort(entries),
            lambda e: F.concat(e["k"], F.lit("#$#"), e["v"]),
        ),
        "|",
    )


def _jstr(s: Column) -> Column:
    """Go json.Marshal string quoting (shared helper — standard JSON
    escaping + Go's default HTML escaper for <>&, matching the
    reference's json.Marshal calls at otlp_trace_parser.go:90,196,267)."""
    from loongcollector_spark.operators.common import go_jstr

    return go_jstr(s)


def _attr_json_value(v: Column) -> Column:
    """Typed JSON rendering of an attribute value (numbers unquoted,
    like Go's json.Marshal of the raw map)."""
    return F.coalesce(
        F.when(v["stringValue"].isNotNull(), _jstr(v["stringValue"])),
        v["intValue"],
        F.when(v["doubleValue"].isNotNull(), v["doubleValue"].cast("string")),
        F.when(v["boolValue"].isNotNull(),
               F.when(v["boolValue"], F.lit("true")).otherwise(F.lit("false"))),
        F.lit('""'),
    )


def _attrs_json(attrs: Column, drop: tuple[str, ...] = ()) -> Column:
    """Sorted-key JSON object of an attributes array (json.Marshal of
    map[string]any sorts keys)."""
    kept = F.filter(
        F.coalesce(attrs, F.array()),
        lambda a: ~a["key"].isin(*drop) if drop else F.lit(True),
    )
    frags = F.transform(
        F.array_sort(
            F.transform(kept, lambda a: F.struct(
                a["key"],
                F.concat(_jstr(a["key"]), F.lit(":"),
                         _attr_json_value(a["value"])),
            ).cast("struct<k:string,frag:string>"))
        ),
        lambda e: e["frag"],
    )
    return F.concat(F.lit("{"), F.array_join(frags, ","), F.lit("}"))


def _attr_get(attrs: Column, key: str) -> Column:
    # filter ONCE, format inside the transform lambda (bound variable, so
    # _attr_str's many value references stay cheap), pick the first — the
    # previous when(size(hit)>0, _attr_str(element_at(hit,1))) shape
    # re-inlined the filter+element_at subtree at EVERY value reference
    # (~13 interpreted lambda scans per attr per row in the trace plan)
    vals = F.transform(
        F.filter(F.coalesce(attrs, F.array()), lambda a: a["key"] == key),
        lambda a: _attr_str(a["value"]),
    )
    return F.coalesce(F.get(vals, 0), F.lit(""))


_KIND = {1: "internal", 2: "server", 3: "client", 4: "producer", 5: "consumer"}


def _kind_str(kind: Column) -> Column:
    c = F.when(kind.isNull(), F.lit(""))
    for num, name in _KIND.items():
        c = c.when(kind == num, F.lit(name))
    return c.otherwise(F.lit(""))


def _status_str(code: Column) -> Column:
    return (
        F.when(code == 2, F.lit("ERROR"))
        .when(code == 1, F.lit("OK"))
        .otherwise(F.lit("UNSET"))
    )


def _span_id(raw: Column, need_decode: bool) -> Column:
    val = F.coalesce(raw, F.lit(""))
    if need_decode:  # hex-encode the base64-decoded payload bytes
        return F.coalesce(F.lower(F.hex(F.unbase64(val))), F.lit(""))
    # pass-through path: the Go chain is hex-decode → hex-encode (both
    # the json unmarshaler and protojson+NeedDecode), which lowercases
    # well-formed ids and ERRORS the payload otherwise — normalize case
    # and map a non-hex id to "" (the drop analog of Go's error return).
    # translate-emptiness + even length ≡ ^(?:[0-9a-fA-F]{2})*$ without
    # a per-row regex engine pass (3 ids per span).
    low = F.lower(val)
    is_hex = (F.length(F.translate(low, "0123456789abcdef", "")) == 0) & (
        F.length(low) % 2 == 0)
    return F.when(is_hex, F.lower(val)).otherwise(F.lit(""))


def _events_json(events: Column) -> Column:
    """eventsToString (otlp_trace_parser.go:258-270): JSON array of
    {attribute, name, time} objects — Marshal sorts the map keys."""
    frags = F.transform(
        F.coalesce(events, F.array()),
        lambda e: F.concat(
            F.lit('{"attribute":'), _attrs_json(e["attributes"]),
            F.lit(',"name":'), _jstr(F.coalesce(e["name"], F.lit(""))),
            F.lit(',"time":'), F.coalesce(e["timeUnixNano"], F.lit("0")),
            F.lit("}"),
        ),
    )
    return F.concat(F.lit("["), F.array_join(frags, ","), F.lit("]"))


def _links_json(links: Column) -> Column:
    frags = F.transform(
        F.coalesce(links, F.array()),
        lambda l: F.concat(
            F.lit('{"attribute":'), _attrs_json(l["attributes"]),
            F.lit(',"spanID":'), _jstr(F.coalesce(l["spanId"], F.lit(""))),
            F.lit(',"traceID":'), _jstr(F.coalesce(l["traceId"], F.lit(""))),
            F.lit("}"),
        ),
    )
    return F.concat(F.lit("["), F.array_join(frags, ","), F.lit("]"))


def otel_trace_to_logs(
    df: DataFrame,
    source_col: str = "content",
    trace_id_decode: bool = False,
    span_id_decode: bool = False,
    parent_span_id_decode: bool = False,
) -> DataFrame:
    """One output row per span, ``contents`` map keyed exactly like the
    reference's Log_Content list, ``log_time`` = endNano/1e9."""
    passthrough = [c for c in df.columns if c != source_col]
    parsed = df.select(
        *passthrough, F.from_json(F.col(source_col), OTLP_TRACE_DDL).alias("_otlp")
    )
    rs = parsed.select(
        *passthrough, F.explode("_otlp.resourceSpans").alias("_rs")
    )
    # resource-level strings are computed HERE — once per resourceSpan,
    # below the scopeSpan/span Generates (a Generate is a CollapseProject
    # barrier, so the top per-span projection references them as plain
    # attributes instead of re-inlining the attribute-array walks)
    res = F.col("_rs.resource.attributes")
    ss = rs.select(
        *passthrough,
        _attr_get(res, "host.name").alias("_host"),
        _attr_get(res, "service.name").alias("_svc"),
        _attrs_json(res, drop=("host.name", "service.name"))
        .alias("_resjson"),
        F.explode("_rs.scopeSpans").alias("_ss"),
    )
    sp = ss.select(
        *passthrough, "_host", "_svc", "_resjson",
        F.col("_ss.scope").alias("_scope"),
        F.explode("_ss.spans").alias("_sp"),
    )
    contents, log_time = _trace_span_exprs(
        trace_id_decode, span_id_decode, parent_span_id_decode)
    return sp.select(
        *passthrough,
        contents.alias("contents"),
        log_time.alias("log_time"),
    )


@_expr_template
def _trace_span_exprs(trace_id_decode: bool, span_id_decode: bool,
                      parent_span_id_decode: bool) -> tuple:
    """(contents map, log_time) expressions over the fixed aliases
    ``_sp``/``_scope`` plus the precomputed resource-level strings
    ``_host``/``_svc``/``_resjson`` — cached per (gateway, decode flags)
    like ``_metric_row_exprs`` (same py4j-construction-cost rationale)."""
    span = F.col("_sp")
    start = span["startTimeUnixNano"].cast("long")
    end = F.when(
        F.coalesce(span["endTimeUnixNano"].cast("long"), F.lit(0)) == 0,
        F.unix_micros(F.current_timestamp()) * 1000,  # endNano==0 → now
    ).otherwise(span["endTimeUnixNano"].cast("long"))
    contents = F.create_map(
        F.lit("host"), F.col("_host"),
        F.lit("service"), F.col("_svc"),
        F.lit("resource"), F.col("_resjson"),
        F.lit("otlp.name"), F.coalesce(F.col("_scope.name"), F.lit("")),
        F.lit("otlp.version"), F.coalesce(F.col("_scope.version"), F.lit("")),
        F.lit("traceID"), _span_id(span["traceId"], trace_id_decode),
        F.lit("spanID"), _span_id(span["spanId"], span_id_decode),
        F.lit("parentSpanID"),
        _span_id(span["parentSpanId"], parent_span_id_decode),
        F.lit("kind"), _kind_str(span["kind"]),
        F.lit("name"), F.coalesce(span["name"], F.lit("")),
        F.lit("links"), _links_json(span["links"]),
        F.lit("logs"), _events_json(span["events"]),
        F.lit("traceState"), F.coalesce(span["traceState"], F.lit("")),
        # decimal division: ns values (~2^60) overflow double precision
        F.lit("start"), _div_long(start, 1000).cast("string"),
        F.lit("end"), _div_long(end, 1000).cast("string"),
        F.lit("duration"), _div_long(end - start, 1000).cast("string"),
        F.lit("attribute"), _attrs_json(span["attributes"]),
        F.lit("statusCode"), _status_str(span["status"]["code"]),
        F.lit("statusMessage"),
        F.coalesce(span["status"]["message"], F.lit("")),
    )
    return contents, _div_long(end, 1_000_000_000)


# ------------------------------ logs ------------------------------------


def _body_str(body: Column) -> Column:
    """``logRecord.Body().AsString()`` (pcommon.Value.AsString): a string
    body is passed through raw (NOT JSON-quoted), ints decimal, bools
    true/false. Doubles render from Java's shortest repr with a whole
    -number ``.0`` tail stripped — identical to Go's encoding/json
    number form for the everyday decimal range; an extreme-magnitude
    double body (|v| ≥ 1e7 or < 1e-3, where Java picks scientific
    notation at different cutoffs than Go's json 'f'/1e21 rule) keeps
    the Java spelling. Bodies are strings in every reference fixture;
    the divergence is documented rather than silently wrong."""
    return F.coalesce(
        body["stringValue"],
        body["intValue"],
        F.when(body["doubleValue"].isNotNull(),
               F.regexp_replace(body["doubleValue"].cast("string"),
                                r"\.0$", "")),
        F.when(body["boolValue"].isNotNull(),
               F.when(body["boolValue"], F.lit("true"))
               .otherwise(F.lit("false"))),
        F.lit(""),
    )


def otel_logs_to_logs(df: DataFrame, source_col: str = "content") -> DataFrame:
    """``ConvertOtlpLogV1`` (pkg/protocol/decoder/opentelemetry/
    otlpDataToSLSProto.go:276-338): one output row per LogRecord with
    the reference's exact content keys — ``time_unix_nano`` /
    ``severity_number`` / ``severity_text`` / ``content`` always,
    ``attributes`` / ``resources`` only when the respective attribute
    set is non-empty (json.Marshal of the raw map: sorted keys, typed
    values). ``log_time`` = Unix seconds of the record timestamp
    (SetLogTimeWithNano).

    Spark shape: from_json against an explicit schema, three nested
    explodes (resourceLogs → scopeLogs → logRecords), one codegen map
    projection — no Python anywhere."""
    passthrough = [c for c in df.columns if c != source_col]
    parsed = df.select(
        *passthrough, F.from_json(F.col(source_col), OTLP_LOG_DDL).alias("_o")
    )
    rl = parsed.select(*passthrough, F.explode("_o.resourceLogs").alias("_rl"))
    sl = rl.select(
        *passthrough,
        F.col("_rl.resource.attributes").alias("_res"),
        F.explode("_rl.scopeLogs").alias("_sl"),
    )
    lr = sl.select(*passthrough, "_res", F.explode("_sl.logRecords").alias("_lr"))
    r = F.col("_lr")
    res = F.col("_res")
    t_ns = F.coalesce(r["timeUnixNano"].cast("long"), F.lit(0))
    contents = F.map_filter(
        F.create_map(
            F.lit("time_unix_nano"), t_ns.cast("string"),
            F.lit("severity_number"),
            F.coalesce(r["severityNumber"], F.lit(0)).cast("string"),
            F.lit("severity_text"), F.coalesce(r["severityText"], F.lit("")),
            F.lit("content"), _body_str(r["body"]),
            # size(NULL) is NULL → when() yields NULL → map_filter drops
            # the key, exactly the reference's len()!=0 gate
            F.lit("attributes"),
            F.when(F.size(r["attributes"]) > 0, _attrs_json(r["attributes"])),
            F.lit("resources"),
            F.when(F.size(res) > 0, _attrs_json(res)),
        ),
        lambda _k, v: v.isNotNull(),
    )
    return lr.select(
        *passthrough,
        contents.alias("contents"),
        _div_long(t_ns, 1_000_000_000).alias("log_time"),
    )


# ----------------------------- metrics ----------------------------------


def _time_nano(t: Column) -> Column:
    """NewMetricLogStringVal's digit-count scaling (log_helper.go:270-283)
    — right-pad the integer string to 19 digits (ns)."""
    return F.rpad(F.coalesce(t, F.lit("0")), 19, "0")


def _metric_name(name: Column, suffix: str = "") -> Column:
    """formatMetricName: anything outside [a-zA-Z0-9_:] becomes _."""
    return F.regexp_replace(
        F.concat(F.coalesce(name, F.lit("")), F.lit(suffix)),
        "[^a-zA-Z0-9_:]", "_",
    )


def _dp_value(dp: Column) -> Column:
    """value2Float: asDouble or asInt."""
    return F.coalesce(dp["asDouble"], dp["asInt"].cast("double"), F.lit(0.0))


def _row(suffix, labels: Column, t: Column, value: Column) -> Column:
    """One metric-log row in RAW form — suffix (not the formatted name),
    label ENTRIES (not the joined string), unpadded time, double value.
    The expensive per-row formatting (_metric_name regexp, _labels_str
    sort+join, _time_nano pad, _go_float_str) runs AFTER the explode as
    top-level codegen expressions; inside these transform lambdas it
    would be interpreted per emitted row (measured ~2x the whole query)."""
    sfx = F.lit(suffix) if isinstance(suffix, str) else suffix
    return F.struct(sfx, labels, F.coalesce(t, F.lit("0")), value).cast(
        "struct<sfx:string,ents:array<struct<k:string,v:string>>,"
        "tn:string,val:double>"
    )


def _with_label(entries: Column, key: str, value: Column) -> Column:
    return F.concat(
        entries,
        F.array(F.struct(F.lit(key), value).cast("struct<k:string,v:string>")),
    )


@_expr_template
def _metric_row_exprs() -> tuple:
    """Build (all_rows, output projection columns) for the metric
    conversion — pure unresolved expression trees over the fixed
    internal aliases ``_m``/``_res``/``_mn``/``_r``, identical on every
    call. Construction costs ~2 s of py4j round-trips (thousands of
    Column calls), so the trees are built ONCE per py4j gateway and
    reused — the prepared-plan-template pattern (operators.common.
    expr_template); a new JVM rebuilds them."""
    met = F.col("_m")
    res = F.col("_res")

    def dp_labels(dp):
        return F.concat(res, _entries(dp["attributes"]))

    def exemplar_rows(dp, labels):
        """exemplarMetricToLogs (otlp_metric_parser.go:247-266): one
        ``_exemplars`` row per exemplar — labels gain traceId/spanId hex
        (when non-empty) plus the filteredAttributes; value is
        asDouble/asInt; time is the exemplar's own nanos."""
        def one(ex):
            lbl = labels
            for key, col in (("traceId", ex["traceId"]),
                             ("spanId", ex["spanId"])):
                lbl = F.when(
                    col.isNotNull() & (col != ""), _with_label(lbl, key, col)
                ).otherwise(lbl)
            lbl = F.concat(lbl, _entries(ex["filteredAttributes"]))
            return _row(
                "_exemplars", lbl, ex["timeUnixNano"],
                F.coalesce(ex["asDouble"], ex["asInt"].cast("double"),
                           F.lit(0.0)))

        return F.transform(F.coalesce(dp["exemplars"], F.array()), one)

    def simple_rows(dps, extra=None, suffixed=False):
        def one(dp):
            labels = dp_labels(dp)
            if extra is not None:
                labels = _with_label(labels, *extra)
            return F.concat(
                exemplar_rows(dp, labels),
                F.array(_row("", labels, dp["timeUnixNano"], _dp_value(dp))),
            )

        return F.flatten(F.transform(F.coalesce(dps, F.array()), one))

    gauge_rows = simple_rows(met["gauge"]["dataPoints"])
    sum_rows = simple_rows(
        met["sum"]["dataPoints"],
        extra=("otlp.metric.ismonotonic",
               F.when(F.coalesce(met["sum"]["isMonotonic"], F.lit(False)),
                      F.lit("true")).otherwise(F.lit("false"))),
    )

    def summary_rows(dp):
        labels = dp_labels(dp)
        base = F.array(
            _row("_sum", labels, dp["timeUnixNano"],
                 F.coalesce(dp["sum"], F.lit(0.0))),
            _row("_count", labels, dp["timeUnixNano"],
                 F.coalesce(dp["count"].cast("double"), F.lit(0.0))),
        )
        quant = F.transform(
            F.coalesce(dp["quantileValues"], F.array()),
            lambda q: _row(
                "",
                _with_label(labels, "quantile",
                            _go_float_str(F.coalesce(q["quantile"], F.lit(0.0)))),
                dp["timeUnixNano"],
                F.coalesce(q["value"], F.lit(0.0)),
            ),
        )
        return F.concat(base, quant)

    def histogram_rows(dp):
        labels = dp_labels(dp)
        t = dp["timeUnixNano"]
        opt = (
            F.when(F.coalesce(dp["sum"], F.lit(0.0)) != 0,
                   F.array(_row("_sum", labels, t,
                                dp["sum"]))).otherwise(F.array())
        )
        opt_min = (
            F.when(F.coalesce(dp["min"], F.lit(0.0)) != 0,
                   F.array(_row("_min", labels, t,
                                dp["min"]))).otherwise(F.array())
        )
        opt_max = (
            F.when(F.coalesce(dp["max"], F.lit(0.0)) != 0,
                   F.array(_row("_max", labels, t,
                                dp["max"]))).otherwise(F.array())
        )
        count_row = F.array(_row(
            "_count", labels, t,
            F.coalesce(dp["count"].cast("double"), F.lit(0.0)),
        ))
        bounds = F.coalesce(dp["explicitBounds"], F.array().cast("array<double>"))
        counts = F.transform(
            F.coalesce(dp["bucketCounts"], F.array()), lambda c: c.cast("long")
        )
        # j over min(len(bounds)+1, len(counts)); le = bounds[j] or +Inf;
        # value = CUMULATIVE count (otlp_metric_parser.go:205-228)
        n_buckets = F.least(F.size(bounds) + 1, F.size(counts))
        idx = F.sequence(F.lit(1), n_buckets)
        bucket = F.when(n_buckets > 0, F.transform(
            idx,
            lambda j: _row(
                "_bucket",
                _with_label(
                    labels, "le",
                    F.when(j <= F.size(bounds),
                           _go_float_str(F.element_at(bounds, j)))
                    .otherwise(F.lit("+Inf")),
                ),
                t,
                F.aggregate(F.slice(counts, 1, j), F.lit(0).cast("long"),
                            lambda acc, x: acc + x).cast("double"),
            ),
        )).otherwise(F.array())
        return F.concat(opt, opt_min, opt_max, count_row,
                        exemplar_rows(dp, labels), bucket)

    def exp_histogram_rows(dp):
        """exponentialHistogram2Logs (otlp_metric_parser.go:77-120):
        _sum/_min/_max (non-zero), _count, then NON-cumulative ``_bucket``
        rows whose ``le`` label is the bucket boundary range — positive
        ``(lower,upper]``, negative ``[-upper,-lower)`` (otlp/
        metric_helper.go:31-36, Go %v floats) — with base =
        2^(2^-scale), lower = base^(offset+i); plus ``le=zero.count``
        and ``le=positive.offset``/``negative.offset`` rows, and the
        datapoint's exemplar rows. NOTE: non-integral scales make the
        boundary a transcendental pow — label strings can differ from Go
        in the last ulp there; exact for scale ≤ 0 (base 2, 4, 16…)."""
        labels = dp_labels(dp)
        t = dp["timeUnixNano"]

        def opt(field, suffix):
            return F.when(
                F.coalesce(dp[field], F.lit(0.0)) != 0,
                F.array(_row(suffix, labels, t, dp[field])),
            ).otherwise(F.array())

        count_row = F.array(_row(
            "_count", labels, t,
            F.coalesce(dp["count"].cast("double"), F.lit(0.0))))
        base = F.pow(F.lit(2.0), F.pow(F.lit(2.0),
                                       -F.coalesce(dp["scale"], F.lit(0))))

        def side(struct_col, positive: bool):
            counts = F.coalesce(struct_col["bucketCounts"], F.array())
            off = F.coalesce(struct_col["offset"], F.lit(0))

            def one(i):
                lower = F.pow(base, (off + i - 1).cast("double"))
                upper = lower * base
                if positive:
                    le = F.concat(F.lit("("), _go_float_str(lower),
                                  F.lit(","), _go_float_str(upper),
                                  F.lit("]"))
                else:
                    le = F.concat(F.lit("["), _go_float_str(-upper),
                                  F.lit(","), _go_float_str(-lower),
                                  F.lit(")"))
                return _row("_bucket", _with_label(labels, "le", le), t,
                            F.element_at(counts, i).cast("double"))

            buckets = F.when(F.size(counts) > 0, F.transform(
                F.sequence(F.lit(1), F.size(counts)), one
            )).otherwise(F.array())
            offset_row = F.array(_row(
                "_bucket",
                _with_label(labels, "le",
                            F.lit("positive.offset" if positive
                                  else "negative.offset")),
                t, off.cast("double")))
            return F.concat(buckets, offset_row)

        zero_row = F.array(_row(
            "_bucket", _with_label(labels, "le", F.lit("zero.count")), t,
            F.coalesce(dp["zeroCount"].cast("double"), F.lit(0.0))))
        return F.concat(
            opt("sum", "_sum"), opt("min", "_min"), opt("max", "_max"),
            count_row, exemplar_rows(dp, labels),
            side(dp["positive"], True), zero_row,
            side(dp["negative"], False),
        )

    sum_hist = F.flatten(F.transform(
        F.coalesce(met["histogram"]["dataPoints"], F.array()), histogram_rows
    ))
    sum_ehist = F.flatten(F.transform(
        F.coalesce(met["exponentialHistogram"]["dataPoints"], F.array()),
        exp_histogram_rows,
    ))
    sum_summ = F.flatten(F.transform(
        F.coalesce(met["summary"]["dataPoints"], F.array()), summary_rows
    ))
    all_rows = F.concat(gauge_rows, sum_rows, sum_hist, sum_ehist, sum_summ)
    out_cols = (
        _metric_name(
            F.concat(F.coalesce(F.col("_mn"), F.lit("")), F.col("_r.sfx"))
        ).alias("__name__"),
        _time_nano(F.col("_r.tn")).alias("__time_nano__"),
        _labels_str(F.col("_r.ents")).alias("__labels__"),
        _go_float_str(F.col("_r.val")).alias("__value__"),
        F.col("_r.val").alias("__value_num__"),
    )
    return met["name"].alias("_mn"), all_rows, out_cols


def otel_metrics_to_logs(df: DataFrame, source_col: str = "content") -> DataFrame:
    """Gauge/sum/summary/histogram datapoints → __name__/__time_nano__/
    __labels__/__value__ rows (plus numeric __value_num__ for oracles)."""
    passthrough = [c for c in df.columns if c != source_col]
    parsed = df.select(
        *passthrough, F.from_json(F.col(source_col), OTLP_METRIC_DDL).alias("_o")
    )
    rm = parsed.select(*passthrough, F.explode("_o.resourceMetrics").alias("_rm"))
    sm = rm.select(
        *passthrough,
        _entries(F.col("_rm.resource.attributes")).alias("_res"),
        F.explode("_rm.scopeMetrics").alias("_sm"),
    )
    m = sm.select(*passthrough, "_res", F.explode("_sm.metrics").alias("_m"))
    name_col, all_rows, out_cols = _metric_row_exprs()
    out = m.select(
        *passthrough, name_col, F.explode(all_rows).alias("_r")
    )
    return out.select(*passthrough, *out_cols)


# --------------------- otel / skywalking aggregators --------------------


def otel_aggregator_route(
    contents: Column,
    metrics_logstore: str = "otlp_metrics",
    trace_logstore: str = "otlp_traces",
    log_logstore: str = "otlp_logs",
) -> Column:
    """aggregator_opentelemetry routing (aggregator_opentelemetry.go:94-104):
    content-count shape decides the logstore — ≤5 metrics, ≥19 trace,
    else log; empty content list is dropped (NULL here)."""
    n = F.size(contents)
    return (
        F.when(n <= 0, F.lit(None).cast("string"))
        .when(n <= 5, F.lit(metrics_logstore))
        .when(n >= 19, F.lit(trace_logstore))
        .otherwise(F.lit(log_logstore))
    )


def skywalking_aggregator_route(
    contents: Column,
    metrics_logstore: str = "sw_metrics",
    trace_logstore: str = "sw_traces",
    log_logstore: str = "sw_logs",
) -> Column:
    """aggregator_skywalking routing (aggregator_skywalking.go:94-109):
    FIRST content key decides — __name__ metrics, links trace, otlp.name
    log, anything else falls back to log (with a warning upstream)."""
    first = F.try_element_at(F.map_keys(contents), F.lit(1))
    return (
        F.when(first.isNull(), F.lit(None).cast("string"))
        .when(first == "__name__", F.lit(metrics_logstore))
        .when(first == "links", F.lit(trace_logstore))
        .otherwise(F.lit(log_logstore))
    )


def _agg_router_factory(route_fn, default_stores):
    def factory(cfg: dict):
        src = cfg.get("ContentsKey", "contents")
        stores = (
            cfg.get("MetricsLogstore", default_stores[0]),
            cfg.get("TraceLogstore", default_stores[1]),
            cfg.get("LogLogstore", default_stores[2]),
        )

        def run(df: DataFrame) -> DataFrame:
            route = route_fn(F.col(src), *stores)
            return (
                df.withColumn("__logstore__", route)
                .filter(F.col("__logstore__").isNotNull())
            )

        return run

    return factory


_AGG_KEYS = {"ContentsKey", "MetricsLogstore", "TraceLogstore", "LogLogstore"}

register("aggregator_opentelemetry", keys=_AGG_KEYS)(
    _agg_router_factory(
        otel_aggregator_route, ("otlp_metrics", "otlp_traces", "otlp_logs")
    )
)
register("aggregator_skywalking", keys=_AGG_KEYS)(
    _agg_router_factory(
        skywalking_aggregator_route, ("sw_metrics", "sw_traces", "sw_logs")
    )
)


# --------------------------- registry glue ------------------------------


def _check_format(cfg: dict) -> str:
    fmt = cfg.get("Format", "").lower()
    if fmt == "":  # processor_otel_trace.go Init: empty format is an error
        raise ValueError("The format field is empty")
    if fmt not in ("json", "protojson", "protobuf"):
        raise ValueError(f"Format={fmt!r}: expected json/protojson/protobuf")
    return fmt


def _wrap_bare(df: DataFrame, source_col: str, wrapper: str) -> DataFrame:
    """Format=protojson carries a BARE ResourceSpans/ResourceMetrics
    document (processor_otel_trace.go:131-139 protojson.Unmarshal into
    v1.ResourceSpans; _metric.go:127-129 into v1.ResourceMetrics), not
    the TracesData/MetricsData wrapper the json format uses — wrap it so
    one parse plan serves both formats."""
    return df.withColumn(
        source_col,
        F.concat(F.lit('{"%s":[' % wrapper), F.col(source_col), F.lit("]}")),
    )


def otlp_pb_to_json(df: DataFrame, source_col: str, mode: str) -> DataFrame:
    """Format=protobuf (processor_otel_trace.go:117-128): binary
    TracesData/MetricsData payloads transcoded per Arrow batch into the
    OTLP/JSON shape (``pbwire.decode_otlp_traces``/``_metrics``), so the
    binary format feeds the SAME codegen conversion plan as json — ids
    land hex-encoded, no second decode. A malformed payload transcodes
    to an empty document (the reference logs-and-skips,
    processor_otel_trace.go:58-63)."""
    import json as _json
    from collections.abc import Iterator

    import pandas as pd

    from loongcollector_spark.pbwire import (
        decode_otlp_logs, decode_otlp_metrics, decode_otlp_traces,
    )

    decode = {"trace": decode_otlp_traces, "metric": decode_otlp_metrics,
              "log": decode_otlp_logs}[mode]
    empty = {"trace": '{"resourceSpans":[]}',
             "metric": '{"resourceMetrics":[]}',
             "log": '{"resourceLogs":[]}'}[mode]
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType([
        StructField(f.name, StringType()) if f.name == source_col else f
        for f in df.schema.fields
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def one(v):
                try:
                    raw = v if isinstance(v, (bytes, bytearray)) else \
                        str(v).encode("latin-1")  # Go []byte(string) cast
                    return _json.dumps(decode(raw), separators=(",", ":"))
                except Exception:
                    return empty
            pdf = pdf.copy()
            pdf[source_col] = pdf[source_col].map(one)
            yield pdf

    return df.mapInPandas(batches, out_schema)


@register(
    "processor_otel_trace",
    keys={"SourceKey", "Format", "NoKeyError", "TraceIDNeedDecode",
          "SpanIDNeedDecode", "ParentSpanIDNeedDecode"},
)
def _trace_factory(cfg: dict):
    fmt = _check_format(cfg)
    src = cfg.get("SourceKey", "content")

    def run(df: DataFrame) -> DataFrame:
        # The reference's *IDNeedDecode flags act ONLY on the protojson
        # path (ConvertResourceSpans, otlp_trace_parser.go:295-320): a
        # protojson bytes field base64-decodes at parse, then NeedDecode
        # re-reads the original string as hex — hexEncode at output makes
        # the flag=true chain a NET PASS-THROUGH of the payload's hex id
        # (verified against TestParserOtelData), while flag=false leaves
        # the base64-decoded bytes to be hex-encoded. The json path
        # (ptrace JSONUnmarshaler → ConvertTrace) and the protobuf path
        # never consult the flags.
        decode_ids = (False, False, False)
        if fmt == "protojson":
            decode_ids = (
                not cfg.get("TraceIDNeedDecode", False),
                not cfg.get("SpanIDNeedDecode", False),
                not cfg.get("ParentSpanIDNeedDecode", False),
            )
            df = _wrap_bare(df, src, "resourceSpans")
        elif fmt == "protobuf":
            df = otlp_pb_to_json(df, src, "trace")
        return otel_trace_to_logs(df, src, *decode_ids)

    return run


@register("processor_otel_metric", keys={"SourceKey", "Format", "NoKeyError"})
def _metric_factory(cfg: dict):
    fmt = _check_format(cfg)
    src = cfg.get("SourceKey", "content")

    def run(df: DataFrame) -> DataFrame:
        if fmt == "protobuf":
            df = otlp_pb_to_json(df, src, "metric")
        elif fmt == "protojson":
            df = _wrap_bare(df, src, "resourceMetrics")
        return otel_metrics_to_logs(df, src)

    return run
