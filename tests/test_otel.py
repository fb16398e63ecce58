"""processor_otel_trace / processor_otel_metric vs the reference's
field mapping (pkg/protocol/decoder/opentelemetry/otlp_trace_parser.go,
otlp_metric_parser.go, decoder_test.go shapes)."""

from __future__ import annotations

import json

import pytest

from loongcollector_spark.operators import build_operator
from loongcollector_spark.operators.otelops import (
    otel_metrics_to_logs, otel_trace_to_logs,
)

_TRACE = {"resourceSpans": [{
    "resource": {"attributes": [
        {"key": "host.name", "value": {"stringValue": "testHost"}},
        {"key": "service.name", "value": {"stringValue": "svc"}},
        {"key": "region", "value": {"stringValue": "eu"}},
        {"key": "n", "value": {"intValue": "7"}},
    ]},
    "scopeSpans": [{"scope": {"name": "lib", "version": "1.2"}, "spans": [{
        "traceId": "0102030405060708090a0b0c0d0e0f10",
        "spanId": "0102030405060708", "parentSpanId": "",
        "name": "testSpan", "kind": 2, "traceState": "st",
        "startTimeUnixNano": "1663904182348000000",
        "endTimeUnixNano": "1663904183348000000",
        "attributes": [{"key": "k1", "value": {"stringValue": "v1"}}],
        "events": [{"name": "ev1", "timeUnixNano": "1663904182349000000",
                    "attributes": [{"key": "a", "value": {"stringValue": "b"}}]}],
        "links": [{"traceId": "ff", "spanId": "aa", "attributes": []}],
        "status": {"code": 2, "message": "boom"},
    }]}],
}]}


def test_otel_trace_span_mapping(spark):
    df = spark.createDataFrame([(1, json.dumps(_TRACE))], "i long, content string")
    row = otel_trace_to_logs(df).collect()[0]
    c = dict(row["contents"])
    # otlp_trace_parser.go:62-98 resource split + :132-215 span fields
    assert c["host"] == "testHost" and c["service"] == "svc"
    assert c["resource"] == '{"n":7,"region":"eu"}'     # sorted, int unquoted
    assert c["otlp.name"] == "lib" and c["otlp.version"] == "1.2"
    assert c["traceID"] == "0102030405060708090a0b0c0d0e0f10"
    assert c["spanID"] == "0102030405060708" and c["parentSpanID"] == ""
    assert c["kind"] == "server" and c["name"] == "testSpan"
    assert c["traceState"] == "st"
    assert c["start"] == "1663904182348000"             # MICROseconds
    assert c["end"] == "1663904183348000"
    assert c["duration"] == "1000000"
    assert c["attribute"] == '{"k1":"v1"}'
    assert c["statusCode"] == "ERROR" and c["statusMessage"] == "boom"
    assert c["logs"] == (
        '[{"attribute":{"a":"b"},"name":"ev1","time":1663904182349000000}]'
    )
    assert c["links"] == '[{"attribute":{},"spanID":"aa","traceID":"ff"}]'
    assert row["log_time"] == 1663904183                # endNano / 1e9


def test_otel_trace_id_decode_and_status_default(spark):
    import base64

    t = json.loads(json.dumps(_TRACE))
    span = t["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    span["traceId"] = base64.b64encode(bytes.fromhex("00ff10")).decode()
    span["status"] = {}
    df = spark.createDataFrame([(1, json.dumps(t))], "i long, content string")
    c = dict(otel_trace_to_logs(df, trace_id_decode=True).collect()[0]["contents"])
    assert c["traceID"] == "00ff10"
    assert c["statusCode"] == "UNSET"


_METRICS = {"resourceMetrics": [{
    "resource": {"attributes": [
        {"key": "host.name", "value": {"stringValue": "testHost"}}]},
    "scopeMetrics": [{"scope": {"name": "s", "version": "1"}, "metrics": [
        {"name": "gauge.metric", "gauge": {"dataPoints": [
            {"attributes": [{"key": "l1", "value": {"stringValue": "x"}}],
             "timeUnixNano": "1663904182348000000", "asDouble": 42.0}]}},
        {"name": "sum_metric", "sum": {"isMonotonic": True, "dataPoints": [
            {"attributes": [], "timeUnixNano": "1663904182348000000",
             "asInt": "5"}]}},
        {"name": "hist", "histogram": {"dataPoints": [
            {"attributes": [], "timeUnixNano": "1663904182348000000",
             "count": "6", "sum": 10.5, "min": 0.0, "max": 4.0,
             "explicitBounds": [1.0, 2.0],
             "bucketCounts": ["1", "2", "3"]}]}},
        {"name": "summ", "summary": {"dataPoints": [
            {"attributes": [], "timeUnixNano": "1663904182348000000",
             "count": "3", "sum": 9.0,
             "quantileValues": [{"quantile": 0.5, "value": 1.5},
                                {"quantile": 0.99, "value": 3.0}]}]}},
    ]}],
}]}


def test_otel_metric_datapoint_mapping(spark):
    df = spark.createDataFrame([(1, json.dumps(_METRICS))], "i long, content string")
    rows = [(r["__name__"], r["__labels__"], r["__value__"], r["__time_nano__"])
            for r in otel_metrics_to_logs(df).collect()]
    tn = "1663904182348000000"
    # gauge: name formatted ('.' -> '_'), labels sorted k#$#v|...
    assert rows[0] == ("gauge_metric", "host.name#$#testHost|l1#$#x", "42", tn)
    # sum appends otlp.metric.ismonotonic (otlp_metric_parser.go:162-177)
    assert rows[1] == (
        "sum_metric", "host.name#$#testHost|otlp.metric.ismonotonic#$#true",
        "5", tn)
    # histogram: _sum/_max (min==0 skipped), _count, CUMULATIVE buckets
    assert rows[2][0] == "hist_sum" and rows[2][2] == "10.5"
    assert rows[3][0] == "hist_max" and rows[3][2] == "4"
    assert rows[4][0] == "hist_count" and rows[4][2] == "6"
    assert [(r[0], r[1].split("|")[-1], r[2]) for r in rows[5:8]] == [
        ("hist_bucket", "le#$#1", "1"),
        ("hist_bucket", "le#$#2", "3"),
        ("hist_bucket", "le#$#+Inf", "6"),
    ]
    # summary: _sum/_count + per-quantile rows on the base name
    assert rows[8][0] == "summ_sum" and rows[8][2] == "9"
    assert rows[9][0] == "summ_count" and rows[9][2] == "3"
    assert rows[10] == ("summ", "host.name#$#testHost|quantile#$#0.5", "1.5", tn)
    assert rows[11] == ("summ", "host.name#$#testHost|quantile#$#0.99", "3", tn)


def test_otel_registry_and_format_validation(spark):
    df = spark.createDataFrame([(1, json.dumps(_TRACE))], "i long, content string")
    op = build_operator({"Type": "processor_otel_trace", "Format": "json"})
    assert op(df).count() == 1

    with pytest.raises(ValueError):        # empty format is an Init error
        build_operator({"Type": "processor_otel_trace"})
    with pytest.raises(ValueError):        # unknown format
        build_operator({"Type": "processor_otel_metric", "Format": "xml"})


def test_otel_skywalking_aggregator_routing(spark):
    from loongcollector_spark.operators.otelops import (
        otel_aggregator_route, skywalking_aggregator_route,
    )
    from pyspark.sql import functions as F

    def m(n):  # n dummy entries
        return "map(" + ",".join(f"'k{i}','v'" for i in range(n)) + ")"

    # maps built with map() expressions — python-dict conversion does not
    # preserve entry order, and skywalking routes on the FIRST entry
    rows = [
        (1, m(4)),                         # ≤5  → metrics
        (2, m(19)),                        # ≥19 → trace
        (3, m(8)),                         # else → log
        (4, "map()"),                      # empty → dropped
        (5, "map('__name__','m')"),        # sw: metrics
        (6, "map('links','[]','z','x')"),  # sw: trace
        (7, "map('otlp.name','lib')"),     # sw: log
        (8, "map('other','?')"),           # sw: fallback log
    ]
    df = spark.range(0).sparkSession.createDataFrame(
        [(i,) for i, _ in rows], "i long"
    ).withColumn(
        "contents",
        F.coalesce(*[
            F.when(F.col("i") == i, F.expr(expr)) for i, expr in rows
        ]),
    )
    got = {r["i"]: (r["otel"], r["sw"]) for r in df.select(
        "i",
        otel_aggregator_route(F.col("contents")).alias("otel"),
        skywalking_aggregator_route(F.col("contents")).alias("sw"),
    ).collect()}
    assert got[1][0] == "otlp_metrics" and got[2][0] == "otlp_traces"
    assert got[3][0] == "otlp_logs" and got[4] == (None, None)
    assert got[5][1] == "sw_metrics" and got[6][1] == "sw_traces"
    assert got[7][1] == "sw_logs" and got[8][1] == "sw_logs"

    op = build_operator({"Type": "aggregator_opentelemetry"})
    assert op(df).count() == 7  # empty-contents row dropped


def test_otel_metric_seconds_timestamp_scaling(spark):
    """NewMetricLogStringVal right-scales short timestamps to 19 digits."""
    m = {"resourceMetrics": [{"resource": {"attributes": []},
         "scopeMetrics": [{"scope": {"name": "s"}, "metrics": [
             {"name": "g", "gauge": {"dataPoints": [
                 {"attributes": [], "timeUnixNano": "1663904182",
                  "asDouble": 1.0}]}}]}]}]}
    df = spark.createDataFrame([(1, json.dumps(m))], "i long, content string")
    row = otel_metrics_to_logs(df).collect()[0]
    assert row["__time_nano__"] == "1663904182000000000"


# ------------------- Format=protobuf (binary OTLP) ----------------------
# Independent test-side encoder: the JSON fixtures above are serialized
# to binary TracesData/MetricsData wire bytes here (public
# opentelemetry-proto field numbers), decoded by pbwire's walker, and
# the Format=protobuf operator output must equal Format=json on the same
# logical payload.

import struct

from loongcollector_spark.pbwire import py_field, py_varint


def _enc_any(v: dict) -> bytes:
    if "stringValue" in v:
        return py_field(1, v["stringValue"].encode())
    if "boolValue" in v:
        return py_field(2, b"\x01" if v["boolValue"] else b"\x00",
                        wire_type=0)[:1] + (b"\x01" if v["boolValue"]
                                            else b"\x00")
    if "intValue" in v:
        n = int(v["intValue"])
        return bytes([0x18]) + py_varint(n if n >= 0 else n + (1 << 64))
    if "doubleValue" in v:
        return bytes([0x21]) + struct.pack("<d", v["doubleValue"])
    return b""


def _enc_kv(kv: dict) -> bytes:
    return py_field(1, kv["key"].encode()) + py_field(2, _enc_any(kv["value"]))


def _enc_attrs(field_no: int, attrs: list) -> bytes:
    return b"".join(py_field(field_no, _enc_kv(a)) for a in attrs)


def _fixed64(field_no: int, v: int) -> bytes:
    return py_varint((field_no << 3) | 1) + struct.pack("<Q", v)


def _dbl(field_no: int, v: float) -> bytes:
    return py_varint((field_no << 3) | 1) + struct.pack("<d", v)


def _enc_span(s: dict) -> bytes:
    b = py_field(1, bytes.fromhex(s["traceId"]))
    b += py_field(2, bytes.fromhex(s["spanId"]))
    b += py_field(3, s["traceState"].encode())
    b += py_field(4, bytes.fromhex(s.get("parentSpanId", "")))
    b += py_field(5, s["name"].encode())
    b += bytes([0x30]) + py_varint(s["kind"])
    b += _fixed64(7, int(s["startTimeUnixNano"]))
    b += _fixed64(8, int(s["endTimeUnixNano"]))
    b += _enc_attrs(9, s["attributes"])
    for ev in s.get("events", []):
        eb = _fixed64(1, int(ev["timeUnixNano"]))
        eb += py_field(2, ev["name"].encode())
        eb += _enc_attrs(3, ev["attributes"])
        b += py_field(11, eb)
    for ln in s.get("links", []):
        lb = py_field(1, bytes.fromhex(ln["traceId"]))
        lb += py_field(2, bytes.fromhex(ln["spanId"]))
        lb += _enc_attrs(4, ln["attributes"])
        b += py_field(13, lb)
    st = s.get("status", {})
    sb = py_field(2, st.get("message", "").encode())
    sb += bytes([0x18]) + py_varint(st.get("code", 0))
    b += py_field(15, sb)
    return b


def _enc_scope(sc: dict) -> bytes:
    return py_field(1, sc["name"].encode()) + py_field(
        2, sc["version"].encode())


def _enc_traces(doc: dict) -> bytes:
    out = b""
    for rs in doc["resourceSpans"]:
        rb = py_field(1, _enc_attrs(1, rs["resource"]["attributes"]))
        for ss in rs["scopeSpans"]:
            sb = py_field(1, _enc_scope(ss["scope"]))
            sb += b"".join(py_field(2, _enc_span(s)) for s in ss["spans"])
            rb += py_field(2, sb)
        out += py_field(1, rb)
    return out


def _enc_number_dp(dp: dict) -> bytes:
    b = _fixed64(3, int(dp["timeUnixNano"]))
    if "asDouble" in dp:
        b += _dbl(4, dp["asDouble"])
    if "asInt" in dp:
        b += py_varint((6 << 3) | 1) + struct.pack("<q", int(dp["asInt"]))
    b += _enc_attrs(7, dp["attributes"])
    return b


def _enc_metric(m: dict) -> bytes:
    b = py_field(1, m["name"].encode())
    if "gauge" in m:
        b += py_field(5, b"".join(
            py_field(1, _enc_number_dp(d)) for d in m["gauge"]["dataPoints"]))
    if "sum" in m:
        sb = b"".join(py_field(1, _enc_number_dp(d))
                      for d in m["sum"]["dataPoints"])
        if m["sum"].get("isMonotonic"):
            sb += bytes([0x18, 0x01])
        b += py_field(7, sb)
    if "histogram" in m:
        hb = b""
        for d in m["histogram"]["dataPoints"]:
            db = _fixed64(3, int(d["timeUnixNano"]))
            db += _fixed64(4, int(d["count"]))
            if "sum" in d:
                db += _dbl(5, d["sum"])
            # packed bucket_counts / explicit_bounds (proto3 default)
            db += py_field(6, b"".join(
                struct.pack("<Q", int(c)) for c in d["bucketCounts"]))
            db += py_field(7, b"".join(
                struct.pack("<d", x) for x in d["explicitBounds"]))
            db += _enc_attrs(9, d["attributes"])
            if d.get("min", 0) != 0:
                db += _dbl(11, d["min"])
            if d.get("max", 0) != 0:
                db += _dbl(12, d["max"])
            hb += py_field(1, db)
        b += py_field(9, hb)
    if "summary" in m:
        sb = b""
        for d in m["summary"]["dataPoints"]:
            db = _fixed64(3, int(d["timeUnixNano"]))
            db += _fixed64(4, int(d["count"]))
            db += _dbl(5, d["sum"])
            db += _enc_attrs(7, d["attributes"])
            for q in d["quantileValues"]:
                db += py_field(6, _dbl(1, q["quantile"]) + _dbl(2, q["value"]))
            sb += py_field(1, db)
        b += py_field(11, sb)
    return b


def _enc_metrics(doc: dict) -> bytes:
    out = b""
    for rm in doc["resourceMetrics"]:
        rb = py_field(1, _enc_attrs(1, rm["resource"]["attributes"]))
        for sm in rm["scopeMetrics"]:
            sb = py_field(1, _enc_scope(sm["scope"]))
            sb += b"".join(py_field(2, _enc_metric(m)) for m in sm["metrics"])
            rb += py_field(2, sb)
        out += py_field(1, rb)
    return out


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_otel_trace_protobuf_equals_json(spark):
    pb = _enc_traces(_TRACE)
    jdf = spark.createDataFrame([(1, json.dumps(_TRACE))],
                                "i long, content string")
    bdf = spark.createDataFrame([(1, bytearray(pb))],
                                "i long, content binary")
    jop = build_operator({"Type": "processor_otel_trace", "Format": "json"})
    bop = build_operator({"Type": "processor_otel_trace",
                          "Format": "protobuf"})
    jrows = [dict(r["contents"]) for r in jop(jdf).collect()]
    brows = [dict(r["contents"]) for r in bop(bdf).collect()]
    assert brows == jrows and len(brows) == 1


def test_otel_metric_protobuf_equals_json(spark):
    # summary datapoint gets an attribute here: a pb walker that drops
    # SummaryDataPoint.attributes (field 7) must fail this equivalence
    doc = json.loads(json.dumps(_METRICS))
    doc["resourceMetrics"][0]["scopeMetrics"][0]["metrics"][3]["summary"][
        "dataPoints"][0]["attributes"] = [
        {"key": "sq", "value": {"stringValue": "sv"}}]
    pb = _enc_metrics(doc)
    jdf = spark.createDataFrame([(1, json.dumps(doc))],
                                "i long, content string")
    bdf = spark.createDataFrame([(1, bytearray(pb))],
                                "i long, content binary")
    jop = build_operator({"Type": "processor_otel_metric", "Format": "json"})
    bop = build_operator({"Type": "processor_otel_metric",
                          "Format": "protobuf"})
    cols = ["__name__", "__time_nano__", "__labels__", "__value__"]
    assert _rows(bop(bdf), cols) == _rows(jop(jdf), cols)
    assert len(bop(bdf).collect()) == 12


def test_otel_protobuf_malformed_payload_yields_no_rows(spark):
    bdf = spark.createDataFrame(
        [(1, bytearray(b"\xff\xff\xff")), (2, None)],
        "i long, content binary")
    bop = build_operator({"Type": "processor_otel_trace",
                          "Format": "protobuf"})
    assert bop(bdf).count() == 0  # logs-and-skips, never a task kill


_EXP_HIST = {"resourceMetrics": [{
    "resource": {"attributes": [
        {"key": "host.name", "value": {"stringValue": "h"}}]},
    "scopeMetrics": [{"scope": {"name": "s", "version": "1"}, "metrics": [
        {"name": "eh", "exponentialHistogram": {"dataPoints": [
            {"attributes": [], "timeUnixNano": "1663904182348000000",
             "count": "17", "sum": 9.5, "max": 12.0, "scale": 0,
             "zeroCount": "2",
             "positive": {"offset": 1, "bucketCounts": ["3", "0", "5"]},
             "negative": {"offset": -1, "bucketCounts": ["7"]}}]}},
    ]}],
}]}


def test_otel_exponential_histogram_mapping(spark):
    """exponentialHistogram2Logs (otlp_metric_parser.go:77-120): base =
    2^(2^-scale); positive buckets '(lower,upper]', negative
    '[-upper,-lower)', zero.count + offset rows, NON-cumulative counts."""
    df = spark.createDataFrame([(1, json.dumps(_EXP_HIST))],
                               "i long, content string")
    rows = [(r["__name__"], r["__labels__"].split("|")[-1], r["__value__"])
            for r in otel_metrics_to_logs(df).collect()]
    assert rows == [
        ("eh_sum", "host.name#$#h", "9.5"),
        ("eh_max", "host.name#$#h", "12"),     # min==0 row skipped
        ("eh_count", "host.name#$#h", "17"),
        ("eh_bucket", "le#$#(2,4]", "3"),      # base 2, offset 1
        ("eh_bucket", "le#$#(4,8]", "0"),
        ("eh_bucket", "le#$#(8,16]", "5"),
        ("eh_bucket", "le#$#positive.offset", "1"),
        ("eh_bucket", "le#$#zero.count", "2"),
        ("eh_bucket", "le#$#[-1,-0.5)", "7"),  # offset -1 → [-2^0, -2^-1)
        ("eh_bucket", "le#$#negative.offset", "-1"),
    ]


def test_otel_exponential_histogram_protobuf_equals_json(spark):
    """Binary path: zigzag scale/offset + packed-varint bucket counts."""
    def enc_exp_metric(m):
        d = m["exponentialHistogram"]["dataPoints"][0]
        def zz(n):
            from loongcollector_spark.pbwire import py_varint
            return py_varint((n << 1) ^ (n >> 63) if n >= 0 else ((-n) * 2 - 1))
        from loongcollector_spark.pbwire import py_field, py_varint
        db = _fixed64(3, int(d["timeUnixNano"]))
        db += _fixed64(4, int(d["count"]))
        db += _dbl(5, d["sum"])
        db += bytes([0x30]) + zz(d["scale"])
        db += _fixed64(7, int(d["zeroCount"]))
        for fno, side in ((8, "positive"), (9, "negative")):
            sb = bytes([0x08]) + zz(side and d[side]["offset"])
            sb += py_field(2, b"".join(
                py_varint(int(c)) for c in d[side]["bucketCounts"]))
            db += py_field(fno, sb)
        db += _dbl(13, d["max"])
        return py_field(1, m["name"].encode()) + py_field(
            10, py_field(1, db))

    from loongcollector_spark.pbwire import py_field
    rm = py_field(1, _enc_attrs(
        1, _EXP_HIST["resourceMetrics"][0]["resource"]["attributes"]))
    sm = py_field(1, _enc_scope({"name": "s", "version": "1"}))
    sm += py_field(2, enc_exp_metric(
        _EXP_HIST["resourceMetrics"][0]["scopeMetrics"][0]["metrics"][0]))
    pb = py_field(1, rm + py_field(2, sm))

    jdf = spark.createDataFrame([(1, json.dumps(_EXP_HIST))],
                                "i long, content string")
    bdf = spark.createDataFrame([(1, bytearray(pb))],
                                "i long, content binary")
    jop = build_operator({"Type": "processor_otel_metric", "Format": "json"})
    bop = build_operator({"Type": "processor_otel_metric",
                          "Format": "protobuf"})
    cols = ["__name__", "__time_nano__", "__labels__", "__value__"]
    assert _rows(bop(bdf), cols) == _rows(jop(jdf), cols)


_EXEMPLAR_METRICS = {"resourceMetrics": [{
    "resource": {"attributes": [
        {"key": "host.name", "value": {"stringValue": "h"}}]},
    "scopeMetrics": [{"scope": {"name": "s", "version": "1"}, "metrics": [
        {"name": "g", "gauge": {"dataPoints": [
            {"attributes": [], "timeUnixNano": "1700000000000000000",
             "asDouble": 1.5,
             "exemplars": [
                 {"filteredAttributes": [
                     {"key": "fa", "value": {"stringValue": "fv"}}],
                  "timeUnixNano": "1700000000000000001", "asDouble": 7.25,
                  "spanId": "0102030405060708",
                  "traceId": "0102030405060708090a0b0c0d0e0f10"},
                 {"filteredAttributes": [], "timeUnixNano":
                  "1700000000000000002", "asInt": "9",
                  "spanId": "", "traceId": ""},
             ]}]}},
    ]}],
}]}


def test_otel_metric_exemplars(spark):
    """exemplarMetricToLogs (otlp_metric_parser.go:247-266): _exemplars
    rows with traceId/spanId labels (non-empty only) + filtered attrs,
    the exemplar's own time, asDouble/asInt value — emitted BEFORE the
    datapoint's value row."""
    df = spark.createDataFrame([(1, json.dumps(_EXEMPLAR_METRICS))],
                               "i long, content string")
    rows = [(r["__name__"], r["__labels__"], r["__value__"],
             r["__time_nano__"]) for r in otel_metrics_to_logs(df).collect()]
    assert rows == [
        ("g_exemplars",
         "fa#$#fv|host.name#$#h|spanId#$#0102030405060708"
         "|traceId#$#0102030405060708090a0b0c0d0e0f10",
         "7.25", "1700000000000000001"),
        ("g_exemplars", "host.name#$#h", "9", "1700000000000000002"),
        ("g", "host.name#$#h", "1.5", "1700000000000000000"),
    ]


def test_otel_metric_exemplars_protobuf_equals_json(spark):
    from loongcollector_spark.pbwire import py_field

    def enc_exemplar(ex):
        b = _fixed64(2, int(ex["timeUnixNano"]))
        if "asDouble" in ex:
            b += _dbl(3, ex["asDouble"])
        if ex["spanId"]:
            b += py_field(4, bytes.fromhex(ex["spanId"]))
        if ex["traceId"]:
            b += py_field(5, bytes.fromhex(ex["traceId"]))
        if "asInt" in ex:
            b += py_varint_field_sf64(6, int(ex["asInt"]))
        b += _enc_attrs(7, ex["filteredAttributes"])
        return b

    def py_varint_field_sf64(fno, n):
        return py_field(fno, b"", wire_type=1)[:1] + struct.pack("<q", n)

    m = _EXEMPLAR_METRICS["resourceMetrics"][0]["scopeMetrics"][0]["metrics"][0]
    dp = m["gauge"]["dataPoints"][0]
    dpb = _fixed64(3, int(dp["timeUnixNano"])) + _dbl(4, dp["asDouble"])
    for ex in dp["exemplars"]:
        dpb += py_field(5, enc_exemplar(ex))
    mb = py_field(1, m["name"].encode()) + py_field(5, py_field(1, dpb))
    rm = py_field(1, _enc_attrs(
        1, _EXEMPLAR_METRICS["resourceMetrics"][0]["resource"]["attributes"]))
    sm = py_field(1, _enc_scope({"name": "s", "version": "1"})) + py_field(2, mb)
    pb = py_field(1, rm + py_field(2, sm))

    jdf = spark.createDataFrame([(1, json.dumps(_EXEMPLAR_METRICS))],
                                "i long, content string")
    bdf = spark.createDataFrame([(1, bytearray(pb))],
                                "i long, content binary")
    jop = build_operator({"Type": "processor_otel_metric", "Format": "json"})
    bop = build_operator({"Type": "processor_otel_metric",
                          "Format": "protobuf"})
    cols = ["__name__", "__time_nano__", "__labels__", "__value__"]
    assert _rows(bop(bdf), cols) == _rows(jop(jdf), cols)


# ----------------------- Format=protojson parity -------------------------

_GO_TRACE_TEST = ("/root/reference/plugins/processor/otel/"
                  "processor_otel_trace_test.go")


@pytest.mark.skipif(not __import__("os").path.isfile(_GO_TRACE_TEST),
                    reason="reference not present")
def test_otel_trace_protojson_reference_vector(spark):
    """The reference's own TestParserOtelData: a bare ResourceSpans
    protojson doc with all three NeedDecode flags — 10 span logs,
    service adb_worker, and the NET-PASS-THROUGH id chain (protojson
    base64-parse → NeedDecode hex(base64(id)) → hex output reproduces
    the payload's original id string)."""
    import re

    src = open(_GO_TRACE_TEST).read()
    payload = re.search(r"const protoJSONData = `\n(.*?)\n`", src,
                        re.S).group(1).strip()
    df = spark.createDataFrame([(1, payload)], "i long, otel string")
    op = build_operator({
        "Type": "processor_otel_trace", "SourceKey": "otel",
        "Format": "protojson", "TraceIDNeedDecode": True,
        "SpanIDNeedDecode": True, "ParentSpanIDNeedDecode": True,
    })
    rows = [dict(r["contents"]) for r in op(df).collect()]
    assert len(rows) == 10
    assert rows[0]["service"] == "adb_worker"
    assert rows[0]["traceID"] == "31646461386336653337343330356530"
    assert rows[0]["spanID"] == "0108b2d29b652107"
    # without NeedDecode the protojson path base64-decodes the id bytes
    # and hex-encodes THOSE (ConvertResourceSpans default branch)
    import base64 as b64
    op2 = build_operator({
        "Type": "processor_otel_trace", "SourceKey": "otel",
        "Format": "protojson",
    })
    raw = b64.b64decode("31646461386336653337343330356530").hex()
    rows2 = [dict(r["contents"]) for r in op2(df).collect()]
    assert rows2[0]["traceID"] == raw


def test_otel_metric_protojson_bare_resource_metrics(spark):
    """Format=protojson takes a bare ResourceMetrics document."""
    bare = json.dumps(_METRICS["resourceMetrics"][0])
    df = spark.createDataFrame([(1, bare)], "i long, content string")
    op = build_operator({"Type": "processor_otel_metric",
                         "Format": "protojson"})
    jop = build_operator({"Type": "processor_otel_metric", "Format": "json"})
    jdf = spark.createDataFrame([(1, json.dumps(_METRICS))],
                                "i long, content string")
    cols = ["__name__", "__time_nano__", "__labels__", "__value__"]
    assert _rows(op(df), cols) == _rows(jop(jdf), cols)


# ------------------------------- logs -----------------------------------

# the reference decoder test's own JSON payload (decoder_test.go:39)
_LOGS_TEXT = (
    '{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name",'
    '"value":{"stringValue":"OtlpExporterExample"}},{"key":'
    '"telemetry.sdk.language","value":{"stringValue":"java"}},{"key":'
    '"telemetry.sdk.name","value":{"stringValue":"opentelemetry"}},'
    '{"key":"telemetry.sdk.version","value":{"stringValue":"1.18.0"}}]},'
    '"scopeLogs":[{"scope":{"name":"io.opentelemetry.example"},'
    '"logRecords":[{"timeUnixNano":"1663904182348000000",'
    '"severityNumber":9,"severityText":"INFO","body":{"stringValue":'
    '"log body1"},"attributes":[{"key":"k1","value":{"stringValue":"v1"}},'
    '{"key":"k2","value":{"stringValue":"v2"}}],"traceId":"","spanId":""},'
    '{"timeUnixNano":"1663904182348000000","severityNumber":9,'
    '"severityText":"INFO","body":{"stringValue":"log body2"},'
    '"attributes":[{"key":"k1","value":{"stringValue":"v1"}},'
    '{"key":"k2","value":{"stringValue":"v2"}}],"traceId":"","spanId":""}'
    ']}]}]}'
)


def test_otel_log_reference_textformat(spark):
    """decoder_test.go TestNormal: 2 logs, Time = ns/1e9, non-empty
    attributes + resources contents."""
    from loongcollector_spark.operators.otelops import otel_logs_to_logs

    df = spark.createDataFrame([(1, _LOGS_TEXT)], "i long, content string")
    rows = otel_logs_to_logs(df).collect()
    assert len(rows) == 2
    assert all(r["log_time"] == 1663904182 for r in rows)
    c = dict(rows[1]["contents"])
    assert c["time_unix_nano"] == "1663904182348000000"
    assert c["severity_number"] == "9"
    assert c["severity_text"] == "INFO"
    assert c["content"] == "log body2"
    assert c["attributes"] == '{"k1":"v1","k2":"v2"}'
    assert c["resources"] == (
        '{"service.name":"OtlpExporterExample",'
        '"telemetry.sdk.language":"java",'
        '"telemetry.sdk.name":"opentelemetry",'
        '"telemetry.sdk.version":"1.18.0"}'
    )


def test_otel_log_convert_golden(spark):
    """otlpDataToSLSProto.go TestConvertOtlpLogV1: unset severity → "0"/"",
    int/bool attributes marshal unquoted, sorted keys; missing attrs drop
    the attributes/resources contents entirely."""
    from loongcollector_spark.operators.otelops import otel_logs_to_logs

    doc = {"resourceLogs": [{
        "resource": {"attributes": [
            {"key": "serviceName", "value": {"stringValue": "test-service"}},
        ]},
        "scopeLogs": [{"scope": {"name": "s"}, "logRecords": [
            {"timeUnixNano": "1700000000123456789",
             "body": {"stringValue": "test-message"},
             "attributes": [
                 {"key": "attr1", "value": {"intValue": "123"}},
                 {"key": "attr2", "value": {"boolValue": True}},
             ]},
            # a bare record: no attributes at all
            {"timeUnixNano": "0", "body": {"intValue": "42"}},
        ]}],
    }]}
    # second group with NO resource attributes → no "resources" key
    bare = {"resourceLogs": [{
        "resource": {"attributes": []},
        "scopeLogs": [{"scope": {}, "logRecords": [
            {"timeUnixNano": "5000000000",
             "body": {"boolValue": False}},
        ]}],
    }]}
    df = spark.createDataFrame(
        [(1, json.dumps(doc)), (2, json.dumps(bare))],
        "i long, content string")
    rows = sorted(otel_logs_to_logs(df).collect(),
                  key=lambda r: (r["i"], r["contents"]["time_unix_nano"]))
    c0 = dict(rows[1]["contents"])   # i=1, ns=17e17 sorts after "0"
    assert c0["time_unix_nano"] == "1700000000123456789"
    assert c0["severity_number"] == "0" and c0["severity_text"] == ""
    assert c0["content"] == "test-message"
    assert c0["attributes"] == '{"attr1":123,"attr2":true}'
    assert c0["resources"] == '{"serviceName":"test-service"}'
    assert rows[1]["log_time"] == 1700000000
    c1 = dict(rows[0]["contents"])   # int body, no record attributes
    assert c1["content"] == "42" and "attributes" not in c1
    assert c1["resources"] == '{"serviceName":"test-service"}'
    c2 = dict(rows[2]["contents"])   # bool body, empty resource
    assert c2["content"] == "false"
    assert "resources" not in c2 and "attributes" not in c2
    assert rows[2]["log_time"] == 5


def _enc_logrecord(r: dict) -> bytes:
    b = _fixed64(1, int(r.get("timeUnixNano", "0")))
    if r.get("severityNumber"):
        b += py_varint((2 << 3) | 0) + py_varint(r["severityNumber"])
    if "severityText" in r:
        b += py_field(3, r["severityText"].encode())
    if "body" in r and r["body"]:
        b += py_field(5, _enc_any(r["body"]))
    b += _enc_attrs(6, r.get("attributes", []))
    return b


def _enc_logs(doc: dict) -> bytes:
    out = b""
    for rl in doc["resourceLogs"]:
        rb = py_field(1, _enc_attrs(1, rl["resource"]["attributes"]))
        for sl in rl["scopeLogs"]:
            sc = {"name": "", "version": "", **sl.get("scope", {})}
            sb = py_field(1, _enc_scope(sc))
            sb += b"".join(py_field(2, _enc_logrecord(r))
                           for r in sl["logRecords"])
            rb += py_field(2, sb)
        out += py_field(1, rb)
    return out


def test_otel_log_protobuf_equals_json(spark):
    """service_http_server Format=otlp_logv1 binary wire decode feeds the
    same plan as the JSON body (decoder.go Content-Type switch)."""
    doc = json.loads(_LOGS_TEXT)
    pb = _enc_logs(doc)
    jdf = spark.createDataFrame([(1, _LOGS_TEXT)], "i long, content string")
    bdf = spark.createDataFrame(
        [(1, pb.decode("latin-1"))], "i long, content string")
    op = build_operator({"Type": "service_http_server",
                         "Format": "otlp_logv1"})
    jrows = sorted(dict(r["contents"]).items() for r in op(jdf).collect())
    brows = sorted(dict(r["contents"]).items() for r in op(bdf).collect())
    assert jrows == brows and len(brows) == 2


def test_service_otlp_logs_mode(spark):
    df = spark.createDataFrame([(1, _LOGS_TEXT)], "i long, content string")
    op = build_operator({"Type": "service_otlp", "Mode": "logs"})
    assert op(df).count() == 2
