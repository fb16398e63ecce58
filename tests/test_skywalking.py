"""service_skywalking v3 log conversions (plugins/input/skywalkingv3/
logging_handle.go:96-178): convertFormat content keys + time split,
attribute/resource Go-JSON, trace gating, and the browser-error quirks
(rune line/col, errorUrl = col)."""

from __future__ import annotations

import json

from loongcollector_spark.operators import build_operator
from loongcollector_spark.operators.skywalkingops import go_rune

LOG_SCHEMA = (
    "timestamp long, service string, service_instance string, "
    "endpoint string, body_type string, body_text string, "
    "trace_id string, trace_segment_id string, span_id long, "
    "tags map<string,string>"
)


def test_convert_format_full(spark):
    row = (1735732800123, "svc-a", "inst-1", "/api/x", "TEXT",
           "hello <world>", "tid-1", "seg-9", 3, {"level": "INFO"})
    df = spark.createDataFrame([row], LOG_SCHEMA)
    [r] = build_operator({"Type": "service_skywalking"})(df).collect()
    # SetLogTimeWithNano(ts/1000, (ts*1e6)%1e9)
    assert r["time"] == 1735732800
    assert r["time_ns"] == 123_000_000
    c = r["contents"]
    assert c["otlp.name"] == "apache-skywalking"
    assert c["service"] == "svc-a"
    assert c["content"] == "hello <world>"
    assert c["timeUnixNano"] == "1735732800123"
    assert c["traceID"] == "tid-1"
    assert c["spanID"] == "seg-9.3"
    # Go json.Marshal: sorted keys, HTML escapes in strings
    assert json.loads(c["attribute"]) == {"endpoint": "/api/x",
                                          "level": "INFO"}
    assert json.loads(c["resource"]) == {"serviceInstance": "inst-1"}
    assert c["attribute"].index('"endpoint"') < c["attribute"].index(
        '"level"')


def test_convert_format_no_trace_and_tag_override(spark):
    rows = [
        (5, "s", "i", "/e", "JSON", '{"a":1}', None, None, None, None),
        (5, "s", "i", "/e", "YAML", "a: 1", None, None, None,
         {"endpoint": "/override"}),
    ]
    df = spark.createDataFrame(rows, LOG_SCHEMA)
    out = build_operator({"Type": "service_skywalking"})(df).collect()
    c0, c1 = out[0]["contents"], out[1]["contents"]
    assert "traceID" not in c0 and "spanID" not in c0
    assert out[0]["time"] == 0 and out[0]["time_ns"] == 5_000_000
    # a tag named endpoint overwrites the endpoint attribute (Go map
    # assignment order, logging_handle.go:165-172)
    assert json.loads(c1["attribute"]) == {"endpoint": "/override"}


def test_go_rune_matches_python_chr(spark):
    vals = [0, 65, 0x7F, 0x80, 0x3B1, 0x7FF, 0x800, 0x4E2D, 0xFFFF,
            0x10000, 0x1F600, 0x10FFFF]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = [r[0] for r in df.select(go_rune(df.n)).collect()]
    assert got == [chr(v) for v in vals]
    bad = [-1, 0xD800, 0xDFFF, 0x110000]
    df = spark.createDataFrame([(v,) for v in bad], "n long")
    got = [r[0] for r in df.select(go_rune(df.n)).collect()]
    assert got == ["�"] * len(bad)   # Go string(invalid rune)


def test_browser_error_quirks(spark):
    row = (2000, "web", "u-1", "1.2.3", "ERROR", "/page", "High",
           "boom", 65, 66, "stack\ntrace", True)
    df = spark.createDataFrame(
        [row],
        "time long, service string, unique_id string, "
        "service_version string, category string, page_path string, "
        "grade string, message string, line int, col int, "
        "stack string, first_reported_error boolean")
    [r] = build_operator(
        {"Type": "service_skywalking", "Mode": "browser_error"})(df
                                                                 ).collect()
    c = r["contents"]
    assert r["time"] == 2 and r["time_ns"] == 0
    assert c["line"] == "A" and c["col"] == "B"   # string(int32) = rune
    assert c["errorUrl"] == "B"                   # takes Col, verbatim
    assert c["firstReportedError"] == "true"
    assert c["category"] == "ERROR" and c["uniqueId"] == "u-1"


def test_unknown_mode_rejected(spark):
    try:
        build_operator({"Type": "service_skywalking", "Mode": "metrics"})
    except ValueError as e:
        assert "unknown Mode" in str(e)
    else:
        raise AssertionError("expected ValueError")
