"""Prometheus text parse + relabel vs the reference's own unittest cases
(core/unittest/prometheus/TextParserUnittest.cpp, RelabelUnittest.cpp)."""

from __future__ import annotations

import hashlib

import pytest

from loongcollector_spark.operators import build_operator
from loongcollector_spark.operators.prom import prom_parse_metric, prom_relabel


def _parse(spark, lines, honor=True, default_ms=0):
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lines)], "i long, content string"
    )
    rows = prom_parse_metric(df, "content", honor, default_ms).orderBy("i").collect()
    return [
        (r["__name__"], dict(sorted(r["labels"].items())), r["value"], r["ts_ms"])
        for r in rows
    ]


def test_prom_parse_tags_and_timestamp(spark):
    # TextParserUnittest::TestParseMetricWithTagsAndTimestamp
    got = _parse(spark, [
        'test_metric{k1="v1", k2="v2"} 9.9410452992e+10 1715829785083',
        'test_metric2{k1="v1", k2="v2"} 2.0 1715829785083',
        'test_metric3{k1="v1",k2="v2"} 4.2 92233720368547758080000',  # overflow
    ])
    assert len(got) == 2
    name, labels, value, ts = got[0]
    assert name == "test_metric" and value == 9.9410452992e10
    assert ts == 1715829785083
    assert labels == {"__name__": "test_metric", "k1": "v1", "k2": "v2"}


def test_prom_parse_multiple_line_shapes(spark):
    # TextParserUnittest::TestParseMultipleLines — 7 of these parse
    got = _parse(spark, [
        "# begin",
        'test_metric1{k1="v1", k2="v 1.0',
        '  test_metric2{k1="v1", k2="v2"} 2.0 1234567890',
        'test_metric3{k1="v1",k2="v2"} 9.9410452992e+10',
        '  test_metric4{k1="v1",k2="v2"} 9.9410452992e+10 1715829785083',
        '  test_metric5{k1="v1", k2="v2" } 9.9410452992e+10 1715829785083',
        'test_metric6{k1="v1",k2="v2",} 9.9410452992e+10 1715829785083',
        'test_metric7{k1="v1",k2="v2", } 9.9410452992e+10 1715829785083  ',
        'test_metric8{k1="v1", k2="v2", } 9.9410452992e+10 1715829785083',
        "# end",
    ])
    assert [g[0] for g in got] == [f"test_metric{i}" for i in range(2, 9)]
    assert got[0][3] == 1234567890000  # seconds scale to millis


def test_prom_parse_failures(spark):
    # TextParserUnittest::TestParseFaliure — every one of these drops
    bad = [
        "", " ", "\t", "\t  \r", "#foobar",
        "a{", "a { ", "a {foo", "a {foo} 3", "a {foo  =",
        'a {foo  ="bar', 'a {foo  ="b\\ar', 'a {foo  = "bar"',
        'a {foo  ="bar",', 'a {foo  ="bar" , ', 'a {foo  ="bar" , baz } 2',
        'a{"__name__":"x","host":"h"} 12', 'a{host:"myhost"} 12',
        '{foo="bar"}', "{foo='bar'} 23",
        "aaa", " aaa", " aaa ", 'foo bar', 'foo bar 124', 'foo 123 bar',
        "fooInf",  # FSM: value letters glue onto the name, never re-split
    ]
    assert _parse(spark, bad) == []


def test_prom_parse_success_shapes(spark):
    # TextParserUnittest::TestParseSuccess highlights
    got = _parse(spark, [
        "foobar 123",
        "foobar 123.456 1000000000\n".strip("\n"),
        "foo{bar=\"#1 az\"} 24",
        r'mssql{loginname="domain\somelogin",env="develop"} 56',
        r'foo{bar="b\"a\\z"} -1.2',
        'foo {bar="baz",aa="",x="y"} 1 1000000000',
        "\t foo\t {  } 0.3\t 1000000000",
        'vm_accounting\t{   name="vminsertRows", accountID = "1" , projectID=\t"1"   } 277779100',
        "abc 123 1000000000 # foobar",
        "abc 123 1000000000.789",
    ], default_ms=7)
    assert got[0] == ("foobar", {"__name__": "foobar"}, 123.0, 7)
    assert got[1][3] == 1000000000000
    assert got[2][1]["bar"] == "#1 az"
    # incorrectly-escaped backslash is a must-support real-world case
    assert got[3][1]["loginname"] == "domain\\somelogin"
    assert got[4][1]["bar"] == 'b"a\\z' and got[4][2] == -1.2
    assert got[5][1]["aa"] == "" and got[5][3] == 1000000000000
    assert got[6][0] == "foo" and got[6][2] == 0.3
    assert got[7][1]["projectID"] == "1"
    assert got[8][3] == 1000000000000      # exemplar ignored
    assert got[9][3] == 1000000000789      # float seconds timestamp


def test_prom_parse_inf_nan(spark):
    import math

    got = _parse(spark, [
        "foo Infinity", "bar +Infinity", "baz -infinity",
        "aaa +inf", "bbb -INF", "ccc INF", "ddd NaN",
    ])
    vals = [g[2] for g in got]
    assert vals[:6] == [float("inf"), float("inf"), float("-inf"),
                        float("inf"), float("-inf"), float("inf")]
    assert math.isnan(vals[6])


def test_prom_parse_honor_timestamps(spark):
    # TextParserUnittest::TestHonorTimestamps
    got = _parse(spark, ["abc 123 456"], honor=False, default_ms=789111)
    assert got == [("abc", {"__name__": "abc"}, 123.0, 789111)]
    # honor=True + a sub-10-digit explicit timestamp invalidates the line
    assert _parse(spark, ["abc 123 456"], honor=True) == []


_K8S = {
    "__meta_kubernetes_pod_ip": "172.17.0.3",
    "__meta_kubernetes_pod_label_app": "node-exporter",
    "pod_ip": "172.17.0.3",
}


def _relabel(spark, cfgs, labels=_K8S):
    df = spark.createDataFrame([(1, labels)], "i long, labels map<string,string>")
    rows = prom_relabel(df, cfgs).collect()
    return dict(sorted(rows[0]["labels"].items())) if rows else None


def test_relabel_actions(spark):
    # RelabelUnittest golden cases
    out = _relabel(spark, [{
        "action": "replace", "replacement": "${1}:9100", "regex": "(.*)",
        "source_labels": ["__meta_kubernetes_pod_ip"],
        "target_label": "__address__",
    }])
    assert out["__address__"] == "172.17.0.3:9100"

    assert _relabel(spark, [{"action": "keep", "regex": "172.*",
                             "source_labels": ["__meta_kubernetes_pod_ip"]}])
    assert _relabel(spark, [{"action": "drop", "regex": "172.*",
                             "source_labels": ["__meta_kubernetes_pod_ip"]}]) is None
    assert _relabel(spark, [{"action": "keepequal", "target_label": "pod_ip",
                             "source_labels": ["__meta_kubernetes_pod_ip"]}])
    assert _relabel(spark, [{"action": "dropequal", "target_label": "pod_ip",
                             "source_labels": ["__meta_kubernetes_pod_ip"]}]) is None

    out = _relabel(spark, [{"action": "uppercase", "target_label": "__meta_kubernetes_pod_label_app",
                            "source_labels": ["__meta_kubernetes_pod_label_app"]}])
    assert out["__meta_kubernetes_pod_label_app"] == "NODE-EXPORTER"

    out = _relabel(spark, [{"action": "hashmod", "modulus": 255, "target_label": "hash_val",
                            "source_labels": ["__meta_kubernetes_pod_ip"]}])
    expect = int.from_bytes(hashlib.md5(b"172.17.0.3").digest()[8:], "big") % 255
    assert out["hash_val"] == str(expect)

    out = _relabel(spark, [{"action": "labelmap",
                            "regex": "__meta_kubernetes_pod_label_(.+)",
                            "replacement": "k8s_$1"}])
    assert out["k8s_app"] == "node-exporter"

    out = _relabel(spark, [{"action": "labeldrop", "regex": "__meta.*"}])
    assert set(out) == {"pod_ip"}
    out = _relabel(spark, [{"action": "labelkeep", "regex": "__meta.*"}])
    assert set(out) == {"__meta_kubernetes_pod_ip", "__meta_kubernetes_pod_label_app"}

    assert _relabel(spark, [{"action": "dropmetric", "match_list": ["m1"]}],
                    {"__name__": "m1"}) is None
    assert _relabel(spark, [{"action": "dropmetric", "match_list": ["m2"]}],
                    {"__name__": "m1"}) is not None


def test_relabel_replace_no_match_and_delete(spark):
    # no match -> untouched (Relabel.cpp:174-176)
    out = _relabel(spark, [{"action": "replace", "regex": "10\\..*",
                            "source_labels": ["__meta_kubernetes_pod_ip"],
                            "target_label": "x", "replacement": "$1"}])
    assert "x" not in out
    # empty replacement result -> target label deleted (Relabel.cpp:180-183)
    out = _relabel(spark, [{"action": "replace", "regex": "(.*)",
                            "source_labels": ["missing_label"],
                            "target_label": "pod_ip", "replacement": "$1"}])
    assert "pod_ip" not in out


def test_prom_registry_operators(spark):
    df = spark.createDataFrame(
        [(1, 'up{job="node"} 1 1715829785083')], "i long, content string"
    )
    op = build_operator({"Type": "processor_prom_parse_metric",
                         "SourceKey": "content"})
    parsed = op(df)
    op2 = build_operator({"Type": "processor_prom_relabel_metric",
                          "RelabelConfigs": [
                              {"action": "keep", "regex": "up",
                               "source_labels": ["__name__"]}]})
    row = op2(parsed).collect()[0]
    assert row["labels"]["job"] == "node" and row["value"] == 1.0

    with pytest.raises(ValueError):
        build_operator({"Type": "processor_prom_relabel_metric",
                        "RelabelConfigs": [{"regex": ".*"}]})
