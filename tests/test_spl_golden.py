"""SPL golden-value parity with the reference's SplUnittest.cpp — the
semantic complement to the execution-only corpus replay: same inputs,
same pipelines, asserted OUTPUT VALUES (APSARA_TEST_EQUAL analogs, cited
per case)."""

from __future__ import annotations

import pytest

from loongcollector_spark.spl import spl_run


@pytest.fixture(scope="module")
def golden_df(spark):
    # the event contents SplUnittest feeds ProcessorSPL
    rows = [
        ("value_3_0", '{"body": {"a": 1, "b": 2}}', '{"a1":"bbbb","c":"d"}',
         "10.0.0.0 GET", "a,b,c", "k1=v1&k2=v2?k3=v3"),
        ("value_4_0", '{"body": {"a": 3, "b": 4}}', '{"a1":"ccc","c1":"d1"}',
         "10.0.0.1 POST", "e,f,g", "k11=v11&k22=v22?k33=v33"),
    ]
    return spark.createDataFrame(
        rows,
        "content string, content_json string, content_obj string, "
        "content_line string, content_csv string, content_kv string",
    )


def test_where_equality(golden_df):
    """SplUnittest.cpp:93-138: `where content='value_3_0'` keeps exactly
    the matching event."""
    out = spl_run(golden_df, "* | where content='value_3_0'")["out"]
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["content"] == "value_3_0"


def test_json_extract_values(golden_df):
    """SplUnittest.cpp:152-190: json_extract of $.body.a / $.body.b
    stringifies the scalars ('1', '2')."""
    out = spl_run(
        golden_df,
        "* | extend a=json_extract(content_json, '$.body.a'),"
        " b=json_extract(content_json, '$.body.b')"
        " | where content='value_3_0' | project a, b",
    )["out"]
    r = out.first()
    assert (r["a"], r["b"]) == ("1", "2")


def test_parse_json_dynamic_keys(golden_df):
    """SplUnittest.cpp:199-257: schema-dynamic parse-json surfaces each
    event's own keys ('a1'/'c' vs 'a1'/'c1')."""
    out = spl_run(golden_df, "* | parse-json content_obj")["out"]
    got = {r["content"]: r for r in out.collect()}
    assert got["value_3_0"]["a1"] == "bbbb" and got["value_3_0"]["c"] == "d"
    assert got["value_4_0"]["a1"] == "ccc" and got["value_4_0"]["c1"] == "d1"
    assert got["value_3_0"]["c1"] is None  # key absent on this event


def test_parse_regexp_values(golden_df):
    """SplUnittest.cpp:268-329: two-group extraction to ip/method."""
    out = spl_run(
        golden_df, r"* | parse-regexp content_line, '(\S+)\s+(\w+)' as ip, method"
    )["out"]
    got = {r["ip"]: r["method"] for r in out.collect()}
    assert got == {"10.0.0.0": "GET", "10.0.0.1": "POST"}


def test_parse_csv_values(golden_df):
    """SplUnittest.cpp:339-403: CSV split into x, y, z per event."""
    out = spl_run(golden_df, "* | parse-csv content_csv as x, y, z")["out"]
    got = {r["x"]: (r["y"], r["z"]) for r in out.collect()}
    assert got == {"a": ("b", "c"), "e": ("f", "g")}


def test_parse_kv_regexp_values(golden_df):
    """SplUnittest.cpp:413-475 (TestRegexKV): `parse-kv -regexp` with a
    (key)(value) pattern extracts every pair of each event."""
    out = spl_run(
        golden_df, r"* | parse-kv -regexp content_kv, '(\w+)=(\w+)'"
    )["out"]
    got = {r["content"]: r for r in out.collect()}
    a = got["value_3_0"]
    assert (a["k1"], a["k2"], a["k3"]) == ("v1", "v2", "v3")
    b = got["value_4_0"]
    assert (b["k11"], b["k22"], b["k33"]) == ("v11", "v22", "v33")
    assert a["k11"] is None  # other event's keys stay null here
