"""ext_basicauth / ext_request_breaker / ext_default_encoder goldens
(plugins/extension/{basicauth,request_breaker,default_encoder})."""

import base64
import json
import os

import pytest

from loongcollector_spark.operators import build_operator
from loongcollector_spark.operators.httpext import (
    basic_auth_header, breaker_replay, response_success,
)


def test_basic_auth_header_rfc7617_golden():
    # the RFC 7617 §2 example pair
    assert (basic_auth_header("Aladdin", "open sesame")
            == "Basic QWxhZGRpbjpvcGVuIHNlc2FtZQ==")
    # Go SetBasicAuth is plain base64 of user:pass — verify round trip
    v = basic_auth_header("u", "p:with:colons")
    assert base64.b64decode(v.split(" ", 1)[1]).decode() == "u:p:with:colons"


def test_ext_basicauth_adds_and_overwrites_header(spark):
    op = build_operator(
        {"Type": "ext_basicauth", "Username": "u1", "Password": "pw"})
    df = spark.createDataFrame([("a",)], "x string")
    out = op(df).collect()[0]
    assert out["__headers__"]["Authorization"] == basic_auth_header("u1", "pw")

    # existing __headers__ map: other keys survive, Authorization replaced
    from pyspark.sql import functions as F
    seeded = df.withColumn("__headers__", F.create_map(
        F.lit("Authorization"), F.lit("stale"),
        F.lit("X-Trace"), F.lit("t1")))
    out2 = op(seeded).collect()[0]["__headers__"]
    assert out2["Authorization"] == basic_auth_header("u1", "pw")
    assert out2["X-Trace"] == "t1"


def test_response_success_is_status_lt_500(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(200,), (404,), (499,), (500,), (503,)],
                               "status int")
    got = [r.ok for r in df.select(
        response_success(F.col("status")).alias("ok")).collect()]
    assert got == [True, True, True, False, False]


def test_breaker_replay_hand_computed(spark):
    # endpoint e: failures at t=1,2 then request at t=3 sees ratio 2/2=1.0
    # → would_break; at t=15 the window [5,14] is empty → closed.
    rows = [
        ("e", "2026-01-01 00:00:01", False),
        ("e", "2026-01-01 00:00:02", False),
        ("e", "2026-01-01 00:00:03", True),
        ("e", "2026-01-01 00:00:04", True),
        ("e", "2026-01-01 00:00:15", True),
        ("f", "2026-01-01 00:00:03", True),   # other endpoint: isolated
    ]
    df = spark.createDataFrame(rows, "endpoint string, ts string, ok boolean")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    got = {(r.endpoint, str(r.ts)): (r.win_total, r.win_failed,
                                     r.fail_ratio_milli, r.would_break)
           for r in breaker_replay(df, failure_ratio=0.5, window_s=10).collect()}
    assert got[("e", "2026-01-01 00:00:01")] == (0, 0, 0, False)
    assert got[("e", "2026-01-01 00:00:03")] == (2, 2, 1000, True)
    # t=4: window has t1,t2 fail + t3 ok → 2/3 > 0.5 → break
    assert got[("e", "2026-01-01 00:00:04")] == (3, 2, 666, True)
    # t=15: window [5, 14.999999] is empty → closed breaker
    assert got[("e", "2026-01-01 00:00:15")] == (0, 0, 0, False)
    assert got[("f", "2026-01-01 00:00:03")] == (0, 0, 0, False)


def test_breaker_defaults_match_reference_init(spark):
    # request_breaker.go:64-70: FailureRatio 0.10, WindowInSeconds 10
    op = build_operator({"Type": "ext_request_breaker"})
    rows = [("e", "2026-01-01 00:00:01", False),
            ("e", "2026-01-01 00:00:05", True),   # 1/1 fail > 0.10 → break
            ("e", "2026-01-01 00:00:12", True)]   # window [2,11]: fail@1 out
    df = spark.createDataFrame(rows, "endpoint string, ts string, ok boolean")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    got = {str(r.ts): r.would_break for r in op(df).collect()}
    assert got["2026-01-01 00:00:05"] is True
    assert got["2026-01-01 00:00:12"] is False


def test_default_encoder_dispatch(spark):
    # prometheus resolves (case/space-insensitive, encoder.go:44) and
    # produces the same WriteRequest frame as the direct encoder call
    op = build_operator({"Type": "ext_default_encoder",
                         "Format": "  Prometheus ", "SeriesLimit": 2})
    df = spark.createDataFrame(
        [("m1", "a#$#1", "1700000000000000000", "2.0"),
         ("m1", "a#$#2", "1700000000000000000", "3.0"),
         ("m1", "a#$#3", "1700000000000000000", "4.0")],
        "__name__ string, __labels__ string, __time_nano__ string, __value__ string")
    out = op(df)
    assert "write_request_pb" in out.columns
    # SeriesLimit is a CAP, not an exact-packing contract (the salted
    # chunking window may flush partial batches like the reference
    # does): every request holds <= 2 series of one name, all 3 series
    # are shipped
    reqs = out.collect()
    assert 2 <= len(reqs) <= 3
    assert all(r["n_series"] <= 2 for r in reqs)
    assert sum(r["n_series"] for r in reqs) == 3

    with pytest.raises(ValueError, match="not supported encode format"):
        build_operator({"Type": "ext_default_encoder", "Format": "json"})


def test_flusher_http_authenticator_writes_headers(spark, tmp_path):
    from loongcollector_spark.flushers import build_flusher

    path = str(tmp_path / "http_out")
    fl = build_flusher({
        "Type": "flusher_http", "Path": path,
        "Authenticator": {"Type": "ext_basicauth",
                          "Options": {"Username": "u", "Password": "p"}},
        "RequestInterceptors": [
            {"Type": "ext_request_breaker",
             "Options": {"FailureRatio": 0.2}}],
    })
    df = spark.createDataFrame([("c1", 0, "user", "hello")],
                               "conv_id string, turn_idx int, role string, text string")
    fl(df)
    hdrs = json.load(open(os.path.join(path, "_request_headers.json")))
    assert hdrs == {"Authorization": basic_auth_header("u", "p")}

    # a non-authenticator extension type fails the build (flusher_http.go:310-313)
    with pytest.raises(ValueError, match="ClientAuthenticator"):
        build_flusher({"Type": "flusher_http", "Path": path,
                       "Authenticator": {"Type": "ext_groupinfo_filter"}})
