"""service_http_server decoder family vs the reference's own decoder
unittests (pkg/protocol/decoder/influxdb/decoder_test.go), plus journal
export-format parsing (plugins/input/journal/input_journal.go)."""

from __future__ import annotations

import pytest

from loongcollector_spark.operators import build_operator
from loongcollector_spark.operators.decoders import (
    go_g_str,
    influx_decode,
    journal_decode,
    statsd_decode,
)

# decoder_test.go:29-55 — verbatim
TEXT_FORMAT = """
# integer value
cpu value=1i

# float value
cpu_load value=1

cpu_load value=1.0

cpu_load value=1.2

# boolean value
error fatal=true

# string value
event msg="logged out"

# multiple values
cpu load=10,alert=true,reason="value above maximum threshold"

cpu,host=server01,region=uswest value=1 1434055562000000000
cpu,host=server02,region=uswest value=3 1434055562000010000
temperature,machine=unit42,type=assembly internal=32,external=100 1434055562000000035
temperature,machine=unit143,type=assembly internal=22,external=130 1434055562005000035
cpu,host=server\\ 01,region=uswest value=1,msg="all systems nominal"
cpu,host=server\\ 01,region=us\\,west value_int=1i
"""

# decoder_test.go:66-69 — verbatim
TXT_WITH_DOT_NAMES = """
cpu.load,host=server01,region=uswest value=1 1434055562000000000
cpu.load,host.dd=server02,region=uswest tt="xx",value=3 1434055562000010000
"""


def _influx(spark, body, **kw):
    df = spark.createDataFrame([(body,)], "content string")
    rows = influx_decode(df, "content", **kw).collect()
    return [r.asDict() for r in rows]


def test_influx_text_format_counts_15_logs(spark):
    # TestNormal (decoder_test.go:167-176): 15 logs, strings skipped
    rows = _influx(spark, TEXT_FORMAT)
    assert len(rows) == 15
    for r in rows:
        assert set(r) >= {"__name__", "__labels__", "__value__",
                          "__time_nano__"}


def test_influx_fields_extend_goldens(spark):
    # TestFieldsExtend case 1 (decoder_test.go:72-110), FieldsExtend=true
    rows = _influx(spark, TXT_WITH_DOT_NAMES, fields_extend=True)
    got = {
        (r["__name__"], r["__value__"], r["__labels__"],
         r["__time_nano__"], r["__type__"], r["__field__"])
        for r in rows
    }
    assert got == {
        ("cpu.load", "1", "host#$#server01|region#$#uswest",
         1434055562000000000, "float", "value"),
        ("cpu.load:tt", "xx", "host.dd#$#server02|region#$#uswest",
         1434055562000010000, "string", "tt"),
        ("cpu.load", "3", "host.dd#$#server02|region#$#uswest",
         1434055562000010000, "float", "value"),
    }


def test_influx_sls_metrics_format_goldens(spark):
    # TestFieldsExtend case 2 (decoder_test.go:111-139):
    # EnableSlsMetricsFormat sanitizes names and label keys; string
    # fields still skipped without FieldsExtend
    rows = _influx(spark, TXT_WITH_DOT_NAMES, sls_metrics_format=True)
    got = {(r["__name__"], r["__value__"], r["__labels__"]) for r in rows}
    assert got == {
        ("cpu_load", "1", "host#$#server01|region#$#uswest"),
        ("cpu_load", "3", "host_dd#$#server02|region#$#uswest"),
    }


def test_influx_escapes_and_types(spark):
    rows = _influx(
        spark,
        'm,host=a\\ b,reg=c\\,d v=1i,u=2u,b=false,s="q\\"z",f=2.5 7\n'
        'weather temp\\ low=9 8',
        fields_extend=True,
    )
    by_field = {r["__field__"]: r for r in rows}
    assert by_field["v"]["__value__"] == "1"
    assert by_field["v"]["__type__"] == "int"
    assert by_field["u"]["__value__"] == "2"
    assert by_field["b"]["__value__"] == "0"
    assert by_field["b"]["__type__"] == "bool"
    assert by_field["s"]["__value__"] == 'q"z'
    assert by_field["f"]["__value__"] == "2.5"
    assert by_field["v"]["__labels__"] == "host#$#a b|reg#$#c,d"
    assert by_field["temp low"]["__name__"] == "weather:temp low"
    assert by_field["temp low"]["__time_nano__"] == 8


def test_influx_db_tag_and_default_time(spark):
    rows = _influx(spark, "cpu value=1", fields_extend=True, db="mydb",
                   default_ts_ns=42)
    assert rows[0]["__tag__:db"] == "mydb"
    assert rows[0]["__time_nano__"] == 42
    # without FieldsExtend no extras at all (decoder.go:205-216)
    rows = _influx(spark, "cpu value=1", db="mydb")
    assert "__tag__:db" not in rows[0] and "__type__" not in rows[0]


def test_go_g_float_formatting(spark):
    # strconv.FormatFloat(v,'g',-1,64) — %e iff exp < -4 or >= 6
    from pyspark.sql import functions as F

    cases = [
        (0.0, "0"), (0.64, "0.64"), (10.5, "10.5"), (123.0, "123"),
        (100000.0, "100000"), (999999.5, "999999.5"),
        (1000000.0, "1e+06"), (1234567.8, "1.2345678e+06"),
        (12345678.0, "1.2345678e+07"), (1e21, "1e+21"),
        (0.001, "0.001"), (0.0001, "0.0001"), (0.00064, "0.00064"),
        (0.00001, "1e-05"), (-2.5, "-2.5"), (1.5e-10, "1.5e-10"),
        (-1e6, "-1e+06"),
    ]
    df = spark.createDataFrame(cases, "v double, want string")
    bad = df.select("v", "want", go_g_str(F.col("v")).alias("got")) \
        .filter("want != got").collect()
    assert not bad, bad


def test_statsd_dogstatsd_lines(spark):
    body = ("page.views:1|c|@0.1|#env:prod,region:us\n"
            "lat:3.5|ms\n"
            "users:uniq|s\n"          # set type: non-numeric, dropped
            "gauge:-7|g|#a:b")
    df = spark.createDataFrame([(body,)], "content string")
    rows = [r.asDict() for r in statsd_decode(df, default_ts_ns=7).collect()]
    assert len(rows) == 3
    by_name = {r["__name__"]: r for r in rows}
    assert by_name["page.views"]["__labels__"] == "env#$#prod|region#$#us"
    assert by_name["page.views"]["__value__"] == 1.0
    assert by_name["page.views"]["__type__"] == "c"
    assert by_name["lat"]["__value__"] == 3.5
    assert by_name["lat"]["__labels__"] == ""
    assert by_name["gauge"]["__value__"] == -7.0
    assert all(r["__time_nano__"] == 7 for r in rows)


JOURNAL_EXPORT = (
    "__REALTIME_TIMESTAMP=1700000000123456\n"
    "__MONOTONIC_TIMESTAMP=555\n"
    "PRIORITY=3\nSYSLOG_FACILITY=4\n"
    "_SYSTEMD_UNIT=nginx.service\nMESSAGE=boom\n"
    "\n"
    "__REALTIME_TIMESTAMP=1700000001000000\n"
    "PRIORITY=6\n_SYSTEMD_UNIT=cron.service\n"
    "SYSLOG_IDENTIFIER=crond\nMESSAGE=ok=fine\n"
)


def test_journal_decode_fields_and_maps(spark):
    df = spark.createDataFrame([(JOURNAL_EXPORT,)], "content string")
    rows = journal_decode(
        df, parse_priority=True, parse_syslog_facility=True
    ).orderBy("_realtime_timestamp_").collect()
    assert len(rows) == 2
    a, b = rows
    assert a["_realtime_timestamp_"] == "1700000000123456"
    assert a["_monotonic_timestamp_"] == "555"
    # PriorityConversionMap / SyslogFacilityString (input_journal.go:52-89)
    assert a["fields"]["PRIORITY"] == "error"
    assert a["fields"]["SYSLOG_FACILITY"] == "auth"
    assert a["fields"]["MESSAGE"] == "boom"
    # value containing '=' splits on the FIRST separator only
    assert b["fields"]["MESSAGE"] == "ok=fine"
    assert b["fields"]["PRIORITY"] == "informational"
    # __-prefixed address fields are not duplicated into the map
    assert "__REALTIME_TIMESTAMP" not in a["fields"]


def test_service_journal_unit_filter(spark):
    df = spark.createDataFrame([(JOURNAL_EXPORT,)], "content string")
    op = build_operator({
        "Type": "service_journal", "Units": ["nginx.service"],
    })
    rows = op(df).collect()
    assert len(rows) == 1
    assert rows[0]["fields"]["_SYSTEMD_UNIT"] == "nginx.service"
    op2 = build_operator({
        "Type": "service_journal", "Identifiers": ["crond"],
    })
    assert op2(df).count() == 1


def test_service_http_server_format_dispatch(spark):
    df = spark.createDataFrame(
        [("cpu,host=h value=2.5 9",)], "content string")
    out = build_operator({
        "Type": "service_http_server", "Format": "influxdb",
    })(df)
    r = out.collect()[0]
    assert (r["__name__"], r["__value__"], r["__time_nano__"]) == \
        ("cpu", "2.5", 9)
    out2 = build_operator({
        "Type": "service_http_server", "Format": "prometheus",
    })(spark.createDataFrame(
        [('m{a="b"} 4 1715829785083',)], "content string"))
    r2 = out2.collect()[0]
    assert r2["__name__"] == "m" and r2["value"] == 4.0
    with pytest.raises(ValueError):
        build_operator({"Type": "service_http_server",
                        "Format": "bogus"})(df)


def test_service_http_server_sls_format_decodes_loggroup(spark):
    """Format 'sls' bodies are sls_logs.LogGroup wire format — the
    decoder must walk THAT schema (Logs=1 submessages), not the
    PipelineEventGroup one, or every push decodes to zero rows."""
    from loongcollector_spark.serializer import sls_pb_loggroup_frame

    from datetime import datetime

    src = spark.createDataFrame(
        [("c1", 0, datetime(2026, 1, 1, 0, 0, 0), "hello"),
         ("c1", 1, datetime(2026, 1, 1, 0, 0, 1), "world")],
        "conv_id string, turn_idx int, ts timestamp, text string",
    )
    from pyspark.sql import functions as F

    blobs = sls_pb_loggroup_frame(src, group_cols=("conv_id",)) \
        .select(F.lit(0).alias("group_id"),
                F.col("loggroup_pb").alias("content"))
    out = build_operator({
        "Type": "service_http_server", "Format": "sls",
    })(blobs).collect()
    got = sorted(r["contents"]["text"] for r in out)
    assert got == ["hello", "world"]


def test_service_http_server_otlp_logv1(spark):
    # round 3: otlp_logv1 decodes (ConvertOtlpLogV1) instead of refusing;
    # a JSON body (Content-Type switch analog: leading '{') parses fully
    body = ('{"resourceLogs":[{"resource":{"attributes":[]},"scopeLogs":'
            '[{"scope":{"name":"s"},"logRecords":[{"timeUnixNano":'
            '"5000000000","severityNumber":9,"severityText":"INFO",'
            '"body":{"stringValue":"hello"}}]}]}]}')
    df = spark.createDataFrame([(body,)], "content string")
    out = build_operator({"Type": "service_http_server",
                          "Format": "otlp_logv1"})(df).collect()
    assert len(out) == 1
    c = dict(out[0]["contents"])
    assert c["content"] == "hello" and c["severity_text"] == "INFO"
    assert out[0]["log_time"] == 5


def test_service_otlp_modes(spark):
    import json

    span = {"resourceSpans": [{"resource": {"attributes": []}, "scopeSpans": [
        {"scope": {}, "spans": [{
            "traceId": "0" * 32, "spanId": "0" * 16, "name": "op",
            "kind": 1, "startTimeUnixNano": "1", "endTimeUnixNano": "2",
            "status": {}, "attributes": [],
        }]}]}]}
    df = spark.createDataFrame([(json.dumps(span),)], "content string")
    out = build_operator({"Type": "service_otlp", "Mode": "traces"})(df)
    assert out.count() == 1


class TestPyroscopeGroups:
    """pyroscope groups-format ingest (raw/profile.go:57-165; decoder.go
    default branch)."""

    def test_full_field_contract(self, spark):
        from loongcollector_spark.operators import build_operator
        from loongcollector_spark.functions.xxh import xxh64

        body = ("main;runtime.doWork cpu.go:12;leafFn cpu.go:40 3\n"
                "main;other 1\n"
                "trailing;semi; 2\n")
        df = spark.createDataFrame([(body,)], "content string")
        op = build_operator({
            "Type": "service_http_server", "Format": "pyroscope",
            "SpyName": "go", "Units": "samples", "SampleRate": 100,
            "AggregationType": "sum", "StartTimeSec": 1700000000,
            "EndTimeSec": 1700000010,
            "Tags": {"profile_id": "p-1", "app": "bench"},
        })
        rows = {r["stackID"]: r for r in op(df).collect()}
        assert len(rows) == 3
        r = rows[format(xxh64(
            b"main;runtime.doWork cpu.go:12;leafFn cpu.go:40", 0), "x")]
        # leaf frame -> name (FunctionFirst keeps "fn pos", middle dropped)
        assert r["name"] == "leafFn cpu.go:40"
        # remaining frames formatted then REVERSED
        assert r["stack"] == "runtime.doWork cpu.go:12\nmain"
        assert r["language"] == "go" and r["type"] == "profile_cpu"
        assert r["units"] == "nanoseconds" and r["valueTypes"] == "cpu"
        assert r["aggTypes"] == "sum" and r["dataType"] == "CallStack"
        assert r["durationNs"] == "10000000000"
        assert r["profileID"] == "p-1"
        assert r["labels"] == '{"app":"bench","profile_id":"p-1"}'
        # samples -> ns: 3 * (1e9 // 100), Go %.2f
        assert r["val"] == "30000000.00"
        # ';'-terminated stack: ONE trailing empty frame stripped
        r2 = rows[format(xxh64(b"trailing;semi;", 0), "x")]
        assert r2["name"] == "semi" and r2["stack"] == "trailing"

    def test_bad_count_poisons_whole_profile_and_pos_first(self, spark):
        from loongcollector_spark.operators.decoders import (
            pyroscope_groups_decode,
        )

        df = spark.createDataFrame(
            [("good;a 1\nbad;line notanint\n",),   # poisoned profile
             ("utility.py:38 - find_nearest 7\n",)],  # PosFirst spy
            "content string")
        out = pyroscope_groups_decode(
            df, spy_name="py", units="bytes", sample_rate=100,
            tags={"profile_id": "x"}).collect()
        assert len(out) == 1  # the poisoned blob emitted nothing
        r = out[0]
        # PosFirst: "<pos> <name>", pos = after LAST space, middle dropped
        assert r["name"] == "find_nearest utility.py:38"
        assert r["units"] == "bytes" and r["valueTypes"] == "mem"
        # DetectProfileType has no case for the aggregate "mem" label —
        # reference lands on profile_unknown for byte/object profiles
        assert r["type"] == "profile_unknown"
        assert r["val"] == "7.00"


REDIS_INFO = (
    "# Server\r\n"
    "redis_version:7.0.3\r\n"
    "os:Linux 5.10\r\n"
    "uptime_in_seconds:12345\r\n"
    "lru_clock:99\r\n"
    "# Clients\r\n"
    "connected_clients:17\r\n"
    "# Memory\r\n"
    "used_memory:1048576\r\n"
    "mem_allocator:jemalloc-5.2.1\r\n"
    "# Replication\r\n"
    "role:master\r\n"
    "# Keyspace\r\n"
    "db0:keys=2,expires=0,avg_ttl=7\r\n"
    "db1:keys=10,expires=3,avg_ttl=4\r\n"
)


class TestRedisInfo:
    """metric_redis vs a hand-trace of input_redis.go gatherInfoOutput
    (:178-240) + gatherServer tag derivation (:84-105, 122-173)."""

    def test_fields_sections_tracking_and_keyspace(self, spark):
        from loongcollector_spark.operators.decoders import (
            redis_info_decode,
        )

        rows = [("tcp://:pw@10.0.0.5:6380", REDIS_INFO),
                ("192.168.1.9", REDIS_INFO),
                ("unix:///var/run/redis.sock", REDIS_INFO)]
        out = redis_info_decode(
            spark.createDataFrame(rows, "url string, content string")
        ).collect()
        expected = {
            # Server section: whitelist only (os dropped)
            "redis_version": "7.0.3", "uptime": "12345", "lru_clock": "99",
            # Tracking renames
            "clients": "17", "replication_role": "master",
            # mem_allocator always dropped, plain keys kept
            "used_memory": "1048576",
            # Keyspace expansion
            "db0_keys": "2", "db0_expires": "0", "db0_avg_ttl": "7",
            "db1_keys": "10", "db1_expires": "3", "db1_avg_ttl": "4",
            # totals; avg_ttl = (7+4) int-div 2 (:235-236)
            "total_db_count": "2", "total_db_avg_ttl": "5",
            "total_db_keys": "12", "total_db_expires": "3",
        }
        assert dict(out[0].fields) == expected
        # userinfo stripped from the host (url.Parse semantics)
        assert (out[0].server, out[0].port) == ("10.0.0.5", "6380")
        # bare address: tcp:// + default port 6379
        assert (out[1].server, out[1].port) == ("192.168.1.9", "6379")
        # unix scheme tags the socket path instead
        assert out[2].socket == "/var/run/redis.sock"
        assert out[2].server is None and out[2].port is None

    def test_err_line_stops_the_scan(self, spark):
        from loongcollector_spark.operators.decoders import (
            redis_info_decode,
        )

        body = ("# Server\r\nredis_version:6.0\r\n"
                "-ERR unknown command\r\nuptime_in_seconds:1\r\n")
        out = redis_info_decode(
            spark.createDataFrame([("h", body)],
                                  "url string, content string")
        ).collect()
        assert dict(out[0].fields) == {
            "redis_version": "6.0", "total_db_count": "0",
            "total_db_avg_ttl": "0", "total_db_keys": "0",
            "total_db_expires": "0"}


class TestNetpingMetrics:
    """metric_netping vs netping.go:283-345 fan-out + label append
    order (:398-448, 598-678)."""

    def _run(self, spark, rows):
        import datetime

        from loongcollector_spark.operators import build_operator

        ts = datetime.datetime(2026, 1, 2, 3, 4, 5)
        schema = (
            "type string,name string,src string,dst string,"
            "src_host string,total int,success int,failed int,"
            "min_rtt_ms double,max_rtt_ms double,avg_rtt_ms double,"
            "total_rtt_ms double,stddev_rtt_ms double,http_rt_ms int,"
            "http_response_bytes int,http_proto string,"
            "http_url_schema string,http_url_host string,"
            "http_code string,has_cert boolean,cert_ttl_days int,"
            "cert_subject_cn string,cert_issuer_cn string,"
            "dns_name string,dns_rt_ms double,err string,ts timestamp")
        df = spark.createDataFrame([r + (ts,) for r in rows], schema)
        out = build_operator({"Type": "metric_netping"})(df).collect()
        return {(r["__name__"], r["__labels__"]): r["__value__"]
                for r in out}, out

    def test_success_gated_fanout(self, spark):
        got, out = self._run(spark, [
            ("ping", "p1", "1.1.1.1", "8.8.8.8", "h1", 3, 3, 0,
             1.0, 9.0, 4.5, 13.5, 2.1, None, None, None, None, None,
             None, None, None, None, None, None, None, None),
            ("tcping", "t1", "1.1.1.1", "web:443", "h1", 3, 0, 3,
             None, None, None, None, None, None, None, None, None,
             None, None, None, None, None, None, None, None,
             "dial timeout"),
        ])
        base = "dst#$#8.8.8.8|name#$#p1|src#$#1.1.1.1|src_host#$#h1"
        assert got[("ping_total", base)] == "3"
        assert got[("ping_rtt_avg_ms", base)] == "4.5"
        # Go 'g': 9.0 prints as 9
        assert got[("ping_rtt_max_ms", base)] == "9"
        # failed dial: counters under the err-appended label set (:429),
        # rtt gauges gated off by success == 0 (:327-333)
        terr = ("dst#$#web:443|err#$#dial timeout|name#$#t1"
                "|src#$#1.1.1.1|src_host#$#h1")
        assert got[("tcping_failed", terr)] == "3"
        names = [r["__name__"] for r in out]
        assert "tcping_rtt_min_ms" not in names
        # 19-digit ns time string (NewMetricLogStringVal, :277-279)
        assert all(len(r["__time_nano__"]) == 19 for r in out)

    def test_httping_response_cert_and_dns(self, spark):
        got, out = self._run(spark, [
            ("httping", "w1", "1.1.1.1", "https://x.io", "h1", 1, 1, 0,
             None, None, None, None, None, 120, 512, "HTTP/1.1",
             "https", "x.io", "200", True, 30, "x.io", "R3",
             None, None, None),
            ("dns", "", "1.1.1.1", None, "h1", 1, 1, 0,
             None, None, None, None, None, None, None, None, None,
             None, None, None, None, None, None, "x.io", 3.5, None),
        ])
        http = ("code#$#200|codex#$#2xx|dst#$#https://x.io|name#$#w1"
                "|proto#$#HTTP/1.1|src#$#1.1.1.1|src_host#$#h1"
                "|url_host#$#x.io|url_schema#$#https")
        assert got[("httping_rt_ms", http)] == "120"
        assert got[("httping_response_bytes", http)] == "512"
        # cert row under the cert label set incl. the reference's
        # misspelled commmon keys (:651-652)
        cert = ("issuer_commmon_name#$#R3|name#$#w1|src#$#1.1.1.1"
                "|src_host#$#h1|subject_commmon_name#$#x.io"
                "|url#$#https://x.io|url_host#$#x.io")
        assert got[("httping_cert_ttl_days", cert)] == "30"
        dns = "dns_name#$#x.io|src#$#1.1.1.1|src_host#$#h1"
        assert got[("dns_resolve_rt_ms", dns)] == "3.5"
        assert got[("dns_resolve_success", dns)] == "1"
        assert got[("dns_resolve_failed", dns)] == "0"


def test_udp_server_delegates_to_decoder_registry(spark):
    from loongcollector_spark.operators import build_operator

    op = build_operator({
        "Type": "service_udp_server", "Format": "statsd",
        "Address": "0.0.0.0:8125", "MaxBufferSize": 65535,
        "DefaultTimeNano": 42,
    })
    out = op(spark.createDataFrame(
        [("deploys.test.myservice:1|c",)], "content string")).collect()
    assert len(out) == 1
    assert out[0]["__name__"] == "deploys.test.myservice"
    assert out[0]["__value__"] == 1.0


class TestMqtt:
    """service_mqtt: Topics wildcard subscription (MQTT v3.1.1 §4.7) +
    the onMessageReceived 6-field contract (input_mqtt.go:99-119)."""

    def test_topic_filters_and_contract(self, spark):
        from loongcollector_spark.operators import build_operator

        df = spark.createDataFrame(
            [("sensors/t1/temp", "21.5", True, False, 7),
             ("sensors/t1/a/temp", "x", False, False, 8),   # + is 1 level
             ("actuators/v2", "open", False, True, 9),
             ("$SYS/broker/load", "z", False, False, 10)],  # $-topics
            "topic string, content string, duplicated boolean, "
            "retained boolean, message_id int")
        op = build_operator({
            "Type": "service_mqtt", "Server": "tcp://mq:1883",
            "Topics": ["sensors/+/temp", "actuators/#"], "QoS": 1,
        })
        out = {r["topic"]: r for r in op(df).collect()}
        assert set(out) == {"sensors/t1/temp", "actuators/v2"}
        r = out["sensors/t1/temp"]
        assert (r["server"], r["duplicated"], r["retained"],
                r["message_id"], r["content"]) == (
            "tcp://mq:1883", "true", "false", "7", "21.5")

    def test_default_hash_excludes_system_topics(self, spark):
        from loongcollector_spark.operators import build_operator

        df = spark.createDataFrame(
            [("a/b", "1"), ("$SYS/x", "2")], "topic string, content string")
        out = build_operator({"Type": "service_mqtt"})(df).collect()
        assert [r["topic"] for r in out] == ["a/b"]
