"""service_syslog parser vs the reference's own test vectors
(plugins/input/syslog/parser_test.go:30-235)."""

import json

from pyspark.sql import functions as F

from loongcollector_spark.operators import build_operator


def _parse(spark, lines, **cfg):
    df = spark.createDataFrame([(l,) for l in lines], "content string")
    op = build_operator({"Type": "service_syslog", "ParseProtocol": "auto",
                         "Year": 2021, **cfg})
    return op(df).collect()


def test_rfc3164_reference_vectors(spark):
    rows = _parse(spark, [
        "<60>Oct 09 14:36:47 hostname program: message",
        "<34>Aug  2 09:49:23 hostname program: message",
        "<86>Jul 31 13:14:22 rs1e13316 su: pam_unix(su:session): "
        "session closed for user nobody",
        "<13>Aug 17 03:42:11 ecs-test-yyh LOGSTASH[-]: "
        "hello, a syslog from logstash",
    ])
    got = [(r["_priority_"], r["_facility_"], r["_severity_"],
            r["_hostname_"], r["_program_"], r["_content_"],
            str(r["_ts_"])) for r in rows]
    assert got == [
        ("60", "7", "4", "hostname", "program", "message",
         "2021-10-09 14:36:47"),
        ("34", "4", "2", "hostname", "program", "message",
         "2021-08-02 09:49:23"),
        ("86", "10", "6", "rs1e13316", "su",
         "pam_unix(su:session): session closed for user nobody",
         "2021-07-31 13:14:22"),
        ("13", "1", "5", "ecs-test-yyh", "LOGSTASH",
         "hello, a syslog from logstash", "2021-08-17 03:42:11"),
    ]


def test_rfc5424_reference_vectors(spark):
    rows = _parse(spark, [
        '<29>1 2016-02-21T04:32:57+00:00 web1 someservice 2341 2 '
        '[origin][meta sequence="14125553" service="someservice"] '
        '"GET /v1/ok HTTP/1.1" 200 145',
        "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - "
        "BOM'su root' failed for lonvick on /dev/pts/8",
    ])
    r = rows[0]
    assert (r["_priority_"], r["_facility_"], r["_severity_"]) == \
        ("29", "3", "5")
    assert r["_hostname_"] == "web1" and r["_program_"] == "someservice"
    assert r["_process_id_"] == "2341" and r["_message_id_"] == "2"
    # Go json.Marshal sorted-key shape, empty SD element kept
    assert json.loads(r["_structured_data_"]) == {
        "origin": {},
        "meta": {"sequence": "14125553", "service": "someservice"},
    }
    assert r["_structured_data_"].startswith('{"meta"')
    assert r["_content_"] == '"GET /v1/ok HTTP/1.1" 200 145'
    r = rows[1]
    assert r["_process_id_"] is None and r["_message_id_"] == "ID47"
    assert r["_structured_data_"] is None
    assert str(r["_ts_"]) == "2003-10-11 22:14:15.003000"
    assert r["_unixtimestamp_"] == "1065910455003000000"


def test_syslog_failure_modes(spark):
    # IgnoreParseFailure keeps the raw line in _content_ (parser.go:55-61)
    rows = _parse(spark, ["Jul 29 06:20:01 host systemd: no pri header"])
    assert rows[0]["_parse_ok"] is False
    assert rows[0]["_priority_"] == "-1"
    assert rows[0]["_content_"].startswith("Jul 29")
    # strict mode drops the line entirely (syslog.go:403-409)
    rows = _parse(spark, ["garbage"], IgnoreParseFailure=False)
    assert rows == []
    # PRI > 191 is invalid (facility would exceed 23): the RFC parsers
    # FAIL the line, they never emit facility 124
    rows = _parse(spark, ["<999>Oct 11 22:14:15 host app: msg"])
    assert rows[0]["_parse_ok"] is False
    assert rows[0]["_facility_"] == "-1"
    rows = _parse(spark, ["<191>Oct 11 22:14:15 host app: msg"])
    assert rows[0]["_parse_ok"] is True
    assert rows[0]["_facility_"] == "23" and rows[0]["_severity_"] == "7"
