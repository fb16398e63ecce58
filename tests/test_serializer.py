"""JsonSerializer golden-format tests: exact line shapes, tag stamping,
internal-column stripping, compressed round-trip."""

import json
import shutil
import tempfile

from pyspark.sql import functions as F

from loongcollector_spark.serializer import to_json_events, write_json_sink


def test_json_event_shape(spark, kv_df):
    out = to_json_events(
        kv_df.withColumn("_to_sink_x", F.lit(True)).withColumn("_parse_ok", F.lit(True)),
        tags={"__source__": "test-host"},
    )
    rows = [json.loads(r["value"]) for r in out.collect()]
    r = next(x for x in rows if x["conv_id"] == "c1" and x["turn_idx"] == 0)
    # __time__ first-class epoch seconds; tags stamped; internals stripped
    assert r["__time__"] == 1767225600  # 2026-01-01T00:00:00Z
    assert r["__source__"] == "test-host"
    assert "_to_sink_x" not in r and "_parse_ok" not in r
    assert r["role"] == "user" and r["text"].startswith("action=")


def test_json_sink_round_trip(spark, kv_df):
    path = tempfile.mkdtemp(prefix="lcs_json_sink_")
    try:
        write_json_sink(kv_df, path, compression="gzip")
        back = spark.read.text(path)
        assert back.count() == kv_df.count()
        parsed = [json.loads(r["value"]) for r in back.collect()]
        assert {p["conv_id"] for p in parsed} == {"c1", "c2"}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_custom_single_protocol_bytes(spark):
    """custom_single converter golden (custom_single_log.go:32-62):
    {"contents": {...}, "tags": {...}, "time": N} with Go's sorted-map
    key order."""
    from loongcollector_spark.serializer import convert_events

    df = spark.createDataFrame(
        [("c1", 0, "hello", "2026-01-01 00:00:00")],
        "conv_id string, turn_idx int, text string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    v = convert_events(df, "custom_single", tags={"host": "h1"}).first()["value"]
    assert v == (
        '{"contents":{"conv_id":"c1","text":"hello","turn_idx":"0"},'
        '"tags":{"host":"h1"},"time":1767225600}'
    )


def test_jsonline_protocol_bytes(spark):
    """jsonline = flattened single-log objects, one per line
    (jsonline.go:15-41 over converter_single_log_flatten.go:25-60)."""
    from loongcollector_spark.serializer import convert_events

    df = spark.createDataFrame(
        [("c1", "hi", "2026-01-01 00:00:00")],
        "conv_id string, text string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    v = convert_events(df, "jsonline", tags={"host": "h1"}).first()["value"]
    assert v == '{"conv_id":"c1","host":"h1","text":"hi","time":1767225600}'
    v2 = convert_events(df, "jsonline", only_contents=True).first()["value"]
    assert v2 == '{"conv_id":"c1","text":"hi","time":1767225600}'


def test_influxdb_protocol_bytes(spark):
    """influxdb line protocol goldens (influxdb_metric_test.go:37-65 and
    the readNames contract converter_sls_metric_test.go:85-133)."""
    from loongcollector_spark.serializer import convert_events

    rows = [
        ("metric", "", 1.0, None, None),
        ("metric", "aa#$#bb", 1.0, None, None),
        ("metric", None, 1.0, 1667615389000000000, None),
        ("cpu1", "k1=v1|k2=v2", 1.0, 1700000000000000001, None),
        # __field__ suffix trim (readNames): name aa:bb + field bb -> aa bb=
        ("aa:bb", "", 2.5, None, "bb"),
        # field 'value' does NOT trim (converter_sls_metric_test.go:123-127)
        ("aa:value", "", 3.0, None, "value"),
    ]
    df = spark.createDataFrame(
        rows,
        "`__name__` string, `__labels__` string, `__value__` double, "
        "`__time_nano__` long, `__field__` string",
    )
    got = [r["value"] for r in convert_events(df, "influxdb").collect()]
    assert got == [
        "metric value=1",
        "metric,aa=bb value=1",
        "metric value=1 1667615389000000000",
        "cpu1,k1=v1,k2=v2 value=1 1700000000000000001",
        "aa bb=2.5",
        "aa:value value=3",
    ]


def test_otlp_v1_protocol_bytes(spark):
    """otlp_v1 converter goldens (pkg/protocol/converter/otlp.go:43-103):
    content→body, level→severityText, Time×1e9 as STRING (protojson
    uint64), remaining contents + tags as stringValue attributes with
    absent (NULL) values dropped."""
    from loongcollector_spark.serializer import (
        convert_events, otlp_resource_logs_frame)

    df = spark.createDataFrame(
        [("c1", 0, "hello", "INFO", None, "2026-01-01 00:00:00")],
        "conv_id string, turn_idx int, content string, level string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    v = convert_events(df, "otlp_v1", tags={"host": "h1"}).first()["value"]
    assert v == (
        '{"timeUnixNano":"1767225600000000000","severityText":"INFO",'
        '"body":{"stringValue":"hello"},"attributes":['
        '{"key":"conv_id","value":{"stringValue":"c1"}},'
        '{"key":"turn_idx","value":{"stringValue":"0"}},'
        '{"key":"host","value":{"stringValue":"h1"}}]}'
    )
    # group frame: resource attrs (source/topic first, otlp.go:47-57),
    # one scope, records in turn order
    g = otlp_resource_logs_frame(df, source="s1").first()["resource_logs"]
    assert g.startswith(
        '{"resource":{"attributes":[{"key":"source",'
        '"value":{"stringValue":"s1"}}]},"scopeLogs":[{"logRecords":['
    )
    assert g.endswith("]}]}")
    import json as _json

    doc = _json.loads(g)
    assert len(doc["scopeLogs"][0]["logRecords"]) == 1


def test_flusher_http_end_to_end(spark, tmp_path):
    from loongcollector_spark.flushers import build_flusher

    df = spark.createDataFrame(
        [("c1", "x", "2026-01-01 00:00:00")],
        "conv_id string, text string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path / "http_body")
    build_flusher({
        "Type": "flusher_http", "Path": out,
        "Convert": {"Protocol": "jsonline", "Encoding": "json"},
    })(df)
    import glob

    lines = []
    for f in glob.glob(out + "/part-*"):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert lines == ['{"conv_id":"c1","text":"x","time":1767225600}']


def test_sls_pb_log_hand_derived_vector(spark):
    """Fully hand-derived protobuf bytes (proto2 wire rules over
    sls_logs.pb.go field numbers): Log{Time=1, Contents=[{a,b}]}
    = 08 01 12 06 0a 01 61 12 01 62."""
    from loongcollector_spark.serializer import sls_pb_log_column

    df = spark.createDataFrame([("b", "1970-01-01 00:00:01")], "a string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    got = df.select(sls_pb_log_column(df).alias("pb")).first()["pb"]
    assert bytes(got) == bytes.fromhex("0801" "1206" "0a0161" "120162")


def test_sls_pb_varint_boundaries(spark):
    """Varint expression vs the Python model across 7-bit boundaries."""
    from loongcollector_spark.serializer import _pb_varint, py_varint

    ns = [0, 1, 127, 128, 300, 16383, 16384, 2097151, 2097152,
          1767225600, (1 << 35) - 1]
    df = spark.createDataFrame([(n,) for n in ns], "n long")
    got = [bytes(r["v"]) for r in
           df.select(_pb_varint(F.col("n")).alias("v")).collect()]
    assert got == [py_varint(n) for n in ns]


def test_sls_pb_loggroup_matches_python_model(spark):
    """Whole-LogGroup bytes vs an independent pure-Python writer, and
    parseability: a minimal proto2 decoder walks the stream back to the
    original (time, contents) rows."""
    from loongcollector_spark.serializer import (
        pb_string_field, py_varint, sls_pb_loggroup_frame,
    )

    rows = [
        ("c1", 0, "hello", "user", "2026-01-01 00:00:00"),
        ("c1", 1, "wörld é", "assistant", "2026-01-01 00:00:01"),
        ("c2", 0, None, "tool", "2026-01-01 00:00:02"),  # null text omitted
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, role string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["conv_id"]: bytes(r["loggroup_pb"])
        for r in sls_pb_loggroup_frame(
            df, topic="tp", source="s1", tags={"host": "h"}
        ).collect()
    }

    import calendar, datetime

    def epoch(s):
        return calendar.timegm(
            datetime.datetime.strptime(s, "%Y-%m-%d %H:%M:%S").timetuple())

    def py_content(k, v):
        return pb_string_field(1, k) + pb_string_field(2, v)

    def py_log(ts, contents):
        body = b"\x08" + py_varint(epoch(ts))
        for k, v in contents:
            c = py_content(k, v)
            body += b"\x12" + py_varint(len(c)) + c
        return body

    def py_group(logs):
        out = b""
        for lg in logs:
            out += b"\x0a" + py_varint(len(lg)) + lg
        out += pb_string_field(3, "tp") + pb_string_field(4, "s1")
        tag = pb_string_field(1, "host") + pb_string_field(2, "h")
        out += b"\x32" + py_varint(len(tag)) + tag
        return out

    # contents follow the frame's column order (serializable_columns)
    want_c1 = py_group([
        py_log("2026-01-01 00:00:00",
               [("conv_id", "c1"), ("turn_idx", "0"), ("text", "hello"),
                ("role", "user")]),
        py_log("2026-01-01 00:00:01",
               [("conv_id", "c1"), ("turn_idx", "1"), ("text", "wörld é"),
                ("role", "assistant")]),
    ])
    want_c2 = py_group([
        py_log("2026-01-01 00:00:02",
               [("conv_id", "c2"), ("turn_idx", "0"), ("role", "tool")]),
    ])
    assert out["c1"] == want_c1
    assert out["c2"] == want_c2


def test_sls_pb_loggroup_max_logs_chunking(spark):
    """max_logs splits a group into ordered sub-groups (the reference's
    MaxLogCount cap, aggregator_base.go:26-29): chunk k holds logs
    [k*max_logs, (k+1)*max_logs) in turn order, concatenating the
    chunks reproduces the uncapped group's Logs bytes, and group_seq
    never serializes as a content."""
    from loongcollector_spark.serializer import sls_pb_loggroup_frame

    rows = [("c1", i, f"t{i}", "2026-01-01 00:00:00") for i in range(5)]
    rows.append(("c2", 0, "solo", "2026-01-01 00:00:01"))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    whole = {
        r["conv_id"]: bytes(r["loggroup_pb"])
        for r in sls_pb_loggroup_frame(df).collect()
    }
    chunked = sorted(
        (r["conv_id"], r["group_seq"], bytes(r["loggroup_pb"]), r["n_logs"])
        for r in sls_pb_loggroup_frame(df, max_logs=2).collect()
    )
    assert [(c, s, n) for c, s, _, n in chunked] == [
        ("c1", 0, 2), ("c1", 1, 2), ("c1", 2, 1), ("c2", 0, 1)]
    # chunk payloads concatenate to the uncapped group's bytes
    assert b"".join(b for c, _, b, _ in chunked if c == "c1") == whole["c1"]
    assert chunked[-1][2] == whole["c2"]
    # no chunk serialized the internal _batch_seq column as a content
    assert b"_batch_seq" not in b"".join(b for *_, b, _ in chunked)


def test_loongsuite_group_max_logs_chunking(spark):
    """Same cap on the proto3 PipelineEventGroup encoder: the decode
    walker reassembles the original rows across chunks with per-chunk
    log_idx restarting at 0."""
    from loongcollector_spark.operators import build_operator
    from loongcollector_spark.pbwire import loongsuite_group_frame

    rows = [("7", i, f"m{i}", "2026-01-01 00:00:00") for i in range(5)]
    df = spark.createDataFrame(
        rows, "gid string, idx int, msg string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    payloads = loongsuite_group_frame(
        df, group_cols=("gid",), order_col="idx", time_col="ts",
        content_cols=["msg"], max_logs=2,
    )
    assert [r["n_logs"] for r in payloads.orderBy("group_seq").collect()] \
        == [2, 2, 1]
    op = build_operator(
        {"Type": "processor_parse_from_pb", "Protocol": "LoongSuite"})
    # decode keyed by the chunk index (the decoder's one passthrough id)
    decoded = op(payloads.select(
        F.col("group_seq").cast("long").alias("group_id"),
        F.col("group_pb").alias("payload")))
    got = sorted(
        (r["group_id"], r["log_idx"], r["contents"]["msg"])
        for r in decoded.collect()
    )
    assert got == [(0, 0, "m0"), (0, 1, "m1"), (1, 0, "m2"),
                   (1, 1, "m3"), (2, 0, "m4")]
