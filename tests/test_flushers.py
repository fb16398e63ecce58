"""Flusher adapter tests: file/table/blackhole/stdout paths (kafka is
adapter-only — the package isn't in this container)."""

import glob
import gzip
import json
import shutil
import tempfile

from pyspark.sql import functions as F

from loongcollector_spark.flushers import build_flusher


def test_flusher_file_json_lines(spark, kv_df):
    d = tempfile.mkdtemp(prefix="lcs_fl_file_")
    try:
        build_flusher({
            "Type": "flusher_file", "FilePath": d,
            "Tags": {"__source__": "t"},
        })(kv_df)
        lines = []
        for f in glob.glob(f"{d}/part-*.txt.gz"):
            with gzip.open(f, "rt") as fh:
                lines += [json.loads(ln) for ln in fh]
        assert len(lines) == kv_df.count()
        assert all(ln["__source__"] == "t" and "__time__" in ln for ln in lines)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_flusher_table_sharded_partitioned(spark, kv_df):
    d = tempfile.mkdtemp(prefix="lcs_fl_tbl_")
    try:
        build_flusher({
            "Type": "flusher_table", "Path": d,
            "PartitionBy": ["role"], "ShardHashKeys": ["conv_id"],
            "ShardCount": 4, "MaxRecordsPerFile": 2,
        })(kv_df)
        back = spark.read.parquet(d)
        assert back.count() == kv_df.count()
        assert sorted(glob.glob(f"{d}/role=*"))  # hive-partitioned layout
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_flusher_blackhole_and_stdout(spark, kv_df, capsys):
    build_flusher({"Type": "flusher_blackhole"})(kv_df)
    build_flusher({"Type": "flusher_stdout", "MaxRows": 2})(kv_df)
    # stdout goes through the JVM console; just assert no exception and
    # the unknown-type error is clear
    try:
        build_flusher({"Type": "flusher_nope"})
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "flusher_nope" in str(e)


def test_jdbc_roundtrip_embedded_derby(spark):
    """Contract test for the JDBC source+sink adapters against the
    embedded Derby engine Spark already ships (no external service):
    flusher_jdbc writes, service_jdbc reads back partitioned, rows and
    values must survive the round trip."""
    from loongcollector_spark.datagen import gen_transcripts
    from loongcollector_spark.flushers import build_flusher
    from loongcollector_spark.sources import service_jdbc

    url = "jdbc:derby:memory:lcs_contract;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    df = gen_transcripts(spark, 300, 30).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    write = build_flusher({
        "Type": "flusher_jdbc", "Url": url, "Table": "turns",
        "Mode": "overwrite", "Driver": driver, "ShardKeys": ["conv_id"],
        "NumPartitions": 4,
    })
    write(df)

    back = service_jdbc(
        spark, url, "turns", partition_column="turn_idx",
        num_partitions=4, lower_bound=0, upper_bound=64, driver=driver,
    )
    assert back.count() == 300
    a = df.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    b = back.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    assert a == b
    # partitioned read really split the scan
    assert back.rdd.getNumPartitions() == 4


def test_kafka_payload_contract(spark):
    """Kafka adapter contract without a broker: the shipped (key, value)
    frame must carry hash-partitioner keys from HashKeys and a JSON value
    with __time__ + every serializable column."""
    import json as _json

    from loongcollector_spark.flushers import kafka_payload_frame

    df = spark.createDataFrame(
        [("c1", 0, "hello", "2026-01-01 00:00:00")],
        "conv_id string, turn_idx int, text string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = kafka_payload_frame(df, "hash", ["conv_id", "turn_idx"])
    assert out.columns == ["key", "value"]
    r = out.first()
    # hashPartitionKey joins the HashKey values with "###"
    # (flusher_kafka_v2.go:345-357)
    assert r["key"] == "c1###0"
    v = _json.loads(r["value"])
    assert v["text"] == "hello" and v["conv_id"] == "c1"
    assert isinstance(v["__time__"], int)

    out2 = kafka_payload_frame(df, "random", [])
    assert out2.columns == ["value"]

    # pipelines that dropped ts must still serialize (no __time__ field)
    v3 = _json.loads(kafka_payload_frame(df.drop("ts")).first()["value"])
    assert "__time__" not in v3 and v3["text"] == "hello"


def test_pb_double_bits_matches_struct_pack(spark):
    """pb_double_bits vs the IEEE-754 ground truth (struct.pack) across
    normals, subnormals, powers of two (the log2 boundary), negatives,
    zero, infinities and NaN."""
    import struct

    from loongcollector_spark.pbwire import pb_double_bits

    vals = [0.5, 1.0, 2.0, 1.0 / 3.0, -2.75, 1e300, -1e300, 1e-300,
            5e-324, 1e-310, 123456.789, 2.0 ** 52, 2.0 ** -1022,
            float("inf"), float("-inf"), 0.0, 7.0, -0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["v"]: r["bits"] for r in
           df.select("v", pb_double_bits(F.col("v")).alias("bits")).collect()}
    for v in vals:
        want = struct.unpack("<q", struct.pack("<d", v))[0]
        if v == 0.0:  # -0.0 folds to +0.0 (documented)
            want = 0
        assert got[v] == want, f"{v}: {got[v]:#x} != {want:#x}"
    nan_bits = (df.select(pb_double_bits(F.lit(float("nan"))).alias("b"))
                .first()["b"])
    assert nan_bits == 0x7FF8000000000000


def test_prom_write_request_roundtrip(spark):
    """Spark-encoded prompb.WriteRequest decodes (independent Python
    wire walker + struct.unpack) back to the source series: sorted
    labels incl __name__, empty labels dropped, ts ns→ms, zero value /
    zero ts omitted like the gogo marshaler."""
    from loongcollector_spark.pbwire import (
        decode_prom_write_request, prom_write_request_frame)

    rows = [
        ("latency_ms", "action=chat|role=user", 12.5, 1700000000123000000),
        ("latency_ms", "action=|role=user", 0.25, 1700000000123000000),
        ("tokens", "role=assistant", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "`__name__` string, `__labels__` string, `__value__` double, "
        "`__time_nano__` long",
    )
    out = prom_write_request_frame(df, series_limit=2).collect()
    decoded = []
    for r in out:
        decoded += decode_prom_write_request(r["write_request_pb"])
    decoded.sort(key=lambda s: (s["labels"]["__name__"], s["value"]))
    assert decoded == [
        {"labels": {"__name__": "latency_ms", "role": "user"},
         "value": 0.25, "timestamp_ms": 1700000000123},
        {"labels": {"__name__": "latency_ms", "action": "chat",
                    "role": "user"},
         "value": 12.5, "timestamp_ms": 1700000000123},
        {"labels": {"__name__": "tokens", "role": "assistant"},
         "value": 0.0, "timestamp_ms": 0},
    ]
    # label bytes are in sorted order on the wire
    for r in out:
        series = decode_prom_write_request(r["write_request_pb"])
        for s in series:
            assert list(s["labels"]) == sorted(s["labels"])


def test_flusher_loki_payload(spark):
    """Loki push-API payload golden: label-set grouping (static +
    dynamic, sorted keys), ["<ns>","<line>"] value pairs in ts order."""
    d = tempfile.mkdtemp(prefix="lcs_fl_loki_")
    try:
        df = spark.createDataFrame(
            [("c1", "user", "a", "2026-01-01 00:00:00"),
             ("c2", "user", "b", "2026-01-01 00:00:01"),
             ("c3", "tool", "c", "2026-01-01 00:00:02")],
            "conv_id string, role string, text string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        build_flusher({
            "Type": "flusher_loki", "Path": d,
            "StaticLabels": {"job": "transcripts"},
            "DynamicLabels": ["content.role"],
            "Convert": {"Protocol": "jsonline"},
        })(df)
        lines = []
        for f in glob.glob(f"{d}/part-*"):
            with open(f) as fh:
                lines += [json.loads(ln) for ln in fh if ln.strip()]
        by_role = {
            ln["streams"][0]["stream"]["role"]: ln["streams"][0]
            for ln in lines
        }
        assert set(by_role) == {"user", "tool"}
        u = by_role["user"]
        assert u["stream"] == {"job": "transcripts", "role": "user"}
        assert [v[0] for v in u["values"]] == [
            "1767225600000000000", "1767225601000000000"]
        assert json.loads(u["values"][0][1])["conv_id"] == "c1"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_flusher_loki_requires_labels(spark):
    import pytest

    with pytest.raises(ValueError, match="at least one label"):
        build_flusher({"Type": "flusher_loki", "Path": "/tmp/x"})


def test_flusher_statistics_empty_frame_reports_zero(spark, capsys):
    """SUM over an empty frame is NULL — the stats flusher must print
    zero rates, not raise TypeError (a pipeline whose filters drop every
    row still flushes)."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, ts timestamp, text string")
    build_flusher({"Type": "flusher_statistics", "GeneratePB": True})(empty)
    outp = capsys.readouterr().out
    assert "loggroups=0" in outp and "logs=0" in outp


def test_kafka_jaas_values_escaped():
    from loongcollector_spark.flushers import kafka_producer_options

    opts = kafka_producer_options({
        "Brokers": ["b:9092"], "Topic": "t",
        "Authentication": {"SASL": {
            "Mechanism": "PLAIN", "Username": "u",
            "Password": 'pa"ss\\wd'}},
    })
    jaas = opts["kafka.sasl.jaas.config"]
    assert 'password="pa\\"ss\\\\wd"' in jaas
    assert jaas.endswith('";')


def test_parse_from_pb_null_group_id_marker_row(spark):
    from loongcollector_spark.operators import build_operator

    df = spark.createDataFrame(
        [(None, bytearray(b"\xff\xff"))],
        "group_id long, payload binary")
    op = build_operator({"Type": "processor_parse_from_pb",
                         "SourceKey": "payload", "Protocol": "LoongSuite",
                         "GroupIdKey": "group_id"})
    rows = op(df).collect()
    assert len(rows) == 1 and rows[0]["_decode_ok"] is False


def test_sls_pb_null_ts_stamps_zero_not_dropped(spark):
    """A NULL time must stamp 0, not null the whole Log blob (which
    silently dropped the event from the group while n_logs counted it)."""
    from loongcollector_spark.pbwire import decode_sls_loggroup
    from loongcollector_spark.serializer import sls_pb_loggroup_frame

    df = spark.createDataFrame(
        [("c1", 0, None, "hello"), ("c1", 1, "2026-01-01 00:00:00", "world")],
        "conv_id string, turn_idx int, ts string, text string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = sls_pb_loggroup_frame(df, group_cols=("conv_id",)).collect()[0]
    g = decode_sls_loggroup(bytes(row["loggroup_pb"]))
    assert row["n_logs"] == 2 and len(g["logs"]) == 2
    times = sorted(log["time"] for log in g["logs"])
    assert times[0] == 0 and times[1] > 0


def test_loki_streams_numeric_ts_order_and_label_prefixes(spark):
    """Mixed-digit-length timestamps must sort NUMERICALLY (Loki rejects
    out-of-order entries; '999...' 18-digit sorts after 19-digit
    lexicographically), and content./tag. prefixes bind to their own
    store: content.level reads the content column even when a
    __tag__:level column exists."""
    from loongcollector_spark.serializer import loki_streams_frame

    df = spark.createDataFrame(
        [("a", "info", "tagval", "2001-09-08 00:00:00"),   # epoch < 1e9 s
         ("b", "info", "tagval", "2026-01-01 00:00:00")],
        "text string, level string, `__tag__:level` string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = loki_streams_frame(
        df, static_labels={"job": "j"},
        dynamic_labels=["content.level"], line_protocol="jsonline",
    ).collect()
    doc = json.loads(out[0]["payload"])
    stream = doc["streams"][0]
    assert stream["stream"]["level"] == "info"  # content, not 'tagval'
    ts_vals = [int(v[0]) for v in stream["values"]]
    assert ts_vals == sorted(ts_vals)
    assert len(str(ts_vals[0])) == 18 and len(str(ts_vals[1])) == 19

    tagged = loki_streams_frame(
        df, static_labels={"job": "j"},
        dynamic_labels=["tag.level"], line_protocol="jsonline",
    ).collect()
    tdoc = json.loads(tagged[0]["payload"])
    assert tdoc["streams"][0]["stream"]["level"] == "tagval"


def test_flusher_pulsar_and_otel_and_prometheus(spark, tmp_path):
    """Adapter smoke: pulsar (kafka payload contract + partition key),
    opentelemetry (ResourceLogs docs), prometheus (WriteRequest blobs
    decode to the input series)."""
    from loongcollector_spark.pbwire import decode_prom_write_request

    df = spark.createDataFrame(
        [("c1", 0, "x", "2026-01-01 00:00:00")],
        "conv_id string, turn_idx int, text string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    p = str(tmp_path / "pulsar")
    build_flusher({"Type": "flusher_pulsar", "Topic": "t",
                   "PartitionKeys": ["conv_id"], "Path": p})(df)
    rows = [json.loads(ln) for f in glob.glob(p + "/part-*")
            for ln in open(f) if ln.strip()]
    assert rows[0]["key"] == "c1" and "__time__" in json.loads(rows[0]["value"])

    o = str(tmp_path / "otel")
    build_flusher({"Type": "flusher_opentelemetry", "Path": o})(df)
    docs = [json.loads(ln) for f in glob.glob(o + "/part-*")
            for ln in open(f) if ln.strip()]
    assert len(docs[0]["scopeLogs"][0]["logRecords"]) == 1

    m = spark.createDataFrame(
        [("tokens", "role=user", 3.5, 1700000000000000000)],
        "`__name__` string, `__labels__` string, `__value__` double, "
        "`__time_nano__` long",
    )
    pr = str(tmp_path / "prom")
    build_flusher({"Type": "flusher_prometheus", "Path": pr})(m)
    import base64

    blobs = [base64.b64decode(ln.strip()) for f in glob.glob(pr + "/part-*")
             for ln in open(f) if ln.strip()]
    series = [s for b in blobs for s in decode_prom_write_request(b)]
    assert series == [{
        "labels": {"__name__": "tokens", "role": "user"},
        "value": 3.5, "timestamp_ms": 1700000000000,
    }]


def test_flusher_checker_capture_and_assertions(spark):
    """flusher_checker.go:28-150 semantics: capture + CheckKeyValue /
    CheckKeyValueAny / CheckKeyValueRegex / CheckEveryLog analogs."""
    import pytest

    from loongcollector_spark.flushers import build_flusher

    df = spark.createDataFrame(
        [("c1", "user", "hello"), ("c2", "user", "world")],
        "conv_id string, role string, text string",
    )
    w = build_flusher({"Type": "flusher_checker"})
    w(df)
    ck = w.checker
    assert ck.log_count() == 2
    ck.check_key_value("role", "user")
    ck.check_key_value_any("text", "world")
    ck.check_key_value_regex("conv_id", "c[0-9]")
    ck.check_every_log(lambda r: r["text"])
    with pytest.raises(AssertionError):
        ck.check_key_value("text", "hello")  # not ALL logs
    w2 = build_flusher({"Type": "flusher_checker", "MaxRows": 1})
    with pytest.raises(AssertionError):
        w2(df)


def test_flusher_statistics_counts_and_pb_bytes(spark, capsys):
    """statistics_frame counters equal a Python recomputation of the
    LogGroup wire size over a hand-built frame (2 groups, 3 logs)."""
    from loongcollector_spark.flushers import build_flusher, statistics_frame
    from loongcollector_spark.serializer import py_sls_log_group

    rows = [("c1", 0, "user", "hi", "t1", "2026-01-01 00:00:00"),
            ("c1", 1, "tool", "run", "t2", "2026-01-01 00:00:01"),
            ("c2", 0, "user", "yo", "t3", "2026-01-01 00:00:02")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string"
    ).selectExpr("conv_id", "turn_idx", "role", "text", "tool",
                 "cast(ts as timestamp) AS ts")
    got = statistics_frame(df, ("conv_id",), generate_pb=True).collect()[0]
    assert got["n_loggroups"] == 2 and got["n_logs"] == 3
    import calendar, datetime

    def epoch(s):
        return calendar.timegm(datetime.datetime.fromisoformat(s).timetuple())

    expected = sum(
        len(py_sls_log_group(
            [(epoch(r[5]), [("conv_id", r[0]), ("turn_idx", str(r[1])),
                            ("role", r[2]), ("text", r[3]),
                            ("tool", r[4])])]))
        for r in rows)
    assert got["pb_bytes"] == expected
    build_flusher({"Type": "flusher_statistics", "GeneratePB": True})(df)
    assert "loggroups=2" in capsys.readouterr().out


def test_flusher_sleep_and_grpc_payload(spark):
    """flusher_sleep is a timed no-op; the grpc payload frame is the SLS
    LogGroup blob (protocol.Codec marshals LogGroup — flusher.go:40-66),
    byte-checked against the independent Python writer."""
    import time

    from loongcollector_spark.flushers import build_flusher, grpc_payload_frame
    from loongcollector_spark.serializer import py_sls_log_group

    df = spark.createDataFrame(
        [("c1", 0, "user", "hi", "t", "2026-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).selectExpr("conv_id", "turn_idx", "role", "text", "tool",
                 "cast(ts as timestamp) AS ts")
    t0 = time.monotonic()
    build_flusher({"Type": "flusher_sleep", "SleepMS": 50})(df)
    assert time.monotonic() - t0 >= 0.05
    blob = bytes(grpc_payload_frame(df).collect()[0]["loggroup_pb"])
    import calendar

    exp = py_sls_log_group([(calendar.timegm((2026, 1, 1, 0, 0, 0, 0, 1, 0)),
                             [("conv_id", "c1"), ("turn_idx", "0"),
                              ("role", "user"), ("text", "hi"),
                              ("tool", "t")])])
    assert blob == exp


def test_kafka_hash_partitioner_roundtrip(spark):
    """flusher_kafka -> broker -> service_kafka against the in-process
    broker model: sarama-exact hash partition assignment (FNV-1a 32,
    int32 cast, abs-mod), same-key co-location, key spread, contiguous
    per-partition offsets, and the consumer projection reading back
    every produced message."""
    import json as _json

    from loongcollector_spark.flushers import kafka_payload_frame
    from loongcollector_spark.kafka_fake import (
        FakeKafkaBroker, fnv1a_32, sarama_hash_partition,
    )
    from loongcollector_spark.sources import kafka_records_projection

    # sarama's hash is FNV-1a over the key: pin the primitive against
    # the published FNV test vectors (public domain)
    assert fnv1a_32(b"") == 2166136261
    assert fnv1a_32(b"a") == 0xE40C292C
    assert fnv1a_32(b"foobar") == 0xBF9CF968

    rows = [(f"conv{i % 7}", i, f"msg {i}") for i in range(100)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    frame = kafka_payload_frame(df, "hash", ["conv_id"]).collect()

    broker = FakeKafkaBroker({"turns": 6})
    acks = broker.produce_rows(frame, "turns", partitioner="hash")

    # every ack carries (partition, offset); partition must equal the
    # independent sarama computation for that row's key
    for r, ack in zip(frame, acks):
        assert ack is not None
        assert ack[0] == sarama_hash_partition(r["key"].encode(), 6)
    # same key -> same partition; 7 keys spread over >1 partition
    key_parts = {}
    for r, (p, _o) in zip(frame, acks):
        key_parts.setdefault(r["key"], set()).add(p)
    assert all(len(ps) == 1 for ps in key_parts.values())
    assert len({next(iter(ps)) for ps in key_parts.values()}) > 1
    # offsets are contiguous from 0 within each partition
    for precs in broker.logs["turns"]:
        assert [r.offset for r in precs] == list(range(len(precs)))

    # consumer side: service_kafka's projection over the broker view
    back = kafka_records_projection(broker.records_frame(spark, "turns"))
    got = back.collect()
    assert len(got) == 100
    assert {(_json.loads(r["text"])["conv_id"], _json.loads(r["text"])["turn_idx"])
            for r in got} == {(c, i) for c, i, _t in rows}
    # per-partition offset order preserves produce order for a key
    by_part = {}
    for r in sorted(got, key=lambda r: (r["_ingest_partition"], r["_line_idx"])):
        by_part.setdefault(r["_ingest_partition"], []).append(
            _json.loads(r["text"])["turn_idx"])
    for seq in by_part.values():
        assert seq == sorted(seq)


def test_kafka_partitioners_and_acks(spark):
    """roundrobin cycles the counter; random stays in range and is
    seed-deterministic; RequiredAcks=0 returns no metadata (NoResponse);
    hash key falls back to the logstore default and joins HashKeys with
    '###' (hashPartitionKey, flusher_kafka_v2.go:345-357)."""
    from loongcollector_spark.flushers import kafka_payload_frame
    from loongcollector_spark.kafka_fake import FakeKafkaBroker

    broker = FakeKafkaBroker({"t": 4})
    acks = [broker.produce("t", b"v%d" % i, partitioner="roundrobin")
            for i in range(10)]
    assert [p for p, _ in acks] == [i % 4 for i in range(10)]

    b2 = FakeKafkaBroker({"t": 4}, seed=7)
    r1 = [b2.produce("t", b"x", partitioner="random")[0] for _ in range(20)]
    assert all(0 <= p < 4 for p in r1)
    b3 = FakeKafkaBroker({"t": 4}, seed=7)
    assert r1 == [b3.produce("t", b"x", partitioner="random")[0]
                  for _ in range(20)]

    b0 = FakeKafkaBroker({"t": 2}, required_acks=0)
    assert b0.produce("t", b"v") is None
    assert sum(len(p) for p in b0.logs["t"]) == 1  # still delivered

    df = spark.createDataFrame(
        [("a", 1, None), (None, None, "x")],
        "conv_id string, turn_idx int, other string")
    rows = kafka_payload_frame(
        df, "hash", ["conv_id", "turn_idx"], default_key="store1").collect()
    keys = sorted(r["key"] for r in rows)
    # multi-key join with ###; all-null hash keys -> logstore default
    assert keys == ["a###1", "store1"]
