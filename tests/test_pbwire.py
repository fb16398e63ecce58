"""Protobuf wire DECODER (the ManualPBParser analog) + LoongSuite group
encoder + processor_parse_from_pb (ProcessorParseFromPBNative.cpp)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from loongcollector_spark import pbwire as W
from loongcollector_spark.operators import build_operator


def test_py_varint_goldens():
    assert W.py_varint(0) == b"\x00"
    assert W.py_varint(127) == b"\x7f"
    assert W.py_varint(128) == b"\x80\x01"
    assert W.py_varint(300) == b"\xac\x02"
    assert W.py_varint(1715829785) == b"\x99\xf8\x95\xb2\x06"


def test_parse_fields_rejects_malformed():
    with pytest.raises(ValueError):
        W.parse_fields(b"\x00\x01")          # field number 0
    with pytest.raises(ValueError):
        W.parse_fields(b"\x0a\x10abc")       # truncated len-delim
    with pytest.raises(ValueError):
        W.parse_fields(b"\x0b\x00")          # wire type 3 (group)
    with pytest.raises(ValueError):
        W.parse_fields(b"\x09\x01\x02\x03")  # truncated fixed64
    with pytest.raises(ValueError):
        W.parse_fields(b"\x0d\x01")          # truncated fixed32


def test_decode_sls_loggroup_full():
    # hand-assembled LogGroup with topic, source, tags and Time_ns
    log = W.py_sls_log(1700000000, [("k1", "v1"), ("k2", "v2")])
    log += b"\x25" + struct.pack("<I", 123456789)          # Time_ns = 4
    buf = (
        W.py_field(1, log)
        + W.py_field(3, b"mytopic")
        + W.py_field(4, b"10.0.0.1")
        + W.py_field(6, W.py_kv("host", "h1"))
    )
    g = W.decode_sls_loggroup(buf)
    assert g["topic"] == "mytopic" and g["source"] == "10.0.0.1"
    assert g["tags"] == {"host": "h1"}
    assert g["logs"][0]["time"] == 1700000000
    assert g["logs"][0]["time_ns"] == 123456789
    assert g["logs"][0]["contents"] == {"k1": "v1", "k2": "v2"}


def test_sls_serializer_decodes_back(spark):
    """encode (serializer codegen) → decode (wire walker) = identity,
    including multi-byte UTF-8 values."""
    from loongcollector_spark.serializer import sls_pb_log_column

    df = spark.createDataFrame(
        [("a", "héllo ✓"), ("b", "")], "k string, v string"
    )
    pb = df.select(
        sls_pb_log_column(df, time_col="_none", content_cols=["k", "v"])
        .alias("pb")
    ).collect()
    for row, (k, v) in zip(pb, [("a", "héllo ✓"), ("b", "")]):
        g = W.decode_sls_loggroup(W.py_field(1, bytes(row["pb"])))
        assert g["logs"][0]["contents"] == {"k": k, "v": v}


def test_loongsuite_group_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 0, "2024-01-01 00:00:07", "error"),
         (1, 1, "2024-01-01 00:01:09", "click"),
         (2, 0, "2024-01-02 10:00:00", "view")],
        "conv long, idx long, ts_s string, et string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    groups = W.loongsuite_group_frame(
        df, group_cols=("conv",), order_col="idx", time_col="ts",
        content_cols=["et"], level="info",
        metadata={"source": "s1"}, tags={"env": "prod"},
    ).collect()
    by_conv = {r["conv"]: r for r in groups}
    g = W.decode_loongsuite_group(bytes(by_conv[1]["group_pb"]))
    assert g["metadata"] == {"source": "s1"} and g["tags"] == {"env": "prod"}
    assert [l["contents"]["et"] for l in g["logs"]] == ["error", "click"]
    assert all(l["level"] == "info" for l in g["logs"])
    assert g["logs"][0]["timestamp"] == 1704067207
    assert by_conv[2]["n_logs"] == 1


def test_parse_from_pb_operator(spark):
    ev = W.py_field(1, bytes([0x08]) + W.py_varint(42)
                    + W.py_field(2, W.py_kv("m", "hello"))
                    + W.py_field(3, b"warn"))
    group = (
        W.py_field(1, W.py_kv("source", "s1"))
        + W.py_field(2, W.py_kv("env", "prod"))
        + W.py_field(3, ev)
    )
    df = spark.createDataFrame(
        [(1, bytearray(group)), (2, bytearray(b"\xff\xff garbage"))],
        "group_id long, payload binary",
    )
    op = build_operator({"Type": "processor_parse_from_pb", "Protocol": "LoongSuite"})
    rows = {r["group_id"]: r for r in op(df).collect()}
    ok = rows[1]
    assert ok["_decode_ok"] and ok["log_time"] == 42
    assert ok["contents"] == {"m": "hello"} and ok["level"] == "warn"
    assert ok["metadata"] == {"source": "s1"} and ok["tags"] == {"env": "prod"}
    assert rows[2]["_decode_ok"] is False  # malformed payload survives

    # reference Init rejects unsupported protocols (cpp:64-67)
    with pytest.raises(ValueError):
        build_operator({"Type": "processor_parse_from_pb", "Protocol": "OTLP"})
