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


def test_fast_walkers_match_reference_decoders():
    """The inline recursive-descent walkers (decode_batch, the production
    path) must return IDENTICAL dicts — and identical failure sets — to
    the parse_fields reference decoders, over round-trip corpora, edge
    wire-type payloads, odd kv shapes, truncations, and bit flips."""
    import struct

    from loongcollector_spark.pbwire import (
        decode_batch, decode_loongsuite_group, decode_sls_loggroup,
    )

    def varint(n):
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def ld(tag, b):
        return bytes([tag]) + varint(len(b)) + b

    def kv(k, v):
        return ld(0x0A, k.encode()) + ld(0x12, v.encode())

    ls = []
    for g in range(20):
        evs = b""
        for i in range(30):
            log = b"\x08" + varint(1700000000 + i)
            log += ld(0x12, kv("event_type", f"type_{i % 7}"))
            log += ld(0x12, kv("props", f"k=v{i};x={g}"))
            log += ld(0x1A, b"info")
            evs += ld(0x0A, log)
        ls.append(ld(0x0A, kv("source", "bench")) + ld(0x1A, evs))
    sls = []
    for g in range(10):
        logs = b""
        for i in range(20):
            log = b"\x08" + varint(1700000000 + i)
            log += ld(0x12, kv("msg", f"line {i} of group {g}"))
            log += b"\x25" + struct.pack("<I", 123456789 + i)
            logs += ld(0x0A, log)
        grp = logs + ld(0x12, b"cat") + ld(0x1A, b"topic")
        grp += ld(0x22, b"src") + ld(0x2A, b"uuid-1")
        grp += ld(0x32, kv("tag1", "v1"))
        sls.append(grp)
    # edge payloads: empty, wrong wire types on known fields, 10-byte
    # varint, unknown fields of every wire type, odd kv shapes
    edges = [
        b"", b"\x08\x01",
        ld(0x0A, b"\x08" + b"\xff" * 9 + b"\x01" + ld(0x12, kv("k", "v"))),
        b"\x0D" + struct.pack("<I", 5),
        b"\x31" + struct.pack("<Q", 7),
        ld(0x3A, b"junk"),
        b"\x38" + varint(12345),
        b"\x3C",  # wire type 4: both must reject
    ]
    kvs = [ld(0x12, b"valfirst") + ld(0x0A, b"k1"), ld(0x12, b"only-value"),
           ld(0x0A, b"only-key"), kv("big", "x" * 300),
           kv("k", "v") + ld(0x1A, b"extra")]
    edges.append(ld(0x1A, b"".join(
        ld(0x0A, b"\x08\x01" + ld(0x12, c)) for c in kvs)))
    edges.append(b"".join(
        ld(0x0A, b"\x08\x01" + ld(0x12, c)) for c in kvs))
    mal = []
    for base in (ls[0], sls[0]):
        for cut in range(0, len(base), 7):
            mal.append(base[:cut])
        for i in range(0, len(base), 11):
            mal.append(base[:i] + bytes([base[i] ^ 0xFF]) + base[i + 1:])

    def ref(payloads, d):
        out = []
        for p in payloads:
            try:
                out.append(d(p))
            except Exception:
                out.append(None)
        return out

    corpus = ls + sls + edges + mal
    assert ref(corpus, decode_loongsuite_group) == decode_batch(
        corpus, "LoongSuite")
    assert ref(corpus, decode_sls_loggroup) == decode_batch(
        corpus, "SLS_LogGroup")
    # None payloads map to None without disturbing neighbors
    assert decode_batch([None, ls[0], None], "LoongSuite")[0] is None
