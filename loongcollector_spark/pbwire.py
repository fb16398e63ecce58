"""Protobuf wire-format DECODER + LoongSuite group encoder.

The ENCODE side for SLS ``LogGroup`` lives in ``serializer.py``
(``sls_pb_log_column`` / ``sls_pb_loggroup_frame`` — pure-codegen binary
concat); this module reuses those primitives (``_pb_varint`` /
``_pb_len_delim``) for the LoongSuite ``PipelineEventGroup`` shape and
adds the decode direction:

* The reference decodes raw protobuf payloads with a hand-written
  ManualPBParser (core/plugin/processor/inner/ProcessorParseFromPBNative.cpp:89-140)
  rather than generated code; ``parse_fields``/``decode_*`` below are
  the same idea in ~60 lines of the public wire spec, driven per Arrow
  batch from ``mapInPandas`` (see ``operators/pbops.py``).

Message schemas (public .proto files shipped by the reference,
Apache-2.0):

* sls_logs.proto (core/protobuf/sls/sls_logs.proto): ``LogGroup{Logs=1,
  Category=2, Topic=3, Source=4, MachineUUID=5, LogTags=6}``,
  ``Log{Time=1(uint32), Contents=2{Key=1,Value=2}, Time_ns=4(fixed32)}``.
* pipeline_event_group.proto (protobuf_public/models): proto3
  ``PipelineEventGroup{Metadata=1(map), Tags=2(map), Logs=3{Events=1}}``
  with ``LogEvent{Timestamp=1(uint64), Contents=2{Key=1,Value=2},
  Level=3}``.

Scale shape: encode is codegen per row + one per-group ordered fold at
the batch boundary; decode is Arrow-batched, stateless, and emits typed
columns so everything downstream is codegen again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.serializer import (
    _pb_len_delim,
    _pb_varint,
    pb_string_field,
    py_varint,
)

# ----------------------- LoongSuite codegen encoder ---------------------


def loongsuite_log_event_column(
    df: DataFrame,
    time_col: str = "ts",
    content_cols: list[str] | None = None,
    level: str | None = None,
) -> Column:
    """models.LogEvent bytes per row: Timestamp=1 varint, Contents=2
    key/value submessages, Level=3 — all JVM expressions (the proto3 twin
    of ``serializer.sls_pb_log_column``)."""
    from loongcollector_spark.serializer import serializable_columns

    cols = content_cols or [c for c in serializable_columns(df) if c != time_col]
    t = (
        F.unix_timestamp(F.col(time_col)) if time_col in df.columns else F.lit(0)
    )
    parts = [F.lit(b"\x08"), _pb_varint(t)]
    for c in cols:
        key = F.lit(c.encode())
        val = F.coalesce(F.col(c).cast("string"), F.lit("")).cast("binary")
        content = F.concat(_pb_len_delim(0x0A, key), _pb_len_delim(0x12, val))
        parts.append(
            F.when(F.col(c).isNotNull(), _pb_len_delim(0x12, content))
            .otherwise(F.lit(b""))
        )
    if level is not None:
        parts.append(F.lit(pb_string_field(3, level)))
    return F.concat(*parts)


def loongsuite_group_frame(
    df: DataFrame,
    group_cols=("conv_id",),
    order_col: str = "turn_idx",
    time_col: str = "ts",
    content_cols: list[str] | None = None,
    level: str | None = None,
    metadata: dict[str, str] | None = None,
    tags: dict[str, str] | None = None,
) -> DataFrame:
    """One serialized ``PipelineEventGroup`` per group: constant
    Metadata=1/Tags=2 entries (driver-side literals), then Logs=3
    wrapping the ordered per-row LogEvent fold."""
    ev = loongsuite_log_event_column(df, time_col, content_cols, level)
    logs = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), ev.alias("b")))
    )
    framed = F.transform(
        logs,
        lambda s: F.concat(F.lit(b"\x0a"), _pb_varint(F.length(s["b"])), s["b"]),
    )
    body = F.aggregate(
        framed, F.lit(b"").cast("binary"), lambda acc, x: F.concat(acc, x)
    )
    const = b""
    for field_no, kv in ((1, metadata), (2, tags)):
        for k, v in (kv or {}).items():
            entry = pb_string_field(1, k) + pb_string_field(2, v)
            const += bytes([(field_no << 3) | 2]) + py_varint(len(entry)) + entry
    group_bytes = F.concat(
        F.lit(const), _pb_len_delim(0x1A, body)  # Logs = field 3
    )
    return df.groupBy(*group_cols).agg(
        group_bytes.alias("group_pb"), F.count("*").alias("n_logs")
    )


# --------------------- pure-Python wire decoder -------------------------


def read_varint(buf, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def parse_fields(buf) -> list[tuple[int, int, object]]:
    """Walk a message: [(field_no, wire_type, value)]. Len-delimited
    values are bytes; varint/fixed are ints. Unknown wire types raise."""
    out, pos, n = [], 0, len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        field_no, wt = tag >> 3, tag & 7
        if field_no == 0:
            raise ValueError("field number 0 is invalid")
        if wt == 0:
            val, pos = read_varint(buf, pos)
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            val = bytes(buf[pos:pos + ln])
            pos += ln
        elif wt == 5:
            val = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        elif wt == 1:
            val = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.append((field_no, wt, val))
    return out


def _kv(buf) -> tuple[str, str]:
    k = v = ""
    for f, _wt, val in parse_fields(buf):
        if f == 1:
            k = val.decode("utf-8", "replace")
        elif f == 2:
            v = val.decode("utf-8", "replace")
    return k, v


def decode_sls_loggroup(buf) -> dict:
    """sls_logs.LogGroup bytes → {logs:[{time,time_ns,contents}], topic,
    source, category, machine_uuid, tags}."""
    group = {"logs": [], "topic": "", "source": "", "category": "",
             "machine_uuid": "", "tags": {}}
    for f, _wt, val in parse_fields(buf):
        if f == 1:
            log = {"time": 0, "time_ns": None, "contents": {}}
            for lf, _lwt, lval in parse_fields(val):
                if lf == 1:
                    log["time"] = lval
                elif lf == 2:
                    k, v = _kv(lval)
                    log["contents"][k] = v
                elif lf == 4:
                    log["time_ns"] = lval
            group["logs"].append(log)
        elif f == 2:
            group["category"] = val.decode()
        elif f == 3:
            group["topic"] = val.decode()
        elif f == 4:
            group["source"] = val.decode()
        elif f == 5:
            group["machine_uuid"] = val.decode()
        elif f == 6:
            k, v = _kv(val)
            group["tags"][k] = v
    return group


def decode_loongsuite_group(buf) -> dict:
    """models.PipelineEventGroup bytes → {metadata, tags, logs:[{
    timestamp, contents, level}]} (the protocol processor_parse_from_pb
    accepts, ProcessorParseFromPBNative.cpp:40-42)."""
    group = {"metadata": {}, "tags": {}, "logs": []}
    for f, _wt, val in parse_fields(buf):
        if f in (1, 2):
            k, v = _kv(val)
            (group["metadata"] if f == 1 else group["tags"])[k] = v
        elif f == 3:
            for ef, _ewt, ev in parse_fields(val):
                if ef != 1:
                    continue
                log = {"timestamp": 0, "contents": {}, "level": ""}
                for lf, _lwt, lval in parse_fields(ev):
                    if lf == 1:
                        log["timestamp"] = lval
                    elif lf == 2:
                        k, v = _kv(lval)
                        log["contents"][k] = v
                    elif lf == 3:
                        log["level"] = lval.decode()
                group["logs"].append(log)
    return group


# ----------------- python model helpers for test goldens ----------------


def py_field(field_no: int, payload: bytes, wire_type: int = 2) -> bytes:
    return py_varint((field_no << 3) | wire_type) + (
        py_varint(len(payload)) + payload if wire_type == 2 else payload
    )


def py_kv(key: str, value: str) -> bytes:
    return py_field(1, key.encode()) + py_field(2, value.encode())


def py_sls_log(time_sec: int, contents: list[tuple[str, str]]) -> bytes:
    body = bytes([0x08]) + py_varint(time_sec)  # Time=1, wire type 0
    for k, v in contents:
        body += py_field(2, py_kv(k, v))
    return body
