"""Sink serialization — the JsonSerializer / flusher_file analog.

The reference's golden-output sink writes one JSON object per event:
group tags + ``__time__`` (epoch seconds) + contents, newline-delimited
(core/collection_pipeline/serializer/JsonSerializer.cpp:30-84, sink
core/plugin/flusher/file/FlusherFile.h:31-52). Compression choices mirror
the Compressor component (LZ4/ZSTD, core/common/compression/).

Spark: ``to_json(struct(...))`` is codegen, ``df.write.text/json`` writes
line-delimited output in parallel — the serializer is part of the same
stage as the last transform, no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# columns that are runtime plumbing, never part of the serialized event
_INTERNAL_PREFIXES = ("_to_", "_batch", "_fmt", "_parse")


def serializable_columns(df: DataFrame) -> list[str]:
    return [c for c in df.columns
            if not any(c.startswith(p) for p in _INTERNAL_PREFIXES)]


def json_event_column(df: DataFrame, time_col: str = "ts",
                      tags: dict[str, str] | None = None):
    """The serialized-event Column: ``__time__`` + constant tags +
    contents, null fields dropped like the reference omits absent
    contents."""
    cols = [c for c in serializable_columns(df) if c != time_col]
    fields = []
    if time_col in df.columns:
        fields.append(F.unix_timestamp(F.col(time_col)).alias("__time__"))
    for k, v in (tags or {}).items():
        fields.append(F.lit(v).alias(k))
    fields += [F.col(c) for c in cols]
    return F.to_json(F.struct(*fields), {"ignoreNullFields": "true"})


def to_json_events(df: DataFrame, time_col: str = "ts",
                   tags: dict[str, str] | None = None) -> DataFrame:
    """One JSON string per row (see json_event_column)."""
    return df.select(json_event_column(df, time_col, tags).alias("value"))


def write_json_sink(df: DataFrame, path: str, time_col: str = "ts",
                    tags: dict[str, str] | None = None,
                    compression: str = "gzip", mode: str = "overwrite") -> None:
    """JSON-lines sink (flusher_file): the golden-output format for
    cross-checking against reference collector output."""
    (to_json_events(df, time_col, tags)
     .write.mode(mode).option("compression", compression).text(path))


# --------------------------------------------------------------------------
# flusher_http converter protocols (pkg/protocol/converter/)
# --------------------------------------------------------------------------
# The Go HTTP flusher serializes through a Converter chosen by
# Convert.Protocol (flusher_http.go:79-118; default custom_single+json).
# Shapes modeled here, with Go json.Marshal's sorted-map-key byte layout:
#
# * custom_single (custom_single_log.go:32-62):
#     {"contents": {...}, "tags": {...}, "time": <epoch sec>}
# * custom_single_flatten / jsonline (converter_single_log_flatten.go:
#   25-60, jsonline.go:15-41): {**contents, **tags, "time": ...} — one
#   flat object per line.
# * influxdb (influxdb_metric.go:32-86 over the __name__/__labels__/
#   __value__/__time_nano__ metric shape): line protocol
#   ``measurement[,k=v...] field=value[ time_nano]``, labels key-sorted.


def _row_tags(df: DataFrame) -> dict:
    """Per-row tags: a ``__tag__:x`` column is the tag ``x``
    (convertLogToMap, converter.go:230-262 strips the prefix into the
    tags map — the reference's inputs stamp discovery tags this way)."""
    return {c[len("__tag__:"):]: F.col(c).cast("string")
            for c in df.columns if c.startswith("__tag__:")}


def _content_struct(df: DataFrame, skip: tuple[str, ...]):
    """contents as a sorted-key struct of string casts (the reference's
    map[string]string contents; Go marshals map keys sorted). ``__tag__:``
    columns are tags, not contents."""
    cols = sorted(c for c in serializable_columns(df)
                  if c not in skip and not c.startswith("__tag__:"))
    return F.struct(*[F.col(c).cast("string").alias(c) for c in cols])


def custom_single_column(df: DataFrame, time_col: str = "ts",
                         tags: dict[str, str] | None = None,
                         rename: dict[str, str] | None = None):
    """custom_single JSON value per event. ``rename`` is the
    ProtocolKeyRenameMap (keys: time/contents/tags)."""
    rename = rename or {}
    merged_tags: dict = {k: F.lit(v) for k, v in (tags or {}).items()}
    merged_tags.update(_row_tags(df))
    fields = {
        rename.get("contents", "contents"): _content_struct(df, (time_col,)),
        rename.get("tags", "tags"): F.struct(
            *[expr.alias(k) for k, expr in sorted(merged_tags.items())]
        ),
        rename.get("time", "time"): F.unix_timestamp(F.col(time_col))
        if time_col in df.columns else F.lit(0),
    }
    struct = F.struct(*[expr.alias(name) for name, expr in sorted(fields.items())])
    return F.to_json(struct, {"ignoreNullFields": "true"})


def jsonline_column(df: DataFrame, time_col: str = "ts",
                    tags: dict[str, str] | None = None,
                    only_contents: bool = False,
                    rename: dict[str, str] | None = None):
    """Flattened single-log JSON (jsonline / custom_single_flatten):
    contents and tags merged top-level plus the time key."""
    rename = rename or {}
    merged: dict = {}
    for c in serializable_columns(df):
        if c != time_col and not c.startswith("__tag__:"):
            merged[c] = F.col(c).cast("string")
    if not only_contents:
        for k, v in (tags or {}).items():
            merged[k] = F.lit(v)
        merged.update(_row_tags(df))
    merged[rename.get("time", "time")] = (
        F.unix_timestamp(F.col(time_col)) if time_col in df.columns else F.lit(0)
    )
    struct = F.struct(*[expr.alias(name) for name, expr in sorted(merged.items())])
    return F.to_json(struct, {"ignoreNullFields": "true"})


def _lp_escape(col, chars: str):
    """influxdb line-protocol escaping: backslash before any of ``chars``."""
    out = col
    for ch in chars:
        out = F.replace(out, F.lit(ch), F.lit("\\" + ch))
    return out


def influxdb_line_column(df: DataFrame):
    """One influxdb line-protocol record per metric event.

    Input shape = the processor_log_to_metric output (__name__,
    __labels__ ``k=v|k=v`` or ``k#$#v|k#$#v``, __value__, __time_nano__,
    optional __field__). Name/field split follows the reader's
    unit-tested contract (converter_sls_metric_test.go:85-133): the
    ``:field`` suffix is trimmed only when a __field__ column names it;
    otherwise the field key is ``value`` and the name passes through.
    """
    name = F.col("__name__")
    if "__field__" in df.columns:
        fld = F.coalesce(F.col("__field__").cast("string"), F.lit(""))
        use = (fld != "") & (fld != "value")
        measurement = F.when(
            use & name.endswith(F.concat(F.lit(":"), fld)),
            F.expr("substring(__name__, 1, length(__name__) - length(__field__) - 1)"),
        ).otherwise(name)
        field_key = F.when(use, fld).otherwise(F.lit("value"))
    else:
        measurement = name
        field_key = F.lit("value")
    labels = F.coalesce(F.col("__labels__"), F.lit(""))
    # accept both the sls #$# and this repo's = key/value separator
    tagline = F.when(
        labels != "",
        F.concat(F.lit(","), F.replace(
            _lp_escape(F.replace(labels, F.lit("#$#"), F.lit("\x00")),
                       ", ").alias("x"),
            F.lit("\x00"), F.lit("="),
        )),
    ).otherwise(F.lit(""))
    # tag values arrive pre-joined; '=' inside them is the separator, so
    # only comma/space are escaped above. '|' becomes the tag delimiter.
    tagline = F.replace(tagline, F.lit("|"), F.lit(","))
    v = F.col("__value__").cast("double")
    vstr = F.when(
        v == F.floor(v), v.cast("long").cast("string")
    ).otherwise(v.cast("string"))
    t = F.when(
        F.col("__time_nano__").isNotNull(),
        F.concat(F.lit(" "), F.col("__time_nano__").cast("string")),
    ).otherwise(F.lit("")) if "__time_nano__" in df.columns else F.lit("")
    return F.concat(
        _lp_escape(measurement, ", "), tagline,
        F.lit(" "), _lp_escape(field_key, ",= "), F.lit("="), vstr, t,
    )


def _otlp_attr_array(pairs):
    """OTLP JSON attribute list: [{"key":k,"value":{"stringValue":v}}…]
    with absent (NULL) values dropped, mirroring the reference's
    PutStr-per-present-content loop (otlp.go:76-83)."""
    entries = F.array(*[
        F.struct(
            F.lit(k).alias("key"),
            F.struct(v.cast("string").alias("stringValue")).alias("value"),
        )
        for k, v in pairs
    ])
    return F.filter(entries, lambda e: e["value"]["stringValue"].isNotNull())


def otlp_log_record_column(df: DataFrame, time_col: str = "ts",
                           tags: dict[str, str] | None = None,
                           observed_time_ns: int = 0):
    """One OTLP ``LogRecord`` per event in OTLP/HTTP protojson shape —
    the otlp_v1 converter's per-log mapping
    (pkg/protocol/converter/otlp.go:43-103, converter.go:31,109):

    * attributes = contents minus the ``content`` body key and ``level``
      severity key, then group tags (PutStr each; reference map order is
      Go-randomized, modeled here as sorted-then-tags, deterministic);
    * timeUnixNano = Time (epoch sec) × 1e9 — protojson renders uint64
      as a STRING;
    * body.stringValue = contents["content"]; severityText =
      contents["level"]; both omitted when absent;
    * observedTimeUnixNano is ``time.Now()`` in the reference — passed
      as a parameter here (0 ⇒ omitted) so goldens stay byte-stable.

    Field order = LogRecord proto field-number order. Pure codegen.
    """
    cols = sorted(
        c for c in serializable_columns(df)
        if c not in (time_col, "content", "level")
    )
    pairs = [(c, F.col(c)) for c in cols]
    pairs += [(k, F.lit(v)) for k, v in (tags or {}).items()]
    fields = []
    if time_col in df.columns:
        t_ns = (F.unix_timestamp(F.col(time_col)) * F.lit(1000000000)
                ).cast("string")
        fields.append(t_ns.alias("timeUnixNano"))
    if "level" in df.columns:
        fields.append(F.col("level").cast("string").alias("severityText"))
    if "content" in df.columns:
        fields.append(
            F.when(
                F.col("content").isNotNull(),
                F.struct(F.col("content").cast("string").alias("stringValue")),
            ).alias("body")
        )
    fields.append(_otlp_attr_array(pairs).alias("attributes"))
    if observed_time_ns:
        fields.append(F.lit(str(observed_time_ns)).alias("observedTimeUnixNano"))
    return F.to_json(F.struct(*fields), {"ignoreNullFields": "true"})


def otlp_resource_logs_frame(df: DataFrame, group_cols=("conv_id",),
                             order_col: str = "turn_idx",
                             time_col: str = "ts",
                             topic: str = "", source: str = "",
                             machine_uuid: str = "",
                             tags: dict[str, str] | None = None) -> DataFrame:
    """One ``ResourceLogs`` JSON document per group: resource attributes
    = source/topic/machine_uuid when set plus the group tags
    (otlp.go:47-61), a single scope, logRecords in stable order."""
    res_pairs = []
    if source:
        res_pairs.append(("source", F.lit(source)))
    if topic:
        res_pairs.append(("topic", F.lit(topic)))
    if machine_uuid:
        res_pairs.append(("machine_uuid", F.lit(machine_uuid)))
    res_pairs += [(k, F.lit(v)) for k, v in (tags or {}).items()]
    res_json = (
        F.to_json(F.struct(_otlp_attr_array(res_pairs).alias("attributes")))
        if res_pairs else F.lit("{}")  # empty Resource message (protojson)
    )
    record = otlp_log_record_column(df, time_col)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"),
                                record.alias("r")))
    )
    body = F.array_join(F.transform(ordered, lambda s: s["r"]), ",")
    grouped = df.groupBy(*group_cols).agg(
        body.alias("_body"), F.count("*").alias("n_records")
    )
    return grouped.select(
        *group_cols,
        F.concat(
            F.lit('{"resource":'), res_json,
            F.lit(',"scopeLogs":[{"logRecords":['), F.col("_body"),
            F.lit("]}]}"),
        ).alias("resource_logs"),
        "n_records",
    )


def loki_streams_frame(df: DataFrame, static_labels: dict[str, str],
                       dynamic_labels: list[str] | None = None,
                       time_col: str = "ts",
                       line_protocol: str = "jsonline",
                       tag_fields_rename: dict[str, str] | None = None) -> DataFrame:
    """The Loki push-API v1 payload (flusher_loki.go:152-171,218-227):
    each event becomes (labels, ts, line) where labels = StaticLabels +
    DynamicLabels read from the event (``content.``/``tag.`` prefixes
    trimmed, converter.go:219-228) and line = the configured converter's
    serialization; the loki client then batches one stream per label
    set — modeled as a groupBy on the label tuple producing one
    ``{"streams":[{"stream":{...},"values":[["<ns>","<line>"],...]}]}``
    document per label set, values in (ts, line) order (the client's
    arrival order is not defined under parallelism, so the stable sort
    makes payloads deterministic)."""
    def resolve(key: str, kind: str):
        """``tag.X`` reads tag X only, ``content.X`` reads the content
        column only (findTargetValues keys each prefix to its own store,
        converter.go:219-228) — an unprefixed label tries tags first.
        When a tag is absent, Convert.TagFieldsRename[X] names the
        underlying tag (converter.go:296-302). Tags live in
        ``__tag__:``-prefixed columns."""
        for cand in (key, (tag_fields_rename or {}).get(key)):
            if cand is None:
                continue
            cols = []
            if kind in ("tag", "any"):
                cols.append(f"__tag__:{cand}")
            if kind in ("content", "any"):
                cols.append(cand)
            for col in cols:
                if col in df.columns:
                    return F.col(col).cast("string")
        return None

    def split_label(lbl: str):
        if lbl.startswith("content."):
            return lbl.split(".", 1)[1], "content"
        if lbl.startswith("tag."):
            return lbl.split(".", 1)[1], "tag"
        return lbl, "any"

    trimmed = sorted(split_label(lbl) for lbl in (dynamic_labels or []))
    line = _HTTP_PROTOCOLS[line_protocol](df)
    merged = {k: F.lit(v) for k, v in static_labels.items()}
    merged.update({c: expr for c, kind in trimmed
                   if (expr := resolve(c, kind)) is not None})
    # Go marshals the LabelSet map with sorted keys — all labels together
    label_fields = [expr.alias(k) for k, expr in sorted(merged.items())]
    stream = F.to_json(F.struct(*label_fields))
    # events without a time column (e.g. metric_mock rows) stamp 0,
    # like the converters' missing-__time__ default
    t = (F.unix_timestamp(F.col(time_col)) if time_col in df.columns
         else F.lit(0))
    # sort on the NUMERIC ns value (a lexicographic string sort misorders
    # mixed-digit-length timestamps, and Loki rejects out-of-order
    # entries within a stream), stringify after
    ns = (t.cast("long") * F.lit(1000000000))
    keyed = df.select(
        stream.alias("_stream"),
        F.struct(ns.alias("ts"), line.alias("line")).alias("_v"),
    )
    values = F.transform(
        F.array_sort(F.collect_list("_v")),
        lambda s: F.array(s["ts"].cast("string"), s["line"]),
    )
    grouped = keyed.groupBy("_stream").agg(
        F.to_json(values).alias("_values"),
        F.count("*").alias("n_entries"),
    )
    return grouped.select(
        F.concat(
            F.lit('{"streams":[{"stream":'), F.col("_stream"),
            F.lit(',"values":'), F.col("_values"), F.lit("}]}"),
        ).alias("payload"),
        "n_entries",
    )


_HTTP_PROTOCOLS = {
    "custom_single": custom_single_column,
    "jsonline": jsonline_column,
    # the Go converter registers the flatten shape under both names
    # (converter.go / converter_single_log_flatten.go)
    "custom_single_flatten": jsonline_column,
    "influxdb": influxdb_line_column,
    "otlp_v1": otlp_log_record_column,
}


def convert_events(df: DataFrame, protocol: str = "custom_single",
                   **kwargs) -> DataFrame:
    """The flusher_http request-body frame: one serialized value per
    event under the chosen converter protocol."""
    if protocol not in _HTTP_PROTOCOLS:
        raise ValueError(
            f"unsupported Convert.Protocol {protocol!r}; "
            f"supported: {sorted(_HTTP_PROTOCOLS)}"
        )
    fn = _HTTP_PROTOCOLS[protocol]
    col = fn(df, **kwargs) if protocol != "influxdb" else fn(df)
    return df.select(col.alias("value"))


# --------------------------------------------------------------------------
# SLS protobuf serializer (SLSSerializer.cpp over the public Apache-2.0
# wire schema pkg/protocol/sls_logs.pb.go:29-31,97-98,149-150,201-206)
# --------------------------------------------------------------------------
# Message layout (ascending field order, standard proto2 encoding):
#   Log        : Time varint f1 · Contents len-delim f2 (repeated)
#   Log_Content: Key len-delim f1 · Value len-delim f2
#   LogGroup   : Logs f1 (rep) · Category f2 · Topic f3 · Source f4 ·
#                MachineUUID f5 · LogTags f6 (LogTag: Key f1, Value f2)
# The per-row Log message is PURE codegen (varints via shift/mask
# when-chains, bytes via unhex, concat on BinaryType); only the
# group-level fold over collected logs uses an interpreted aggregate —
# at the sink boundary, once per LogGroup, never per row.


def py_varint(n: int) -> bytes:
    """Python twin of the varint expression (test model + const fields)."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def py_sls_log_group(logs: list) -> bytes:
    """Independent pure-Python LogGroup writer (test known-answer source
    for sls_pb_loggroup_frame / statistics_frame): ``logs`` is a list of
    ``(epoch_ts, [(key, value), ...])`` tuples; topic/source/tags empty."""
    out = b""
    for ts, contents in logs:
        body = b"\x08" + py_varint(ts)
        for k, v in contents:
            c = pb_string_field(1, k) + pb_string_field(2, v)
            body += b"\x12" + py_varint(len(c)) + c
        out += b"\x0a" + py_varint(len(body)) + body
    return out


def _pb_byte(col):
    """One byte from an int expression in [0, 255]."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 2, "0"))


def concat_binary(arr):
    """Concatenate an ``array<binary>`` column LINEARLY: hex each
    element, one ``array_join`` pass (UTF8String builder), one unhex.
    The naive ``F.aggregate(arr, b'', concat)`` left fold re-copies the
    accumulator on every element — O(total²) bytes per group, which is
    the dominant cost once a conversation/group holds hundreds of
    framed events."""
    return F.unhex(F.array_join(F.transform(arr, F.hex), ""))


def _pb_varint(col, max_bytes: int = 5):
    """Protobuf varint of a non-negative long expression (≤ 2^35-1).

    The byte loop reads its input ~3× per byte; ``bind_once`` keeps the
    input referenced exactly once so nested len-delim framing composes
    with linear (not exponential) plan size.

    Fast path: values < 128 (almost every length-delimited framing —
    keys, label names/values, short contents) encode as the single raw
    byte, skipping the ~12-node-per-byte continuation walk. The encode
    tree sits behind a higher-order-function boundary (bind_once), so
    it is evaluated interpreted — node count IS the per-row cost."""
    from loongcollector_spark.operators.common import bind_once

    def body(v):
        pieces = []
        for i in range(max_bytes):
            grp = F.shiftright(v, 7 * i).bitwiseAND(F.lit(0x7F))
            more = F.shiftright(v, 7 * (i + 1)) > 0
            byte = _pb_byte(
                F.when(more, grp.bitwiseOR(F.lit(0x80))).otherwise(grp)
            )
            if i == 0:
                pieces.append(byte)
            else:
                pieces.append(
                    F.when(F.shiftright(v, 7 * i) > 0, byte)
                    .otherwise(F.lit(b""))
                )
        return F.when(v < 128, _pb_byte(v)).otherwise(F.concat(*pieces))

    return bind_once(col.cast("long"), body)


def _pb_len_delim(tag: int, payload):
    """tag byte + varint(byte length) + payload (payload: binary col).
    ``bind_once`` on the payload: it is read twice (length + bytes), and
    payloads nest — without the binding each nesting level multiplies."""
    from loongcollector_spark.operators.common import bind_once

    return bind_once(
        payload,
        lambda p: F.concat(F.lit(bytes([tag])), _pb_varint(F.length(p)), p),
    )


def pb_string_field(field_num: int, value: str) -> bytes:
    """Constant length-delimited field, assembled driver-side."""
    raw = value.encode()
    return bytes([(field_num << 3) | 2]) + py_varint(len(raw)) + raw


def sls_pb_log_column(df: DataFrame, time_col: str = "ts",
                      content_cols: list[str] | None = None):
    """The serialized ``Log`` message per row — all JVM expressions.
    Null contents are omitted (the JsonSerializer's ignoreNullFields
    twin); values are stringified like the reference's string-only
    content model."""
    cols = content_cols or [
        c for c in serializable_columns(df) if c != time_col
    ]
    from loongcollector_spark.operators.common import expr_template

    return expr_template(_sls_pb_log_expr)(
        time_col if time_col in df.columns else None, tuple(cols))


def _sls_pb_log_expr(time_col: str | None, cols: tuple):
    """The per-row Log wire tree — cached per (time presence, column
    tuple) via ``expr_template`` (~0.8 s of py4j construction)."""
    # NULL/pre-1970 times stamp 0 like the converters' missing-__time__
    # default: a NULL here would null the whole concat and silently DROP
    # the log from the group blob while n_logs still counts it, and a
    # negative epoch corrupts the varint stream
    t = (
        F.greatest(F.coalesce(F.unix_timestamp(F.col(time_col)), F.lit(0)),
                   F.lit(0))
        if time_col is not None else F.lit(0)
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
    return F.concat(*parts)


def sls_pb_loggroup_frame(df: DataFrame, group_cols=("conv_id",),
                          order_col: str = "turn_idx", time_col: str = "ts",
                          topic: str = "", source: str = "",
                          machine_uuid: str = "",
                          tags: dict[str, str] | None = None,
                          max_logs: int | None = None) -> DataFrame:
    """One ``LogGroup`` blob per group: logs in stable order, then the
    constant Topic/Source/MachineUUID/LogTags fields (assembled once
    driver-side as literal bytes).

    ``max_logs`` splits a group into consecutive sub-groups of at most
    that many logs (the reference caps LogGroups at MaxLogCount=1024,
    ``plugins/aggregator/baseagg/aggregator_base.go:26-29,93-137``) and
    adds a ``group_seq`` column — the 0-based chunk index, the pack-id
    sequence twin. Besides parity, it bounds per-group aggregation
    state: without it a hot key's whole history lands in ONE blob."""
    df = _chunked(df, group_cols, order_col, max_logs)
    if max_logs is not None:
        group_cols = tuple(group_cols) + ("_batch_seq",)
    log = sls_pb_log_column(df, time_col)
    logs = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), log.alias("b")))
    )
    framed = F.transform(
        logs,
        lambda s: F.concat(
            F.lit(b"\x0a"), _pb_varint(F.length(s["b"])), s["b"]
        ),
    )
    body = concat_binary(framed)
    const = b""
    if topic:
        const += pb_string_field(3, topic)
    if source:
        const += pb_string_field(4, source)
    if machine_uuid:
        const += pb_string_field(5, machine_uuid)
    for k, v in (tags or {}).items():
        tag_msg = pb_string_field(1, k) + pb_string_field(2, v)
        const += bytes([0x32]) + py_varint(len(tag_msg)) + tag_msg
    out = df.groupBy(*group_cols).agg(
        F.concat(body, F.lit(const)).alias("loggroup_pb"),
        F.count("*").alias("n_logs"),
    )
    if max_logs is not None:
        out = out.withColumnRenamed("_batch_seq", "group_seq")
    return out


def _chunked(df: DataFrame, group_cols, order_col: str,
             max_logs: int | None) -> DataFrame:
    """Stamp each row with its group's 0-based chunk index under a
    ``max_logs``-per-chunk cap (``_batch_seq``, an internal-prefix
    column so it never serializes as a content). One exchange on the
    group key + in-partition sort — the same shuffle the group
    aggregation pays anyway."""
    if max_logs is None:
        return df
    if max_logs < 1:
        raise ValueError(f"max_logs must be >= 1, got {max_logs}")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(order_col)
    return df.withColumn(
        "_batch_seq",
        F.floor((F.row_number().over(w) - 1) / max_logs).cast("int"),
    )
