"""HTTP-push input decoders (service_http_server) + journal/otlp inputs.

The reference's httpserver input (plugins/input/httpserver/
input_http_server.go) accepts pushed payload bodies and decodes each
with a per-Format decoder from pkg/protocol/decoder/*: ``influxdb``,
``statsd``, ``prometheus``, ``sls``, ``otlp``, ``raw``. The Spark
adapter is the same contract over a DataFrame of payload bodies: one
row per pushed body, the decoder explodes it into the reference's
metric-log shape (``__name__`` / ``__labels__`` / ``__value__`` /
``__time_nano__`` columns) with pure-codegen expressions — no Python
on the data path, so a 100 TB replay of captured push traffic scans,
parses, and aggregates entirely JVM-side.

Scale shape: each body row is independent (explode of a split — a
Generate, no shuffle); the per-line regexes are anchored single-pass
patterns, and the only non-codegen pieces are HOF lambdas over the
short per-line tag/field arrays.

* influxdb line protocol (pkg/protocol/decoder/influxdb/decoder.go:
  159-219 parsePointsToLogs): point × field → one log; name is the
  measurement when the field key is ``value`` else ``measurement:field``;
  float values printed Go-'g', ints decimal, bools 1/0; string fields
  only emitted with ``FieldsExtend`` (plus ``__type__``/``__field__``/
  ``__tag__:db`` extras).
* statsd / dogstatsd (pkg/protocol/decoder/statsd/decoder.go:44-65):
  ``name:value|type[|@rate][|#k:v,...]``; value must be numeric (the
  reference asserts float64 — set-type metrics are not representable);
  the sample rate is parsed and ignored exactly like the reference.
* journal export format (plugins/input/journal/input_journal.go:339-371
  emits Fields + _realtime_timestamp_/_monotonic_timestamp_; the export
  framing itself is the public systemd journal-export spec): blank-line
  separated entries of NAME=value lines. ParsePriority /
  ParseSyslogFacility map numeric fields through the reference's
  conversion tables verbatim.

Known line-protocol approximations (documented, fixture-covered): the
escape handling resolves ``\\,`` ``\\=`` ``\\ `` and quoted field
strings; a literal backslash immediately before a separator (``\\\\,``)
is read as an escape — the reference's influxdb models parser tracks
escape parity exactly. Not reachable from well-formed emitters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register

# ---------------------------------------------------------------------------
# influxdb line protocol
# ---------------------------------------------------------------------------

# measurement: commas/spaces escaped; tags: chars with \-escapes up to the
# first unescaped space; fields: tokens that may embed "quoted strings";
# optional trailing integer timestamp (ns). All repetition is POSSESSIVE
# (++/*+): the alternatives are mutually exclusive per position, so
# possessive matching is semantics-preserving — and without it the
# nested quantified alternations backtrack exponentially on a long
# non-matching line (a hostile 5 kB token pinned an executor thread;
# the same failure mode the grok build-time lint rejects in user
# patterns).
_INFLUX_LINE_RX = (
    r"^((?:[^, \\]|\\.)++)"             # 1 measurement
    r"(?:,((?:[^ \\]|\\.)++))?"         # 2 tag pairs (no leading comma)
    r" ((?:[^ \"\\]|\\.|\"(?:[^\"\\]|\\.)*+\")++)"  # 3 fields
    r"(?: (\d++))?\s*+$"                # 4 timestamp (ns)
)
# split commas that sit OUTSIDE any (escape-aware) quoted string
_FIELD_SPLIT_RX = r",(?=(?:[^\"\\]|\\.|\"(?:[^\"\\]|\\.)*+\")*+$)"
_UNESCAPED_COMMA = r"(?<!\\),"
_UNESCAPED_EQ_KEY = r"^((?:[^=\\]|\\.)*+)=(.*)$"


def _unescape_ident(c: Column) -> Column:
    return F.regexp_replace(c, r"\\([, =])", r"$1")


def go_g_str(v: Column) -> Column:
    """Go ``strconv.FormatFloat(v, 'g', -1, 64)`` of a double column.

    Go's shortest-'g' picks %e iff decimal exponent < -4 or >= 6
    (ftoa.go: shortest => eprec=6), with a sign-always two-digit
    exponent; Java's ``Double.toString`` picks scientific outside
    [1e-3, 1e7) with bare exponents. Both emit the same shortest digit
    string, so the conversion is pure string surgery on the Java form,
    case by where the two thresholds disagree:

    * [1e-3, 1e6): both decimal - strip Java's trailing ``.0``.
    * [1e6, 1e7): Java decimal (exactly 7 integer digits), Go sci -
      always e+06; mantissa digits with trailing zeros stripped.
    * [1e-4, 1e-3): Java sci (E-4), Go decimal - ``0.000`` + digits.
    * elsewhere: Java sci -> drop a ``.0`` mantissa tail, exponent to
      e(+/-)NN.

    (NaN/Infinity never reach this from the line-protocol parse - the
    value regex rejects them.)
    """
    from loongcollector_spark.operators.common import bind_once

    def from_java(s):
        is_sci = s.contains("E")
        m = F.substring_index(s, "E", 1)
        e = F.substring_index(s, "E", -1).cast("int")
        exp_txt = F.concat(
            F.when(e < 0, F.lit("e-")).otherwise(F.lit("e+")),
            F.lpad(F.abs(e).cast("string"), 2, "0"),
        )
        digits = F.regexp_replace(
            F.regexp_replace(m, r"\.", ""), r"0+$", "")
        ddigits = F.regexp_replace(
            F.regexp_replace(s, r"\.", ""), r"0+$", "")
        dec_to_sci = F.concat(
            F.substring(ddigits, 1, 1),
            F.when(
                F.length(ddigits) > 1,
                F.concat(F.lit("."), F.substr(ddigits, F.lit(2))),
            ).otherwise(F.lit("")),
            F.lit("e+06"),
        )
        return (
            F.when(is_sci & (e == -4), F.concat(F.lit("0.000"), digits))
            .when(is_sci, F.concat(F.regexp_replace(m, r"\.0$", ""), exp_txt))
            .when(s.rlike(r"^\d{7}\."), dec_to_sci)
            .otherwise(F.regexp_replace(s, r"\.0$", ""))
        )

    def body(v_):
        a = F.abs(v_)
        out = bind_once(a.cast("string"), from_java)
        return F.when(a == 0, F.lit("0")).otherwise(
            F.concat(F.when(v_ < 0, F.lit("-")).otherwise(F.lit("")), out)
        )

    return bind_once(v.cast("double"), body)
def _sorted_labels(entries: Column, sls_format: bool = False) -> Column:
    """array<struct<k,v>> → reference helper.MetricLabels serialization:
    sort by key, join ``k#$#v`` with ``|`` (pkg/helper/log_helper.go:
    Less sorts by Name). With ``sls_format``, label keys sanitize
    ``[^a-zA-Z0-9_]`` → ``_`` and values ``|`` → ``_``
    (formatLabelKey/formatLabelValue, log_helper.go:292-337)."""
    if sls_format:
        entries = F.transform(
            entries,
            lambda s: F.struct(
                F.regexp_replace(s["k"], r"[^a-zA-Z0-9_]", "_").alias("k"),
                F.translate(s["v"], "|", "_").alias("v"),
            ),
        )
    return F.array_join(
        F.transform(
            F.array_sort(entries),
            lambda s: F.concat(s["k"], F.lit("#$#"), s["v"]),
        ),
        "|",
    )


def _sls_metric_name(name: Column) -> Column:
    """formatNewMetricName (log_helper.go:339-363): ``[^a-zA-Z0-9_:]``
    → ``_`` (the colon survives — it joins measurement and field)."""
    return F.regexp_replace(name, r"[^a-zA-Z0-9_:]", "_")


def influx_decode(
    df: DataFrame,
    source: str = "content",
    fields_extend: bool = False,
    db: str = "",
    default_ts_ns: int = 0,
    sls_metrics_format: bool = False,
) -> DataFrame:
    """Influx line-protocol bodies → metric logs (decoder.go:159-219).

    One output row per (line, numeric-or-bool field); string fields are
    skipped unless ``fields_extend`` (decoder.go:184-189). ``db``
    models the request's ``?db=`` form value (decoder.go:160).
    ``sls_metrics_format`` is the reference's global
    EnableSlsMetricsFormat switch: metric names and label keys sanitize
    to the SLS metricstore charset (log_helper.go:292-363)."""
    lines = F.explode(F.split(F.col(source), "\n")).alias("_line")
    out = df.select("*", lines).withColumn("_line", F.trim("_line"))
    out = out.filter(
        (F.col("_line") != "") & ~F.col("_line").startswith("#")
        & F.col("_line").rlike(_INFLUX_LINE_RX)
    )
    meas = F.regexp_extract("_line", _INFLUX_LINE_RX, 1)
    tags = F.regexp_extract("_line", _INFLUX_LINE_RX, 2)
    fields = F.regexp_extract("_line", _INFLUX_LINE_RX, 3)
    ts = F.regexp_extract("_line", _INFLUX_LINE_RX, 4)

    tag_entries = F.filter(
        F.transform(
            F.split(tags, _UNESCAPED_COMMA),
            lambda p: F.struct(
                _unescape_ident(
                    F.regexp_extract(p, _UNESCAPED_EQ_KEY, 1)).alias("k"),
                _unescape_ident(
                    F.regexp_extract(p, _UNESCAPED_EQ_KEY, 2)).alias("v"),
            ),
        ),
        lambda s: s["k"] != "",
    )
    out = (
        out.withColumn("_meas", _unescape_ident(meas))
        .withColumn("_labels", F.when(tags == "", F.lit(""))
                    .otherwise(_sorted_labels(tag_entries,
                                              sls_metrics_format)))
        .withColumn(
            "_tn",
            F.when(ts == "", F.lit(default_ts_ns)).otherwise(
                ts.cast("long")),
        )
        .withColumn("_field", F.explode(F.split(fields, _FIELD_SPLIT_RX)))
    )
    fkey = _unescape_ident(F.regexp_extract("_field", _UNESCAPED_EQ_KEY, 1))
    fval = F.regexp_extract("_field", _UNESCAPED_EQ_KEY, 2)
    is_str = fval.rlike(r"^\".*\"$")
    is_bool = fval.rlike(r"^(?i)(t|true|f|false)$")
    is_int = fval.rlike(r"^-?\d+[iu]$")
    is_float = fval.rlike(r"^-?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")
    value = (
        F.when(is_str, F.regexp_replace(
            F.substring(fval, 2, F.length(fval) - F.lit(2)),
            r"\\([\"\\])", r"$1"))
        .when(is_bool, F.when(F.lower(fval).startswith("t"), "1")
              .otherwise("0"))
        .when(is_int, F.substring(fval, 1, F.length(fval) - F.lit(1)))
        .when(is_float, go_g_str(fval.cast("double")))
    )
    vtype = (
        F.when(is_str, "string").when(is_bool, "bool")
        .when(is_int, "int").when(is_float, "float")
    )
    out = (
        out.withColumn("_fkey", fkey)
        .withColumn("__value__", value)
        .withColumn("__type__", vtype)
        .filter(F.col("__value__").isNotNull() & (F.col("_fkey") != ""))
    )
    if not fields_extend:
        out = out.filter(F.col("__type__") != "string")
    name = F.when(
        F.col("_fkey") == "value", F.col("_meas")
    ).otherwise(F.concat("_meas", F.lit(":"), "_fkey"))
    if sls_metrics_format:
        name = _sls_metric_name(name)
    out = (
        out.withColumn("__name__", name)
        .withColumnRenamed("_labels", "__labels__")
        .withColumnRenamed("_tn", "__time_nano__")
    )
    if fields_extend:
        out = out.withColumnRenamed("_fkey", "__field__")
        if db:
            out = out.withColumn("__tag__:db", F.lit(db))
        keep_extra = ["__type__", "__field__"] + (["`__tag__:db`"] if db else [])
    else:
        out = out.drop("_fkey", "__type__")
        keep_extra = []
    passthrough = [c for c in df.columns if c != source]
    return out.select(
        *passthrough, "__name__", "__labels__", "__value__",
        "__time_nano__", *keep_extra,
    )


# ---------------------------------------------------------------------------
# statsd / dogstatsd
# ---------------------------------------------------------------------------

_STATSD_RX = (
    r"^([^:|#\n]+):(-?(?:\d+(?:\.\d+)?|\.\d+))\|([a-zA-Z]+)"
    r"(?:\|@([\d.]+))?(?:\|#([^|]*))?\s*$"
)


def statsd_decode(
    df: DataFrame, source: str = "content", default_ts_ns: int = 0,
    sls_metrics_format: bool = False,
) -> DataFrame:
    """dogstatsd lines → metric logs (decoder.go:44-65): name:value|type
    with optional |@rate (parsed, ignored — the reference never scales)
    and |#k:v,... tags. Non-numeric values (set metrics) drop, mirroring
    the reference's float64 assertion."""
    out = df.select(
        "*", F.explode(F.split(F.col(source), "\n")).alias("_line")
    ).filter(F.trim("_line") != "")
    out = out.filter(F.col("_line").rlike(_STATSD_RX))
    tags = F.regexp_extract("_line", _STATSD_RX, 5)
    entries = F.filter(
        F.transform(
            F.split(tags, ","),
            lambda p: F.struct(
                F.substring_index(p, ":", 1).alias("k"),
                F.when(
                    p.contains(":"),
                    F.substr(
                        p, F.length(F.substring_index(p, ":", 1)) + F.lit(2)
                    ),
                ).otherwise(F.lit("")).alias("v"),
            ),
        ),
        lambda s: s["k"] != "",
    )
    passthrough = [c for c in df.columns if c != source]
    name = F.regexp_extract("_line", _STATSD_RX, 1)
    if sls_metrics_format:
        name = _sls_metric_name(name)
    return out.select(
        *passthrough,
        name.alias("__name__"),
        F.when(tags == "", F.lit("")).otherwise(
            _sorted_labels(entries, sls_metrics_format)).alias("__labels__"),
        F.regexp_extract("_line", _STATSD_RX, 2)
        .cast("double").alias("__value__"),
        F.lit(default_ts_ns).cast("long").alias("__time_nano__"),
        F.regexp_extract("_line", _STATSD_RX, 3).alias("__type__"),
    )


# ---------------------------------------------------------------------------
# systemd journal export format
# ---------------------------------------------------------------------------

PRIORITY_CONVERSION = {  # input_journal.go:80-89, verbatim
    "0": "emergency", "1": "alert", "2": "critical", "3": "error",
    "4": "warning", "5": "notice", "6": "informational", "7": "debug",
}
SYSLOG_FACILITY = {  # input_journal.go:52-77, verbatim
    "0": "kernel", "1": "user", "2": "mail", "3": "daemon", "4": "auth",
    "5": "syslog", "6": "line printer", "7": "network news", "8": "uucp",
    "9": "clock daemon", "10": "security/auth", "11": "ftp", "12": "ntp",
    "13": "log audit", "14": "log alert", "15": "clock daemon",
    "16": "local0", "17": "local1", "18": "local2", "19": "local3",
    "20": "local4", "21": "local5", "22": "local6", "23": "local7",
}


def _map_lookup(table: dict[str, str], key: Column) -> Column:
    m = F.create_map(*[F.lit(x) for kv in table.items() for x in kv])
    return F.element_at(m, key)


def journal_decode(
    df: DataFrame,
    source: str = "content",
    parse_priority: bool = False,
    parse_syslog_facility: bool = False,
) -> DataFrame:
    """Journal EXPORT-format blobs → one row per entry with the fields
    map + ``_realtime_timestamp_``/``_monotonic_timestamp_`` string
    columns — the exact AddDataArray contract of input_journal.go:339,
    368-370 (timestamps emitted as decimal strings alongside Fields).
    ParsePriority / ParseSyslogFacility rewrite PRIORITY /
    SYSLOG_FACILITY through the reference's conversion maps in-place.
    Binary-framed fields (NAME newline + size prefix) are out of scope —
    the export framing here is the textual NAME=value form."""
    entries = F.explode(F.split(F.col(source), r"\n\n+")).alias("_entry")
    out = df.select("*", entries).filter(F.trim("_entry") != "")
    kvs = F.filter(
        F.transform(
            F.split(F.col("_entry"), "\n"),
            lambda ln: F.struct(
                F.substring_index(ln, "=", 1).alias("key"),
                F.when(
                    ln.contains("="),
                    F.substr(
                        ln,
                        F.length(F.substring_index(ln, "=", 1)) + F.lit(2),
                    ),
                ).otherwise(F.lit("")).alias("value"),
            ),
        ),
        lambda s: s["key"] != "",
    )
    out = out.withColumn("_fields", F.map_from_entries(kvs))
    f = F.col("_fields")
    if parse_priority:
        out = out.withColumn(
            "_fields",
            F.when(
                f.getItem("PRIORITY").isNotNull(),
                F.map_concat(
                    F.map_filter(f, lambda k, _v: k != "PRIORITY"),
                    F.create_map(
                        F.lit("PRIORITY"),
                        F.coalesce(
                            _map_lookup(PRIORITY_CONVERSION,
                                        f.getItem("PRIORITY")),
                            F.lit(""),
                        ),
                    ),
                ),
            ).otherwise(f),
        )
        f = F.col("_fields")
    if parse_syslog_facility:
        out = out.withColumn(
            "_fields",
            F.when(
                f.getItem("SYSLOG_FACILITY").isNotNull(),
                F.map_concat(
                    F.map_filter(f, lambda k, _v: k != "SYSLOG_FACILITY"),
                    F.create_map(
                        F.lit("SYSLOG_FACILITY"),
                        F.coalesce(
                            _map_lookup(SYSLOG_FACILITY,
                                        f.getItem("SYSLOG_FACILITY")),
                            F.lit(""),
                        ),
                    ),
                ),
            ).otherwise(f),
        )
        f = F.col("_fields")
    passthrough = [c for c in df.columns if c != source]
    return out.select(
        *passthrough,
        F.coalesce(f.getItem("__REALTIME_TIMESTAMP"), F.lit("0"))
        .alias("_realtime_timestamp_"),
        F.coalesce(f.getItem("__MONOTONIC_TIMESTAMP"), F.lit("0"))
        .alias("_monotonic_timestamp_"),
        F.map_filter(
            f, lambda k, _v: ~k.startswith("__")
        ).alias("fields"),
    )


# ---------------------------------------------------------------------------
# registry operators
# ---------------------------------------------------------------------------


@register("service_http_server",
          keys={"Format", "SourceKey", "FieldsExtend", "DB",
                "DefaultTimeNano", "UnlinkUnixSock", "Address",
                "ReadTimeoutSec", "ShutdownTimeoutSec", "MaxBodySize",
                "EnableSlsMetricsFormat",
                # pyroscope meta (the reference reads these from the
                # ingest URL query string; config-supplied here)
                "SpyName", "Units", "SampleRate", "AggregationType",
                "StartTimeSec", "EndTimeSec", "Tags"})
def service_http_server(cfg: dict):
    """HTTP push input (input_http_server.go): the server/transport
    knobs (Address/timeouts/body size) are engine-owned in Spark and
    accepted for config compatibility; ``Format`` selects the decoder
    exactly like the reference's decoder registry
    (pkg/protocol/decoder/decoder.go)."""
    fmt = cfg.get("Format", "influxdb").lower()
    src = cfg.get("SourceKey", "content")
    default_ts = int(cfg.get("DefaultTimeNano", 0))
    sls_fmt = bool(cfg.get("EnableSlsMetricsFormat"))

    def run(df: DataFrame) -> DataFrame:
        if fmt == "influxdb":
            return influx_decode(
                df, src, fields_extend=bool(cfg.get("FieldsExtend")),
                db=cfg.get("DB", ""), default_ts_ns=default_ts,
                sls_metrics_format=sls_fmt)
        if fmt == "statsd":
            return statsd_decode(df, src, default_ts_ns=default_ts,
                                 sls_metrics_format=sls_fmt)
        if fmt == "prometheus":
            from loongcollector_spark.operators.prom import prom_parse_metric

            return prom_parse_metric(
                df, src, default_ts_ms=default_ts // 1_000_000)
        if fmt == "sls":
            # sls bodies are sls_logs.LogGroup wire format (Logs=1,
            # Category=2, ...), NOT PipelineEventGroup — route to the
            # matching walker or every push decodes to zero logs
            from loongcollector_spark.operators.pbops import parse_from_pb

            return parse_from_pb(df, src, protocol="SLS_LogGroup")
        if fmt == "otlp_logv1":
            # the reference switches on the HTTP Content-Type header
            # (decoder.go: json vs pb export request); here a body
            # starting with '{' is the JSON encoding, anything else the
            # binary ExportLogsServiceRequest — transcoded through the
            # wire walker into the SAME codegen conversion plan
            from loongcollector_spark.operators.otelops import (
                otel_logs_to_logs, otlp_pb_to_json,
            )

            # NULL-safe split: a NULL body must not vanish from BOTH
            # branches (ltrim(NULL).startswith → NULL filters false on
            # either side); it routes to the pb walker, which maps any
            # undecodable payload to an empty document (logs-and-skips)
            is_json = F.coalesce(
                F.ltrim(F.col(src)).startswith("{"), F.lit(False))
            converted = otel_logs_to_logs(df.filter(is_json), src).unionByName(
                otel_logs_to_logs(
                    otlp_pb_to_json(df.filter(~is_json), src, "log"), src)
            )
            return converted
        if fmt == "raw":
            return df.withColumnRenamed(src, "content") if src != "content" else df
        if fmt == "pyroscope":
            # the groups text format (decoder.go:70-78 default branch);
            # binary trie/pprof/JFR payloads are external-library formats
            return pyroscope_groups_decode(
                df, src,
                spy_name=cfg.get("SpyName", "unknown"),
                units=cfg.get("Units", "samples"),
                sample_rate=int(cfg.get("SampleRate", 100)),
                agg_type=cfg.get("AggregationType", "sum"),
                start_time_s=int(cfg.get("StartTimeSec", 0)),
                end_time_s=int(cfg.get("EndTimeSec", 0)),
                tags=cfg.get("Tags"),
            )
        raise ValueError(f"service_http_server: unsupported Format {fmt!r}")

    return run


@register("service_otlp", keys={"Mode", "SourceKey", "Protocals", "Protocols"})
def service_otlp(cfg: dict):
    """OTLP push input (plugins/input/opentelemetry): the gRPC/HTTP
    transport is engine-owned; the decode of pushed OTLP-JSON payloads
    reuses the otel processors. ``Mode``: traces | metrics."""
    mode = cfg.get("Mode", "traces")
    src = cfg.get("SourceKey", "content")

    def run(df: DataFrame) -> DataFrame:
        from loongcollector_spark.operators.otelops import (
            otel_logs_to_logs, otel_metrics_to_logs, otel_trace_to_logs,
        )

        if mode == "traces":
            return otel_trace_to_logs(df, src)
        if mode == "metrics":
            return otel_metrics_to_logs(df, src)
        if mode == "logs":
            return otel_logs_to_logs(df, src)
        raise ValueError(f"service_otlp: unsupported Mode {mode!r}")

    return run


@register("service_journal",
          keys={"SourceKey", "ParsePriority", "ParseSyslogFacility",
                "Units", "Kernel", "Identifiers", "SeekPosition",
                "CursorFlushPeriodMs", "CursorSeekFallback",
                "JournalPaths", "MatchPatterns", "UseJournalEventTime"})
def service_journal(cfg: dict):
    """systemd journal input (input_journal.go): the sdjournal follow
    loop is engine-owned; the decode is over export-format blobs.
    ``Units`` / ``Identifiers`` become post-parse filters on the
    _SYSTEMD_UNIT / SYSLOG_IDENTIFIER fields (the reference adds them
    as journal matches, input_journal.go:236-262)."""
    src = cfg.get("SourceKey", "content")

    def run(df: DataFrame) -> DataFrame:
        out = journal_decode(
            df, src,
            parse_priority=bool(cfg.get("ParsePriority")),
            parse_syslog_facility=bool(cfg.get("ParseSyslogFacility")),
        )
        units = cfg.get("Units") or []
        idents = cfg.get("Identifiers") or []
        cond = None
        if units:
            cond = F.col("fields").getItem("_SYSTEMD_UNIT").isin(units)
        if idents:
            c2 = F.col("fields").getItem("SYSLOG_IDENTIFIER").isin(idents)
            cond = c2 if cond is None else (cond | c2)
        if cfg.get("Kernel"):
            c3 = F.col("fields").getItem("_TRANSPORT") == "kernel"
            cond = c3 if cond is None else (cond | c3)
        return out.filter(cond) if cond is not None else out

    return run


# spyName -> frame-part ordering (helper/profile/meta.go:141-170
# sequenceMapping): these four put the source position FIRST; everything
# else (go, java, node, dotnet, ebpf, unknown) keeps function first.
_PYRO_POS_FIRST = {"rs", "rb", "py", "php"}

# Units -> valueTypes (meta.go DetectValueType)
_PYRO_VALUE_TYPES = {
    "nanoseconds": "cpu", "samples": "cpu",
    "objects": "mem", "bytes": "mem",
    "goroutines": "goroutines",
    "lock_samples": "mutex", "lock_nanoseconds": "mutex",
}
# valueTypes -> profile Type.Kind via DetectProfileType(meta.go:104-119).
# Faithful quirk: DetectProfileType matches RAW sample-value names
# ("inuse_space", "mutex_count", ...) — the aggregate labels "mem" and
# "mutex" that DetectValueType produces are NOT in its case lists, so
# bytes/objects/lock_* profiles land on profile_unknown in the reference
# too (only cpu and goroutines round-trip to their own kind).
_PYRO_KIND = {"cpu": "profile_cpu", "goroutines": "profile_goroutines"}


def pyroscope_groups_decode(
    df: DataFrame,
    source_col: str = "content",
    spy_name: str = "unknown",
    units: str = "samples",
    sample_rate: int = 100,
    agg_type: str = "sum",
    start_time_s: int = 0,
    end_time_s: int = 0,
    tags: dict | None = None,
) -> DataFrame:
    """Pyroscope ingest, ``groups`` text format (one profile body per
    input row; ``stack;frames... <count>`` lines) → the reference's
    13-field profile log contract (pkg/helper/profile/pyroscope/raw/
    profile.go:57-165 + pkg/protocol/decoder/pyroscope/decoder.go:70-78).

    Reference-exact semantics:
    - split on the LAST space; spaceless lines are skipped, a
      non-integer count fails the WHOLE profile (doParse returns err) —
      here the blob's rows are dropped wholesale;
    - one trailing empty frame (a ``;``-terminated stack) is stripped;
    - frame text is "name pos" reordered per spyName (meta.go
      FormatPositionAndName: name = before FIRST space, pos = after
      LAST space, middle dropped); leaf frame becomes ``name``, the
      remaining frames are formatted then REVERSED into ``stack``;
    - ``samples`` units convert to nanoseconds with the integer
      multiplier 1e9 // SampleRate; ``val`` is Go's %.2f;
    - ``stackID`` = cespare/xxhash (XXH64 seed 0) of the raw stacktrace
      bytes, lowercase hex — Spark's builtin xxhash64 is seed-42, so
      this is the one pandas-UDF column (``functions/xxh.py``);
    - ``labels`` is the sorted-key JSON of the meta tags (Go
      json.Marshal map ordering); profileID comes from the
      ``profile_id`` tag (uuid4 fallback is nondeterministic by design
      in the reference — supply the tag for reproducible output).

    Everything except stackID is whole-stage codegen; per-frame
    formatting runs in HOF lambdas over the short frame arrays.
    """
    import json as _json
    from pyspark.sql import Window

    tags = dict(tags or {})
    out_units = "nanoseconds" if units == "samples" else units
    mult = (1_000_000_000 // int(sample_rate)) if units == "samples" else 1
    value_type = _PYRO_VALUE_TYPES.get(units, "unknown")
    kind = _PYRO_KIND.get(value_type, "profile_unknown")
    labels_json = _json.dumps(tags, separators=(",", ":"), sort_keys=True)
    if "profile_id" in tags:
        profile_id = tags["profile_id"]
    else:  # GetProfileID's uuid4 branch — nondeterministic, like the Go
        import uuid

        profile_id = str(uuid.uuid4())
    pos_first = spy_name in _PYRO_POS_FIRST

    def fmt(s):
        t = F.trim(s)
        name = F.substring_index(t, " ", 1)
        pos = F.regexp_extract(t, r"([^ ]*)$", 1)
        two = (F.concat(pos, F.lit(" "), name) if pos_first
               else F.concat(name, F.lit(" "), pos))
        return F.when(t.contains(" "), two).otherwise(t)

    pid = F.monotonically_increasing_id()
    lines = (
        df.select(F.col(source_col).alias("_body"), pid.alias("_pid"))
        .select("_pid", F.explode(F.split("_body", "\n")).alias("_line"))
        .filter(F.instr("_line", " ") > 0)
    )
    parsed = lines.select(
        "_pid",
        F.regexp_extract("_line", r"^(.*) ([^ ]*)$", 1).alias("_stacktrace"),
        F.regexp_extract("_line", r"^(.*) ([^ ]*)$", 2)
        .try_cast("long").alias("_v"),
    )
    # a single bad count poisons the whole profile (doParse error path)
    w = Window.partitionBy("_pid")
    parsed = (
        parsed.withColumn("_bad", F.max(F.col("_v").isNull()).over(w))
        .filter(~F.col("_bad"))
    )
    arr0 = F.split("_stacktrace", ";")
    parsed = parsed.withColumn(
        "_frames",
        F.when(
            F.element_at(arr0, -1) == "",
            F.slice(arr0, 1, F.greatest(F.size(arr0) - 1, F.lit(0))),
        ).otherwise(arr0),
    )
    frames = F.col("_frames")

    from loongcollector_spark.functions.xxh import xxh64

    @F.pandas_udf("string")
    def stack_id(st):
        # seed-0 xxh64 is the Go byte contract (profile.go:96) Spark's
        # seed-42 builtin can't reproduce; stacktraces repeat heavily
        # across samples, so memoize per Arrow batch — the Python hash
        # runs once per DISTINCT stack, not per row
        memo = {}

        def h(s):
            r = memo.get(s)
            if r is None:
                r = memo[s] = format(xxh64(s.encode("utf-8"), 0), "x")
            return r

        return st.map(h)

    return parsed.select(
        F.lit(int(start_time_s)).alias("time_sec"),
        fmt(F.element_at(frames, -1)).alias("name"),
        F.array_join(
            F.reverse(
                F.transform(
                    F.slice(frames, 1,
                            F.greatest(F.size(frames) - 1, F.lit(0))),
                    fmt,
                )
            ),
            "\n",
        ).alias("stack"),
        stack_id(F.col("_stacktrace")).alias("stackID"),
        F.lit(spy_name).alias("language"),
        F.lit(kind).alias("type"),
        F.lit(out_units).alias("units"),
        F.lit(value_type).alias("valueTypes"),
        F.lit(agg_type).alias("aggTypes"),
        F.lit("CallStack").alias("dataType"),
        F.lit(str((int(end_time_s) - int(start_time_s)) * 1_000_000_000))
        .alias("durationNs"),
        F.lit(profile_id).alias("profileID"),
        F.lit(labels_json).alias("labels"),
        # Go FormatFloat(v,'f',2): plain %.2f, no thousands grouping
        F.format_string("%.2f", (F.col("_v") * mult).cast("double"))
        .alias("val"),
    )


# ---------------------------------------------------------------------------
# redis INFO (metric_redis)
# ---------------------------------------------------------------------------

# Tracking renames (plugins/input/redis/input_redis.go:57-61)
_REDIS_TRACKING = {
    "uptime_in_seconds": "uptime",
    "connected_clients": "clients",
    "role": "replication_role",
}
_REDIS_SERVER_KEEP = ("lru_clock", "uptime_in_seconds", "redis_version")


def _redis_tags(url: Column) -> Column:
    """Collect/gatherServer tag derivation (input_redis.go:84-105,
    163-173): bare addresses get a ``tcp://`` scheme; tcp hosts missing
    a port get ``:6379``; ``unix://`` urls tag the socket path instead.
    Returns struct(server, port, socket)."""
    from loongcollector_spark.operators.common import bind_once

    def body(u):
        is_unix = u.startswith("unix://")
        nu = F.when(u.rlike("^(tcp|unix)://"), u).otherwise(
            F.concat(F.lit("tcp://"), u))
        # url.Parse: host is everything after the scheme up to '/',
        # with the [:password]@ userinfo stripped
        hostport = F.regexp_extract(
            nu, r"^[a-z]+://(?:[^@/]*@)?([^/]*)", 1)
        has_port = hostport.rlike(r"^.*:\d+$")
        host = F.when(has_port,
                      F.regexp_extract(hostport, r"^(.*):\d+$", 1)
                      ).otherwise(hostport)
        port = F.when(has_port,
                      F.regexp_extract(hostport, r":(\d+)$", 1)
                      ).otherwise(F.lit("6379"))
        sock = F.regexp_extract(u, r"^unix://(.*)$", 1)
        return F.struct(
            F.when(is_unix, F.lit(None).cast("string"))
            .otherwise(host).alias("server"),
            F.when(is_unix, F.lit(None).cast("string"))
            .otherwise(port).alias("port"),
            F.when(is_unix, sock).otherwise(F.lit(None).cast("string"))
            .alias("socket"),
        )

    return bind_once(F.coalesce(url, F.lit("")), body)


def redis_info_decode(df: DataFrame, src: str = "content",
                      url_key: str = "url") -> DataFrame:
    """redis ``INFO`` output → one row per server with the reference's
    fields map (plugins/input/redis/input_redis.go gatherInfoOutput,
    :178-240):

    * reading stops at the first line containing ``ERR``;
    * ``# Section`` headers set the running section (len > 2 only);
    * Server-section lines keep only lru_clock / uptime_in_seconds /
      redis_version; ``mem_allocator`` is always dropped;
    * Tracking renames uptime_in_seconds→uptime, connected_clients→
      clients, role→replication_role;
    * Keyspace lines (``db0:keys=2,expires=0,avg_ttl=0``) expand to
      ``db0_keys``/``db0_expires``/``db0_avg_ttl`` and feed the
      ``total_db_count/keys/expires/avg_ttl`` summary fields
      (avg_ttl integer-divided by the db count, :235-236).

    Documents stay independent — no shuffle, embarrassingly parallel
    over a fleet-wide scrape archive. The per-document passes are SQL
    higher-order expressions (each a single parsed expression tree, not
    a py4j-built lambda pyramid — the string form builds the plan ~10x
    faster and keeps every pass O(lines))."""
    ks_guard = ("e.sec = 'Keyspace' and e.name not in "
                "('uptime_in_seconds', 'connected_clients', 'role') "
                "and contains(trim(e.val), 'keys=')")
    d = (
        df
        .withColumn("_lx", F.expr(
            f"transform(split(`{src}`, '\\r?\\n'),"
            " (x, i) -> struct(i as i, x as x))"))
        # strings.Contains(line, "ERR") breaks the scan (:192)
        .withColumn("_errpos", F.expr(
            "array_min(transform("
            "filter(_lx, s -> contains(s.x, 'ERR')), s -> s.i))"))
        # running-section fold: '#' headers (len > 2) set the section,
        # ':'-less lines drop, the rest append (sec, name, value)
        .withColumn("_entries", F.expr("""
            aggregate(
              filter(_lx, s -> _errpos is null or s.i < _errpos),
              named_struct(
                'sec', '',
                'es', cast(array() as
                  array<struct<sec:string,name:string,val:string>>)),
              (acc, s) -> case
                when length(s.x) = 0 then acc
                when substring(s.x, 1, 1) = '#' then named_struct(
                  'sec', if(length(s.x) > 2, substring(s.x, 3), acc.sec),
                  'es', acc.es)
                when instr(s.x, ':') = 0 then acc
                else named_struct('sec', acc.sec, 'es', array_append(
                  acc.es, named_struct(
                    'sec', acc.sec,
                    'name', substring_index(s.x, ':', 1),
                    'val', substr(
                      s.x,
                      length(substring_index(s.x, ':', 1)) + 2)))) end
            ).es"""))
        # Server-section whitelist + the unconditional mem_allocator drop
        .withColumn("_entries", F.expr("""
            filter(_entries, e -> not (
              (e.sec = 'Server' and e.name not in
                ('lru_clock', 'uptime_in_seconds', 'redis_version'))
              or e.name = 'mem_allocator'))"""))
        .withColumn("_ks", F.expr(f"filter(_entries, e -> {ks_guard})"))
        # plain fields: Tracking renames, trimmed values
        .withColumn("_plain", F.expr(f"""
            transform(
              filter(_entries, e -> not ({ks_guard})),
              e -> named_struct(
                'k', case e.name
                       when 'uptime_in_seconds' then 'uptime'
                       when 'connected_clients' then 'clients'
                       when 'role' then 'replication_role'
                       else e.name end,
                'v', trim(e.val)))"""))
        # db line pairs: strings.Split(dbp, '=') uses element [1], not
        # the rest-of-string, when a value embeds '='
        .withColumn("_ksf", F.expr("""
            flatten(transform(_ks, e ->
              transform(
                filter(split(trim(e.val), ','), p -> contains(p, '=')),
                p -> named_struct(
                  'k', concat(e.name, '_', split_part(p, '=', 1)),
                  'v', split_part(p, '=', 2)))))"""))
        # totals in one pass (ParseInt failure counts 0, :247-259)
        .withColumn("_tot", F.expr("""
            aggregate(_ks,
              named_struct('keys', 0L, 'expires', 0L, 'ttl', 0L),
              (a, e) -> aggregate(
                filter(split(trim(e.val), ','), p -> contains(p, '=')),
                a,
                (b, p) -> named_struct(
                  'keys', b.keys + if(split_part(p, '=', 1) = 'keys',
                    coalesce(try_cast(split_part(p, '=', 2) as long), 0L),
                    0L),
                  'expires', b.expires +
                    if(split_part(p, '=', 1) = 'expires',
                    coalesce(try_cast(split_part(p, '=', 2) as long), 0L),
                    0L),
                  'ttl', b.ttl + if(split_part(p, '=', 1) = 'avg_ttl',
                    coalesce(try_cast(split_part(p, '=', 2) as long), 0L),
                    0L))))"""))
        # Go int64 division truncates; TTL sums are non-negative
        .withColumn("_all", F.expr("""
            concat(_plain, _ksf, array(
              named_struct('k', 'total_db_count',
                           'v', cast(size(_ks) as string)),
              named_struct('k', 'total_db_avg_ttl', 'v', cast(
                if(size(_ks) > 0,
                   cast((_tot.ttl - pmod(_tot.ttl, size(_ks)))
                        / size(_ks) as long),
                   _tot.ttl) as string)),
              named_struct('k', 'total_db_keys',
                           'v', cast(_tot.keys as string)),
              named_struct('k', 'total_db_expires',
                           'v', cast(_tot.expires as string))))"""))
    )
    # Go map semantics: duplicate keys last-wins. map_from_entries would
    # throw under the default EXCEPTION dedup policy; the fold pays the
    # rebuild only on an actual duplicate (values are never null here)
    fields = F.expr("""
        aggregate(_all, cast(map() as map<string,string>),
          (m, e) -> if(isnotnull(element_at(m, e.k)),
            map_concat(map_filter(m, (k, v) -> k != e.k), map(e.k, e.v)),
            map_concat(m, map(e.k, e.v))))""")
    tags = _redis_tags(F.col(url_key) if url_key in df.columns
                       else F.lit("tcp://:6379"))
    return d.select(
        tags["server"].alias("server"),
        tags["port"].alias("port"),
        tags["socket"].alias("socket"),
        fields.alias("fields"),
    )

@register("metric_redis", keys={"ServerUrls", "SourceKey", "UrlKey"})
def metric_redis(cfg: dict):
    """metric_redis (plugins/input/redis/input_redis.go): the TCP
    INFO round trip is deployment-side; this operator parses landed
    (url, INFO-body) rows. ``ServerUrls`` is accepted for config
    parity with the reference's YAML."""
    src = cfg.get("SourceKey", "content")
    url_key = cfg.get("UrlKey", "url")

    def run(df: DataFrame) -> DataFrame:
        return redis_info_decode(df, src, url_key)

    return run


# ---------------------------------------------------------------------------
# netping probe metrics (metric_netping)
# ---------------------------------------------------------------------------


def netping_metrics(df: DataFrame, time_col: str = "ts") -> DataFrame:
    """NetPing result rows → the reference's metric-log fan-out
    (plugins/input/netping/netping.go:283-345):

    * every valid result emits ``{type}_total`` / ``{type}_success`` /
      ``{type}_failed``;
    * icmp/tcping results with ``success > 0`` add the five
      ``{type}_rtt_{min,max,avg,total,stddev}_ms`` gauges;
    * httping adds ``httping_rt_ms`` + ``httping_response_bytes`` on
      success, and (when the leaf cert was seen)
      ``httping_cert_ttl_days`` under the cert label set (:648-663);
    * dns resolution rows emit ``dns_resolve_rt_ms`` on success and the
      success/failed pair (:283-293).

    Labels follow helper.MetricLabels: sorted ``k#$#v`` joined with
    ``|`` (log_helper.go:209-224); values print via Go 'g'
    (NewMetricLog, :258-265); ``__time_nano__`` is the 19-digit ns
    string. Expected input columns: type (ping|tcping|httping|dns),
    name, src, dst, src_host, total, success, failed, the rtt stats,
    http_rt_ms / http_response_bytes / http_proto / http_url_schema /
    http_url_host / http_code, has_cert / cert_ttl_days /
    cert_subject_cn / cert_issuer_cn, dns_name, err. Missing columns
    default to null and their gated metrics simply don't fire.

    One codegen projection + a Generate (explode) — no shuffle; a
    fleet's probe archive aggregates map-side."""
    def col_or_null(c, typ="string"):
        return (F.col(c) if c in df.columns
                else F.lit(None)).cast(typ)

    typ = F.col("type")
    t_ns = F.concat(
        F.unix_micros(F.col(time_col).cast("timestamp")).cast("string"),
        F.lit("000"))

    def lbl(*pairs):
        ents = F.array(*[
            F.struct(F.lit(k).alias("k"),
                     F.coalesce(v.cast("string"), F.lit("")).alias("v"))
            for k, v in pairs
        ])
        return _sorted_labels(ents)

    base_lbl = lbl(("name", col_or_null("name")),
                   ("src", col_or_null("src")),
                   ("dst", col_or_null("dst")),
                   ("src_host", col_or_null("src_host")))
    dns_lbl = lbl(("dns_name", col_or_null("dns_name")),
                  ("src", col_or_null("src")),
                  ("src_host", col_or_null("src_host")))
    dns_fail_lbl = lbl(("dns_name", col_or_null("dns_name")),
                       ("src", col_or_null("src")),
                       ("src_host", col_or_null("src_host")),
                       ("err", col_or_null("err")))
    http_lbl = lbl(("name", col_or_null("name")),
                   ("src", col_or_null("src")),
                   ("dst", col_or_null("dst")),
                   ("src_host", col_or_null("src_host")),
                   ("proto", col_or_null("http_proto")),
                   ("url_schema", col_or_null("http_url_schema")),
                   ("url_host", col_or_null("http_url_host")),
                   ("code", col_or_null("http_code")),
                   ("codex", F.concat(
                       (F.coalesce(col_or_null("http_code")
                                   .try_cast("int"), F.lit(0)) / 100)
                       .cast("int").cast("string"), F.lit("xx"))))
    cert_lbl = lbl(("name", col_or_null("name")),
                   ("src", col_or_null("src")),
                   ("url", col_or_null("dst")),
                   ("src_host", col_or_null("src_host")),
                   ("url_host", col_or_null("http_url_host")),
                   # the reference's field name (sic, :651-652)
                   ("subject_commmon_name", col_or_null("cert_subject_cn")),
                   ("issuer_commmon_name", col_or_null("cert_issuer_cn")))

    def m(name, labels, value):
        # value stays double here; the Go-'g' formatting tree is built
        # ONCE on the exploded column (25 copies of it made plan
        # construction the dominant cost)
        return F.struct(
            name.cast("string").alias("name"),
            labels.alias("labels"),
            value.cast("double").alias("value"))

    success = F.coalesce(col_or_null("success", "long"), F.lit(0))
    err = col_or_null("err")
    base_err_lbl = lbl(("name", col_or_null("name")),
                       ("src", col_or_null("src")),
                       ("dst", col_or_null("dst")),
                       ("src_host", col_or_null("src_host")),
                       ("err", err))
    # label selection mirrors the Go append order: failed dials append
    # ``err`` (:410,:429,:598); httping appends proto/code/... only once
    # a response exists (:637-641) — so a no-response failure reports
    # under base(+err) labels, a bad-status response under http labels
    counter_lbl = F.when(
        (typ == "httping") & col_or_null("http_code").isNotNull(),
        http_lbl,
    ).when(err.isNotNull(), base_err_lbl).otherwise(base_lbl)
    counters = F.array(
        m(F.concat(typ, F.lit("_total")), counter_lbl,
          col_or_null("total", "long")),
        m(F.concat(typ, F.lit("_success")), counter_lbl, success),
        m(F.concat(typ, F.lit("_failed")), counter_lbl,
          col_or_null("failed", "long")),
    )
    empty = F.array().cast(
        "array<struct<name:string,labels:string,value:string>>")
    rtt = F.when(
        typ.isin("ping", "tcping") & (success > 0),
        F.array(*[
            m(F.concat(typ, F.lit(f"_rtt_{s}_ms")), base_lbl,
              col_or_null(f"{s}_rtt_ms", "double"))
            for s in ("min", "max", "avg", "total", "stddev")
        ]),
    ).otherwise(empty)
    http = F.when(
        (typ == "httping") & (success > 0),
        F.array(
            m(F.lit("httping_rt_ms"), http_lbl,
              col_or_null("http_rt_ms", "long")),
            m(F.lit("httping_response_bytes"), http_lbl,
              col_or_null("http_response_bytes", "long")),
        ),
    ).otherwise(empty)
    cert = F.when(
        (typ == "httping")
        & F.coalesce(col_or_null("has_cert", "boolean"), F.lit(False)),
        F.array(m(F.lit("httping_cert_ttl_days"), cert_lbl,
                  col_or_null("cert_ttl_days", "long"))),
    ).otherwise(empty)
    dns = F.when(
        success > 0,
        F.array(
            m(F.lit("dns_resolve_rt_ms"), dns_lbl,
              col_or_null("dns_rt_ms", "double")),
            m(F.lit("dns_resolve_success"), dns_lbl, F.lit(1)),
            m(F.lit("dns_resolve_failed"), dns_lbl, F.lit(0)),
        ),
    ).otherwise(F.array(
        m(F.lit("dns_resolve_success"), dns_fail_lbl, F.lit(0)),
        m(F.lit("dns_resolve_failed"), dns_fail_lbl, F.lit(1)),
    ))

    metrics = F.when(typ == "dns", dns).otherwise(
        F.concat(counters, rtt, http, cert))
    out = df.select(t_ns.alias("__time_nano__"),
                    F.explode(metrics).alias("_m"))
    return out.select(
        F.col("_m")["name"].alias("__name__"),
        "__time_nano__",
        F.col("_m")["labels"].alias("__labels__"),
        go_g_str(F.col("_m")["value"]).alias("__value__"),
    )


@register("metric_netping",
          keys={"ICMPConfigs", "TCPConfigs", "HTTPConfigs", "DNSConfigs",
                "IntervalSeconds", "TimeoutSeconds", "DisableDNS",
                "TimeCol"})
def metric_netping(cfg: dict):
    """metric_netping (plugins/input/netping/netping.go): the probing
    goroutines are deployment-side; this operator converts landed probe
    result rows into the reference's metric-log fan-out. Probe target
    configs are accepted for YAML parity."""
    time_col = cfg.get("TimeCol", "ts")

    def run(df: DataFrame) -> DataFrame:
        return netping_metrics(df, time_col)

    return run


@register("service_udp_server",
          keys={"Decoder", "Format", "SourceKey", "Address",
                "MaxBufferSize", "DefaultTimeNano",
                "EnableSlsMetricsFormat", "FieldsExtend", "DB"})
def service_udp_server(cfg: dict):
    """service_udp_server (plugins/input/udpserver/input_udp.go:146-152):
    the UDP listener is engine-owned; each datagram decodes through the
    same ext_default_decoder Format registry the HTTP push input uses —
    so the operator delegates to the shared Format switch. Default
    decoder is ext_default_decoder (init, :149)."""
    decoder = cfg.get("Decoder", "ext_default_decoder")
    if decoder != "ext_default_decoder":
        raise ValueError(
            f"service_udp_server: unknown Decoder extension {decoder!r}")
    passthrough = {k: v for k, v in cfg.items()
                   if k not in ("Decoder", "Address", "MaxBufferSize")}
    from loongcollector_spark.operators import build_operator

    return build_operator(
        {"Type": "service_http_server", **passthrough})


# ---------------------------------------------------------------------------
# mqtt subscription (service_mqtt)
# ---------------------------------------------------------------------------


def mqtt_filter_regex(topic_filter: str) -> str:
    """MQTT v3.1.1 topic filter → anchored Java regex (the subscription
    match the broker performs for input_mqtt's Topics list; spec §4.7):
    ``+`` matches exactly one level, a trailing ``/#`` matches the
    parent and any subtree, ``#`` alone matches everything — except
    that wildcard-leading filters never match ``$``-system topics
    (§4.7.2)."""
    import re as _re

    if "#" in topic_filter[:-1]:
        raise ValueError(
            f"mqtt: '#' must terminate the filter: {topic_filter!r}")
    guard = r"(?!\$)" if topic_filter[:1] in ("#", "+") else ""
    if topic_filter == "#":
        return f"^{guard}.*$"
    if topic_filter.endswith("/#"):
        body, tail = topic_filter[:-2], r"(/.*)?"
    else:
        body, tail = topic_filter, ""
    parts = [
        "[^/]+" if p == "+" else _re.escape(p) for p in body.split("/")
    ]
    return "^" + guard + "/".join(parts) + tail + "$"


@register("service_mqtt",
          keys={"Server", "Topics", "QoS", "ClientID", "Username",
                "Password", "SSLCA", "SSLCert", "SSLKey", "RetryMin",
                "RetryRatio", "RetryMax", "CleanSession", "OrderMatters",
                "ClientIDAutoInc", "KeepAlive", "Version",
                "TopicKey", "SourceKey"})
def service_mqtt(cfg: dict):
    """service_mqtt (plugins/input/mqtt/input_mqtt.go): the broker
    session is deployment-side; this operator replays landed messages —
    subscription filtering via the Topics wildcard list (default ``#``,
    Init :71-73) and the 6-field log contract of onMessageReceived
    (:99-119: server/topic/duplicated/retained/message_id/content).
    Connection/TLS/retry knobs are accepted for YAML parity."""
    server = cfg.get("Server") or "tcp://127.0.0.1:1883"
    topics = cfg.get("Topics") or ["#"]
    regexes = [mqtt_filter_regex(t) for t in topics]
    topic_key = cfg.get("TopicKey", "topic")
    src = cfg.get("SourceKey", "content")

    def run(df: DataFrame) -> DataFrame:
        topic = F.coalesce(F.col(topic_key).cast("string"), F.lit(""))
        match = F.lit(False)
        for rx in regexes:
            match = match | topic.rlike(rx)

        def flag(name):
            if name in df.columns:
                return F.when(
                    F.coalesce(F.col(name).cast("boolean"), F.lit(False)),
                    F.lit("true")).otherwise(F.lit("false"))
            return F.lit("false")

        return df.filter(match).select(
            F.lit(server).alias("server"),
            topic.alias("topic"),
            flag("duplicated").alias("duplicated"),
            flag("retained").alias("retained"),
            (F.coalesce(F.col("message_id").cast("long"), F.lit(0))
             if "message_id" in df.columns else F.lit(0))
            .cast("string").alias("message_id"),
            F.coalesce(F.col(src).cast("string"), F.lit(""))
            .alias("content"),
        )

    return run
