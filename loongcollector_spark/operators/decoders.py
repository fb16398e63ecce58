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
            raise ValueError(
                "service_http_server: Format otlp_logv1 (OTLP logs "
                "protobuf) has no wire walker here; push OTLP-JSON "
                "through service_otlp instead")
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
            otel_metrics_to_logs, otel_trace_to_logs,
        )

        if mode == "traces":
            return otel_trace_to_logs(df, src)
        if mode == "metrics":
            return otel_metrics_to_logs(df, src)
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
        import pandas as pd

        return pd.Series([format(xxh64(s.encode("utf-8"), 0), "x")
                          for s in st])

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
