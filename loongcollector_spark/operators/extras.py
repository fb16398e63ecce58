"""Remaining reference processors: geo enrichment, encryption, host/cloud
tags, multiline merge BY_REGEX, passthrough, and the Go-twin aliases whose
semantics are already covered by a registered factory under the native name.
"""

from __future__ import annotations

import csv

from pyspark.sql import SparkSession, Window, functions as F

from loongcollector_spark.operators import REGISTRY, register


@register("processor_default", keys=set())
def default_passthrough(cfg: dict):
    """No-op processor (plugins/processor/defaultone/processor_default.go:23)."""
    return lambda df: df


@register("processor_tag", keys={"Tags", "Renames"})
def tag_native(cfg: dict):
    """Group-tag stamping (ProcessorTagNative.cpp:64-97): adds
    HOST_NAME/HOST_ID/HOST_IP-style constants from driver-side context,
    with optional renames — plain ``lit()`` columns, zero per-row cost.

    Config: ``Tags`` {key: value}; ``Renames`` {old: new} applied first.
    """
    tags = cfg.get("Tags", {})
    renames = cfg.get("Renames", {})

    def run(df):
        for old, new in renames.items():
            if old in df.columns:
                df = df.withColumnRenamed(old, new)
        for k, v in tags.items():
            df = df.withColumn(k, F.lit(v))
        return df

    return run


@register("processor_cloud_meta", keys={"Platform", "Metadata", "KeyPrefix"})
def cloud_meta(cfg: dict):
    """Cloud platform metadata fields (cloud_meta.go:33-44): constant
    driver-context enrichment — ``Platform`` + ``Metadata`` {key: value},
    keys optionally prefixed ``__cloud_instance_id__``-style."""
    platform = cfg.get("Platform", "mock")
    meta = cfg.get("Metadata", {})
    prefix = cfg.get("KeyPrefix", "")

    def run(df):
        df = df.withColumn(f"{prefix}cloud_platform", F.lit(platform))
        for k, v in meta.items():
            df = df.withColumn(f"{prefix}{k}", F.lit(v))
        return df

    return run


def _ip_to_long(col):
    """Dotted-quad string → uint32-as-long, pure codegen (no UDF).
    try_cast: a malformed IP yields null (joins to no range → NoMatch)
    instead of failing the job under ANSI mode."""
    p = F.split(col, r"\.")
    return (
        F.element_at(p, 1).try_cast("long") * 16777216
        + F.element_at(p, 2).try_cast("long") * 65536
        + F.element_at(p, 3).try_cast("long") * 256
        + F.element_at(p, 4).try_cast("long")
    )


@register("processor_geoip", keys={"SourceKey", "Ranges", "DictFilePath", "NoMatch"})
def geoip(cfg: dict):
    """IP → country/province/city (processor_geoip.go:35-49, MaxMind-style
    interval db) as a /16-prefix-bucketed BROADCAST HASH JOIN — the fact
    table never shuffles and each probe touches only the ranges of its
    own /16 block (see the bucketing comment below).

    Config: ``SourceKey`` (ip string column); ``Ranges`` inline rows
    [start_ip, end_ip, country, province, city] or ``DictFilePath`` CSV
    with the same 5 columns; ``NoMatch`` default "Unknown".
    """
    src = cfg["SourceKey"]
    no_match = cfg.get("NoMatch", "Unknown")
    ranges = cfg.get("Ranges")
    if ranges is None:
        with open(cfg["DictFilePath"], newline="") as f:
            ranges = [row[:5] for row in csv.reader(f) if len(row) >= 5]

    def run(df):
        spark = SparkSession.getActiveSession()
        rdf = spark.createDataFrame(
            [tuple(r) for r in ranges],
            "__geo_start string, __geo_end string, __geo_country string, "
            "__geo_province string, __geo_city string",
        ).select(
            _ip_to_long(F.col("__geo_start")).alias("__geo_lo"),
            _ip_to_long(F.col("__geo_end")).alias("__geo_hi"),
            "__geo_country", "__geo_province", "__geo_city",
        )
        # /16-prefix bucketing turns the range join into an EQUI join:
        # each range is exploded to one row per /16 block it covers, the
        # fact side computes its block with a shift, and the join key is
        # the block — Spark plans BroadcastHashJoin with the lo<=ip<=hi
        # check as a cheap residual, instead of BroadcastNestedLoopJoin
        # probing every range per row (O(rows x ranges) with a real 10k+
        # range GeoIP table). Ranges are contiguous CIDR-style blocks, so
        # the expansion factor is small (one row per /16 spanned).
        rdf = rdf.select(
            F.explode(
                F.sequence(
                    (F.col("__geo_lo") / 65536).cast("long"),
                    (F.col("__geo_hi") / 65536).cast("long"),
                )
            ).alias("__geo_bucket"),
            "__geo_lo", "__geo_hi",
            "__geo_country", "__geo_province", "__geo_city",
        )
        ip_num = _ip_to_long(F.col(src))
        joined = df.join(
            F.broadcast(rdf),
            ((ip_num / 65536).cast("long") == F.col("__geo_bucket"))
            & (ip_num >= F.col("__geo_lo")) & (ip_num <= F.col("__geo_hi")),
            "left",
        )
        for out_col, geo_col in (
            ("ip_country", "__geo_country"),
            ("ip_province", "__geo_province"),
            ("ip_city", "__geo_city"),
        ):
            joined = joined.withColumn(
                out_col, F.coalesce(F.col(geo_col), F.lit(no_match))
            )
        return joined.drop("__geo_bucket", "__geo_lo", "__geo_hi",
                           "__geo_country", "__geo_province", "__geo_city")

    return run


@register("processor_encrypt", keys={"SourceKeys", "EncryptionParameters", "KeepSource"})
def encrypt(cfg: dict):
    """AES field encryption, hex output (processor_encrypt.go:57-68).
    ``aes_encrypt`` is JVM-native (Spark 3.3+); ECB mode is used so output
    is deterministic/testable like the reference's fixed-IV CBC.

    Config: ``SourceKeys`` [cols], ``EncryptionParameters.Key`` (16/24/32
    bytes), ``KeepSource`` (default False: source replaced in place).
    """
    keys = cfg["SourceKeys"]
    enc_key = cfg["EncryptionParameters"]["Key"]
    keep_source = cfg.get("KeepSource", False)

    def run(df):
        for k in keys:
            enc = F.hex(
                F.aes_encrypt(
                    F.col(k).cast("binary"), F.lit(enc_key), F.lit("ECB")
                )
            )
            if keep_source:
                df = df.withColumn(f"{k}_encrypt", enc)
            else:
                df = df.withColumn(k, enc)
        return df

    return run


@register("processor_parse_container_log", keys={"SourceKey", "Format", "IgnoringStdout", "IgnoringStderr"})
def parse_container_log(cfg: dict):
    """Container stdout parsing (ProcessorParseContainerLogNative.cpp):
    containerd CRI format ``<rfc3339-time> <stream> <P|F> <body>`` or
    docker json-file ``{"log":..,"stream":..,"time":..}``. Emits
    ``_time_``/``_source_``(stream)/``content`` + the partial flag the
    BY_FLAG multiline merge consumes; optional stdout/stderr drops.
    """
    src = cfg.get("SourceKey", "text")
    fmt = cfg.get("Format", "containerd")
    ignore_stdout = cfg.get("IgnoringStdout", False)
    ignore_stderr = cfg.get("IgnoringStderr", False)
    cri_rx = r"^(\S+) (stdout|stderr) ([PF]) ?(.*)$"

    def run(df):
        c = F.col(src)
        if fmt == "containerd":
            ok = c.rlike(cri_rx)
            out = (
                df.withColumn("_parse_ok", ok)
                .withColumn("_time_", F.regexp_extract(c, cri_rx, 1))
                .withColumn("_source_", F.regexp_extract(c, cri_rx, 2))
                .withColumn("_part_", F.regexp_extract(c, cri_rx, 3) == "P")
                .withColumn("content", F.regexp_extract(c, cri_rx, 4))
            )
        else:  # docker json-file
            m = F.from_json(c, "map<string,string>")
            ok = m.getItem("log").isNotNull()
            out = (
                df.withColumn("_parse_ok", ok)
                .withColumn("_time_", m.getItem("time"))
                .withColumn("_source_", m.getItem("stream"))
                # docker appends \n to complete lines; absence = partial
                .withColumn("_part_", ~m.getItem("log").endswith("\n"))
                .withColumn("content", F.regexp_replace(m.getItem("log"), r"\n$", ""))
            )
        if ignore_stdout:
            out = out.filter(F.col("_source_") != "stdout")
        if ignore_stderr:
            out = out.filter(F.col("_source_") != "stderr")
        return out

    return run


def _alias(new_name: str, base_name: str, key_map: dict[str, str],
           defaults: dict | None = None):
    """Register a Go-twin plugin name that delegates to an existing factory
    with its config keys translated (same semantics, different YAML keys).
    Accepted keys = the twin's renamed keys + everything the base accepts
    (resolved after all operator modules import — see DEFERRED_KEYS)."""
    from loongcollector_spark.operators import DEFERRED_KEYS

    DEFERRED_KEYS[new_name] = (base_name, frozenset(key_map))

    @register(new_name)
    def factory(cfg: dict):
        translated = dict(defaults or {})
        for k, v in cfg.items():
            translated[key_map.get(k, k)] = v
        return REGISTRY[base_name](translated)

    return factory


# processor_regex (plugins/processor/regex/regex.go:32-44) — Go twin of the
# native regex parse; FullMatch/KeepSourceIfParseError map onto the common
# parse-result options. Unlike the C++ native parse (anchored full match),
# the Go twin defaults FullMatch to FALSE — match-anywhere (regex.go:134).
_alias("processor_regex", "processor_parse_regex",
       {"KeepSourceIfParseError": "KeepingSourceWhenParseFail",
        "FullMatch": "FullMatch"},
       defaults={"FullMatch": False})

# processor_json (plugins/processor/json/processor_json.go:29-43) — JSON
# expansion with connector flattening; same engine as processor_parse_json.
# Source-keep rule is an OR the rename-alias can't express
# (shouldKeepSource, processor_json.go:100-101):
#   keep = KeepSource || (KeepSourceIfParseError && parse failed)
# with BOTH defaulting true (processor_json.go:112-113).
@register("processor_json",
          keys={"SourceKey", "KeepSource", "KeepSourceIfParseError",
                "ExpandConnector", "Prefix", "ExpandDepth", "Schema",
                "AttrsKey", "NoKeyError", "UseSourceKeyAsPrefix",
                "ExpandArray", "IgnoreFirstConnector"})
def json_twin(cfg: dict):
    keep = cfg.get("KeepSource", True)
    keep_on_err = cfg.get("KeepSourceIfParseError", True)
    t = {k: v for k, v in cfg.items()
         if k in {"SourceKey", "ExpandConnector", "Prefix", "ExpandDepth",
                  "Schema", "AttrsKey"}}
    t["KeepingSourceWhenParseSucceed"] = bool(keep)
    t["KeepingSourceWhenParseFail"] = bool(keep or keep_on_err)
    from loongcollector_spark.operators import REGISTRY
    return REGISTRY["processor_parse_json"](t)


@register("processor_csv",
          keys={"SourceKey", "SplitSep", "SplitKeys", "TrimLeadingSpace",
                "PreserveOthers", "ExpandOthers", "ExpandKeyPrefix",
                "KeepSource", "NoKeyError"})
def csv_twin(cfg: dict):
    """Go processor_csv (processor_csv.go:30-44): TrimLeadingSpace strips
    leading blanks per field; overflow handling is PreserveOthers (the
    remainder into ``_decode_preserve_``) or ExpandOthers (extra
    ``<prefix>N`` keys) — mapped onto parse_delimiter."""
    t = {
        "SourceKey": cfg.get("SourceKey", "content"),
        "Separator": cfg.get("SplitSep", ","),
        "Keys": cfg["SplitKeys"],
        "AllowingShortenedFields": True,
        "TrimLeadingSpace": cfg.get("TrimLeadingSpace", False),
        "KeepingSourceWhenParseSucceed": cfg.get("KeepSource", False),
    }
    if cfg.get("ExpandOthers"):
        t["OverflowedFieldsTreatment"] = "extend"
        t["ExtendKeyPrefix"] = cfg.get("ExpandKeyPrefix", "expand_")
    elif cfg.get("PreserveOthers"):
        t["OverflowedFieldsTreatment"] = "preserve"
    else:
        t["OverflowedFieldsTreatment"] = "discard"
    return REGISTRY["processor_parse_delimiter"](t)

# processor_split_char / processor_split_string
# (split/char/split_char.go:34-49, split/string/split_string.go:33-45):
# split ONE field value into SplitKeys — parse_delimiter semantics with
# the Go twins' extra options mapped, not dropped.


@register("processor_split_char",
          keys={"SourceKey", "SplitSep", "SplitKeys", "QuoteFlag", "Quote",
                "KeepSource", "NoKeyError"})
def split_char(cfg: dict):
    """Go split/char twin: ``QuoteFlag`` enables the quote-aware FSM split
    (split_char.go:34-49) — mapped onto parse_delimiter's from_csv path."""
    t = {
        "SourceKey": cfg.get("SourceKey", "content"),
        "Separator": cfg.get("SplitSep", "\t"),
        "Keys": cfg["SplitKeys"],
        "OverflowedFieldsTreatment": "discard",
        "AllowingShortenedFields": True,
        "KeepingSourceWhenParseSucceed": cfg.get("KeepSource", False),
    }
    if cfg.get("QuoteFlag"):
        t["Quote"] = cfg.get("Quote", '"')
    return REGISTRY["processor_parse_delimiter"](t)


@register("processor_split_string",
          keys={"SourceKey", "SplitSep", "SplitKeys", "ExpandOthers",
                "ExpandKeyPrefix", "KeepSource", "NoKeyError"})
def split_string(cfg: dict):
    """Go split/string twin: ``ExpandOthers`` expands fields beyond
    SplitKeys into ``<ExpandKeyPrefix>1..N`` (split_string.go:33-45) —
    mapped onto parse_delimiter's extend mode with a key prefix."""
    t = {
        "SourceKey": cfg.get("SourceKey", "content"),
        "Separator": cfg.get("SplitSep", "\t"),
        "Keys": cfg["SplitKeys"],
        "AllowingShortenedFields": True,
        "KeepingSourceWhenParseSucceed": cfg.get("KeepSource", False),
        "OverflowedFieldsTreatment":
            "extend" if cfg.get("ExpandOthers") else "discard",
    }
    if cfg.get("ExpandOthers"):
        t["ExtendKeyPrefix"] = cfg.get("ExpandKeyPrefix", "expand_")
    return REGISTRY["processor_parse_delimiter"](t)

# aggregator_metadata_group (metadatagroup/aggregator_metadata_group.go:
# 170-248): regroup on metadata keys — in the Spark model metadata is just
# columns, so the semantics are content_value_group's.
_alias("aggregator_metadata_group", "aggregator_content_value_group",
       {"GroupMetadataKeys": "GroupKeys"})


@register("processor_spl", keys={"Script", "TimeoutMilliSeconds", "MaxMemoryBytes"})
def processor_spl(cfg: dict):
    """SPL script processor (ProcessorSPL.cpp:34-154): compile the Script
    through the SPL front-end at build time; single-output scripts apply
    in-line (the config-pipeline position). Timeout/memory knobs are
    engine-owned in Spark and accepted for config compatibility."""
    script = cfg["Script"]

    def run(df):
        from loongcollector_spark.spl import spl_run

        outs = spl_run(df, script)
        if len(outs) != 1:
            raise ValueError(
                "processor_spl in a pipeline position needs a single-output "
                f"script; got branches {sorted(outs)}"
            )
        return next(iter(outs.values()))

    return run


_DOCKER_STDOUT_KEYS = {
    # collection knobs the Spark model honors
    "Stdout", "Stderr", "BeginLineRegex", "BeginLineCheckLength",
    "MaxLogSize", "GroupKeys", "OrderKey", "Tags",
    # discovery / runtime knobs (container selection + tailing cadence) —
    # deployment-side in the reference, accepted for config compatibility
    "IncludeEnv", "ExcludeEnv", "IncludeLabel", "ExcludeLabel",
    "IncludeContainerLabel", "ExcludeContainerLabel", "IncludeK8sLabel",
    "ExcludeK8sLabel", "ExternalEnvTag", "ExternalK8sLabelTag",
    "FlushIntervalMs", "ReadIntervalMs", "SaveCheckPointSec",
    "BeginLineTimeoutMs", "CloseUnChangedSec", "StartLogMaxOffset",
    "K8sNamespaceRegex", "K8sPodRegex", "K8sContainerRegex",
}


def _docker_line_parse(df, src):
    """Per-line auto-detect (docker_stdout_processor.go:185-203,
    ParseContainerLogLine): '{'-prefixed → docker json-file
    {"log","stream","time"}; else CRI ``<time> <stream> <P|F> <body>``;
    unparseable lines keep the whole line as content with empty
    time/stream (the reference's error branches)."""
    c = F.coalesce(F.col(src), F.lit(""))
    m = F.from_json(c, "map<string,string>")
    json_ok = c.startswith("{") & m.getItem("log").isNotNull()
    cri_rx = r"^(\S+) (\S+) ([PF]) ?(.*)$"
    cri_ok = (~c.startswith("{")) & c.rlike(cri_rx)
    return (
        df.withColumn("_parse_ok", json_ok | cri_ok)
        .withColumn("_time_", F.when(json_ok, m.getItem("time"))
                    .when(cri_ok, F.regexp_extract(c, cri_rx, 1))
                    .otherwise(F.lit("")))
        .withColumn("_source_", F.when(json_ok, m.getItem("stream"))
                    .when(cri_ok, F.regexp_extract(c, cri_rx, 2))
                    .otherwise(F.lit("")))
        # partial line: CRI 'P' flag, or docker log value missing the
        # trailing \n the json-file driver appends to complete lines
        .withColumn("_part_", F.when(
            json_ok, ~m.getItem("log").endswith("\n")
        ).when(cri_ok, F.regexp_extract(c, cri_rx, 3) == "P")
         .otherwise(F.lit(False)))
        .withColumn("content", F.when(
            json_ok, F.regexp_replace(m.getItem("log"), r"\n$", "")
        ).when(cri_ok, F.regexp_extract(c, cri_rx, 4)).otherwise(c))
    )


def _stream_filter(df, stdout: bool, stderr: bool):
    """StreamAllowed (docker_stdout_processor.go:205-216): only checked
    when exactly one of stdout/stderr collects; empty stream is always
    allowed."""
    if stdout and stderr:
        return df
    allowed = "stderr" if stderr else "stdout"
    return df.filter((F.col("_source_") == "") |
                     F.col("_source_").isNull() |
                     (F.col("_source_") == allowed))


def _docker_stdout_factory(cfg: dict, raw: bool):
    stdout = cfg.get("Stdout", True)
    stderr = cfg.get("Stderr", True)
    begin_rx = cfg.get("BeginLineRegex") or None
    check_len = cfg.get("BeginLineCheckLength", 10 * 1024)
    group_keys = cfg.get("GroupKeys", ["_ingest_file"])
    order_key = cfg.get("OrderKey", "_line_idx")
    # container-discovery tags (_image_name_/_container_name_/…): the
    # reference appends them to every log (NewDockerStdoutProcessor tags
    # param); here they arrive from whatever discovery populated the cfg
    tags = cfg.get("Tags") or {}

    def _tagged(out):
        for k, v in tags.items():
            out = out.withColumn(str(k), F.lit(str(v)))
        return out

    def run(df):
        src = "content" if "content" in df.columns else "text"
        if raw:
            # rawstdout pump (rawstdout/input_docker_stdout.go:107-135):
            # lines are `<time> <content>` from docker attach with
            # timestamps; no stream/partial framing in the line itself —
            # _source_ rides in on a column when the demultiplexer
            # (deployment-side stdcopy) provides one.
            c = F.coalesce(F.col(src), F.lit(""))
            rx = r"^(\S+) (.*)$"
            ok = c.rlike(rx)
            df = (
                df.withColumn("_time_", F.when(ok, F.regexp_extract(c, rx, 1))
                              .otherwise(F.lit("")))
                .withColumn("content", F.when(ok, F.regexp_extract(c, rx, 2))
                            .otherwise(c))
            )
            if "_source_" not in df.columns:
                df = df.withColumn("_source_", F.lit("stdout"))
            df = _stream_filter(df, stdout, stderr)
            if begin_rx:
                df = _merge_events(df, group_keys, order_key, begin_rx,
                                   check_len, anchored=True)
            return _tagged(df)
        if src != "content":
            df = df.withColumnRenamed(src, "content")
        df = _docker_line_parse(df, "content")
        df = _stream_filter(df, stdout, stderr)
        # reassemble split-up long lines first (CRI P-runs / docker
        # json partials) — concatenated WITHOUT separators, exactly the
        # beginLineReg==nil branch (docker_stdout_processor.go:233-243)
        df = _merge_partial_runs(
            df.drop("_parse_ok"), group_keys, order_key)
        if begin_rx:
            df = _merge_events(df, group_keys, order_key, begin_rx, check_len,
                               anchored=False)
        return _tagged(df)

    return run


def _agg_docker_events(df, group_keys, order_key, joiner):
    """Collapse ``_mgid`` runs into events. The multiline event carries
    the LAST line's time/stream (newRawLogByMultiLine,
    docker_stdout_processor.go:314-348 uses ``lastOne``)."""
    carry = [k for k in ("_time_", "_source_") if k in df.columns]
    return (
        df.groupBy(*group_keys, "_mgid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col(order_key).alias("o"),
                                 F.col("content").alias("c")))),
                    lambda s: s["c"],
                ),
                joiner,
            ).alias("content"),
            F.min(order_key).alias(order_key),
            *[F.max_by(F.col(k), F.col(order_key)).alias(k) for k in carry],
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_mgid")
    )


def _merge_partial_runs(df, group_keys, order_key):
    """Partial-line reassembly (beginLineReg==nil branch,
    docker_stdout_processor.go:233-243): runs of partial rows concatenate
    with the first following complete row, WITHOUT separators. Event id =
    running count of rows whose previous row was complete."""
    wo = Window.partitionBy(*group_keys).orderBy(order_key)
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_p = F.coalesce(F.lag("_part_").over(wo), F.lit(False))
    df = df.withColumn("_mgid", F.sum((~prev_p).cast("long")).over(wc))
    return _agg_docker_events(df.drop("_part_"), group_keys, order_key,
                              joiner="")


def _merge_events(df, group_keys, order_key, pattern, check_len, anchored):
    """BeginLineRegex multiline (docker_stdout_processor.go:244-258): a
    begin-matching line flushes the accumulated event and starts a new
    one; leading non-matching lines accumulate and flush as their own
    event when the first begin-match arrives (unlike
    processor_merge_multiline's single_line treatment). Pure window
    algebra: event id = running count of begin matches (the leading
    unmatched run is group 0). The json variant searches anywhere in the
    first ``check_len`` chars (Go regexp.Match); the raw variant
    (rawstdout/input_docker_stdout.go:180) requires the match to span
    the whole truncated check line — ``anchored=True``."""
    check = F.substring(F.col("content"), 1, int(check_len))
    rx = f"^(?:{pattern})$" if anchored else pattern
    begin = check.rlike(rx)
    wo = Window.partitionBy(*group_keys).orderBy(order_key)
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = df.withColumn("_mgid", F.sum(begin.cast("long")).over(wc))
    return _agg_docker_events(df.drop("n_merged") if "n_merged" in df.columns
                              else df, group_keys, order_key, joiner="\n")


@register("service_docker_stdout", keys=_DOCKER_STDOUT_KEYS)
def service_docker_stdout(cfg: dict):
    """Docker stdout service input modeled as a processor over tailed
    json-file/CRI log lines (plugins/input/docker/stdout/
    docker_stdout_processor.go:185-282 + input_docker_stdout.go:420-433
    defaults). Container discovery (IncludeEnv/IncludeLabel…) and the
    _image_name_/_container_name_/_container_ip_ tags are runtime
    metadata a deployment attaches per container; the line-level
    semantics — auto-detected json/CRI parse, stream filtering, partial
    reassembly, BeginLineRegex multiline — replay here."""
    return _docker_stdout_factory(cfg, raw=False)


@register("service_docker_stdout_raw", keys=_DOCKER_STDOUT_KEYS)
def service_docker_stdout_raw(cfg: dict):
    """Raw docker attach variant (plugins/input/docker/rawstdout/
    input_docker_stdout.go:100-200): `<time> <content>` lines from the
    multiplexed attach stream; BeginLineRegex must span the whole
    check-length prefix (FindStringIndex anchored both ends)."""
    return _docker_stdout_factory(cfg, raw=True)


@register("service_docker_event",
          keys={"IntervalMs", "EventQueueSize", "IgnoreAttributes"})
def service_docker_event(cfg: dict):
    """Docker daemon events (plugins/input/docker/event/
    input_docker_event.go:61-83): each event becomes a log with
    ``_time_nano_``/``_action_``/``_type_``/``_id_`` plus the actor
    attributes unless IgnoreAttributes. The daemon subscription is
    deployment-side; the field contract applies over an events frame
    with (time_nano, action, type, id[, attrs map])."""
    ignore_attrs = cfg.get("IgnoreAttributes", False)

    def run(df):
        out = df.select(
            F.col("time_nano").cast("string").alias("_time_nano_"),
            F.col("action").alias("_action_"),
            F.col("type").alias("_type_"),
            F.col("id").alias("_id_"),
            *([c for c in ("attrs",) if c in df.columns and not ignore_attrs]),
        )
        return out

    return run


@register("ext_groupinfo_filter", keys={"Tags", "Metas"})
def ext_groupinfo_filter(cfg: dict):
    """FlushInterceptor ``ext_groupinfo_filter`` (plugins/extension/
    group_info_filter/group_info_filter.go:78-99): an AND of per-key
    regex conditions over group tags/metas — a group is dropped as soon
    as any condition's unanchored match result differs from ``not
    Reverse``. Keys resolve ``__tag__:k`` columns first (the per-row tag
    convention the serializers use), then plain columns; a key absent
    from the frame tests the pattern against '' exactly like Go's
    ``GetTags().Get(k)``. Each condition spec is either a plain pattern
    string or ``{Pattern, Reverse}``. Patterns compile at build time
    (Init parity: a bad regex fails the pipeline build, not the run)."""
    import re as _re

    conds = []
    for section in ("Metas", "Tags"):
        for k, spec in (cfg.get(section) or {}).items():
            if isinstance(spec, dict):
                pattern = str(spec.get("Pattern", ""))
                reverse = bool(spec.get("Reverse", False))
            else:
                pattern, reverse = str(spec), False
            _re.compile(pattern)
            conds.append((k, pattern, reverse))

    def run(df):
        keep = F.lit(True)
        for k, pattern, reverse in conds:
            col = next(
                (F.col(c).cast("string")
                 for c in (f"__tag__:{k}", k) if c in df.columns),
                F.lit(""),
            )
            m = F.coalesce(col, F.lit("")).rlike(pattern)
            keep = keep & (~m if reverse else m)
        return df.filter(keep)

    return run


@register("service_lumberjack",
          keys={"BindAddress", "V1", "V2", "SSLCA", "SSLCert", "SSLKey",
                "InsecureSkipVerify", "SourceKey"})
def service_lumberjack(cfg: dict):
    """service_lumberjack (input_lumberjack.go:139-160, defaults :178-186:
    V2 on, V1 off): decode beats-protocol batch blobs. V2 events keep the
    raw JSON payload as ONE string under ``content`` (rawJSONDecoder +
    AddDataArray(keys=["content"])); V1 'D' frames land their k/v pairs
    as the ``fields`` map (AddData parity). BindAddress/TLS options are
    accepted for config parity; the listener itself is deployment-side —
    this operator consumes the landed batch blobs."""
    v2 = cfg.get("V2", True)
    src = cfg.get("SourceKey", "content")

    def run(df):
        from loongcollector_spark.sources import lumberjack_events

        out = lumberjack_events(df, src).filter(F.col("_parse_ok"))
        if v2:
            return out.select("record_idx", "seq", "content")
        return out.select("record_idx", "seq", "fields")

    return run


@register("metric_nginx_status",
          keys={"Urls", "ResponseTimeoutMs", "SourceKey", "UrlKey"})
def metric_nginx_status(cfg: dict):
    """metric_nginx_status (plugins/input/nginx/input_nginx.go:114-171):
    parse nginx stub_status bodies into the 7-field contract
    (active/accepts/handled/requests/reading/writing/waiting) plus the
    ``_server_``/``_port_`` tags derived from the probed URL (:175-191,
    scheme-default ports). The HTTP probing loop is deployment-side;
    this operator parses landed (url, body) rows with pure codegen
    regexp extraction — same line discipline as the Go reader (value
    after the first ':' on line 1; whitespace fields of lines 3 and 4)."""
    src = cfg.get("SourceKey", "content")
    url_key = cfg.get("UrlKey", "url")

    def run(df):
        body = F.col(src)
        line3 = F.regexp_extract(body, r"(?s)^[^\n]*\n[^\n]*\n([^\n]*)", 1)
        line4 = F.regexp_extract(body, r"(?s)^[^\n]*\n[^\n]*\n[^\n]*\n([^\n]*)", 1)
        url = F.col(url_key)
        host_port = F.regexp_extract(url, r"^[a-z+]+://([^/]+)", 1)
        host = F.regexp_extract(host_port, r"^([^:]+)", 1)
        explicit_port = F.regexp_extract(host_port, r":(\d+)$", 1)
        scheme = F.regexp_extract(url, r"^([a-z+]+)://", 1)
        port = F.when(explicit_port != "", explicit_port).otherwise(
            F.when(scheme == "http", F.lit("80"))
            .when(scheme == "https", F.lit("443"))
            .otherwise(F.lit(""))
        )
        # F.get (not [i]): a malformed/short body must yield null fields,
        # never an ANSI ArrayIndexOutOfBounds that kills the whole scan.
        f3 = F.split(F.trim(line3), r"\s+")
        f4 = F.split(F.trim(line4), r"\s+")
        return df.select(
            host.alias("_server_"),
            port.alias("_port_"),
            F.trim(F.regexp_extract(body, r"^[^:]*:([^\n]*)", 1)).alias("active"),
            F.get(f3, 0).alias("accepts"),
            F.get(f3, 1).alias("handled"),
            F.get(f3, 2).alias("requests"),
            F.get(f4, 1).alias("reading"),
            F.get(f4, 3).alias("writing"),
            F.get(f4, 5).alias("waiting"),
        )

    return run
