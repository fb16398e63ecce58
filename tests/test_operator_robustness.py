"""Registry-wide robustness net: EVERY registered operator executes over
an adversarial frame — nulls, empty strings, multi-byte UTF-8, control
characters (incl. the \\x01 fast-path separator), separator collisions —
without throwing under ANSI mode. Catches the classic production
failures (null-handling, cast errors) for operators whose golden tests
only feed well-formed rows."""

from __future__ import annotations

import pytest

from loongcollector_spark.operators import KNOWN_KEYS, REGISTRY, build_operator

# one minimal, valid config per operator; applied to the adversarial frame
CONFIGS: dict[str, dict] = {
    "processor_parse_regex": {"SourceKey": "text", "Regex": r"(\S+) (\w+)",
                              "Keys": ["a", "b"]},
    "processor_parse_json": {"SourceKey": "text"},
    "processor_parse_delimiter": {"SourceKey": "text", "Separator": ",",
                                  "Keys": ["a", "b"]},
    "processor_split_key_value": {"SourceKey": "text",
                                  "EmptyKeyPrefix": "ek_",
                                  "NoSeparatorKeyPrefix": "nk_"},
    "processor_parse_apsara": {"SourceKey": "text"},
    "processor_parse_timestamp": {"SourceKey": "text"},
    "processor_timestamp_filter": {"SourceKey": "ts",
                                   "LowerBound": "2020-01-01 00:00:00"},
    "processor_filter": {"ConditionExp": {"key": "role", "exp": ".*"},
                         "DiscardingNonUTF8": True},
    "processor_filter_regex": {"Include": {"role": ".*"},
                               "Exclude": {"tool": "zzz.*"}},
    "processor_filter_key_regex": {"Include": ["conv.*"]},
    "processor_desensitize": {"SourceKey": "text", "Method": "const",
                              "RegexContent": "[0-9]+"},
    "processor_split_log_string": {"SourceKey": "text"},
    "processor_split_log_regex": {"SourceKey": "text", "SplitRegex": r"\d.*",
                                  "OrderKeys": ["conv_id", "turn_idx"]},
    "processor_merge_multiline_log": {"StartPattern": r"\d.*"},
    "processor_split_multiline_log_string": {
        "SourceKey": "text", "StartPattern": r"\d.*",
        "ContinuePattern": r"\s.*", "OrderKeys": ["conv_id", "turn_idx"]},
    "processor_merge_conversation": {},
    "processor_parse_container_log": {"SourceKey": "text"},
    "service_syslog": {"SourceKey": "text", "ParseProtocol": "auto",
                       "Year": 2026},
    "processor_tag": {"Tags": {"__hostname__": "h"}},
    "processor_grok": {"SourceKey": "text", "Match": ["%{IP:ip} %{WORD:w}"]},
    "processor_regex": {"SourceKey": "text", "Regex": r"(\w+)",
                        "Keys": ["w"], "FullMatch": False},
    "processor_json": {"SourceKey": "text"},
    "processor_csv": {"SourceKey": "text", "SplitKeys": ["a", "b"],
                      "PreserveOthers": True, "TrimLeadingSpace": True},
    "processor_split_char": {"SourceKey": "text", "SplitSep": ",",
                             "SplitKeys": ["a"], "QuoteFlag": True},
    "processor_split_string": {"SourceKey": "text", "SplitSep": ",",
                               "SplitKeys": ["a"], "ExpandOthers": True},
    "processor_drop": {"DropKeys": ["tool"]},
    "processor_rename": {"SourceKeys": ["tool"], "DestKeys": ["tool2"]},
    "processor_add_fields": {"Fields": {"env": "x"}},
    "processor_pick_key": {"Include": ["conv_id", "text"]},
    "processor_drop_last_key": {"DropKey": "text", "Include": ["role"]},
    "processor_dict_map": {"SourceKey": "role", "DestKey": "rc",
                           "MapDict": {"user": "u"}},
    "processor_string_replace": {"SourceKey": "text", "Method": "regex",
                                 "Match": r"\d", "ReplaceString": "*"},
    "processor_base64_encoding": {"SourceKey": "text", "NewKey": "b64"},
    "processor_base64_decoding": {"SourceKey": "role", "NewKey": "dec"},
    "processor_md5": {"SourceKey": "text"},
    "processor_encrypt": {"SourceKeys": ["text"],
                          "EncryptionParameters": {"Key": "0123456789abcdef"}},
    "processor_gotime": {"SourceKey": "text",
                         "SourceFormat": "2006-01-02 15:04:05"},
    "processor_strptime": {"SourceKey": "text",
                           "EnablePreciseTimestamp": True},
    "processor_appender": {"Key": "role", "Value": "-x"},
    "processor_anchor": {"SourceKey": "text",
                         "Anchors": [{"Start": "[", "Stop": "]",
                                      "FieldName": "anch"}]},
    "processor_pack_json": {"SourceKeys": ["role", "tool"]},
    "processor_fields_with_condition": {"Switch": [
        {"Condition": {"FieldConditions": [
            {"Key": "role", "ComparisonOperator": "equals", "Value": "user"}]},
         "Actions": [{"type": "processor_add_fields", "Fields": {"sev": "x"}}]}]},
    "processor_rate_limit": {"Fields": ["role"], "Limit": "2/h"},
    "processor_geoip": {"SourceKey": "text",
                        "Ranges": [["10.0.0.0", "10.255.255.255", "C", "P", "X"]]},
    "processor_cloud_meta": {"Metadata": {"iid": "i-1"}},
    "processor_log_to_metric": {"MetricLabelKeys": ["role"],
                                "MetricValues": {"m": "turn_idx"}},
    "processor_log_to_sls_metric": {"MetricLabelKeys": ["role"],
                                    "MetricValues": {"role": "turn_idx"}},
    "processor_default": {},
    "processor_spl": {"Script": "* | where role is not null"},
    "aggregator_content_value_group": {"GroupKeys": ["role", "tool"]},
    "aggregator_context": {},
    "aggregator_base": {"MaxLogCount": 8, "Topic": "x", "PackFlag": True,
                        "MaxLogGroupCount": 4},
    "aggregator_default": {},
    "aggregator_logstore_router": {"SourceKey": "role",
                                   "RouterRegex": ["user"],
                                   "RouterLogstore": ["ls_u"]},
    "aggregator_shardhash": {"SourceKeys": ["conv_id"], "ShardCount": 8,
                             "EnablePackID": True},
    "aggregator_metadata_group": {"GroupMetadataKeys": ["role"]},
    "batcher": {"MinCnt": 2, "MinSizeBytes": 16, "GroupKey": ["conv_id"],
                "OrderKey": "turn_idx", "SizeKey": "text"},
    "processor_prom_parse_metric": {"SourceKey": "text"},
    "processor_prom_relabel_metric": {"RelabelConfigs": [
        {"action": "replace", "source_labels": ["role"],
         "target_label": "r"},
        {"action": "labelmap", "regex": "(.*)", "replacement": "m_$1"},
        {"action": "keep", "source_labels": ["__name__"], "regex": ".*"},
    ]},
    "processor_parse_from_pb": {"SourceKey": "text", "Protocol": "LoongSuite",
                                "GroupIdKey": "turn_idx"},
    "processor_otel_trace": {"SourceKey": "text", "Format": "json"},
    "processor_otel_metric": {"SourceKey": "text", "Format": "json"},
    "aggregator_opentelemetry": {"ContentsKey": "contents"},
    "aggregator_skywalking": {"ContentsKey": "contents"},
    "service_http_server": {"SourceKey": "text", "Format": "influxdb",
                            "FieldsExtend": True, "DB": "d"},
    "service_otlp": {"SourceKey": "text", "Mode": "traces"},
    "service_journal": {"SourceKey": "text", "ParsePriority": True,
                        "ParseSyslogFacility": True,
                        "Units": ["nginx.service"]},
    "service_docker_stdout": {"GroupKeys": ["conv_id"],
                              "OrderKey": "turn_idx",
                              "BeginLineRegex": r"\d.*",
                              "Tags": {"_container_name_": "c"}},
    "service_docker_stdout_raw": {"GroupKeys": ["conv_id"],
                                  "OrderKey": "turn_idx",
                                  "BeginLineRegex": r"\d.*"},
    "service_docker_event": {"IgnoreAttributes": False},
    "service_canal": {"Host": "db1", "EnableDDL": True, "PackValues": True,
                      "EnableEventMeta": True},
    "ext_groupinfo_filter": {"Tags": {"role": {"Pattern": "user|tool",
                                               "Reverse": False},
                                      "absent_key": ".*"},
                             "Metas": {"conv_id": "c.*"}},
    "service_lumberjack": {"V2": True, "SourceKey": "content"},
    "metric_nginx_status": {"SourceKey": "text", "UrlKey": "tool"},
    "metric_redis": {"SourceKey": "text", "UrlKey": "tool"},
    "metric_netping": {"TimeCol": "ts"},
    "service_udp_server": {"SourceKey": "text", "Format": "statsd"},
    "service_mqtt": {"Topics": ["#"], "TopicKey": "tool",
                     "SourceKey": "text"},
    "service_snmp": {"FieldKey": "field"},
    "service_skywalking": {"Mode": "logging"},
    "service_kubernetesmeta": {"ClusterID": "c", "Interval": 5},
    "service_wineventlog": {"SourceKey": "text", "EventID": "1-100,-7",
                            "Level": "info,err", "IgnoreZeroValue": True},
    "ext_basicauth": {"Username": "u\x01ser", "Password": "p:ss"},
    "ext_request_breaker": {"FailureRatio": 0.5, "WindowInSeconds": 5,
                            "EndpointKey": "tool", "TimeKey": "ts",
                            "SuccessKey": "ok"},
    "ext_default_encoder": {"Format": "prometheus", "SeriesLimit": 2},
    "metric_process_v2": {"TopNCPU": 2, "TopNMem": 2,
                          "MinMemoryLimitKB": 0},
    "metric_system_v2": {},
    "service_gpu_metric": {},
    "metric_meta_host": {"Disk": True, "Net": True, "Process": True},
}


def _as_binlog_events(df):
    """service_canal consumes a binlog-event frame; hostile text rides in
    as a row-image value and the DDL query, with null columns/rows/meta."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("turn_idx").cast("long").alias("event_seq"),
        F.element_at(
            F.array(F.lit("insert"), F.lit("update"), F.lit("delete"),
                    F.lit("ddl")),
            (F.pmod("turn_idx", F.lit(4)) + 1).cast("int")).alias("action"),
        F.col("conv_id").alias("db"), F.col("tool").alias("tbl"),
        F.when(F.col("turn_idx") % 2 == 0,
               F.array(F.lit("id"))).alias("columns"),
        F.when(F.col("text").isNotNull(),
               F.array(F.array(F.col("text"), F.col("tool")))).alias("rows"),
        F.col("role").alias("gtid"), F.col("tool").alias("filename"),
        F.col("turn_idx").cast("long").alias("log_pos"),
        F.lit(None).cast("long").alias("event_time"),
        F.lit(None).cast("long").alias("event_size"),
        F.lit(None).cast("long").alias("server_id"),
        F.col("text").alias("query"),
        F.lit(None).cast("long").alias("error_code"),
        F.lit(None).cast("long").alias("exec_time"),
        F.col("text").alias("status_vars"),
    )


def _with_map_shapes(df):
    """Ops whose input contract is a parsed shape (a ``labels`` /
    ``contents`` map) get the map built from the hostile columns — the
    hostile VALUES still flow through the op."""
    from pyspark.sql import functions as F

    m = F.create_map(
        F.lit("__name__"), F.coalesce(F.col("role"), F.lit("")),
        F.lit("text"), F.coalesce(F.col("text"), F.lit("")),
    )
    return df.withColumn("labels", m).withColumn("contents", m)


def _as_lumberjack_blobs(df):
    """service_lumberjack consumes binary batch blobs; the hostile text
    (never valid framing) must come back as _parse_ok=false markers, not
    a thrown job."""
    from pyspark.sql import functions as F

    return df.select(F.col("text").cast("binary").alias("content"))


def _as_netping_results(df):
    """metric_netping consumes probe-result rows; hostile text rides in
    as the probe type/name/err, counters from turn_idx (may be null)."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("role").alias("type"), F.col("text").alias("name"),
        F.col("conv_id").alias("src"), F.col("tool").alias("dst"),
        F.col("text").alias("err"),
        F.col("turn_idx").cast("int").alias("total"),
        F.col("turn_idx").cast("int").alias("success"),
        F.lit(0).alias("failed"), F.col("ts"),
    )


def _as_docker_events(df):
    """service_docker_event consumes a daemon-events frame; hostile text
    rides in as the action, null-able ids/types included."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("turn_idx").cast("long").alias("time_nano"),
        F.col("text").alias("action"),
        F.col("role").alias("type"),
        F.col("conv_id").alias("id"),
        F.create_map(F.lit("image"),
                     F.coalesce(F.col("tool"), F.lit(""))).alias("attrs"),
    )


def _as_varbinds(df):
    """service_snmp consumes polled varbind rows; hostile text rides in
    as the OctetString value bytes AND the field/oid names, type codes
    and conversions cycle through the real + invalid space."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("turn_idx").alias("target_index"),
        F.col("conv_id").alias("target"),
        F.col("text").alias("field"), F.col("tool").alias("oid"),
        F.element_at(
            F.array(F.lit(""), F.lit("hwaddr"), F.lit("ipaddr"),
                    F.lit(None)),
            (F.pmod("turn_idx", F.lit(4)) + 1).cast("int"))
        .alias("conversion"),
        F.pmod("turn_idx", F.lit(256)).cast("int").alias("type_code"),
        F.col("text").cast("binary").alias("value_bytes"),
        F.col("turn_idx").cast("long").alias("value_num"),
    )


def _as_pod_objects(df):
    """service_kubernetesmeta consumes observed-pod rows; hostile text
    rides in as label values, container names/images, the pod name —
    with null maps/arrays/timestamps."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("conv_id").alias("namespace"), F.col("text").alias("name"),
        F.lit("v1").alias("api_version"), F.col("role").alias("phase"),
        F.col("tool").alias("pod_ip"),
        F.when(F.col("text").isNotNull(),
               F.create_map(F.lit("k"), F.col("text"))).alias("labels"),
        F.lit(None).cast("map<string,string>").alias("annotations"),
        F.when(F.col("turn_idx") % 2 == 0, F.array(F.struct(
            F.col("text").alias("name"), F.col("tool").alias("image"),
            F.lit(None).cast("string").alias("cpu_request"),
            F.lit(None).cast("string").alias("cpu_limit"),
            F.lit(None).cast("string").alias("memory_request"),
            F.lit(None).cast("string").alias("memory_limit"),
            F.lit(None).cast("array<int>").alias("ports"),
            F.lit(None).cast("array<struct<name:string,path:string>>")
            .alias("volume_mounts")))).alias("containers"),
        F.col("ts").alias("creation_ts"),
        F.col("turn_idx").cast("long").alias("first_observed"),
        F.col("turn_idx").cast("long").alias("last_observed"),
        F.col("role").alias("method"),
    )


def _as_skywalking_logdata(df):
    """service_skywalking consumes LogData rows; hostile text rides in
    as the body, tag value, and endpoint, with null trace/tags/time."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("turn_idx").cast("long").alias("timestamp"),
        F.col("role").alias("service"),
        F.col("conv_id").alias("service_instance"),
        F.col("text").alias("endpoint"),
        F.col("tool").alias("body_type"),
        F.col("text").alias("body_text"),
        F.when(F.col("turn_idx") % 2 == 0, F.col("conv_id"))
        .alias("trace_id"),
        F.col("tool").alias("trace_segment_id"),
        F.col("turn_idx").cast("long").alias("span_id"),
        F.when(F.col("text").isNotNull(),
               F.create_map(F.lit("k"), F.col("text"))).alias("tags"),
    )


def _as_request_outcomes(df):
    """ext_request_breaker consumes a request-outcome log; hostile text
    rides in as the endpoint, the success flag and timestamp are
    null-able."""
    from pyspark.sql import functions as F

    return df.withColumn(
        "ok", F.when(F.col("role").isNotNull(), F.col("turn_idx") % 2 == 0))


def _as_metric_rows(df):
    """ext_default_encoder(prometheus) consumes log_to_metric-shaped
    rows; hostile text rides in as the raw ``__labels__`` encoding."""
    from pyspark.sql import functions as F

    return df.select(
        F.coalesce(F.col("role"), F.lit("m")).alias("__name__"),
        F.col("text").alias("__labels__"),
        F.col("turn_idx").cast("double").alias("__value__"),
        (F.col("turn_idx").cast("long") * 1000).alias("__time_nano__"),
    )


# ops that require a non-raw input shape: prep fn applied before the op
def _as_process_rows(df):
    """metric_process_v2 consumes observed-process rows; hostile text
    rides in as exe/cmdline/comm, with null metrics and timestamps."""
    from pyspark.sql import functions as F

    n = F.col("turn_idx").cast("long")
    return df.select(
        F.monotonically_increasing_id().alias("scan_idx"),
        F.col("turn_idx").cast("int").alias("pid"),
        F.col("text").alias("exe"), F.col("text").alias("cmdline"),
        F.col("role").alias("comm"),
        F.when(n % 2 == 0, n.cast("double")).alias("cpu_percent"),
        F.lit(None).cast("double").alias("stime_percent"),
        n.cast("double").alias("utime_percent"),
        F.when(n % 3 == 0, n * 1024).alias("rss"),
        n.alias("swap"), n.alias("vsz"),
        F.lit(None).cast("long").alias("data"),
        F.lit(None).cast("int").alias("threads_num"),
        F.lit(None).cast("int").alias("fds_num"),
        n.alias("net_in_bytes"), n.alias("net_in_packet"),
        n.alias("net_out_bytes"), n.alias("net_out_packet"),
        n.alias("read_bytes"), n.alias("write_bytes"),
        n.alias("read_count"), n.alias("write_count"),
        F.col("ts"),
    )


def _as_system_snapshots(df):
    """metric_system_v2 consumes two counter snapshots per host; hostile
    text is the host key, with null jiffies/gauges/arrays/timestamps."""
    from pyspark.sql import functions as F

    n = F.col("turn_idx").cast("double")
    null_l = F.lit(None).cast("long")
    return df.select(
        F.col("conv_id").alias("host"),
        (F.col("turn_idx") % 2).cast("int").alias("snap_idx"),
        F.col("ts").alias("snap_ts"),
        n.alias("cpu_user"), n.alias("cpu_system"),
        F.lit(None).cast("double").alias("cpu_nice"),
        n.alias("cpu_irq"), n.alias("cpu_softirq"),
        n.alias("cpu_guest"), n.alias("cpu_guest_nice"),
        n.alias("cpu_idle"), n.alias("cpu_iowait"), n.alias("cpu_steal"),
        F.lit(None).cast("int").alias("ncpus"),
        n.alias("mem_util_pct"), null_l.alias("mem_cache"),
        null_l.alias("mem_free"), null_l.alias("mem_available"),
        null_l.alias("mem_used"), null_l.alias("mem_total"),
        n.alias("swap_util_pct"), n.alias("load1"), n.alias("load5"),
        n.alias("load15"), null_l.alias("boot_time"),
        null_l.alias("tcp_out_segs"), null_l.alias("tcp_in_segs"),
        null_l.alias("tcp_retrans_segs"),
        F.when(F.col("turn_idx") % 3 == 0, F.array(F.struct(
            F.col("text").alias("name"), null_l.alias("read_bytes"),
            null_l.alias("write_bytes"), null_l.alias("read_count"),
            null_l.alias("write_count"), null_l.alias("read_time"),
            null_l.alias("write_time"), null_l.alias("io_time"),
        ))).alias("disks"),
        F.lit(None).cast(
            "array<struct<name:string,bytes_recv:long,bytes_sent:long,"
            "packets_recv:long,packets_sent:long,errin:long,errout:long,"
            "dropin:long,dropout:long>>").alias("interfaces"),
    )


def _as_gpu_readings(df):
    from pyspark.sql import functions as F

    n = F.col("turn_idx").cast("long")
    return df.select(
        F.col("turn_idx").cast("int").alias("device"),
        F.when(n % 2 == 0, n * 1000).alias("power_usage_mw"),
        n.alias("temperature"), n.alias("gpu_util"),
        F.lit(None).cast("long").alias("memory_util"),
        (n * 1024).alias("total_memory"),
        F.when(n % 3 == 0, n).alias("used_memory"),
        F.col("ts"),
    )


def _as_host_objects(df):
    """metric_meta_host consumes host rows; hostile text rides in as
    the hostname, label values, process cmdlines — with null arrays."""
    from pyspark.sql import functions as F

    null_s = F.lit(None).cast("string")
    return df.select(
        F.col("conv_id").alias("host_id"), F.col("text").alias("hostname"),
        F.col("tool").alias("ip"),
        F.col("turn_idx").cast("long").alias("boot_time"),
        F.col("role").alias("os"), null_s.alias("platform"),
        null_s.alias("platform_family"), null_s.alias("platform_version"),
        null_s.alias("kernel_version"), null_s.alias("kernel_arch"),
        null_s.alias("virtualization_system"),
        null_s.alias("virtualization_role"),
        F.lit(None).cast("int").alias("processor_count"),
        F.lit(None).cast("int").alias("core_count"),
        F.col("text").alias("vendor_id"), null_s.alias("family"),
        null_s.alias("model"), F.col("text").alias("model_name"),
        F.lit(None).cast("double").alias("mhz"),
        F.lit(None).cast("int").alias("cache_size"),
        F.lit(None).cast("long").alias("mem_total"),
        F.lit(None).cast("long").alias("swap_total"),
        F.lit(None).cast("long").alias("vsz_total"),
        F.when(F.col("turn_idx") % 2 == 0, F.array(F.struct(
            F.col("text").alias("device"), F.col("role").alias("opts"),
            null_s.alias("fstype"), F.col("tool").alias("mount_point"),
        ))).alias("disks"),
        F.lit(None).cast(
            "array<struct<index:int,name:string,mtu:int,"
            "hardware_address:string,flags:array<string>,"
            "addrs:array<string>>>").alias("nets"),
        F.when(F.col("turn_idx") % 3 == 0, F.array(F.struct(
            F.col("turn_idx").cast("int").alias("pid"),
            F.col("text").alias("cmdline"), F.col("tool").alias("exe"),
            F.col("role").alias("comm"),
            F.lit(None).cast("int").alias("ppid"),
            F.lit(None).cast("long").alias("start_time"),
            F.col("turn_idx").cast("long").alias("rss"),
        ))).alias("processes"),
        F.col("ts"),
    )


PREP = {
    "service_snmp": _as_varbinds,
    "metric_process_v2": _as_process_rows,
    "metric_system_v2": _as_system_snapshots,
    "service_gpu_metric": _as_gpu_readings,
    "metric_meta_host": _as_host_objects,
    "service_kubernetesmeta": _as_pod_objects,
    "service_skywalking": _as_skywalking_logdata,
    "ext_request_breaker": _as_request_outcomes,
    "ext_default_encoder": _as_metric_rows,
    "service_canal": _as_binlog_events,
    "processor_prom_relabel_metric": _with_map_shapes,
    "aggregator_opentelemetry": _with_map_shapes,
    "aggregator_skywalking": _with_map_shapes,
    "service_docker_event": _as_docker_events,
    "service_lumberjack": _as_lumberjack_blobs,
    "metric_netping": _as_netping_results,
}


@pytest.fixture(scope="module")
def hostile_df(spark):
    rows = [
        ("c1", 0, "user", None, "search", "2026-01-01 00:00:00"),
        ("c1", 1, "assistant", "", "", "2026-01-01 00:00:01"),
        ("c1", 2, None, "a=1&b=2", None, None),
        ("c2", 0, "tool", "\x01\x01,\x01", "t", "2026-01-01 00:00:02"),
        ("c2", 1, "user", '{"truncated": ', "", "2026-01-01 00:00:03"),
        ("c2", 2, "user", "白日依山尽 κόσμε ‮ rtl", "", "2026-01-01 00:00:04"),
        ("c3", 0, "user", '10.1.2.3 GET "quoted, field" [in]', "", "2026-01-01 00:00:05"),
        ("c3", 1, "user", "x" * 5000, "", "2026-01-01 00:00:06"),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).selectExpr("conv_id", "turn_idx", "role", "text", "tool",
                 "cast(ts as timestamp) AS ts")


def test_every_operator_has_a_robustness_config():
    assert set(CONFIGS) == set(REGISTRY), (
        set(CONFIGS) ^ set(REGISTRY)
    )


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_operator_survives_hostile_rows(spark, hostile_df, name):
    op = build_operator({"Type": name, **CONFIGS[name]})
    df = PREP.get(name, lambda d: d)(hostile_df)
    rows = op(df).collect()  # full evaluation, must not throw
    assert rows is not None


def test_training_functions_survive_hostile_docs(spark):
    """dedup/text/multimodal functions over nulls, empties, unicode, and
    single-char docs — full evaluation must not throw."""
    from loongcollector_spark.functions import dedup, multimodal, text

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, " "), (3, "a"), (4, "白日 依山 尽"),
         (5, "x " * 2000), (6, "dup dup dup"), (7, "dup dup dup")],
        "doc_id long, text string",
    )
    dedup.exact_dedup(docs).collect()
    dedup.minhash_signatures(docs).collect()
    dedup.minhash_lsh_pairs(docs).collect()
    dedup.simhash_signatures(docs).collect()
    dedup.simhash_near_pairs(docs).collect()
    dedup.ngram_jaccard_adjacent(docs).collect()
    text.with_token_count(docs).collect()
    text.with_quality(docs).collect()
    text.with_lang_guess(docs).collect()
    text.with_fingerprint(docs).collect()
    text.gopher_quality(docs).collect()
    media = multimodal.documents_as_media(docs, "video")
    multimodal.extract_features(media).collect()
    multimodal.frame_sample(media).collect()

    from loongcollector_spark.functions import tokenizer

    # BPE over the hostile corpus: non-ASCII and blank docs drop out of
    # the word table; training on a near-empty vocabulary and applying
    # zero-or-few merges must both evaluate cleanly
    merges = tokenizer.bpe_train(docs, n_merges=3)
    tokenizer.bpe_encode(docs, merges).collect()
    tokenizer.bpe_encode(docs, []).collect()


def test_similarity_survives_hostile_embeddings(spark):
    """zero vectors (zero norm), constant vectors, and nulls through the
    similarity kernels — div-by-zero must yield null/NaN rows, never a
    thrown job."""
    from loongcollector_spark.functions import similarity

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0] + [0.1] * 61),
         (1, [0.0] * 64),             # zero norm
         (2, [1.0] * 64),
         (3, None),                   # null vector
         (4, [1.0, 2.0, 3.0] + [0.1] * 61)],
        "vec_id long, embedding array<float>",
    )
    similarity.cosine_topk(emb, query_vec_id=0, k=3).collect()
    similarity.lsh_bucketed_topk(emb, query_vec_id=0, k=3).collect()
    similarity.ivf_topk(emb, query_vec_id=0, k=3, n_centroids=2,
                        nprobe=1).collect()
    pairs = similarity.embedding_near_dup_pairs(emb, min_cos_1e4=9000)
    got = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}
    assert (0, 4) in got  # the true near-dup still surfaces
    from loongcollector_spark.functions.dedup import connected_components

    comp = {r["node"]: r["comp"] for r in connected_components(
        pairs, left="vec_a", right="vec_b").collect()}
    assert comp[0] == comp[4] == 0  # near-dups land in one cluster


def test_new_curation_functions_survive_hostile_docs(spark):
    """lm scoring, cross-doc gram share, and jpeg media over nulls,
    empties, single-word and repeated docs."""
    from loongcollector_spark.functions import multimodal
    from loongcollector_spark.functions.curation import cross_doc_gram_share
    from loongcollector_spark.functions.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, " "), (3, "a"), (4, "白日 依山 尽"),
         (5, "x " * 2000), (6, "dup dup dup"), (7, "dup dup dup")],
        "doc_id long, text string",
    )
    lm = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    assert 0 not in lm and 1 not in lm and 3 not in lm  # <2 words drop
    assert lm[6]["lm_score_1e3"] == lm[7]["lm_score_1e3"]
    share = {r["doc_id"]: r for r in cross_doc_gram_share(docs).collect()}
    assert share[6]["shared_ratio_1e3"] == 1000  # full cross-doc dup
    assert share[4]["shared_ratio_1e3"] == 0
    media = multimodal.synthetic_media(docs.select("doc_id"), "jpeg")
    feats = multimodal.extract_features(media).collect()
    assert all(r["ok"] for r in feats)


def test_semantic_dedup_survives_hostile_embeddings(spark):
    """zero-norm and null vectors through the SemDeDup path: null
    cosines never win the argmax or mark a duplicate."""
    from loongcollector_spark.functions.similarity import semantic_dedup

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 0.1]),
         (1, [0.0] * 4),              # zero norm (is also a "centroid")
         (2, [1.0] * 4),
         (3, None),                   # null vector
         (4, [1.0, 2.0, 3.0, 0.1])],  # exact dup of 0
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in
           semantic_dedup(emb, n_centroids=2, min_cos_1e4=9990).collect()}
    assert out[0]["kept"] is True
    assert out[4]["kept"] is False    # dup of lower-id cell-mate
    assert out[4]["cell"] == out[0]["cell"]
