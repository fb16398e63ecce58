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


def kafka_payload_frame(df: DataFrame, partitioner: str = "random",
                        hash_keys: list | None = None) -> DataFrame:
    """The (key, value) frame flusher_kafka ships to the broker —
    factored out so the serialization contract is testable without a
    kafka package/broker in the container. PartitionerType 'hash' maps
    HashKeys onto the message key (broker-side hash partitioning,
    flusher_kafka_v2.go:43-83); random/roundrobin leave the key null."""
    from loongcollector_spark.serializer import serializable_columns

    cols = [c for c in serializable_columns(df) if c != "ts"]
    fields = [F.col(c) for c in cols]
    if "ts" in df.columns:  # pipelines may drop/never produce ts
        fields.insert(0, F.unix_timestamp("ts").alias("__time__"))
    value = F.to_json(F.struct(*fields), {"ignoreNullFields": "true"})
    sel = [value.alias("value")]
    if partitioner == "hash" and hash_keys:
        sel.insert(0, F.concat_ws(
            "_", *[F.col(k).cast("string") for k in hash_keys]
        ).alias("key"))
    return df.select(*sel)


@register_flusher("flusher_kafka")
def flusher_kafka(cfg: dict):
    """Kafka sink (flusher_kafka_v2.go:43-83). Requires the
    spark-sql-kafka package on the cluster; the payload shape is
    kafka_payload_frame (contract-tested in-container)."""
    brokers = cfg["Brokers"]
    topic = cfg["Topic"]
    partitioner = cfg.get("PartitionerType", "random")
    hash_keys = cfg.get("HashKeys", [])

    def write(df: DataFrame) -> None:
        (kafka_payload_frame(df, partitioner, hash_keys)
         .write.format("kafka")
         .option("kafka.bootstrap.servers", brokers)
         .option("topic", topic)
         .save())

    return write


@register_flusher("flusher_http")
def flusher_http(cfg: dict):
    """HTTP sink body serialization (flusher_http.go:73-118): the
    Convert.Protocol / Convert.Encoding pair chooses the converter —
    custom_single (default), jsonline, influxdb, otlp_v1 — over the same
    shapes
    as pkg/protocol/converter. No HTTP client in this container, so the
    request bodies land as line files under ``Path`` (one value per
    line, exactly the bytes a POST body would carry); RemoteURL is
    recorded in the directory's _SUCCESS-adjacent metadata only."""
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

    def write(df: DataFrame) -> None:
        kwargs = {"tags": tags} if protocol != "influxdb" else {}
        w = convert_events(df, protocol, **kwargs).write.mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        w.text(path)

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
    protocol = cfg.get("Convert", {}).get("Protocol", "custom_single")

    def write(df: DataFrame) -> None:
        (loki_streams_frame(df, static, dynamic, line_protocol=protocol)
         .select("payload").write.mode("overwrite").text(path))

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
