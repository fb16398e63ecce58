"""Flusher adapter tests: file/table/blackhole/stdout paths (kafka is
adapter-only — the package isn't in this container)."""

import glob
import gzip
import json
import shutil
import tempfile

from pyspark.sql import functions as F

from loongcollector_spark.flushers import build_flusher


def test_flusher_file_json_lines(spark, kv_df):
    d = tempfile.mkdtemp(prefix="lcs_fl_file_")
    try:
        build_flusher({
            "Type": "flusher_file", "FilePath": d,
            "Tags": {"__source__": "t"},
        })(kv_df)
        lines = []
        for f in glob.glob(f"{d}/part-*.txt.gz"):
            with gzip.open(f, "rt") as fh:
                lines += [json.loads(ln) for ln in fh]
        assert len(lines) == kv_df.count()
        assert all(ln["__source__"] == "t" and "__time__" in ln for ln in lines)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_flusher_table_sharded_partitioned(spark, kv_df):
    d = tempfile.mkdtemp(prefix="lcs_fl_tbl_")
    try:
        build_flusher({
            "Type": "flusher_table", "Path": d,
            "PartitionBy": ["role"], "ShardHashKeys": ["conv_id"],
            "ShardCount": 4, "MaxRecordsPerFile": 2,
        })(kv_df)
        back = spark.read.parquet(d)
        assert back.count() == kv_df.count()
        assert sorted(glob.glob(f"{d}/role=*"))  # hive-partitioned layout
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_flusher_blackhole_and_stdout(spark, kv_df, capsys):
    build_flusher({"Type": "flusher_blackhole"})(kv_df)
    build_flusher({"Type": "flusher_stdout", "MaxRows": 2})(kv_df)
    # stdout goes through the JVM console; just assert no exception and
    # the unknown-type error is clear
    try:
        build_flusher({"Type": "flusher_nope"})
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "flusher_nope" in str(e)


def test_jdbc_roundtrip_embedded_derby(spark):
    """Contract test for the JDBC source+sink adapters against the
    embedded Derby engine Spark already ships (no external service):
    flusher_jdbc writes, service_jdbc reads back partitioned, rows and
    values must survive the round trip."""
    from loongcollector_spark.datagen import gen_transcripts
    from loongcollector_spark.flushers import build_flusher
    from loongcollector_spark.sources import service_jdbc

    url = "jdbc:derby:memory:lcs_contract;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    df = gen_transcripts(spark, 300, 30).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    write = build_flusher({
        "Type": "flusher_jdbc", "Url": url, "Table": "turns",
        "Mode": "overwrite", "Driver": driver, "ShardKeys": ["conv_id"],
        "NumPartitions": 4,
    })
    write(df)

    back = service_jdbc(
        spark, url, "turns", partition_column="turn_idx",
        num_partitions=4, lower_bound=0, upper_bound=64, driver=driver,
    )
    assert back.count() == 300
    a = df.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    b = back.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    assert a == b
    # partitioned read really split the scan
    assert back.rdd.getNumPartitions() == 4


def test_kafka_payload_contract(spark):
    """Kafka adapter contract without a broker: the shipped (key, value)
    frame must carry hash-partitioner keys from HashKeys and a JSON value
    with __time__ + every serializable column."""
    import json as _json

    from loongcollector_spark.flushers import kafka_payload_frame

    df = spark.createDataFrame(
        [("c1", 0, "hello", "2026-01-01 00:00:00")],
        "conv_id string, turn_idx int, text string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = kafka_payload_frame(df, "hash", ["conv_id", "turn_idx"])
    assert out.columns == ["key", "value"]
    r = out.first()
    assert r["key"] == "c1_0"
    v = _json.loads(r["value"])
    assert v["text"] == "hello" and v["conv_id"] == "c1"
    assert isinstance(v["__time__"], int)

    out2 = kafka_payload_frame(df, "random", [])
    assert out2.columns == ["value"]

    # pipelines that dropped ts must still serialize (no __time__ field)
    v3 = _json.loads(kafka_payload_frame(df.drop("ts")).first()["value"])
    assert "__time__" not in v3 and v3["text"] == "hello"
