"""Flusher adapter tests: file/table/blackhole/stdout paths (kafka is
adapter-only — the package isn't in this container)."""

import glob
import gzip
import json
import shutil
import tempfile

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
