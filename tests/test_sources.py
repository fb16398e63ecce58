"""Source adapters + container-log parser tests."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators import build_operator
from loongcollector_spark.sources import input_file, input_static_file, service_mock


@pytest.fixture()
def text_dir():
    d = tempfile.mkdtemp(prefix="lcs_src_")
    with open(f"{d}/a.log", "w") as f:
        f.write("ERROR first\n  detail 1\n  detail 2\nERROR second\n")
    with open(f"{d}/b.log", "w") as f:
        f.write("ERROR other-file\n  tail\n")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_input_file_provenance_and_order(spark, text_dir):
    df = input_file(spark, f"{text_dir}/*.log")
    rows = df.orderBy("_ingest_file", "_line_idx").collect()
    assert rows[0]["text"] == "ERROR first" and rows[0]["_line_idx"] == 0
    assert rows[3]["text"] == "ERROR second" and rows[3]["_line_idx"] == 3
    assert len({r["_ingest_file"] for r in rows}) == 2


def test_input_file_multiline_merge(spark, text_dir):
    df = input_file(spark, f"{text_dir}/*.log", multiline_start_rx=r"ERROR.*")
    texts = sorted(r["text"] for r in df.collect())
    assert "ERROR first\n  detail 1\n  detail 2" in texts
    assert "ERROR other-file\n  tail" in texts
    assert "ERROR second" in texts


def test_input_file_line_idx_across_splits(spark):
    """The line index must stay correct when one file is read as MANY
    parallel blocks (the de-skew contract: no per-file single-task
    window — a 100 GB file must not become a straggler)."""
    d = tempfile.mkdtemp(prefix="lcs_split_")
    n = 20_000
    try:
        with open(f"{d}/big.log", "w") as f:
            f.write("\n".join(f"line-{i:07d}" for i in range(n)))
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "32768")
        try:
            df = input_file(spark, f"{d}/*.log")
            assert df.rdd.getNumPartitions() > 4  # really split
            rows = df.orderBy("_line_idx").collect()
            assert [r["_line_idx"] for r in rows] == list(range(n))
            assert rows[12345]["text"] == "line-0012345"
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_input_file_encoding_gbk_and_utf16(spark):
    """FileEncoding UTF8/UTF16/GBK (FileReaderOptions.h:30-34): the scan
    decodes to UTF-8 strings JVM-side, provenance + multiline compose on
    top, and a UTF-16 BOM is stripped."""
    d = tempfile.mkdtemp(prefix="lcs_enc_")
    lines = ["第%d行 价格=￥%d 模块=登录" % (i, i * 3) for i in range(200)]
    try:
        with open(f"{d}/g.log", "wb") as f:
            f.write(("\n".join(lines) + "\n").encode("gbk"))
        with open(f"{d}/u.log", "wb") as f:  # BOM + LE, CRLF line ends
            f.write(("\r\n".join(lines)).encode("utf-16"))
        got = input_file(spark, f"{d}/g.log", file_encoding="GBK")
        rows = got.orderBy("_line_idx").collect()
        assert [r["text"] for r in rows] == lines
        assert [r["_line_idx"] for r in rows] == list(range(200))
        u = input_file(spark, f"{d}/u.log", file_encoding="UTF16")
        urows = [r["text"] for r in u.orderBy("_line_idx").collect()]
        assert urows == lines  # BOM stripped, \r swallowed
        bare = input_file(spark, f"{d}/g.log", file_encoding="GBK",
                          with_provenance=False)
        assert bare.columns == ["text"]
        with pytest.raises(ValueError, match="FileEncoding"):
            input_file(spark, f"{d}/g.log", file_encoding="EBCDIC")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_input_file_encoding_multiline_merge(spark):
    """GBK decode composes with the multiline merge state machine."""
    d = tempfile.mkdtemp(prefix="lcs_encm_")
    try:
        with open(f"{d}/m.log", "wb") as f:
            f.write("错误 主行\n  栈帧一\n  栈帧二\n错误 下一条\n".encode("gbk"))
        df = input_file(spark, f"{d}/m.log", file_encoding="GBK",
                        multiline_start_rx="错误.*")
        texts = sorted(r["text"] for r in df.collect())
        assert texts == ["错误 下一条", "错误 主行\n  栈帧一\n  栈帧二"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_service_command(spark):
    """input_command (input_command.go:175-230): stdout splits on
    LineSplitSep, each line carries the script-content md5; Base64
    scripts decode; failures raise unless IgnoreError; timeouts kill."""
    import base64
    import hashlib

    from loongcollector_spark.sources import service_command

    script = "printf 'alpha\\nbeta\\ngamma'\n"
    rows = service_command(spark, script).orderBy("content").collect()
    assert [r["content"] for r in rows] == ["alpha", "beta", "gamma"]
    md5 = hashlib.md5(script.encode()).hexdigest()
    assert all(r["script_md5"] == md5 for r in rows)

    b64 = base64.b64encode(b"echo fromb64").decode()
    got = service_command(spark, b64, content_encoding="Base64").collect()
    assert [r["content"] for r in got] == ["fromb64", ""]  # trailing \n

    with pytest.raises(RuntimeError, match="exec failed"):
        service_command(spark, "exit 3")
    assert service_command(spark, "exit 3", ignore_error=True).count() == 0
    with pytest.raises(RuntimeError, match="killed after"):
        service_command(spark, "sleep 5", timeout_ms=300)
    env = service_command(
        spark, 'echo "v=$LCS_X"', environments=["LCS_X=42"]
    ).collect()
    assert env[0]["content"] == "v=42"
    with pytest.raises(ValueError, match="ScriptType"):
        service_command(spark, "x", script_type="perl")


def test_input_static_file_and_mock(spark):
    df = input_static_file(spark, "/root/testdata/sf0.001/events.parquet")
    assert df.count() > 0
    mock = service_mock(spark, n_turns=100)
    assert mock.count() == 100
    assert mock.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_parse_container_log_containerd(spark):
    rows = [
        ("2026-01-01T00:00:00.123Z stdout F hello world",),
        ("2026-01-01T00:00:01.000Z stderr P partial chunk",),
        ("not a cri line",),
    ]
    df = spark.createDataFrame(rows, "text string")
    op = build_operator({"Type": "processor_parse_container_log"})
    got = {r["content"]: r for r in op(df).filter("_parse_ok").collect()}
    assert got["hello world"]["_source_"] == "stdout"
    assert not got["hello world"]["_part_"]
    assert got["partial chunk"]["_part_"]
    assert op(df).filter("NOT _parse_ok").count() == 1

    # IgnoringStderr drops the stderr stream
    op2 = build_operator({
        "Type": "processor_parse_container_log", "IgnoringStderr": True,
    })
    assert op2(df).filter("_source_ = 'stderr'").count() == 0


def test_parse_container_log_docker_json(spark):
    rows = [
        ('{"log":"line done\\n","stream":"stdout","time":"2026-01-01T00:00:00Z"}',),
        ('{"log":"partial...","stream":"stdout","time":"2026-01-01T00:00:01Z"}',),
    ]
    df = spark.createDataFrame(rows, "text string")
    op = build_operator({
        "Type": "processor_parse_container_log", "Format": "docker_json",
    })
    got = op(df).orderBy("_time_").collect()
    assert got[0]["content"] == "line done" and not got[0]["_part_"]
    assert got[1]["content"] == "partial..." and got[1]["_part_"]


def test_table_adapter_parquet_fallback(spark, tmp_path):
    """tables.py: without the Iceberg runtime every entry point degrades
    to parquet with the same logical layout; the Iceberg DDL carries the
    bucket/days partition spec and write order."""
    from loongcollector_spark import tables

    assert not tables.iceberg_available(spark)  # none in this container

    ddl = tables.transcripts_ddl("transcripts")
    assert f"bucket({tables.N_BUCKETS}, conv_id)" in ddl
    assert "days(ts)" in ddl and "USING iceberg" in ddl
    assert "ORDERED BY conv_id, turn_idx" in tables.transcripts_write_order_ddl("transcripts")

    from loongcollector_spark.datagen import gen_transcripts

    df = gen_transcripts(spark, 200, 20)
    p = str(tmp_path / "t")
    tables.write_table(df, p, mode="overwrite", partition_by=("role",))
    back = tables.read_table(spark, p)
    assert back.count() == 200
    assert set(back.columns) == set(df.columns)


def test_input_file_multiline_without_provenance(spark, text_dir):
    """multiline_start_rx with with_provenance=False must merge (via
    internal provenance) and drop the provenance columns — not fail with
    an unresolved-column error at first action."""
    df = input_file(spark, f"{text_dir}/*.log", multiline_start_rx=r"ERROR.*",
                    with_provenance=False)
    texts = sorted(r["text"] for r in df.collect())
    assert "ERROR first\n  detail 1\n  detail 2" in texts
    assert "_ingest_file" not in df.columns and "_line_idx" not in df.columns


# --------------------------- read_warc (ISO 28500) -----------------------

def _warc_record(wtype, uri, payload: bytes, extra=""):
    hdr = (f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
           f"WARC-Target-URI: {uri}\r\n"
           f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           f"WARC-Record-ID: <urn:uuid:{wtype}-1>\r\n{extra}"
           f"Content-Length: {len(payload)}\r\n\r\n")
    return hdr.encode() + payload + b"\r\n\r\n"


def test_read_warc_length_framed_and_type_filter(spark, tmp_path):
    from loongcollector_spark.sources import read_warc

    # payload CONTAINS the record separator — only length framing survives
    p1 = b"hello\r\n\r\nworld \xf0\x9f\x8c\x8d"
    p2 = b"GET / HTTP/1.1\r\n\r\n"
    raw = (_warc_record("conversion", "http://ex.com/a", p1)
           + _warc_record("request", "http://ex.com/b", p2))
    f = tmp_path / "x.warc"
    f.write_bytes(raw)
    rows = read_warc(spark, str(f)).orderBy("record_idx").collect()
    assert [r.warc_type for r in rows] == ["conversion", "request"]
    assert bytes(rows[0].payload) == p1
    assert rows[0].content_length == len(p1) and rows[0]._parse_ok
    assert rows[0].target_uri == "http://ex.com/a"
    assert rows[0].headers["warc-date"] == "2026-01-01T00:00:00Z"
    only = read_warc(spark, str(f), record_types=["conversion"]).collect()
    assert len(only) == 1 and only[0].warc_type == "conversion"


def test_read_warc_gzip_members_and_truncated_tail(spark, tmp_path):
    import gzip as _gzip

    from loongcollector_spark.sources import read_warc

    # CC-style: one gzip member PER record, concatenated
    r1 = _warc_record("conversion", "http://ex.com/a", b"abc")
    r2 = _warc_record("conversion", "http://ex.com/b", b"defgh")
    gz = _gzip.compress(r1) + _gzip.compress(r2)
    f = tmp_path / "x.warc.gz"
    f.write_bytes(gz)
    rows = read_warc(spark, str(f)).orderBy("record_idx").collect()
    assert [bytes(r.payload) for r in rows] == [b"abc", b"defgh"]

    # truncated record -> one marker row, no task failure
    bad = r1 + b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"
    f2 = tmp_path / "bad.warc"
    f2.write_bytes(bad)
    rows2 = read_warc(spark, str(f2)).orderBy("record_idx").collect()
    assert [r._parse_ok for r in rows2] == [True, False]


class TestLumberjack:
    """lumberjack wire decoder (input_lumberjack.go:139-160; frame layout
    per the public elastic/go-lumber protocol)."""

    @staticmethod
    def _blob_df(spark, blobs):
        import pandas as pd
        return spark.createDataFrame(
            pd.DataFrame({"content": blobs}), "content binary")

    def test_v2_json_window_and_compressed(self, spark):
        import struct, zlib
        from loongcollector_spark.sources import lumberjack_events

        f1 = b"2J" + struct.pack(">II", 1, 9) + b'{"a":"x"}'
        f2 = b"2J" + struct.pack(">II", 2, 9) + b'{"b":"y"}'
        comp = zlib.compress(f1 + f2)
        blob = (b"2W" + struct.pack(">I", 2)
                + b"2C" + struct.pack(">I", len(comp)) + comp)
        rows = lumberjack_events(
            self._blob_df(spark, [blob])).orderBy("seq").collect()
        assert [(r["seq"], r["content"], r["_parse_ok"]) for r in rows] == [
            (1, '{"a":"x"}', True), (2, '{"b":"y"}', True)]

    def test_v1_data_frame_fields_map(self, spark):
        import struct
        from loongcollector_spark.sources import lumberjack_events

        def kv(k, v):
            return (struct.pack(">I", len(k)) + k
                    + struct.pack(">I", len(v)) + v)

        blob = (b"1W" + struct.pack(">I", 1)
                + b"1D" + struct.pack(">II", 7, 2)
                + kv(b"line", b"hello") + kv(b"host", b"h1"))
        rows = lumberjack_events(self._blob_df(spark, [blob])).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["seq"] == 7 and r["version"] == "1" and r["content"] is None
        assert dict(r["fields"]) == {"line": "hello", "host": "h1"}

    def test_truncated_and_garbage_emit_marker(self, spark):
        import struct
        from loongcollector_spark.sources import lumberjack_events

        good = b"2J" + struct.pack(">II", 1, 4) + b"abcd"
        truncated = b"2J" + struct.pack(">II", 2, 50) + b"short"
        rows = lumberjack_events(
            self._blob_df(spark, [good + truncated, b"XZ junk"])).collect()
        ok = [r for r in rows if r["_parse_ok"]]
        bad = [r for r in rows if not r["_parse_ok"]]
        assert len(ok) == 1 and ok[0]["content"] == "abcd"
        assert len(bad) == 2  # truncated frame + non-lumberjack blob

    def test_registry_op_v2_contract(self, spark):
        import struct
        from loongcollector_spark.operators import build_operator

        blob = b"2J" + struct.pack(">II", 3, 2) + b"{}"
        op = build_operator({"Type": "service_lumberjack"})
        rows = op(self._blob_df(spark, [blob])).collect()
        assert [r["content"] for r in rows] == ["{}"]


def test_input_debug_file(spark, tmp_path):
    """input_debug_file (input_debug_file.go:31-91): first LineLimit
    lines per file joined under FieldName, one log per file."""
    from loongcollector_spark.sources import input_debug_file

    p1 = tmp_path / "a.log"
    p1.write_text("\n".join(f"l{i}" for i in range(10)) + "\n")
    p2 = tmp_path / "b.log"
    p2.write_text("x\ny\n")
    out = {r["_source_file"].rsplit("/", 1)[-1]: r["content"]
           for r in input_debug_file(
               spark, str(tmp_path / "*.log"), line_limit=3).collect()}
    assert out["a.log"] == "l0\nl1\nl2"
    assert out["b.log"] == "x\ny"
    # default field name and limit contract (models.ContentKey, 1000)
    [r] = input_debug_file(spark, str(p2)).collect()
    assert r["content"] == "x\ny"


def test_overwrite_partitions_resume_parquet(spark, tmp_path):
    """write_table(mode='overwrite_partitions') — the idempotent-resume
    write: replaying one batch's partitions replaces exactly those
    partitions and leaves the others untouched (parquet dynamic
    partition overwrite; the Iceberg path maps to overwritePartitions,
    exercised by the gated test below when a runtime jar is present)."""
    from loongcollector_spark import tables

    p = str(tmp_path / "t")
    day1 = spark.createDataFrame(
        [("c1", 0, "a", "d1"), ("c2", 0, "b", "d1")],
        "conv_id string, turn_idx int, text string, day string")
    day2 = spark.createDataFrame(
        [("c3", 0, "x", "d2")],
        "conv_id string, turn_idx int, text string, day string")
    tables.write_table(day1, p, mode="overwrite", partition_by=("day",))
    tables.write_table(day2, p, mode="overwrite_partitions",
                       partition_by=("day",))
    # replay day2 with corrected rows: only d2 is replaced
    day2b = spark.createDataFrame(
        [("c3", 0, "x-fixed", "d2"), ("c4", 0, "y", "d2")],
        "conv_id string, turn_idx int, text string, day string")
    tables.write_table(day2b, p, mode="overwrite_partitions",
                       partition_by=("day",))
    got = {(r["conv_id"], r["text"]) for r in
           tables.read_table(spark, p).collect()}
    assert got == {("c1", "a"), ("c2", "b"), ("c3", "x-fixed"), ("c4", "y")}


def test_iceberg_runtime_smoke(tmp_path):
    """GATED: runs only when an Iceberg runtime jar is on the session
    classpath (none ships in this container). Exercises the real
    transcripts DDL (bucket/days partition spec), the write-order
    ALTER, an append, and the overwritePartitions resume round trip
    against a local hadoop catalog."""
    import pytest
    from pyspark.sql import SparkSession

    from loongcollector_spark import tables

    probe = SparkSession.getActiveSession()
    if probe is None or not tables.iceberg_available(probe):
        pytest.skip("no Iceberg runtime jar in this container")

    wh = str(tmp_path / "warehouse")
    s = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.catalog.lcs",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lcs.type", "hadoop")
        .config("spark.sql.catalog.lcs.warehouse", wh)
        .getOrCreate()
    )
    s.sql(tables.transcripts_ddl("db.transcripts"))
    s.sql(tables.transcripts_write_order_ddl("db.transcripts"))
    rows = s.createDataFrame(
        [("c1", 0, "user", "hi", "", "2026-01-01 00:00:00"),
         ("c1", 1, "assistant", "yo", "", "2026-01-01 00:00:01")],
        tables.TRANSCRIPT_COLUMNS.replace(" timestamp", " string"),
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    tables.write_table(rows, "lcs.db.transcripts", mode="append")
    fixed = rows.withColumn("text", F.lit("fixed"))
    tables.write_table(fixed, "lcs.db.transcripts",
                       mode="overwrite_partitions")
    got = tables.read_table(s, "lcs.db.transcripts").collect()
    assert len(got) == 2 and all(r["text"] == "fixed" for r in got)
