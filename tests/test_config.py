"""Reference-YAML pipeline execution: the exact config shape of the
reference's nginx benchmark scenario
(test/benchmark/local/test_cases/performance_file_to_file_loongcollector/
loongcollector.yaml) runs end-to-end on Spark — file input, native regex
parse with the 11-key schema, JSON-lines file flusher."""

import glob
import gzip
import json

from loongcollector_spark.config import PipelineConfig, run_config

NGINX_LINE = (
    '192.168.0.1 - frank [01/Jan/2026:00:00:07 +0000] '
    '"GET /index.html HTTP/1.1" 200 512 "-" "bench/1.0"'
)

YAML = """
enable: true
inputs:
  - Type: input_file
    FilePaths:
      - {logdir}/*.log
processors:
  - Type: processor_parse_regex_native
    SourceKey: content
    Regex: ^([^ ]*) ([^ ]*) ([^ ]*) \\[([^\\]]*)\\] "(\\S+) ([^\\"]*) (\\S*)" ([^ ]*) ([^ ]*) "([^\\"]*)" "([^\\"]*)"
    Keys:
      - ip
      - ident
      - auth
      - timestamp
      - method
      - request
      - http_version
      - response_code
      - bytes
      - referrer
      - user_agent
flushers:
  - Type: flusher_file
    FilePath: {outdir}/test.out
"""


def test_reference_nginx_yaml_runs(spark, tmp_path):
    logdir = tmp_path / "logs"
    logdir.mkdir()
    (logdir / "a.log").write_text((NGINX_LINE + "\n") * 5 + "not a log line\n")

    cfg = PipelineConfig.parse(
        YAML.format(logdir=logdir, outdir=tmp_path / "out")
    )
    out = run_config(spark, cfg)

    # transformed frame: parsed keys present, parse-fail row kept raw
    rows = out.collect()
    ok = [r for r in rows if r["_parse_ok"]]
    assert len(rows) == 6 and len(ok) == 5
    assert ok[0]["ip"] == "192.168.0.1" and ok[0]["response_code"] == "200"
    bad = next(r for r in rows if not r["_parse_ok"])
    assert bad["content"] == "not a log line"  # KeepingSourceWhenParseFail

    # flusher output: JSON-lines golden format with the parsed contents
    lines = []
    for p in glob.glob(f"{tmp_path}/out/test.out/part-*"):
        opener = gzip.open if p.endswith(".gz") else open
        with opener(p, "rt") as f:
            lines += [json.loads(ln) for ln in f if ln.strip()]
    assert len(lines) == 6
    parsed = [ln for ln in lines if ln.get("ip") == "192.168.0.1"]
    assert len(parsed) == 5 and parsed[0]["method"] == "GET"


def test_config_unknown_processor_key_rejected(spark):
    cfg = PipelineConfig.parse("""
processors:
  - Type: processor_drop
    DropKeys: [x]
    NotAKey: 1
""")
    import pytest

    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(ValueError, match="unknown/unhandled config keys"):
        run_config(spark, cfg, df=df)


def test_config_disable_is_noop(spark):
    cfg = PipelineConfig.parse("enable: false\nprocessors: []\n")
    assert run_config(spark, cfg, df=None) is None


def test_reference_spl_yaml_runs(spark, tmp_path):
    """The reference's SPL benchmark config
    (performance_file_to_file_loongcollectorspl/loongcollector.yaml):
    processor_spl with a parse-regexp script, run verbatim."""
    logdir = tmp_path / "logs"
    logdir.mkdir()
    (logdir / "a.log").write_text((NGINX_LINE + "\n") * 3)

    cfg = PipelineConfig.parse(f"""
enable: true
inputs:
  - Type: input_file
    FilePaths:
      - {logdir}/*.log
processors:
  - Type: processor_spl
    Script: |
      * | parse-regexp content, '^([^ ]*) ([^ ]*) ([^ ]*) \\[([^\\]]*)\\] "(\\S+) ([^\\"]*) (\\S*)" ([^ ]*) ([^ ]*) "([^\\"]*)" "([^\\"]*)"' as ip, ident, auth, timestamp, method, request, http_version, response_code, bytes, referrer, user_agent
flushers:
  - Type: flusher_file
    FilePath: {tmp_path}/out/test.out
""")
    out = run_config(spark, cfg)
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0]["ip"] == "192.168.0.1"
    assert rows[0]["method"] == "GET" and rows[0]["response_code"] == "200"


def test_reference_yaml_streaming_mode(spark, tmp_path):
    """The SAME nginx YAML runs continuously: file-source stream, per-
    micro-batch processor chain, idempotent batch=<id> flusher output."""
    from loongcollector_spark.config import run_config_streaming

    logdir = tmp_path / "logs"
    logdir.mkdir()
    (logdir / "a.log").write_text((NGINX_LINE + "\n") * 4)
    (logdir / "b.log").write_text((NGINX_LINE + "\n") * 2)

    cfg = PipelineConfig.parse(
        YAML.format(logdir=logdir, outdir=tmp_path / "out")
    )
    q = run_config_streaming(spark, cfg, str(tmp_path / "stream"))
    q.awaitTermination(120)

    lines = []
    for p in glob.glob(f"{tmp_path}/out/test.out/batch=*/part-*"):
        opener = gzip.open if p.endswith(".gz") else open
        with opener(p, "rt") as f:
            lines += [json.loads(ln) for ln in f if ln.strip()]
    assert len(lines) == 6
    assert all(ln["ip"] == "192.168.0.1" for ln in lines)


def test_streaming_mode_reads_all_globs_and_multiline(spark, tmp_path):
    """Streaming twin parity with the batch reader: ALL FilePaths globs
    are ingested and the input-level Multiline block merges lines."""
    from loongcollector_spark.config import run_config_streaming

    d1, d2 = tmp_path / "l1", tmp_path / "l2"
    d1.mkdir(); d2.mkdir()
    (d1 / "a.log").write_text("ERROR one\n  tail a\nERROR two\n")
    (d2 / "b.log").write_text("ERROR three\n  tail b\n")
    cfg = PipelineConfig.parse(f"""
enable: true
inputs:
  - Type: input_file
    FilePaths:
      - {d1}/*.log
      - {d2}/*.log
    Multiline:
      StartPattern: ERROR.*
flushers:
  - Type: flusher_file
    FilePath: {tmp_path}/out/ml.out
""")
    q = run_config_streaming(spark, cfg, str(tmp_path / "stream"))
    q.awaitTermination(120)

    lines = []
    for p in glob.glob(f"{tmp_path}/out/ml.out/batch=*/part-*"):
        opener = gzip.open if p.endswith(".gz") else open
        with opener(p, "rt") as f:
            lines += [json.loads(ln) for ln in f if ln.strip()]
    texts = sorted(ln["content"] for ln in lines)
    assert texts == ["ERROR one\n  tail a", "ERROR three\n  tail b", "ERROR two"]
