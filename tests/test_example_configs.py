"""The reference's shipped example pipelines run VERBATIM through the
config front-end (example_config/data_pipelines/*.yaml, read from the
reference tree at runtime, never vendored). Only deployment-specific
bits are patched: input file globs point at a tmp fixture, and cloud
sinks (flusher_sls endpoints) are swapped for the local golden file
sink. Each YAML's own documented Before→After pair is the assertion.
"""

import os

import pytest
import yaml

from loongcollector_spark.config import PipelineConfig, run_config

EXAMPLES = "/root/reference/example_config/data_pipelines"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference tree not present")


def _load_patched(name, logdir, outdir):
    with open(f"{EXAMPLES}/{name}") as f:
        cfg = yaml.safe_load(f)
    for inp in cfg.get("inputs", []):
        if "FilePaths" in inp:
            inp["FilePaths"] = [f"{logdir}/*.log"]
    flushers = []
    for fl in cfg.get("flushers", []):
        if fl["Type"] == "flusher_sls":
            flushers.append({"Type": "flusher_file",
                             "FilePath": f"{outdir}/golden.out"})
        else:
            flushers.append(fl)
    cfg["flushers"] = flushers
    return PipelineConfig.parse(yaml.dump(cfg))


def test_file_delimiter_example(spark, tmp_path):
    # file-delimiter.yaml: {"content": "123\t2022-08-08\tbuy\t10000"}
    # → {"uid":"123","time":"2022-08-08","method":"buy","value":"10000"}
    logdir = tmp_path / "logs"; logdir.mkdir()
    (logdir / "a.log").write_text("123\t2022-08-08\tbuy\t10000\n")
    cfg = _load_patched("file-delimiter.yaml", logdir, tmp_path)
    [r] = run_config(spark, cfg).collect()
    assert (r["uid"], r["time"], r["method"], r["value"]) == (
        "123", "2022-08-08", "buy", "10000")


def test_file_grok_example(spark, tmp_path):
    # file-grok.yaml: "10.0.0.0 GET /index.html 15824 0.043" →
    # client/method/request/bytes/duration via the custom HTTP pattern
    logdir = tmp_path / "logs"; logdir.mkdir()
    (logdir / "a.log").write_text("10.0.0.0 GET /index.html 15824 0.043\n")
    cfg = _load_patched("file-grok.yaml", logdir, tmp_path)
    [r] = run_config(spark, cfg).collect()
    assert (r["client"], r["method"], r["request"], r["bytes"],
            r["duration"]) == ("10.0.0.0", "GET", "/index.html",
                               "15824", "0.043")


def test_file_json_example(spark, tmp_path):
    # file-json.yaml: {"key1":"value1","key2":2} → key1=value1, key2=2
    # (ExpandDepth 1, empty connector, KeepSource false). Schema-less
    # JSON lands in the ``attrs`` map column — same pairs, scalars
    # stringified exactly as the Go plugin emits them; the map shape is
    # the deliberate scale-safe representation (per-event dynamic
    # columns don't exist in a DataFrame; the SPL front-end offers the
    # exhaustive flat expansion where column output is required).
    logdir = tmp_path / "logs"; logdir.mkdir()
    (logdir / "a.log").write_text('{"key1":"value1","key2":2}\n')
    cfg = _load_patched("file-json.yaml", logdir, tmp_path)
    [r] = run_config(spark, cfg).collect()
    assert r["attrs"] == {"key1": "value1", "key2": "2"}
    assert r["content"] is None  # KeepSource: false drops the raw field


def test_multiline_java_stack_trace_example(spark, tmp_path):
    # multiline_java_stack_trace-split_log_regex.yaml: the three
    # documented lines merge into ONE event on the date-prefix header
    lines = (
        "2022-08-09 14:47:17  [ main:1 ] - [ ERROR ] "
        "com.aliyun.NullPointerTest.main(NullPointerTest.java:13) Param Error\n"
        "java.lang.NullPointerException\n"
        "\tat com.aliyun.NullPointerTest.main(NullPointerTest.java:11)\n"
    )
    logdir = tmp_path / "logs"; logdir.mkdir()
    cfg = _load_patched(
        "multiline_java_stack_trace-split_log_regex.yaml", logdir, tmp_path)
    # the reference's file reader hands the splitter a raw multi-line
    # BLOCK (splitting blocks into logs is the splitter's whole job), so
    # the blob goes in via the df hook; processors stay verbatim
    df = spark.createDataFrame([(lines.rstrip("\n"),)], "content string")
    rows = run_config(spark, cfg, df=df).collect()
    # the documented After Process: ONE event carrying all three lines.
    # (Go fullMatch requires the WHOLE line to match; the YAML's \s\[
    # pattern doesn't cover the doc line's double space, so the header
    # never opens a new event even in the reference — splitting only
    # kicks in on single-space headers, asserted below.)
    assert len(rows) == 1 and rows[0]["content"] == lines.rstrip("\n")

    one_space = lines.replace("17  [", "17 [")
    two_events = one_space + one_space.replace("14:47:17", "14:47:18")
    df2 = spark.createDataFrame([(two_events.rstrip("\n"),)], "content string")
    rows2 = sorted(run_config(spark, cfg, df=df2).collect(),
                   key=lambda r: r["content"])
    assert len(rows2) == 2
    assert rows2[0]["content"] == one_space.rstrip("\n")
    assert "14:47:18" in rows2[1]["content"]


def test_input_command_example_processor_chain(spark, tmp_path):
    """input_command.yaml's PROCESSOR chain verbatim (regex →
    add_fields → log_to_sls_metric). The script itself probes the host
    (ifconfig/ss/ntpdate), so its documented output lines
    ('$hostname $ip <metric> <value>') stand in as the input fixture —
    the input adapter has its own oracle (`command_input`)."""
    with open(f"{EXAMPLES}/input_command.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg = PipelineConfig.parse(yaml.dump(
        {"enable": True, "processors": cfg["processors"],
         "flushers": [{"Type": "flusher_stdout", "OnlyStdout": True}]}))
    df = spark.createDataFrame(
        [("host-1 10.1.2.3 port_used 42",),
         ("host-1 10.1.2.3 pro_zombie 0",),
         ("host-1 10.1.2.3 time_diff 0.02",)],
        "content string")
    rows = run_config(spark, cfg, df=df).collect()
    metrics = {r["__labels__"]: r["__value__"] for r in rows}
    assert metrics == {
        "hostname#$#host-1|ip#$#10.1.2.3|metrics_type#$#port_used": "42",
        "hostname#$#host-1|ip#$#10.1.2.3|metrics_type#$#pro_zombie": "0",
        "hostname#$#host-1|ip#$#10.1.2.3|metrics_type#$#time_diff": "0.02",
    }
    # the metric NAME comes from the 'Metric' FIELD's VALUE (set to
    # op_metrics by the add_fields step), not from the dict key
    # (processor_log_to_sls_metric.go:312-322 names[name])
    assert all(r["__name__"] == "op_metrics" for r in rows)
