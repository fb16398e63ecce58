"""Replay of the reference's e2e test cases (test/e2e/test_cases/*/
case.feature) — the feature files are read from the reference tree at
runtime, never vendored. A minimal extractor pulls each scenario's
pipeline YAML and its Then-assertions (at-least count, field list,
field/tag regex maps); the docker-compose environment steps become
local equivalents (file mounts → tmp copies, HTTP POST bodies → df
rows). Cases needing a real broker/DB/container runtime are out of
scope here and covered by their unit contracts instead.
"""

import json
import os
import re
import shutil

import pytest
import yaml

from pyspark.sql import functions as F

from loongcollector_spark.config import PipelineConfig, run_config

CASES = "/root/reference/test/e2e/test_cases"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CASES), reason="reference tree not present")


def parse_feature(case: str) -> dict:
    """Extract config + assertions from a case.feature file."""
    text = open(f"{CASES}/{case}/case.feature").read()
    blocks = re.findall(r'"""\n(.*?)"""', text, re.S)
    out = {"config": None, "at_least": None, "field_list": None,
           "field_kv": None, "tag_kv": None}
    # walk the steps in order, pairing each with its following block
    steps = re.findall(
        r'(Given[^\n]*config as below|Then the log fields match as below'
        r'|Then the log fields match kv|Then the log tags match kv)'
        r'[^\n]*\n\s+"""\n(.*?)"""', text, re.S)
    for step, block in steps:
        if "config as below" in step:
            out["config"] = block
        elif "fields match as below" in step:
            out["field_list"] = yaml.safe_load(block)
        elif "fields match kv" in step:
            out["field_kv"] = yaml.safe_load(block)
        elif "tags match kv" in step:
            out["tag_kv"] = yaml.safe_load(block)
    m = re.search(r"at least \{(\d+)\} logs", text)
    if m:
        out["at_least"] = int(m.group(1))
    assert out["config"], f"no config block in {case}"
    return out


def _patched_config(case: dict, file_map: dict[str, str]) -> PipelineConfig:
    cfg = yaml.safe_load(case["config"])
    for inp in cfg.get("inputs", []):
        if "FilePaths" in inp:
            inp["FilePaths"] = [
                file_map.get(p, p) for p in inp["FilePaths"]]
        # container discovery needs a container runtime — the filter
        # keys are deployment-side, not data semantics
        inp.pop("EnableContainerDiscovery", None)
        inp.pop("ContainerFilters", None)
    cfg.setdefault("flushers", [])
    cfg["flushers"] = [f for f in cfg["flushers"]
                       if f.get("Type") != "flusher_sls"]
    return PipelineConfig.parse(yaml.dump(cfg))


def check_kv(rows, kv, colmap=None):
    """Every asserted key must exist and every row's value match the
    anchored-or-search regex (the harness uses re.MatchString —
    unanchored search)."""
    for key, rx in kv.items():
        col = (colmap or {}).get(key, key)
        for r in rows:
            v = r[col]
            assert v is not None, (key, col)
            assert re.search(rx, str(v)), (key, rx, v)


def test_input_mock_log_case(spark):
    case = parse_feature("input_mock_log")
    cfg = _patched_config(case, {})
    rows = run_config(spark, cfg).collect()
    assert len(rows) >= case["at_least"]
    for field in case["field_list"]:
        assert field in rows[0].asDict(), field
    assert rows[0]["tag1"] == "aaaa" and rows[0]["content"] == "xxxxxx"


def test_input_static_file_case(spark, tmp_path):
    case = parse_feature("input_static_file")
    # "mount {./a.log} to {/root/test/1/2/3/axxxx.log}" with the glob
    # /root/test/**/a*.log → same nesting under tmp
    dest = tmp_path / "test" / "1" / "2" / "3"
    dest.mkdir(parents=True)
    shutil.copy(f"{CASES}/input_static_file/a.log", dest / "axxxx.log")
    cfg = _patched_config(
        case, {"/root/test/**/a*.log": f"{tmp_path}/test/*/*/*/a*.log"})
    rows = run_config(spark, cfg).collect()
    assert len(rows) >= case["at_least"]          # at least 1000
    check_kv(rows, {k: v for k, v in case["field_kv"].items()
                    if k != "__tag__:__path__"})
    # the __tag__:__path__ regex pins the MOUNT target; our provenance
    # column pins the same file at the same nesting under tmp
    assert all(r["_ingest_file"].endswith("/1/2/3/axxxx.log") for r in rows)


def test_reader_flush_timeout_case(spark, tmp_path):
    case = parse_feature("reader_flush_timeout")
    logdir = tmp_path / "test"
    logdir.mkdir()
    shutil.copy(f"{CASES}/reader_flush_timeout/a.log", logdir / "simple.log")
    # run.sh appends an UNTERMINATED 5th line after 5 s — the event the
    # FlushTimeoutSecs reader must still emit
    with open(logdir / "simple.log", "a") as f:
        f.write("5=====")
    cfg = _patched_config(
        case, {"/root/test/simple.log": f"{logdir}/simple.log"})
    rows = run_config(spark, cfg).collect()
    assert len(rows) >= case["at_least"]
    assert any(r["content"] == "5=====" for r in rows)


def test_aggregator_context_case(spark, tmp_path):
    case = parse_feature("aggregator_context")
    logdir = tmp_path / "test"
    logdir.mkdir()
    (logdir / "example.log").write_text(
        "".join(f"{i}|message-{i}\n" for i in range(1, 201)))
    cfg = _patched_config(
        case, {"/root/test/example.log": f"{logdir}/example.log"})
    df = run_config(spark, cfg)
    assert df.count() >= case["at_least"]
    # "the context of log is valid": per-source order is preserved —
    # the split rows keep their file order (aggregator_context.go keeps
    # per-source sequence; ours sorts within partitions on provenance)
    rows = df.orderBy("_line_idx").collect()
    nos = [int(r["no"]) for r in rows]
    assert nos == sorted(nos)
    assert rows[0]["no"] == "1" and rows[0]["content"] == "message-1"


def test_input_http_server_case(spark):
    from loongcollector_spark.operators import build_operator

    case = parse_feature("input_http_server")
    cfg = yaml.safe_load(case["config"])
    http_cfg = cfg["inputs"][0]
    # the POSTed url is ?db=mydb — the form value reaches the decoder
    # as the DB parameter (decoder.go:160)
    op = build_operator({**http_cfg, "Address": None, "DB": "mydb",
                         "Type": "service_http_server"})
    body = "weather,city=hz value=32"
    df = spark.createDataFrame([(body,)], "content string")
    rows = op(df).collect()
    assert len(rows) >= case["at_least"]
    check_kv(rows, {k: v for k, v in case["field_kv"].items()
                    if k != "__tag__:db"})
    assert rows[0]["__tag__:db"] == "mydb"


def test_input_prometheus_case(spark):
    """service_prometheus scrapes an exporter and emits SLS metric
    events; the scrape loop is deployment-side — the exporter's
    exposition payload goes through the same parse + event conversion
    (ProcessorPromParseMetricNative path)."""
    from loongcollector_spark.operators.prom import (
        prom_parse_metric, to_sls_metric_events)

    case = parse_feature("input_prometheus")
    exposition = "\n".join(
        [f'scrape_counter{{job="prometheus",instance="exporter:18080",'
         f'shard="{i}"}} {i * 1.5} 171582978{i:04d}' for i in range(12)]
    )
    df = spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(exposition.split("\n"))],
        "line_id long, content string")
    out = to_sls_metric_events(prom_parse_metric(df, "content"))
    rows = out.collect()
    assert len(rows) >= case["at_least"]
    for field in case["field_list"]:
        assert field in rows[0].asDict(), field
    assert rows[0]["__name__"] == "scrape_counter"
    assert "job#$#prometheus" in rows[0]["__labels__"]
    assert rows[0]["__time_nano__"].endswith("000000")


def test_input_http_case(spark):
    """metric_http polls the configured address and emits the probe
    field contract; the transport is injected (no egress here), the
    anchor processor chain from the config runs verbatim."""
    import yaml as _yaml

    from loongcollector_spark import sources
    from loongcollector_spark.operators import build_operator

    case = parse_feature("input_http")
    cfg = _yaml.safe_load(case["config"])
    http = cfg["inputs"][0]

    def fake_probe(addr):
        return ("success", 200, 12.3456, '{"status":"ok"}')

    df = sources.metric_http(
        spark, http["Addresses"], include_body=http["IncludeBody"],
        prober=fake_probe)
    # IntervalMs repetition is the deployment loop; four ticks → union
    for _ in range(3):
        df = df.unionByName(sources.metric_http(
            spark, http["Addresses"], include_body=http["IncludeBody"],
            prober=fake_probe))
    for proc in cfg["processors"]:
        df = build_operator(proc)(df)
    rows = df.collect()
    assert len(rows) >= case["at_least"]
    for field in case["field_list"]:
        assert field in rows[0].asDict(), field
    r = rows[0]
    assert (r["_result_"], r["_http_response_code_"]) == ("success", "200")
    assert r["_response_time_ms_"] == "12.346"  # 3-decimal contract
    assert r["_address_"] == http["Addresses"][0]


def test_flusher_http_case_influx_roundtrip(spark):
    """flusher_http with Convert.Protocol=influxdb: the mock metric
    rows serialize to influx line protocol (what the case POSTs into
    influxdb) and the independent influx DECODER recovers exactly the
    asserted fields — a closed-loop replay of the subscriber check.
    The request-breaker interceptor and Query templating are transport
    concerns."""
    import yaml as _yaml

    from loongcollector_spark.config import PipelineConfig, run_config
    from loongcollector_spark.operators.decoders import influx_decode
    from loongcollector_spark.serializer import influxdb_line_column

    case = parse_feature("flusher_http")
    cfg = _yaml.safe_load(case["config"])
    cfg["flushers"] = []
    pipeline = PipelineConfig.parse(_yaml.dump(cfg))
    df = run_config(spark, pipeline)
    assert df.count() >= case["at_least"]  # mock rows survive grouping

    lines = df.select(influxdb_line_column(df).alias("line"))
    decoded = influx_decode(lines, "line", fields_extend=True)
    rows = decoded.collect()
    assert len(rows) >= case["at_least"]
    check_kv(rows, {k: v for k, v in case["field_kv"].items()
                    if k in ("__name__", "__value__", "__labels__",
                             "__type__", "__time_nano__")})


def _cri_lines(spark, lines, stream="stdout"):
    rows = [
        (f"2024-01-01T00:00:{i:02d}.000000000Z {stream} F {ln}", "c.log", i)
        for i, ln in enumerate(lines)
    ]
    return spark.createDataFrame(
        rows, "content string, _ingest_file string, _line_idx long")


def test_input_container_stdio_case(spark):
    """Container stdout in containerd CRI format through the parse with
    the case's stream filters; the _image_name_/_container_name_/
    _container_ip_ TAGS are container-discovery runtime metadata
    (deployment-side), the FIELD assertions replay."""
    from loongcollector_spark.operators import build_operator

    case = parse_feature("input_container_stdio")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    op = build_operator({
        "Type": "processor_parse_container_log", "SourceKey": "content",
        "IgnoringStdout": cfg.get("IgnoringStdout", False),
        "IgnoringStderr": cfg.get("IgnoringStderr", False),
    })
    df = _cri_lines(spark, ["hello"]).unionByName(
        _cri_lines(spark, ["noise"], stream="stderr"))
    rows = op(df).collect()
    assert len(rows) >= case["at_least"]
    check_kv(rows, case["field_kv"])  # content ^hello$, _time_ RFC3339,
    assert all(r["_source_"] == "stdout" for r in rows)  # stderr ignored


def test_input_container_stdio_multiline_case(spark):
    """The multiline variant: CRI lines 'today' + 'hello' merge into one
    event under the input-level Multiline StartPattern."""
    from loongcollector_spark.operators import build_operator

    case = parse_feature("input_container_stdio_multiline")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    parse = build_operator({
        "Type": "processor_parse_container_log", "SourceKey": "content",
        "IgnoringStderr": cfg.get("IgnoringStderr", False),
    })
    merge = build_operator({
        "Type": "processor_merge_multiline_log", "SourceKey": "content",
        "MergeType": "regex", **cfg["Multiline"],
        "GroupKeys": ["_ingest_file"], "OrderKey": "_line_idx",
    })
    parsed = parse(_cri_lines(spark, ["today", "hello"]))
    assert all(r["_source_"] == "stdout" for r in parsed.collect())
    rows = merge(parsed).collect()
    assert len(rows) >= case["at_least"]
    assert rows[0]["content"] == "today\nhello"  # the case's field regex
    check_kv(rows, {"content": case["field_kv"]["content"]})


def parse_scenarios(case: str) -> list[dict]:
    """Like parse_feature but one dict per Scenario (some features
    carry several — e.g. the kafka dynamic-topic content + tag pair)."""
    text = open(f"{CASES}/{case}/case.feature").read()
    out = []
    for chunk in re.split(r"\n  @e2e", text)[1:]:
        d = {"config": None, "at_least": None, "field_kv": None}
        steps = re.findall(
            r'(Given[^\n]*config as below|Then the log fields match kv)'
            r'[^\n]*\n\s+"""\n(.*?)"""', chunk, re.S)
        for step, block in steps:
            if "config as below" in step:
                d["config"] = block
            else:
                d["field_kv"] = yaml.safe_load(block)
        m = re.search(r"at least \{(\d+)\} logs", chunk)
        d["at_least"] = int(m.group(1)) if m else 1
        # the local-config step block is the PIPELINE yaml; skip the
        # subscriber-config block that precedes it
        assert d["config"] and "inputs" in d["config"], case
        out.append(d)
    return out


def _kafka_case_frame(spark, tmp_path, scenario, lines):
    """Run a kafka-flusher scenario's input+processors, then build the
    payload frame the flusher would ship (no broker in container)."""
    from loongcollector_spark.flushers import kafka_payload_frame

    cfg = yaml.safe_load(scenario["config"])
    logdir = tmp_path / "test" / "1" / "2" / "3"
    logdir.mkdir(parents=True, exist_ok=True)
    (logdir / "input.log").write_text("".join(l + "\n" for l in lines))
    for inp in cfg["inputs"]:
        inp["FilePaths"] = [f"{tmp_path}/test/*/*/*/input.log"]
    fl = cfg["flushers"][0]
    cfg["flushers"] = []
    df = run_config(spark, PipelineConfig.parse(yaml.dump(cfg)))
    return kafka_payload_frame(
        df, fl.get("PartitionerType", "random"), fl.get("HashKeys", []),
        topic=fl["Topic"] if "%{" in fl["Topic"] else None,
        headers=fl.get("Headers", [])), fl


def test_flusher_kafka_dynamic_topic_content_case(spark, tmp_path):
    """Scenario 1: Topic app-%{content.service} — every message routes
    to app-serviceA (run.sh emits {"service":"serviceA",...} JSON)."""
    scenario = parse_scenarios("flusher_kafka_native_dynamic_topic")[0]
    lines = ['{"env":"prod","service":"serviceA","msg":"hello-%d"}' % i
             for i in range(1, 31)]
    frame, _ = _kafka_case_frame(spark, tmp_path, scenario, lines)
    rows = frame.collect()
    assert len(rows) >= scenario["at_least"]
    check_kv(rows, {"topic": scenario["field_kv"]["topic"]})
    import json as _json
    assert all(_json.loads(r["value"])["content"] for r in rows)


def test_flusher_kafka_dynamic_topic_tag_case(spark, tmp_path):
    """Scenario 2: Topic app-%{tag.__hostname__} — the host tag rides
    into the topic; missing tag falls back to the raw template
    (FlusherKafka.cpp:181-185)."""
    from loongcollector_spark.flushers import format_topic_column

    scenario = parse_scenarios("flusher_kafka_native_dynamic_topic")[1]
    lines = ['{"service":"serviceA","msg":"hello-%d"}' % i
             for i in range(1, 31)]
    cfg = yaml.safe_load(scenario["config"])
    topic = cfg["flushers"][0]["Topic"]
    df = spark.createDataFrame(
        [(l, "loongcollector") for l in lines],
        "content string, __hostname__ string")
    out = df.select(format_topic_column(df, topic).alias("topic")).collect()
    assert all(r["topic"] == "app-loongcollector" for r in out)
    # tag column absent → per-event format fails → raw template survives
    bare = df.drop("__hostname__")
    fb = bare.select(format_topic_column(bare, topic).alias("t")).first()
    assert fb["t"] == topic


def test_flusher_kafka_headers_case(spark, tmp_path):
    """Static Headers (KafkaConfig.h:117-134) attach to every message;
    the case asserts header.h1=v1 / header.h2=v2 on the consumed side."""
    scenario = parse_scenarios("flusher_kafka_native_headers")[0]
    lines = [f"hello-{i}" for i in range(1, 31)]
    frame, fl = _kafka_case_frame(spark, tmp_path, scenario, lines)
    rows = frame.collect()
    assert len(rows) >= scenario["at_least"]
    want = {h["key"]: h["value"] for h in fl["Headers"]}
    for r in rows:
        got = {h["key"]: bytes(h["value"]).decode() for h in r["headers"]}
        assert got == want
    check_kv(rows, {"topic": scenario["field_kv"]["topic"]}) if \
        "topic" in frame.columns else None


def _docker_json_lines(spark, logs, stream="stdout"):
    """json-file driver lines: complete lines carry a trailing \\n in
    the `log` value (the docker daemon appends it)."""
    rows = [
        (json.dumps({"log": ln, "stream": stream,
                     "time": f"2024-01-01T00:00:{i:02d}.000000000Z"}),
         "c.log", i)
        for i, ln in enumerate(logs)
    ]
    return spark.createDataFrame(
        rows, "content string, _ingest_file string, _line_idx long")


_DISCOVERY_TAGS = {
    "_image_name_": "e2e-container:latest",
    "_container_name_": "e2e-container-1",
    "_container_ip_": "172.20.0.2",
}


def test_input_docker_stdout_case(spark):
    """service_docker_stdout over json-file lines: the stdout stream
    collects with _time_/_source_ + discovery tags; IncludeEnv is the
    container-selection filter (deployment-side)."""
    from loongcollector_spark.operators import build_operator

    case = parse_feature("input_docker_stdout")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    assert cfg["Type"] == "service_docker_stdout"
    op = build_operator({"Type": cfg["Type"], "Tags": _DISCOVERY_TAGS})
    df = _docker_json_lines(spark, ["hello\n"])
    rows = op(df).collect()
    assert len(rows) >= case["at_least"]
    check_kv(rows, case["field_kv"])


def test_input_docker_stdout_multiline_case(spark):
    """BeginLineRegex multiline: 'today' opens an event, following lines
    append — content ^today\\nhello$ exactly as the case asserts."""
    from loongcollector_spark.operators import build_operator

    case = parse_feature("input_docker_stdout_multiline")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    op = build_operator({
        "Type": cfg["Type"], "Tags": _DISCOVERY_TAGS,
        "BeginLineRegex": cfg["BeginLineRegex"],
        "Stdout": cfg.get("Stdout", True),
    })
    df = _docker_json_lines(spark, ["today\n", "hello\n"])
    rows = op(df).collect()
    assert len(rows) >= case["at_least"]
    assert rows[0]["content"] == "today\nhello"
    check_kv(rows, case["field_kv"])


def test_input_docker_rawstdout_case(spark):
    """service_docker_stdout_raw over attach-with-timestamps lines
    `<rfc3339> <content>`."""
    from loongcollector_spark.operators import build_operator

    case = parse_feature("input_docker_rawstdout")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    assert cfg["Type"] == "service_docker_stdout_raw"
    op = build_operator({"Type": cfg["Type"], "Tags": _DISCOVERY_TAGS})
    df = spark.createDataFrame(
        [(f"2024-01-01T00:00:0{i}.000000000Z hello", "c", i)
         for i in range(2)],
        "content string, _ingest_file string, _line_idx long")
    rows = op(df).collect()
    assert len(rows) >= case["at_least"]
    check_kv(rows, case["field_kv"])


def test_input_docker_rawstdout_multiline_case(spark):
    """The raw variant's multiline config (same service, BeginLineRegex
    absent in the case config — single lines stay single)."""
    from loongcollector_spark.operators import build_operator

    case = parse_feature("input_docker_rawstdout_multiline")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    op = build_operator({"Type": cfg["Type"], "Tags": _DISCOVERY_TAGS})
    df = spark.createDataFrame(
        [("2024-01-01T00:00:01.000000000Z hello", "c", 0)],
        "content string, _ingest_file string, _line_idx long")
    rows = op(df).collect()
    assert len(rows) >= case["at_least"]
    check_kv(rows, case["field_kv"])


def test_input_docker_event_case(spark):
    """service_docker_event: daemon events → _time_nano_/_action_/
    _type_/_id_ fields (the daemon subscription is deployment-side)."""
    from loongcollector_spark.operators import build_operator

    case = parse_feature("input_docker_event")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    op = build_operator({"Type": cfg["Type"],
                         "IntervalMs": cfg.get("IntervalMs")})
    df = spark.createDataFrame(
        [(1700000000000000000, "die", "container", "abc123"),
         (1700000000500000000, "disconnect", "network", "def456")],
        "time_nano long, action string, type string, id string")
    rows = op(df).collect()
    assert len(rows) >= case["at_least"]
    check_kv(rows, case["field_kv"])


def test_input_docker_static_file_case(spark, tmp_path):
    """input_file with a `**` any-depth glob (MaxDirSearchDepth): 1000
    lines from a file four directories deep, path provenance intact."""
    case = parse_feature("input_docker_static_file")
    deep = tmp_path / "a" / "b" / "c" / "d"
    deep.mkdir(parents=True)
    target = deep / "axxxxxxx.log"
    target.write_text(
        "".join(f"{i}====================\n" for i in range(1000)))
    (tmp_path / "a" / "other.log").write_text("decoy\n")  # fails a*.log

    cfg = _patched_config(case, {"/root/test/**/a*.log":
                                 f"{tmp_path}/**/a*.log"})
    out = run_config(spark, cfg)
    rows = out.collect()
    assert len(rows) >= case["at_least"]
    check_kv(rows, case["field_kv"])
    assert all(r["_ingest_file"].endswith("/a/b/c/d/axxxxxxx.log")
               for r in rows)  # the case's __path__ tag, container-relative


def test_input_mock_metric_case(spark):
    """metric_mock with OpenPrometheusPattern: each tick is one metric
    event with the __name__/__time_nano__/__labels__/__value__ contract
    and labels = sorted tags+fields pairs."""
    case = parse_feature("input_mock_metric")
    cfg = _patched_config(case, {})
    out = run_config(spark, cfg)
    rows = out.collect()
    assert len(rows) >= case["at_least"]
    assert set(out.columns) == set(case["field_list"])
    labels = rows[0]["__labels__"]
    got_keys = [p.split("#$#")[0] for p in labels.split("|")]
    assert got_keys == sorted(["content", "tag1", "tag2", "time"])
    assert all(re.fullmatch(r"[0-9]+", r["__time_nano__"]) for r in rows)


def test_input_mysql_case(spark):
    """service_mysql's checkpointed StateMent sync (rdb.go:218-299)
    replayed on embedded Derby: the ? placeholder binds the saved
    checkpoint, rows past it collect, the checkpoint advances to
    max(CheckPointColumn) and a re-sync returns only newer rows."""
    from loongcollector_spark.sources import rdb_checkpoint, service_rdb

    case = parse_feature("input_mysql")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    assert cfg["Type"] == "service_mysql"

    url = "jdbc:derby:memory:lcs_mysql_case;create=true"
    names = ["INSERT", "SELECT", "CREATE", "GRANT-X", "A<B>", "(JOIN)"]
    # Derby resolves the statement's unquoted identifiers as UPPERCASE;
    # seed with uppercase column names (MySQL itself is case-insensitive)
    seed = spark.createDataFrame(
        [(i, names[i % len(names)]) for i in range(1, 601)],
        "HELP_KEYWORD_ID int, NAME string")
    (seed.write.format("jdbc").option("url", url)
     .option("dbtable", "help_keyword").mode("overwrite").save())

    df = service_rdb(
        spark, url, cfg["StateMent"],
        checkpoint_column=cfg["CheckPointColumn"],
        checkpoint_value=cfg["CheckPointStart"],
        checkpoint_type=cfg["CheckPointColumnType"],
        num_partitions=4,
    )
    rows = df.collect()
    assert len(rows) >= case["at_least"]
    assert {c.lower() for c in df.columns} >= set(case["field_list"])
    check_kv(rows, case["field_kv"], colmap={"help_keyword_id": "HELP_KEYWORD_ID",
                                             "name": "NAME"})

    # checkpoint advance: re-sync sees nothing, new rows sync alone
    cp = rdb_checkpoint(df, cfg["CheckPointColumn"].upper())
    assert cp == "600"
    again = service_rdb(
        spark, url, cfg["StateMent"],
        checkpoint_column=cfg["CheckPointColumn"],
        checkpoint_value=cp, checkpoint_type="int")
    assert again.count() == 0
    more = spark.createDataFrame([(601, "UPDATE")],
                                 "HELP_KEYWORD_ID int, NAME string")
    (more.write.format("jdbc").option("url", url)
     .option("dbtable", "help_keyword").mode("append").save())
    assert [r["HELP_KEYWORD_ID"] for r in again.collect()] == [601]


def test_reader_log_rotate_case(spark, tmp_path):
    """Rotation (reader_log_rotate/run.sh): simple.log accrues an
    unterminated '5=====', rotates to simple.log.1, the fresh file gets
    '6====='. The rotated sibling keeps collecting — all 6 lines, each
    exactly once."""
    case = parse_feature("reader_log_rotate")
    vol = tmp_path / "vol"
    vol.mkdir()
    (vol / "simple.log").write_text(
        "1=====\n2=====\n3=====\n4=====\n5=====")  # no trailing newline
    (vol / "simple.log").rename(vol / "simple.log.1")
    (vol / "simple.log").write_text("6=====\n")

    cfg = _patched_config(
        case, {"/root/test/simple.log": f"{vol}/simple.log*"})
    out = run_config(spark, cfg)
    got = sorted(r["content"] for r in out.collect())
    assert len(got) >= case["at_least"]
    assert got == [f"{i}=====" for i in range(1, 7)]


def test_reader_deleted_case(spark, tmp_path):
    """reader_deleted: the unterminated tail of a file must flush before
    deletion — the batch read of the pre-delete snapshot emits it."""
    case = parse_feature("reader_deleted")
    f = tmp_path / "simple.log"
    f.write_text("1=====\n2=====\n3=====\n4=====\n5=====")
    cfg = _patched_config(case, {"/root/test/simple.log": str(f)})
    out = run_config(spark, cfg)
    got = sorted(r["content"] for r in out.collect())
    assert len(got) >= case["at_least"]
    assert "5=====" in got  # the no-newline tail is an event


def test_reader_new_line_after_timeout_case(spark, tmp_path):
    """reader_new_line_after_timeout: '5=====' flushes on timeout, the
    later '\\n6=====' starts a NEW event — final splits are stable (no
    '5=====6' merge, no re-emit)."""
    case = parse_feature("reader_new_line_after_timeout")
    f = tmp_path / "a.log"
    f.write_text("1=====\n2=====\n3=====\n4=====\n")
    with open(f, "a") as fh:
        fh.write("5=====")       # timeout flush point
        fh.write("\n6=====\n")   # the run.sh follow-up append
    cfg = _patched_config(case, {"/root/test/a.log": str(f)})
    out = run_config(spark, cfg)
    got = sorted(r["content"] for r in out.collect())
    assert len(got) >= case["at_least"]
    assert got == [f"{i}=====" for i in range(1, 7)]


# ---------------------------------------------------------------------------
# kafka producer-option cases: the security/compression/version variants
# configure the PRODUCER, not the payload — replayed as config → Java
# producer option mapping (kafka_producer_options), no broker needed.
# ---------------------------------------------------------------------------

def _kafka_case_flusher(case: str) -> dict:
    """The flusher dict from a kafka e2e case's local-config block."""
    text = open(f"{CASES}/{case}/case.feature").read()
    m = re.search(
        r'local config as below[^\n]*\n\s+"""\n(.*?)"""', text, re.S)
    cfg = yaml.safe_load(m.group(1))
    return cfg["flushers"][0]


def test_flusher_kafka_tls_case_options():
    from loongcollector_spark.flushers import kafka_producer_options

    fl = _kafka_case_flusher("flusher_kafka_native_tls")
    opts = kafka_producer_options(fl)
    assert opts["kafka.bootstrap.servers"] == "kafka:29093"
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.ssl.truststore.location"] == "/etc/kafka/ssl/ca.crt"
    assert "kafka.sasl.mechanism" not in opts


def test_flusher_kafka_sasl_plain_case_options():
    from loongcollector_spark.flushers import kafka_producer_options

    fl = _kafka_case_flusher("flusher_kafka_native_sasl_plain")
    opts = kafka_producer_options(fl)
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert opts["kafka.sasl.jaas.config"] == (
        'org.apache.kafka.common.security.plain.PlainLoginModule required '
        'username="user" password="pass";')


def test_flusher_kafka_kerberos_case_options():
    from loongcollector_spark.flushers import kafka_producer_options

    fl = _kafka_case_flusher("flusher_kafka_native_kerberos")
    opts = kafka_producer_options(fl)
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert opts["kafka.sasl.mechanism"] == "GSSAPI"
    assert opts["kafka.sasl.kerberos.service.name"] == "kafka"
    assert 'keyTab="/var/kerberos/client.keytab"' in opts[
        "kafka.sasl.jaas.config"]
    assert 'principal="client@EXAMPLE.COM"' in opts["kafka.sasl.jaas.config"]
    # MessageTimeoutMs 60000 → Java delivery.timeout.ms
    assert opts["kafka.delivery.timeout.ms"] == "60000"
    # CustomConfig "Kafka: debug" passthrough (KafkaConfig.h:138-141)
    assert opts["kafka.debug"] == "security,broker"


def test_flusher_kafka_compression_case_options():
    from loongcollector_spark.flushers import kafka_producer_options

    fl = _kafka_case_flusher("flusher_kafka_native_compression")
    opts = kafka_producer_options(fl)
    assert opts["kafka.compression.type"] == "gzip"
    assert opts["kafka.max.request.size"] == "5242880"
    assert opts["kafka.linger.ms"] == "200"


@pytest.mark.parametrize("case", [
    "flusher_kafka_native_0.10.x", "flusher_kafka_native_1.x.x",
    "flusher_kafka_native_2.x.x", "flusher_kafka_native_3.x.x"])
def test_flusher_kafka_version_cases_options(case):
    """The 4-broker-version matrix: every case's config builds a valid
    option map (version accepted incl. the 4-part 0.10.2.1) with the
    delivery knobs mapped (KafkaProducer.cpp:309-330)."""
    from loongcollector_spark.flushers import kafka_producer_options

    fl = _kafka_case_flusher(case)
    opts = kafka_producer_options(fl)
    assert opts["kafka.acks"] == str(fl.get("RequiredAcks", 1))
    assert opts["kafka.retries"] == str(fl.get("MaxRetries", 3))
    assert opts["kafka.request.timeout.ms"] == str(fl.get("Timeout", 30000))
    assert opts["kafka.buffer.memory"] == str(
        fl.get("QueueBufferingMaxKbytes", 1048576) * 1024)


def test_kafka_producer_options_validation(tmp_path):
    """AuthConfig::Validate parity (AuthConfig.cpp:70-107) + version
    grammar (KafkaUtil.cpp:42-89) + PEM keystore inlining (KIP-651)."""
    from loongcollector_spark.flushers import kafka_producer_options

    base = {"Brokers": ["b:9092"], "Topic": "t"}
    with pytest.raises(ValueError, match="Username and Password"):
        kafka_producer_options(
            {**base, "Authentication": {"SASL": {"Mechanism": "PLAIN",
                                                 "Username": "u"}}})
    with pytest.raises(ValueError, match="CertFile and KeyFile"):
        kafka_producer_options(
            {**base, "Authentication": {"TLS": {"Enabled": True,
                                                "CertFile": "c.pem"}}})
    with pytest.raises(ValueError, match="Principal and Keytab"):
        kafka_producer_options(
            {**base, "Authentication": {"Kerberos": {"Enabled": True}}})
    with pytest.raises(ValueError, match="cannot be enabled together"):
        kafka_producer_options(
            {**base, "Authentication": {
                "Kerberos": {"Enabled": True, "Principal": "p",
                             "Keytab": "k"},
                "SASL": {"Mechanism": "PLAIN", "Username": "u",
                         "Password": "p"}}})
    with pytest.raises(ValueError, match="invalid Version"):
        kafka_producer_options({**base, "Version": "2.x"})
    # SCRAM mechanism → ScramLoginModule; TLS+SASL → SASL_SSL
    cert = tmp_path / "client.pem"; cert.write_text("CERTPEM\n")
    key = tmp_path / "client.key"; key.write_text("KEYPEM\n")
    opts = kafka_producer_options({**base, "Authentication": {
        "TLS": {"Enabled": True, "CertFile": str(cert), "KeyFile": str(key),
                "KeyPassword": "kp"},
        "SASL": {"Mechanism": "SCRAM-SHA-256", "Username": "u",
                 "Password": "pw"}}})
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert "ScramLoginModule" in opts["kafka.sasl.jaas.config"]
    assert opts["kafka.ssl.keystore.certificate.chain"] == "CERTPEM\n"
    assert opts["kafka.ssl.keystore.key"] == "KEYPEM\n"
    assert opts["kafka.ssl.key.password"] == "kp"


def test_input_pgsql_case(spark):
    """service_pgsql's $1-placeholder checkpoint sync (rdb.go:218-299;
    the pgsql driver numbers its params) replayed on embedded Derby with
    the case's init.sql table shape."""
    from loongcollector_spark.sources import rdb_checkpoint, service_rdb

    case = parse_feature("input_pgsql")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    assert cfg["Type"] == "service_pgsql" and "$1" in cfg["StateMent"]

    url = "jdbc:derby:memory:lcs_pgsql_case;create=true"
    # init.sql shape: id / time / alarmtype / ip / count ("TIME" and
    # "COUNT" need delimited identifiers on Derby, so seed via SQL DDL)
    seed = spark.createDataFrame(
        [(i, "2026-01-01 00:00:00", "NO_ALARM", "10.10.***.***", i - 1)
         for i in range(1, 21)],
        "ID int, TIME string, ALARMTYPE string, IP string, COUNT int")
    (seed.write.format("jdbc").option("url", url)
     .option("dbtable", "specialalarmtest").mode("overwrite").save())

    df = service_rdb(
        spark, url, cfg["StateMent"],
        checkpoint_column=cfg["CheckPointColumn"],
        checkpoint_value=cfg["CheckPointStart"],
        checkpoint_type=cfg["CheckPointColumnType"],
        max_sync_size=cfg.get("MaxSyncSize", 0),
        num_partitions=4,
    )
    rows = df.collect()
    assert len(rows) >= case["at_least"]
    assert {c.lower() for c in df.columns} >= {
        f.strip() for f in case["field_list"]}
    cp = rdb_checkpoint(df, cfg["CheckPointColumn"].upper())
    assert cp == "20"
    assert service_rdb(
        spark, url, cfg["StateMent"],
        checkpoint_column=cfg["CheckPointColumn"],
        checkpoint_value=cp, checkpoint_type="int").count() == 0


def test_input_mssql_case(spark):
    """service_mssql's ?-placeholder + ORDER BY statement (the case's
    StateMent) on embedded Derby with the init.sql LogtailTestTable
    shape; MaxSyncSize keeps the LOWEST ids so the checkpoint never
    skips unread rows."""
    from loongcollector_spark.sources import rdb_checkpoint, service_rdb

    case = parse_feature("input_mssql")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    assert cfg["Type"] == "service_mssql"

    url = "jdbc:derby:memory:lcs_mssql_case;create=true"
    seed = spark.createDataFrame(
        [(i, f"item{i}", i * 10) for i in range(1, 301)],
        "ID int, NAME string, QUANTITY int")
    (seed.write.format("jdbc").option("url", url)
     .option("dbtable", "LogtailTestTable").mode("overwrite").save())

    df = service_rdb(
        spark, url, cfg["StateMent"],
        checkpoint_column=cfg["CheckPointColumn"],
        checkpoint_value=cfg["CheckPointStart"],
        checkpoint_type=cfg["CheckPointColumnType"],
        max_sync_size=cfg.get("MaxSyncSize", 0),
        num_partitions=4,
    )
    rows = df.collect()
    assert len(rows) >= case["at_least"]
    assert {c.lower() for c in df.columns} >= {
        f.strip() for f in case["field_list"]}
    # MaxSyncSize=100: the batch is ids 1..100 (ordered paging), so the
    # checkpoint is 100 and the NEXT sync starts there — no skipped rows
    assert len(rows) == cfg["MaxSyncSize"]
    cp = rdb_checkpoint(df, cfg["CheckPointColumn"].upper())
    assert cp == "100"
    nxt = service_rdb(
        spark, url, cfg["StateMent"],
        checkpoint_column=cfg["CheckPointColumn"],
        checkpoint_value=cp, checkpoint_type="int",
        max_sync_size=cfg.get("MaxSyncSize", 0))
    assert [r["ID"] for r in nxt.orderBy("ID").collect()] == list(
        range(101, 201))


def _flusher_case(case: str):
    """(input frame, flusher dict) for a metric_mock-driven flusher case."""
    c = parse_feature(case)
    cfg = yaml.safe_load(c["config"])
    fl = cfg["flushers"][0]
    cfg["flushers"] = []
    return c, cfg, fl


def test_flusher_loki_case(spark, tmp_path):
    """flusher_loki case: mock rows tagged __tag__:name=hello →
    TagFieldsRename maps label loki_name onto that tag → every stream
    carries {loki_name: hello, source: loongcollector} and the lines
    hold the case's value field (the subscriber-side kv assertions)."""
    case, cfg, fl = _flusher_case("flusher_loki")
    df = run_config(spark, PipelineConfig.parse(yaml.dump(cfg)))
    from loongcollector_spark.serializer import loki_streams_frame

    frame = loki_streams_frame(
        df, fl["StaticLabels"], fl["DynamicLabels"],
        tag_fields_rename=fl["Convert"]["TagFieldsRename"])
    payloads = [json.loads(r["payload"]) for r in frame.collect()]
    n = 0
    for p in payloads:
        for s in p["streams"]:
            assert s["stream"]["loki_name"] == "hello"
            assert s["stream"]["source"] == "loongcollector"
            for _, line in s["values"]:
                assert "log contents" in line
                n += 1
    assert n >= case["at_least"]


def test_flusher_clickhouse_case(spark):
    """flusher_clickhouse case: the connection/auth option mapping
    (flusher_clickhouse.go:32-67) from the case's verbatim YAML, plus
    the data round trip through the shared JDBC write path on Derby —
    the landed rows carry the case's asserted _name/_value fields."""
    from loongcollector_spark.flushers import (
        build_flusher, clickhouse_jdbc_options)

    case, cfg, fl = _flusher_case("flusher_clickhouse")
    url, opts = clickhouse_jdbc_options(fl)
    assert url == "jdbc:clickhouse://clickhouse:9000/default"
    assert opts == {}  # empty user/password stay unset
    build_flusher(fl | {"Type": "flusher_clickhouse"})  # validates knobs

    df = run_config(spark, PipelineConfig.parse(yaml.dump(cfg)))
    derby = "jdbc:derby:memory:lcs_ch_case;create=true"
    rows = df.select(F.col("_name").alias("NAME"),
                     F.col("_value").alias("VAL"))
    build_flusher({"Type": "flusher_jdbc", "Url": derby,
                   "Table": fl["Table"], "Mode": "overwrite"})(rows)
    back = (spark.read.format("jdbc").option("url", derby)
            .option("dbtable", fl["Table"]).load().collect())
    assert len(back) >= case["at_least"]
    check_kv(back, {"_name": case["field_kv"]["_name"],
                    "_value": case["field_kv"]["_value"]},
             colmap={"_name": "NAME", "_value": "VAL"})


def test_flusher_doris_case(spark, tmp_path):
    """flusher_doris case: custom_single_flatten json-lines stream-load
    bodies — every landed line carries the case's content/value kv."""
    from loongcollector_spark.flushers import build_flusher

    case, cfg, fl = _flusher_case("flusher_doris")
    df = run_config(spark, PipelineConfig.parse(yaml.dump(cfg)))
    out = str(tmp_path / "doris")
    build_flusher(fl | {"Type": "flusher_doris", "Path": out})(df)
    lines = [json.loads(r["value"])
             for r in spark.read.text(out).collect()]
    assert len(lines) >= case["at_least"]
    for doc in lines:
        assert re.search(case["field_kv"]["content"], doc["content"])
        assert re.search(case["field_kv"]["value"], doc["value"])


def test_flusher_elasticsearch_case(spark, tmp_path):
    """flusher_elasticsearch case: converter docs land under the
    resolved index; the case asserts index+content on what arrives."""
    from loongcollector_spark.flushers import build_flusher, es_doc_frame

    case, cfg, fl = _flusher_case("flusher_elasticsearch")
    df = run_config(spark, PipelineConfig.parse(yaml.dump(cfg)))
    frame = es_doc_frame(df, fl["Index"])
    rows = frame.collect()
    assert len(rows) >= case["at_least"]
    for r in rows:
        assert re.search(case["field_kv"]["index"], r["index"])
        assert re.search(case["field_kv"]["content"],
                         json.loads(r["doc"])["contents"]["Content"])
    out = str(tmp_path / "es")
    build_flusher(fl | {"Type": "flusher_elasticsearch", "Path": out})(df)
    import glob as _glob
    assert _glob.glob(f"{out}/index=default/*.txt")


def test_es_doc_frame_dynamic_index(spark):
    """Dynamic %{content.x} Index (getIndexKeys,
    flusher_elasticsearch.go:155-176) resolves per event."""
    from loongcollector_spark.flushers import es_doc_frame

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "svc string, content string"
    ).withColumn("ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    got = {r["index"] for r in
           es_doc_frame(df, "logs-%{content.svc}").collect()}
    assert got == {"logs-a", "logs-b"}
