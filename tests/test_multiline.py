"""Multiline merge/split: full Start/Continue/End + BY_FLAG semantics.

Scenario expectations mirror the reference unittest
(core/unittest/processor/ProcessorMergeMultilineLogNativeUnittest.cpp,
constants at :26-32) — Java-stack-trace begin/continue/end lines plus an
'unmatch log' filler; both keep (single_line) and discard treatments.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from loongcollector_spark.operators import build_operator
from loongcollector_spark.operators.multiline import fsm_events, strip_pattern

BEGIN = "Exception in thread 'main' java.lang.NullPointerException"
CONT = "    at com.example.myproject.Book.getTitle(Book.java:16)"
END = "    ...23 more"
UNMATCH = "unmatch log"

BEGIN_RX = r"Exception.*"
CONT_RX = r"\s+at\s.*"
END_RX = r"\s*\.\.\.\d+ more"


def _df(spark, lines, conv="c1"):
    rows = [(conv, i, t, "2026-01-01 00:00:%02d" % (i % 60)) for i, t in enumerate(lines)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _merged(spark, lines, **cfg):
    base = {"Type": "processor_merge_multiline_log"}
    base.update(cfg)
    out = build_operator(base)(_df(spark, lines))
    return [r["text"] for r in sorted(out.collect(), key=lambda r: r["turn_idx"])]


# ---------- pure-FSM goldens (cpp unittest scenarios) ----------

def _fsm(lines, start=None, cont=None, end=None, single_line=True):
    sp = re.compile(strip_pattern(start)) if strip_pattern(start) else None
    cp = re.compile(strip_pattern(cont)) if strip_pattern(cont) else None
    ep = re.compile(strip_pattern(end)) if strip_pattern(end) else None
    evs = fsm_events(lines, sp, cp, ep, single_line)
    return ["\n".join(lines[i] for i in ev) for ev in evs]


def test_fsm_begin_continue_goldens():
    # Unittest TestLogSplitWithBeginContinue (keep-unmatch, :2952+)
    assert _fsm([UNMATCH, UNMATCH], BEGIN_RX, CONT_RX) == [UNMATCH, UNMATCH]
    assert _fsm([BEGIN, UNMATCH], BEGIN_RX, CONT_RX) == [BEGIN, UNMATCH]
    assert _fsm([BEGIN, CONT, CONT, UNMATCH], BEGIN_RX, CONT_RX) == [
        "\n".join([BEGIN, CONT, CONT]), UNMATCH]
    assert _fsm([BEGIN, CONT, BEGIN], BEGIN_RX, CONT_RX) == [
        "\n".join([BEGIN, CONT]), BEGIN]
    # discard drops only unmatched lines
    assert _fsm([UNMATCH, BEGIN, CONT], BEGIN_RX, CONT_RX, single_line=False) == [
        "\n".join([BEGIN, CONT])]


def test_fsm_begin_end_goldens():
    assert _fsm([BEGIN, UNMATCH, END], BEGIN_RX, end=END_RX) == [
        "\n".join([BEGIN, UNMATCH, END])]
    # end never arrives → whole tail unmatched, kept one-per-line
    assert _fsm([BEGIN, UNMATCH], BEGIN_RX, end=END_RX) == [BEGIN, UNMATCH]
    # rows between end and next begin are unmatched
    assert _fsm([BEGIN, END, UNMATCH, BEGIN, END], BEGIN_RX, end=END_RX) == [
        "\n".join([BEGIN, END]), UNMATCH, "\n".join([BEGIN, END])]
    # a second begin while open does NOT restart the event
    assert _fsm([BEGIN, BEGIN, END], BEGIN_RX, end=END_RX) == [
        "\n".join([BEGIN, BEGIN, END])]


def test_fsm_continue_end_goldens():
    assert _fsm([CONT, CONT, END], cont=CONT_RX, end=END_RX) == [
        "\n".join([CONT, CONT, END])]
    # a lone end line is a complete (merged) event even under discard
    assert _fsm([END], cont=CONT_RX, end=END_RX, single_line=False) == [END]
    # open run that hits a non-continue non-end line → all unmatched
    assert _fsm([CONT, UNMATCH, END], cont=CONT_RX, end=END_RX) == [
        CONT, UNMATCH, END]


def test_fsm_end_only_goldens():
    assert _fsm([UNMATCH, UNMATCH, END, UNMATCH, END], end=END_RX) == [
        "\n".join([UNMATCH, UNMATCH, END]), "\n".join([UNMATCH, END])]
    # trailing lines with no end → unmatched singles (kept) / dropped (discard)
    assert _fsm([END, UNMATCH], end=END_RX) == [END, UNMATCH]
    assert _fsm([END, UNMATCH], end=END_RX, single_line=False) == [END]


def test_pattern_stripping():
    assert strip_pattern(r"Exception.*") == "Exception"
    assert strip_pattern(r"foo.*.*$") == "foo"
    assert strip_pattern(".*") is None
    assert strip_pattern(None) is None


# ---------- Spark paths vs the pure FSM ----------

def test_spark_start_continue_matches_fsm(spark):
    random.seed(7)
    vocab = [BEGIN, CONT, UNMATCH, "Exception: minor", "   at deeper.frame(X.java:1)"]
    lines = [random.choice(vocab) for _ in range(60)]
    for treatment in ("single_line", "discard"):
        want = _fsm(lines, BEGIN_RX, CONT_RX, single_line=treatment == "single_line")
        got = _merged(
            spark, lines, StartPattern=BEGIN_RX, ContinuePattern=CONT_RX,
            UnmatchedContentTreatment=treatment,
        )
        assert got == want, treatment


def test_spark_start_end(spark):
    lines = [UNMATCH, BEGIN, UNMATCH, END, UNMATCH, BEGIN, CONT]
    want = _fsm(lines, BEGIN_RX, end=END_RX)
    got = _merged(spark, lines, StartPattern=BEGIN_RX, EndPattern=END_RX)
    assert got == want
    # nested Multiline config block, reference YAML shape
    got2 = _merged(
        spark, lines,
        Multiline={"StartPattern": BEGIN_RX, "EndPattern": END_RX},
    )
    assert got2 == want


def test_spark_continue_end_and_end_only(spark):
    lines = [CONT, CONT, END, UNMATCH, END]
    assert _merged(
        spark, lines, ContinuePattern=CONT_RX, EndPattern=END_RX
    ) == _fsm(lines, cont=CONT_RX, end=END_RX)
    lines2 = [UNMATCH, END, CONT, END, UNMATCH]
    assert _merged(spark, lines2, EndPattern=END_RX) == _fsm(lines2, end=END_RX)


def test_spark_all_three_ignores_continue(spark):
    # reference: start+continue+end → continue ignored (MultilineOptions.cpp:140)
    lines = [BEGIN, CONT, END, BEGIN, UNMATCH, END]
    got = _merged(
        spark, lines, StartPattern=BEGIN_RX, ContinuePattern=CONT_RX,
        EndPattern=END_RX,
    )
    assert got == _fsm(lines, BEGIN_RX, end=END_RX)


def test_spark_by_flag(spark):
    rows = [
        ("c1", 0, "par", True), ("c1", 1, "tial ", True), ("c1", 2, "line", False),
        ("c1", 3, "whole line", False), ("c1", 4, "tail-par", True),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, _part_ boolean"
    )
    out = build_operator({
        "Type": "processor_merge_multiline_log", "MergeType": "flag",
    })(df)
    got = [r["text"] for r in sorted(out.collect(), key=lambda r: r["turn_idx"])]
    # P-runs merge with the following full line, WITHOUT line breaks;
    # a trailing P-run at EOF still merges (cpp:152-156)
    assert got == ["partial line", "whole line", "tail-par"]
    assert "_part_" not in out.columns


def test_split_multiline_blob(spark):
    blob = "\n".join([BEGIN, CONT, CONT, BEGIN, UNMATCH])
    df = spark.createDataFrame([("c1", 0, blob)], "conv_id string, turn_idx int, text string")
    out = build_operator({
        "Type": "processor_split_multiline_log_string",
        "StartPattern": BEGIN_RX, "ContinuePattern": CONT_RX,
        "OrderKeys": ["conv_id", "turn_idx"],
    })(df)
    got = [r["text"] for r in sorted(out.collect(), key=lambda r: r["line_idx"])]
    assert got == ["\n".join([BEGIN, CONT, CONT]), BEGIN, UNMATCH]


def test_legacy_start_only_shape_unchanged(spark):
    # round-2 behavior must survive: trailing-.* start pattern, single_line
    lines = [UNMATCH, BEGIN, CONT, BEGIN]
    got = _merged(spark, lines, StartPattern=BEGIN_RX,
                  UnmatchedContentTreatment="single_line")
    assert got == [UNMATCH, "\n".join([BEGIN, CONT]), BEGIN]


def test_json_mode_events():
    """Multiline.Mode=JSON brace matching (JsonLogFileReader.cpp:47-120):
    quote-aware depth, non-{ lines are singles, mismatch voids buffer."""
    from loongcollector_spark.operators.multiline import json_events

    lines = [
        '{"a": 1,',           # opens
        ' "b": "x}y{z",',     # braces inside quotes ignored
        ' "c": {"d": 2}}',    # closes
        'plain line',          # single
        '{"open": true',       # EOF unbalanced -> unmatched singles
    ]
    assert json_events(lines, True) == [[0, 1, 2], [3], [4]]
    assert json_events(lines, False) == [[0, 1, 2], [3]]
    # escaped quote inside a string does not end the string
    tricky = ['{"k": "a\\"}",', '"m": 1}']
    assert json_events(tricky, True) == [[0, 1]]
    # brace mismatch (extra }) voids the buffer
    assert json_events(['{"a": 1}}'], True) == [[0]]
    assert json_events(['{"a": 1}}'], False) == []


def test_json_mode_spark(spark):
    lines = ['{"a": 1,', ' "b": 2}', 'garbage', '{"c": 3}']
    got = _merged(spark, lines, Multiline={"Mode": "JSON"})
    assert got == ['{"a": 1,\n "b": 2}', "garbage", '{"c": 3}']


def test_input_file_multiline_yaml(spark, tmp_path):
    """Reference input-file YAML with a Multiline block merges per file
    before processors (docs/cn/plugins/input/native/input-file.md)."""
    import textwrap

    from loongcollector_spark.config import PipelineConfig, _read_input

    log = tmp_path / "app.log"
    log.write_text(
        "[2026-01-01:0:0.0] [ERROR] boom\n"
        "  at frame1\n"
        "[2026-01-01:0:0.1] [INFO] ok\n"
    )
    cfg = PipelineConfig.parse(textwrap.dedent(f"""
        enable: true
        inputs:
          - Type: input_file
            FilePaths: ["{log}"]
            Multiline:
              StartPattern: '\\[\\d+-\\d+-\\d+:\\d+:\\d+.\\d+\\].*'
        processors: []
        flushers: []
    """))
    df = _read_input(spark, cfg.inputs[0])
    texts = sorted(r["content"] for r in df.collect())
    assert texts == [
        "[2026-01-01:0:0.0] [ERROR] boom\n  at frame1",
        "[2026-01-01:0:0.1] [INFO] ok",
    ]
