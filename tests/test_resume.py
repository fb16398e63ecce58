"""Kill/resume idempotency (SURVEY §5.3): inject a failure after stage k,
re-run from the manifest, assert identical outputs and no duplicates."""

import json

import pandas as pd
import pytest

from loongcollector_spark.checkpoint import Manifest
from loongcollector_spark.datagen import gen_transcripts
from loongcollector_spark.plans.pipeline import run_pipeline

SINKS = ("sink_tool", "sink_errors", "sink_assistant", "sink_default")


def _all_outputs(spark, out):
    res = {}
    for s in SINKS:
        res[s] = (
            spark.read.parquet(f"{out}/sinks/{s}")
            .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
    res["counters"] = (
        spark.read.parquet(f"{out}/counters")
        .toPandas().sort_values(["sink", "window_start", "role"]).reset_index(drop=True)
    )
    return res


def test_kill_and_resume_identical(spark, tmp_path):
    df = gen_transcripts(spark, 3_000, 300)
    clean_dir, resume_dir = str(tmp_path / "clean"), str(tmp_path / "resumed")

    run_pipeline(spark, df, clean_dir)

    # crash after 2 completed sink stages
    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(spark, df, resume_dir, fail_after_stage=2)
    m = Manifest.load(resume_dir)
    done = [k for k in m.data["stages"] if k.startswith("sink:")]
    assert len(done) == 2
    assert not m.is_done("counters")

    # resume: completes remaining stages, skips finished ones
    summary = run_pipeline(spark, df, resume_dir)
    skipped = [r for r in summary["metrics"] if "skipped:resume" in r["stage"]]
    assert len(skipped) == 2

    a, b = _all_outputs(spark, clean_dir), _all_outputs(spark, resume_dir)
    for k in a:
        pd.testing.assert_frame_equal(a[k], b[k])


def test_rerun_after_success_skips_everything(spark, tmp_path):
    df = gen_transcripts(spark, 1_000, 100)
    out = str(tmp_path / "o")
    run_pipeline(spark, df, out)
    summary = run_pipeline(spark, df, out)
    skipped = [r for r in summary["metrics"] if "skipped:resume" in r["stage"]]
    assert len(skipped) == len(SINKS)


def test_input_change_invalidates_manifest(spark, tmp_path):
    out = str(tmp_path / "o")
    run_pipeline(spark, gen_transcripts(spark, 1_000, 100), out)
    summary = run_pipeline(spark, gen_transcripts(spark, 1_200, 100), out)
    assert not [r for r in summary["metrics"] if "skipped" in r["stage"]]
    m = Manifest.load(out)
    n = spark.read.parquet(f"{out}/sinks/sink_default").count()
    assert n == 1_200  # fully rewritten, no stale rows


def test_manifest_atomic_shape(spark, tmp_path):
    out = str(tmp_path / "o")
    run_pipeline(spark, gen_transcripts(spark, 500, 50), out)
    with open(f"{out}/_manifest.json") as f:
        data = json.load(f)
    assert data["input_fingerprint"]
    assert all(v["status"] == "done" for v in data["stages"].values())


def test_file_fingerprint_metadata_path(spark, tmp_path):
    """File-backed inputs fingerprint from file metadata (no data scan);
    rewriting the input changes the fingerprint, re-reading does not."""
    import time as _time

    from loongcollector_spark.checkpoint import input_fingerprint

    p = str(tmp_path / "in.parquet")
    gen_transcripts(spark, 500, 50).write.mode("overwrite").parquet(p)
    f1 = input_fingerprint(spark.read.parquet(p))
    f2 = input_fingerprint(spark.read.parquet(p))
    assert f1 == f2 and f1.startswith("files:")

    _time.sleep(0.05)  # ensure mtime moves
    gen_transcripts(spark, 600, 50).write.mode("overwrite").parquet(p)
    f3 = input_fingerprint(spark.read.parquet(p))
    assert f3 != f1

    # in-memory frames fall back to the scan fingerprint
    f4 = input_fingerprint(gen_transcripts(spark, 100, 10))
    assert not f4.startswith("files:") and ":" in f4


def test_config_change_invalidates_manifest(spark, tmp_path):
    """A changed sink rule must re-run stages — resume keyed only on the
    input fingerprint would keep parquet computed under the OLD rule."""
    from loongcollector_spark.routing import SinkRule

    df = gen_transcripts(spark, 500, 50)
    out = str(tmp_path / "o")
    rules_a = [SinkRule("sink_x", kind="tag", key="role", value="assistant"),
               SinkRule("sink_default", kind="always")]
    run_pipeline(spark, df, out, rules=rules_a)
    n_a = spark.read.parquet(f"{out}/sinks/sink_x").count()

    rules_b = [SinkRule("sink_x", kind="tag", key="role", value="tool"),
               SinkRule("sink_default", kind="always")]
    summary = run_pipeline(spark, df, out, rules=rules_b)
    skipped = [r for r in summary["metrics"] if "skipped:resume" in r["stage"]]
    assert skipped == []  # config change → nothing skipped
    n_b = spark.read.parquet(f"{out}/sinks/sink_x").count()
    assert n_a != n_b  # output reflects the NEW rule


def test_manifest_uri_path_roundtrip(spark, tmp_path):
    """URI out_dirs route manifest IO through the Hadoop FS API — a
    file:// URI exercises the same code path s3a/hdfs take."""
    uri = f"file://{tmp_path}/uri_run"
    m = Manifest.load(uri, spark)
    assert m.path.endswith("/_manifest.json") and "://" in m.path
    m.mark_done("sink:x", rows=7)
    m2 = Manifest.load(uri, spark)
    assert m2.is_done("sink:x")
    assert m2.data["stages"]["sink:x"]["rows"] == 7
    # and no bogus LOCAL 'file:' directory appeared relative to cwd
    import os
    assert not os.path.exists("file:")

    with pytest.raises(ValueError, match="spark session"):
        Manifest.load("s3a://bucket/run")
