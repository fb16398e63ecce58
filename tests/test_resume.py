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
