"""The north-rule deployment contract: `spark-submit --py-files lcs.zip`
runs the full pipeline with the package imported FROM THE ZIP (the
entrypoint is copied outside the repo so nothing else can satisfy the
import) — the exact launch shape a multi-executor cluster uses, where
the zip is what ships code to executors."""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_runs_pipeline_from_zip():
    tmp = tempfile.mkdtemp(prefix="lcs_submit_")
    try:
        zip_path = os.path.join(tmp, "lcs.zip")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            pkg = os.path.join(REPO, "loongcollector_spark")
            for root, _dirs, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        zf.write(full, os.path.relpath(full, REPO))
        # entrypoint OUTSIDE the repo: its sys.path bootstrap then points
        # at tmp (no package there), so only --py-files can satisfy the
        # import
        entry = os.path.join(tmp, "submit_job.py")
        shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), entry)
        out_dir = os.path.join(tmp, "out")
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="2g")
        proc = subprocess.run(
            ["spark-submit", "--master", "local[4]",
             "--py-files", zip_path, entry,
             "--generate", "5000", "--output", out_dir, "--no-resume"],
            capture_output=True, text=True, timeout=300, env=env, cwd=tmp,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        assert summary["in_rows"] == 5000
        assert summary["routed_rows"] == 5000
        assert os.path.exists(os.path.join(out_dir, "_manifest.json"))
        sinks = os.listdir(os.path.join(out_dir, "sinks"))
        assert "sink_default" in sinks
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
