"""Profile run_pipeline per-stage at a given parallelism (fresh JVM).

Usage: python tools/profile_pipeline.py <cpus> <input_parquet> [n_turns]
Prints one JSON line with stage timings.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    input_path = sys.argv[2]
    n_turns = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from loongcollector_spark.plans.pipeline import run_pipeline
    from loongcollector_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix=f"lcs_prof_{cpus}_")
    try:
        df = spark.read.parquet(input_path)
        # warm-up run (JIT + codegen), then timed run
        warm = tempfile.mkdtemp(prefix=f"lcs_prof_warm_{cpus}_")
        run_pipeline(spark, df, warm, resume=False,
                     num_partitions=max(cpus * 2, 16))
        shutil.rmtree(warm, ignore_errors=True)
        t0 = time.monotonic()
        res = run_pipeline(spark, df, out, resume=False,
                           num_partitions=max(cpus * 2, 16))
        wall = time.monotonic() - t0
        n = n_turns or res["in_rows"]
        print(json.dumps({
            "cpus": cpus, "wall_s": round(wall, 2),
            "turns_per_sec": round(n / wall, 1),
            "stages": {m["stage"]: round(m["wall_ms"] / 1e3, 2)
                       for m in res["metrics"]},
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
