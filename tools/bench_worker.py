"""Single-measurement bench worker: fresh JVM, warm-up run, timed runs.

Usage: python tools/bench_worker.py <cpus> <input_parquet> <n_turns> [timed_runs]
Prints one JSON line {"cpus":..,"turns_per_sec":..,"wall_s":..,"runs":[..]}.

Run in a subprocess per measurement so each parallelism level gets its own
JVM (driver memory is a JVM-launch-time setting) and JIT/GC state never
leaks between measurements. The first pipeline run warms codegen + JIT;
throughput is the best of the timed runs (steady state — what a long-lived
cluster job actually sees).
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
    n_turns = int(sys.argv[3])
    timed_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from loongcollector_spark.plans.pipeline import run_pipeline
    from loongcollector_spark.session import get_spark

    from pyspark.sql import functions as F

    # preallocate + pretouch the heap: lets G1 settle after one warm-up
    # run instead of three (measured 52 -> 45s steady state at 8 cores)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        app_name=f"lcs-bench-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(input_path)
    num_partitions = max(cpus * 2, 16)
    # payload bytes: what the reference's MB/s numbers meter (raw log text)
    payload_bytes = df.select(F.sum(F.octet_length("text"))).first()[0] or 0

    walls = []
    try:
        for i in range(timed_runs + 1):  # run 0 = warm-up
            out = tempfile.mkdtemp(prefix=f"lcs_bw_{cpus}_")
            try:
                t0 = time.monotonic()
                run_pipeline(spark, df, out, resume=False,
                             num_partitions=num_partitions)
                wall = time.monotonic() - t0
            finally:
                shutil.rmtree(out, ignore_errors=True)
            if i > 0:
                walls.append(round(wall, 2))
    finally:
        spark.stop()

    best = min(walls)
    print(json.dumps({
        "cpus": cpus, "n_turns": n_turns, "wall_s": best,
        "turns_per_sec": round(n_turns / best, 1), "runs": walls,
        "payload_mb": round(payload_bytes / 1e6, 1),
        "mb_per_sec": round(payload_bytes / 1e6 / best, 1),
    }))


if __name__ == "__main__":
    main()
