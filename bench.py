"""Benchmark runner.

1. times every driver-contract query at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
2. measures the flagship pipeline's throughput (turns/sec through
   parse→enrich→route→aggregate, sinks written) on a seeded synthetic
   transcripts table at TWO parallelism levels — local[N] and local[4N] —
   and reports the strong-scaling efficiency (BASELINE.json requires
   ≥0.8 between N and 4N).

Prints ONE JSON line:
  {"metric": ..., "value": <total query sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "pipeline": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "2000000"))
LOW_CPUS = max(CPUS // 4, 1)


def _session(cpus: int, shuffle: int):
    from loongcollector_spark.session import get_spark

    spark = get_spark(
        app_name=f"lcs-bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=shuffle
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _run_queries(spark) -> dict[str, float]:
    from loongcollector_spark.driver_queries import QUERIES

    times = {}
    for name, (fn, _sql) in QUERIES.items():
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        n = df.count()
        times[name] = round(time.monotonic() - t0, 3)
        assert n >= 0
    return times


def _pipeline_throughput(cpus: int, input_path: str, n_turns: int) -> float:
    """turns/sec for the full pipeline incl. sink writes at local[cpus]."""
    from loongcollector_spark.plans.pipeline import run_pipeline

    spark = _session(cpus, shuffle=max(cpus, 8))
    out = tempfile.mkdtemp(prefix=f"lcs_bench_{cpus}_")
    try:
        df = spark.read.parquet(input_path)
        t0 = time.monotonic()
        run_pipeline(spark, df, out, resume=False, num_partitions=max(cpus * 2, 16))
        wall = time.monotonic() - t0
        return n_turns / wall
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def main():
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1

    # --- phase 1: operator queries at the given sf ------------------------
    spark = _session(CPUS, shuffle=32)
    t0 = time.monotonic()
    qtimes = _run_queries(spark)
    total = round(time.monotonic() - t0, 3)

    # --- phase 2: pipeline throughput at two parallelism levels ----------
    from loongcollector_spark.datagen import gen_transcripts

    input_dir = tempfile.mkdtemp(prefix="lcs_bench_input_")
    try:
        gen_transcripts(
            spark, n_turns=BENCH_TURNS, n_convs=max(BENCH_TURNS // 10, 1),
            partitions=max(CPUS * 2, 16),
        ).write.mode("overwrite").parquet(input_dir)
        spark.stop()

        tp_low = _pipeline_throughput(LOW_CPUS, input_dir, BENCH_TURNS)
        tp_high = _pipeline_throughput(CPUS, input_dir, BENCH_TURNS)
        efficiency = (tp_high / tp_low) / (CPUS / LOW_CPUS)
    finally:
        shutil.rmtree(input_dir, ignore_errors=True)

    print(json.dumps({
        "metric": "operator-query suite + pipeline turns/sec at two parallelism levels",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "pipeline": {
            "bench_turns": BENCH_TURNS,
            f"turns_per_sec_local{LOW_CPUS}": round(tp_low, 1),
            f"turns_per_sec_local{CPUS}": round(tp_high, 1),
            "parallelism_ratio": CPUS // LOW_CPUS,
            "scaling_efficiency": round(efficiency, 3),
        },
    }))


if __name__ == "__main__":
    main()
