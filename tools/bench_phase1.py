"""Phase-1 bench subprocess: time every driver-contract query at a sf dir.

Usage: python tools/bench_phase1.py <sf_dir> <cpus>
Prints one JSON line {"total": sec, "queries": {name: sec}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir, cpus = sys.argv[1], int(sys.argv[2])
    from loongcollector_spark.driver_queries import QUERIES
    from loongcollector_spark.session import get_spark

    spark = get_spark(app_name="lcs-bench-q", master=f"local[{cpus}]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: run every query once at the smallest sf so codegen + JIT
    # compile each plan shape before timing (steady-state metering — a
    # cold first query otherwise absorbs the whole JVM warm-up)
    warm_dir = sf_dir.replace("sf0.1", "sf0.001")
    if warm_dir != sf_dir:
        for name, (fn, _sql) in QUERIES.items():
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass
    # materialize the transcripts input table for the timed sf up front
    # (input preparation, not query work — the production analog is the
    # Iceberg table already existing; build time reported separately)
    from loongcollector_spark.driver_queries import transcripts_from_events

    t_fix = time.monotonic()
    transcripts_from_events(spark, sf_dir).count()
    fixture_build_s = round(time.monotonic() - t_fix, 3)
    times = {}
    t0 = time.monotonic()
    for name, (fn, _sql) in QUERIES.items():
        t1 = time.monotonic()
        n = fn(spark, sf_dir).count()
        times[name] = round(time.monotonic() - t1, 3)
        assert n >= 0
    total = round(time.monotonic() - t0, 3)
    spark.stop()
    print(json.dumps({"total": total, "queries": times,
                      "fixture_build_s": fixture_build_s}))


if __name__ == "__main__":
    main()
