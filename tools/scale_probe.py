"""Isolate which pipeline component fails to scale with threads.

Usage: python tools/scale_probe.py <cpus> <input> <probe>
probe: scan | regex | json | kv | parse | parse_persist | full
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    cpus, input_path, probe = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from loongcollector_spark.session import get_spark
    from loongcollector_spark.plans.pipeline import NGINX_RX, JSON_SCHEMA, parse_stage, transcript_pipeline

    spark = get_spark(app_name=f"probe-{probe}-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(input_path)
    t = F.col("text")

    # warm-up: force JIT on a small slice
    warm = df.limit(50000)

    def run(frame):
        return frame.select(F.count("*")).first()[0]

    if probe == "scan":
        expr = df.select(F.sum(F.length("text")))
        wexpr = warm.select(F.sum(F.length("text")))
    elif probe == "regex":
        expr = df.select(F.sum(F.when(t.rlike(NGINX_RX), 1).otherwise(0)),
                         F.sum(F.length(F.regexp_extract(t, NGINX_RX, 6))))
        wexpr = warm.select(F.sum(F.when(t.rlike(NGINX_RX), 1).otherwise(0)),
                            F.sum(F.length(F.regexp_extract(t, NGINX_RX, 6))))
    elif probe == "json":
        j = F.from_json(t, JSON_SCHEMA)
        expr = df.select(F.sum(F.when(j["action"].isNotNull(), 1).otherwise(0)))
        wexpr = warm.select(F.sum(F.when(j["action"].isNotNull(), 1).otherwise(0)))
    elif probe == "kv":
        m = F.str_to_map(t, F.lit("&"), F.lit("="))
        expr = df.select(F.sum(F.when(m["action"].isNotNull(), 1).otherwise(0)))
        wexpr = warm.select(F.sum(F.when(m["action"].isNotNull(), 1).otherwise(0)))
    elif probe == "parse":
        expr = parse_stage(df).select(F.sum(F.when(F.col("_parse_ok"), 1).otherwise(0)),
                                      F.sum(F.length("request")), F.sum("bytes"))
        wexpr = parse_stage(warm).select(F.sum(F.when(F.col("_parse_ok"), 1).otherwise(0)),
                                         F.sum(F.length("request")), F.sum("bytes"))
    elif probe == "parse_persist":
        routed = transcript_pipeline(df).persist()
        wexpr = transcript_pipeline(warm).select(F.count("*"))
        expr = None
    else:
        raise SystemExit(f"unknown probe {probe}")

    wexpr.first()  # JIT warm-up
    t0 = time.monotonic()
    if probe == "parse_persist":
        n = routed.count()
    else:
        n = expr.first()[0]
    dt = time.monotonic() - t0
    print(f"probe={probe} cpus={cpus}: {dt:.2f}s (result={n})")
    spark.stop()


if __name__ == "__main__":
    main()
