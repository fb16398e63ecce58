"""The reference's headline regex benchmark, reproduced: parse generated
nginx access lines with the 11-capture-group pattern and meter MB/s.

Reference numbers (README.md:64-67): 68 MB/s on one processing thread
(C++ boost::regex, file→file); competitors fluentbit 19, vector 12.

Usage: python tools/regex_bench.py [threads] [n_lines]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    threads = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_lines = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000

    from loongcollector_spark.operators import build_operator
    from loongcollector_spark.plans.pipeline import NGINX_KEYS, NGINX_RX
    from loongcollector_spark.session import get_spark

    spark = get_spark(app_name="regex-bench", master=f"local[{threads}]",
                      shuffle_partitions=max(threads, 4))
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, n_lines, 1, max(threads * 2, 4)).select(
        F.concat(
            F.lit("10."), (F.col("id") % 250).cast("string"),
            F.lit(".0."), (F.col("id") % 199).cast("string"),
            F.lit(' - - [01/Jan/2026:00:00:07 +0000] "GET /api/v1/items/'),
            (F.col("id") % 9999).cast("string"),
            F.lit(' HTTP/1.1" 200 '), (F.col("id") % 65536).cast("string"),
            F.lit(' "https://ref.example.com/path" '
                  '"Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36"'),
        ).alias("text")
    ).persist()
    df.count()
    nbytes = df.select(F.sum(F.octet_length("text"))).first()[0]

    op = build_operator({
        "Type": "processor_parse_regex", "SourceKey": "text",
        "Regex": NGINX_RX, "Keys": NGINX_KEYS,
    })
    out = op(df)
    out.write.format("noop").mode("overwrite").save()  # warm-up (JIT)
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    print(json.dumps({
        "threads": threads, "n_lines": n_lines,
        "payload_mb": round(nbytes / 1e6, 1), "wall_s": round(best, 2),
        "mb_per_sec": round(nbytes / 1e6 / best, 1),
        "reference_single_thread_mb_per_sec": 68,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
