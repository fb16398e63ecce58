"""Generate a seeded synthetic transcripts parquet for benching.

Usage: python tools/gen_input.py <out_dir> <n_turns> [partitions]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out, n = sys.argv[1], int(sys.argv[2])
    partitions = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    from loongcollector_spark.datagen import gen_transcripts
    from loongcollector_spark.session import get_spark

    spark = get_spark(app_name="lcs-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    gen_transcripts(
        spark, n_turns=n, n_convs=max(n // 10, 1), partitions=partitions
    ).write.mode("overwrite").parquet(out)
    spark.stop()


if __name__ == "__main__":
    main()
