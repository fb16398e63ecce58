"""Hot-key skew demo: salted vs unsalted conv partitioning.

The skew fixture (datagen hot_frac) puts ~30% of all turns in ONE
conversation. Partitioning by conv_id alone pins that conversation to a
single task; the salted repartition spreads it over salt_mod partitions.
This prints per-partition row-count distributions and wall times for
both, at local[N].

Usage: python tools/skew_demo.py [cpus] [n_turns]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from loongcollector_spark.datagen import gen_transcripts
    from loongcollector_spark.plans.pipeline import transcript_pipeline
    from loongcollector_spark import routing
    from loongcollector_spark.session import get_spark

    spark = get_spark(app_name="skew-demo", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    df = gen_transcripts(spark, n_turns=n_turns, n_convs=n_turns // 10,
                         hot_frac=0.30, partitions=cpus * 2)
    routed = transcript_pipeline(df)

    def measure(name, frame):
        import shutil
        import tempfile

        out = tempfile.mkdtemp(prefix=f"lcs_skew_{name}_")
        frame.write.mode("overwrite").parquet(out)  # warm
        t0 = time.monotonic()
        frame.write.mode("overwrite").parquet(out)
        wall = time.monotonic() - t0
        shutil.rmtree(out, ignore_errors=True)
        dist = (
            frame.groupBy(F.spark_partition_id().alias("pid"))
            .count().select("count").toPandas()["count"]
        )
        return {
            "wall_s": round(wall, 2),
            "partitions": int(dist.size),
            "max_rows": int(dist.max()),
            "median_rows": int(dist.median()),
            "skew_ratio_max_over_median": round(float(dist.max() / dist.median()), 1),
        }

    unsalted = measure(
        "unsalted", routed.repartition(cpus * 2, F.col("conv_id"))
        .sortWithinPartitions("conv_id", "turn_idx")
    )
    salted = measure(
        "salted", routing.salted_repartition(routed, num_partitions=cpus * 2)
    )
    print(json.dumps({"n_turns": n_turns, "cpus": cpus,
                      "unsalted": unsalted, "salted": salted}))
    spark.stop()


if __name__ == "__main__":
    main()
