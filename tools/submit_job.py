"""spark-submit entrypoint for the full pipeline.

Cluster usage (the --py-files contract from the north star):

    zip -r lcs.zip loongcollector_spark
    spark-submit --py-files lcs.zip tools/submit_job.py \
        --input /data/transcripts --output /data/out \
        --salt-mod 64 --num-partitions 4096

Local smoke:

    python tools/submit_job.py --input /root/testdata/sf0.001 --generate 10000

Prints one JSON summary line (rows, wall, per-stage metrics).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet dir")
    ap.add_argument("--config", help="reference-style pipeline YAML: run it "
                                     "(inputs/processors/flushers) and exit")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic turns instead of reading --input")
    ap.add_argument("--output", default="/tmp/lcs_out")
    ap.add_argument("--salt-mod", type=int, default=16)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--window", default="1 hour")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None,
                    help="override master (omit under spark-submit)")
    args = ap.parse_args()

    from loongcollector_spark.plans.pipeline import run_pipeline
    from loongcollector_spark.session import get_spark
    from pyspark.sql import SparkSession

    if args.master:
        spark = get_spark(app_name="lcs-submit", master=args.master)
    else:
        # under spark-submit the master/conf come from the launcher
        spark = SparkSession.builder.appName("lcs-submit").getOrCreate()

    if args.config:
        from loongcollector_spark.config import PipelineConfig, run_config

        out = run_config(spark, PipelineConfig.load(args.config))
        print(json.dumps({
            "config": args.config,
            "rows": out.count() if out is not None else 0,
        }))
        spark.stop()
        return

    if args.generate:
        from loongcollector_spark.datagen import gen_transcripts

        df = gen_transcripts(spark, n_turns=args.generate,
                             n_convs=max(args.generate // 10, 1))
    else:
        df = spark.read.parquet(args.input)

    res = run_pipeline(
        spark, df, args.output,
        window_duration=args.window,
        salt_mod=args.salt_mod,
        num_partitions=args.num_partitions,
        resume=not args.no_resume,
    )
    print(json.dumps({
        "in_rows": res["in_rows"],
        "routed_rows": res["routed_rows"],
        "wall_s": round(res["wall_s"], 2),
        "out_dir": res["out_dir"],
        "stages": {m["stage"]: round(m["wall_ms"] / 1e3, 2) for m in res["metrics"]},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
