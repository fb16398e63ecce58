"""Deterministic rate limiting.

Reference: plugins/processor/ratelimit/processor_rate_limit.go — token
bucket per distinct combo of ``Fields`` values, ``Limit`` "N/s|m|h",
over-limit logs dropped. A wall-clock token bucket is nondeterministic;
the batch-deterministic equivalent (same admitted set on every run and at
every parallelism) is: keep the first N events per (fields, time-window)
in stable event-time order —
``row_number() over (partition by fields, window(ts) order by ts, tiebreak) <= N``.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from loongcollector_spark.operators import register

_UNIT = {"s": "1 second", "m": "1 minute", "h": "1 hour"}


@register("processor_rate_limit", keys={"Fields", "Limit", "TsKey", "OrderKeys"})
def rate_limit(cfg: dict):
    fields = cfg.get("Fields", [])
    limit_str = str(cfg.get("Limit", "100/s"))
    n, unit = limit_str.split("/")
    n = int(n)
    window_dur = _UNIT[unit.strip()]
    ts_col = cfg.get("TsKey", "ts")
    tiebreak = cfg.get("OrderKeys", ["conv_id", "turn_idx"])

    def run(df):
        win = F.window(F.col(ts_col), window_dur).getField("start")
        w = Window.partitionBy(win, *[F.col(f) for f in fields]).orderBy(
            F.col(ts_col), *[F.col(t) for t in tiebreak]
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_rn")
        )

    return run
