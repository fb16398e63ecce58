"""Lookup enrichment — dictmap semantics as a broadcast hash join.

Reference: plugins/processor/dictmap/processor_dict_map.go —
``MapDict`` inline dict or 2-column CSV ``DictFilePath`` (≤ MaxDictSize
1000 rows), ``SourceKey`` → ``DestKey``, ``Mode`` fill|overwrite,
``HandleMissing`` + ``Missing`` (default "Unknown", go:175-181).

Scale posture: the dictionary is tiny by contract (≤1000 rows) so the
join is ALWAYS broadcast — zero shuffle of the fact table. For dicts
under ``INLINE_THRESHOLD`` we go further and inline a literal
``create_map`` expression: pure codegen, not even a broadcast exchange.
"""

from __future__ import annotations

import csv
from itertools import chain

from pyspark.sql import SparkSession, functions as F

from loongcollector_spark.operators import register

INLINE_THRESHOLD = 64
MAX_DICT_SIZE = 1000


def load_dict(cfg: dict) -> dict[str, str]:
    if cfg.get("MapDict"):
        d = dict(cfg["MapDict"])
    else:
        d = {}
        with open(cfg["DictFilePath"], newline="") as f:
            for row in csv.reader(f):
                if len(row) >= 2:
                    d[row[0]] = row[1]
    if len(d) > cfg.get("MaxDictSize", MAX_DICT_SIZE):
        raise ValueError(f"dict size {len(d)} exceeds MaxDictSize")
    return d


@register("processor_dict_map", keys={"SourceKey", "DestKey", "Mode", "HandleMissing", "Missing", "MapDict", "DictFilePath", "MaxDictSize"})
def dict_map(cfg: dict):
    src = cfg["SourceKey"]
    dest = cfg.get("DestKey", src)
    mode = cfg.get("Mode", "overwrite")
    handle_missing = cfg.get("HandleMissing", True)
    missing = cfg.get("Missing", "Unknown")
    mapping = load_dict(cfg)

    def run(df):
        if len(mapping) <= INLINE_THRESHOLD:
            m = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
            mapped = m[F.col(src)]
        else:
            spark = SparkSession.getActiveSession()
            dict_df = spark.createDataFrame(
                list(mapping.items()), [f"__dict_key__", "__dict_val__"]
            )
            df = df.join(
                F.broadcast(dict_df),
                df[src] == dict_df["__dict_key__"],
                "left",
            ).drop("__dict_key__")
            mapped = F.col("__dict_val__")

        if handle_missing:
            mapped = F.coalesce(mapped, F.lit(missing))
        if mode == "fill" and dest in df.columns:
            out = F.coalesce(F.col(dest), mapped)
        else:
            out = mapped
        df = df.withColumn(dest, out)
        return df.drop("__dict_val__") if "__dict_val__" in df.columns else df

    return run
