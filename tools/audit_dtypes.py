"""Dtype-strict sweep of every driver query vs its DuckDB oracle.

The driver's correctness gate hash-compares VALUES after sorting columns
by name; its canon is stricter than tools/verify_oracles.py's
(check_dtype=False). A DuckDB HUGEINT (sum over BIGINT) surfaces as
float64 in pandas while Spark returns int64 — values "equal" but a
dtype-sensitive serialization hashes them differently (the
aggregator_base_packs r03 red row). This tool flags every query whose
raw Spark/DuckDB pandas dtypes disagree in KIND (int vs float vs object
vs datetime vs bool), so oracles can pin casts explicitly.

Usage: python tools/audit_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from loongcollector_spark.driver_queries import QUERIES
    from loongcollector_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_ok = n_flag = n_err = 0
    for name, (fn, oracle) in QUERIES.items():
        if only and name not in only:
            continue
        if oracle is None:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
            want = con.sql(oracle).df()
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:200]}")
            n_err += 1
            continue
        bad = []
        for c in sorted(set(got.columns) & set(want.columns)):
            ks, kd = kind(got[c]), kind(want[c])
            if ks != kd:
                # all-null object columns from empty frames are benign
                if len(got) == 0:
                    continue
                bad.append(f"{c}: spark={got[c].dtype}({ks}) duckdb={want[c].dtype}({kd})")
        if bad:
            print(f"FLAG {name}: " + "; ".join(bad))
            n_flag += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_flag} flagged, {n_err} errors")
    sys.exit(1 if (n_flag or n_err) else 0)


if __name__ == "__main__":
    main()
