"""Local stand-in for the driver's correctness gate: run every
driver_queries entry on Spark AND its DuckDB oracle at a given sf dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/verify_oracles.py [sf_dir] [query ...]
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
    """Dtype KIND — the driver's value hash is dtype-sensitive (int 1200
    vs float 1200.0 hash differently), so a DuckDB HUGEINT (sum over
    BIGINT -> pandas float64) against a Spark int64 is a real failure
    even though values compare equal. Caught live: aggregator_base_packs
    r03 red row."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(4)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from loongcollector_spark.driver_queries import QUERIES
    from loongcollector_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, (fn, oracle) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            raw_got = fn(spark, sf_dir).toPandas()
            got = canon(raw_got)
            if oracle is None:
                # rows-only check (driver's weaker gate for non-SQL ops)
                print(f"PASS {name} (rows-only: {len(got)} rows)")
                n_pass += 1
                continue
            raw_want = con.sql(oracle).df()
            want = canon(raw_want)
            assert list(got.columns) == list(want.columns), (
                f"columns {list(got.columns)} vs {list(want.columns)}")
            if len(raw_got):
                for c in raw_got.columns:
                    ks, kd = kind(raw_got[c]), kind(raw_want[c])
                    assert ks == kd, (
                        f"dtype kind mismatch on {c}: spark "
                        f"{raw_got[c].dtype}({ks}) vs duckdb "
                        f"{raw_want[c].dtype}({kd})")
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:400]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
