"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship parse→enrich→route→aggregate pipeline on
sf0.001. ``queries()`` / ``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2, verified against DuckDB on the same parquet
tables (the transcripts input is derived deterministically from the
``events`` table by SQL that runs identically on both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from loongcollector_spark.driver_queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from loongcollector_spark.driver_queries import q_pipeline_sink_counts

    return q_pipeline_sink_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql}
