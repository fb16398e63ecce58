"""Table abstraction: Iceberg when the runtime is on the cluster,
parquet otherwise.

The target deployment (BASELINE.json north rule) reads and writes
Iceberg tables of transcripts at 10^12-turn scale. This container ships
no Iceberg runtime jar, so every entry point degrades to parquet with
the SAME logical layout; the Iceberg-specific pieces (catalog DDL,
partition spec, MERGE-friendly write) are generated here and exercised
by tests as strings, and the format switch is one probe away from live.

Partition layout for the transcripts table (the 100 TB posture):

* ``bucket(N_BUCKETS, conv_id)`` — conversations hash-spread so one hot
  conv_id cannot pin a partition (the salting story at the storage
  layer; reads for one conversation touch one bucket);
* ``days(ts)`` — time pruning for windowed counters and replay;
* sort order ``(conv_id, turn_idx)`` inside files — the stable turn
  ordering contract materialized, so per-conversation reads are a
  sequential range scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_BUCKETS = 1024

TRANSCRIPT_COLUMNS = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog class is loadable in this JVM."""
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def transcripts_ddl(table: str, catalog: str = "lcs") -> str:
    """CREATE TABLE DDL for the transcripts Iceberg table — the partition
    spec + write order the pipeline assumes at scale."""
    return (
        f"CREATE TABLE IF NOT EXISTS {catalog}.{table} ({TRANSCRIPT_COLUMNS})\n"
        f"USING iceberg\n"
        f"PARTITIONED BY (bucket({N_BUCKETS}, conv_id), days(ts))\n"
        f"TBLPROPERTIES ('write.distribution-mode'='hash',\n"
        f"               'write.parquet.compression-codec'='zstd')"
    )


def transcripts_write_order_ddl(table: str, catalog: str = "lcs") -> str:
    """The stable (conv_id, turn_idx) ordering contract, materialized as
    the table's write order."""
    return (f"ALTER TABLE {catalog}.{table} "
            f"WRITE ORDERED BY conv_id, turn_idx")


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read a table reference: an Iceberg catalog table name when the
    runtime is present and the ref is not a path, else a parquet path."""
    if iceberg_available(spark) and "/" not in ref:
        return spark.table(ref)
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write to an Iceberg table (createOrReplace/append/
    overwritePartitions via writeTo) or, without the runtime, to a
    parquet path with the same partitioning.

    ``mode='overwrite_partitions'`` is the idempotent-resume write: only
    the partitions present in ``df`` are replaced (Iceberg
    ``overwritePartitions()``; parquet dynamic partitionOverwriteMode) —
    re-running a failed batch rewrites its own partitions byte-identical
    and leaves every other partition untouched, which is the
    exactly-once replay contract checkpoint.py's manifest assumes
    (reference ExactlyOnceQueueManager.h:41-96)."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in ref:
        w = df.writeTo(ref)
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "overwrite_partitions":
            w.overwritePartitions()
        else:
            w.append()
        return
    if mode == "overwrite_partitions":
        writer = (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
        )
    else:
        writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(ref)
