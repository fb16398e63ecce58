"""Sink serialization — the JsonSerializer / flusher_file analog.

The reference's golden-output sink writes one JSON object per event:
group tags + ``__time__`` (epoch seconds) + contents, newline-delimited
(core/collection_pipeline/serializer/JsonSerializer.cpp:30-84, sink
core/plugin/flusher/file/FlusherFile.h:31-52). Compression choices mirror
the Compressor component (LZ4/ZSTD, core/common/compression/).

Spark: ``to_json(struct(...))`` is codegen, ``df.write.text/json`` writes
line-delimited output in parallel — the serializer is part of the same
stage as the last transform, no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# columns that are runtime plumbing, never part of the serialized event
_INTERNAL_PREFIXES = ("_to_", "_batch", "_fmt", "_parse")


def serializable_columns(df: DataFrame) -> list[str]:
    return [c for c in df.columns
            if not any(c.startswith(p) for p in _INTERNAL_PREFIXES)]


def json_event_column(df: DataFrame, time_col: str = "ts",
                      tags: dict[str, str] | None = None):
    """The serialized-event Column: ``__time__`` + constant tags +
    contents, null fields dropped like the reference omits absent
    contents."""
    cols = [c for c in serializable_columns(df) if c != time_col]
    fields = []
    if time_col in df.columns:
        fields.append(F.unix_timestamp(F.col(time_col)).alias("__time__"))
    for k, v in (tags or {}).items():
        fields.append(F.lit(v).alias(k))
    fields += [F.col(c) for c in cols]
    return F.to_json(F.struct(*fields), {"ignoreNullFields": "true"})


def to_json_events(df: DataFrame, time_col: str = "ts",
                   tags: dict[str, str] | None = None) -> DataFrame:
    """One JSON string per row (see json_event_column)."""
    return df.select(json_event_column(df, time_col, tags).alias("value"))


def write_json_sink(df: DataFrame, path: str, time_col: str = "ts",
                    tags: dict[str, str] | None = None,
                    compression: str = "gzip", mode: str = "overwrite") -> None:
    """JSON-lines sink (flusher_file): the golden-output format for
    cross-checking against reference collector output."""
    (to_json_events(df, time_col, tags)
     .write.mode(mode).option("compression", compression).text(path))
