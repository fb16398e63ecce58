"""processor_parse_from_pb — raw protobuf payloads → typed log rows.

Reference: core/plugin/processor/inner/ProcessorParseFromPBNative.cpp
(Init validates Protocol against sSupportedProtocols = {"LoongSuite"},
:40-42; Process walks each RawEvent's bytes with a hand-written
ManualPBParser and emits the decoded PipelineEventGroup, :80-140).

Spark shape: the payload column is opaque ``binary``; decode runs per
Arrow batch via ``mapInPandas`` with the pure-Python wire walker in
``pbwire`` (the ManualPBParser analog), exploding each group's log
events into rows of typed columns — group tags/metadata ride along as
map columns so everything downstream is codegen. A malformed payload
drops with a ``_decode_ok=false`` marker row rather than killing the
worker (the reference's mOutFailedEventGroupsTotal path).

Protocols: ``LoongSuite`` (models.PipelineEventGroup, the reference's
only supported value) and ``SLS_LogGroup`` (sls_logs.LogGroup — this
engine's own serializer output, giving an encode→decode round trip).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from loongcollector_spark.operators import register
from loongcollector_spark.pbwire import decode_batch

_OUT_SCHEMA = (
    "group_id long, log_idx int, log_time long, contents map<string,string>, "
    "level string, tags map<string,string>, metadata map<string,string>, "
    "_decode_ok boolean"
)


def parse_from_pb(
    df: DataFrame, source_col: str = "payload", protocol: str = "LoongSuite",
    group_id_col: str = "group_id",
) -> DataFrame:
    """One input row = one serialized event group; output = one row per
    decoded log event, tagged with the input's ``group_id_col``."""
    if protocol not in ("LoongSuite", "SLS_LogGroup"):
        # ProcessorParseFromPBNative.cpp:64-67
        raise ValueError(f"Unsupported protocol '{protocol}'")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # whole-batch wire decode (pbwire.decode_batch): inline
            # recursive-descent walkers, ~2x the parse_fields reference
            # path; malformed payloads come back as None
            def as_bytes(p):
                try:  # NULL payloads arrive as None/NaN — marker row
                    return bytes(p)
                except Exception:
                    return None

            groups = decode_batch(
                [as_bytes(payload) for payload in pdf[source_col]], protocol)
            # columnar assembly: per-column appends beat building one
            # tuple per log row and letting pandas re-pivot them
            c_gid, c_idx, c_time, c_contents = [], [], [], []
            c_level, c_tags, c_meta, c_ok = [], [], [], []
            for gid, g in zip(pdf[group_id_col], groups):
                try:
                    gid = int(gid)  # NULL arrives as NaN/None — marker row,
                except (TypeError, ValueError):  # never a task kill
                    gid = -1
                if g is None:
                    c_gid.append(gid)
                    c_idx.append(-1)
                    c_time.append(0)
                    c_contents.append({})
                    c_level.append("")
                    c_tags.append({})
                    c_meta.append({})
                    c_ok.append(False)
                    continue
                tags = g.get("tags", {})
                meta = g.get("metadata", {})
                if protocol == "SLS_LogGroup":
                    meta = {
                        k: v for k, v in [
                            ("topic", g["topic"]), ("source", g["source"]),
                            ("category", g["category"]),
                            ("machine_uuid", g["machine_uuid"]),
                        ] if v
                    }
                    for i, log in enumerate(g["logs"]):
                        c_gid.append(gid)
                        c_idx.append(i)
                        tv = log.get("time", 0)
                        # a crafted wt-2 Time decodes to bytes: clamp to
                        # 0 instead of raising outside the decode guard
                        c_time.append(tv if type(tv) is int else 0)
                        c_contents.append(log["contents"])
                        c_level.append("")
                        c_tags.append(tags)
                        c_meta.append(meta)
                        c_ok.append(True)
                else:
                    for i, log in enumerate(g["logs"]):
                        c_gid.append(gid)
                        c_idx.append(i)
                        tv = log.get("timestamp", 0)
                        c_time.append(tv if type(tv) is int else 0)
                        c_contents.append(log["contents"])
                        c_level.append(log.get("level", ""))
                        c_tags.append(tags)
                        c_meta.append(meta)
                        c_ok.append(True)
            yield pd.DataFrame({
                "group_id": c_gid, "log_idx": c_idx, "log_time": c_time,
                "contents": c_contents, "level": c_level, "tags": c_tags,
                "metadata": c_meta, "_decode_ok": c_ok,
            })

    return df.select(group_id_col, source_col).mapInPandas(batches, _OUT_SCHEMA)


@register("processor_parse_from_pb", keys={"Protocol", "SourceKey", "GroupIdKey"})
def _factory(cfg: dict):
    protocol = cfg["Protocol"]  # mandatory, ProcessorParseFromPBNative.cpp:54
    if protocol not in ("LoongSuite", "SLS_LogGroup"):
        raise ValueError(f"Unsupported protocol '{protocol}'")
    src = cfg.get("SourceKey", "payload")
    gid = cfg.get("GroupIdKey", "group_id")

    def run(df: DataFrame) -> DataFrame:
        return parse_from_pb(df, src, protocol, gid)

    return run
