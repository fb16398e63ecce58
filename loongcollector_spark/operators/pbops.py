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
from loongcollector_spark.pbwire import decode_loongsuite_group, decode_sls_loggroup

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
    if protocol == "LoongSuite":
        decode = decode_loongsuite_group
    elif protocol == "SLS_LogGroup":
        decode = decode_sls_loggroup
    else:  # ProcessorParseFromPBNative.cpp:64-67
        raise ValueError(f"Unsupported protocol '{protocol}'")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for gid, payload in zip(pdf[group_id_col], pdf[source_col]):
                try:
                    gid = int(gid)  # NULL arrives as NaN/None — marker row,
                except (TypeError, ValueError):  # never a task kill
                    gid = -1
                try:
                    g = decode(bytes(payload))
                except Exception:
                    rows.append((gid, -1, 0, {}, "", {}, {}, False))
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
                    rows.append((
                        gid, i,
                        int(log.get("time", log.get("timestamp", 0))),
                        log["contents"], log.get("level", ""), tags, meta,
                        True,
                    ))
            yield pd.DataFrame(
                rows, columns=["group_id", "log_idx", "log_time", "contents",
                               "level", "tags", "metadata", "_decode_ok"],
            )

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
