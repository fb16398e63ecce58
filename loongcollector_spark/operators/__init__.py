"""Operator registry — the Spark analog of the reference's plugin registries.

The reference registers processors by name into ``pipeline.Processors[name]``
(Go, plugins/processor/*/init()) or the C++ ``PluginRegistry``. Here the
registry maps a config ``Type`` to a factory; the factory takes the config
dict (same key names as the reference's YAML, e.g. ``SourceKey``, ``Regex``,
``Keys``) and returns a pure ``DataFrame -> DataFrame`` function built from
native Spark expressions — so a pipeline config compiles to one Catalyst
plan, whole-stage-codegen fused.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

OperatorFn = Callable[[DataFrame], DataFrame]
Factory = Callable[[dict], OperatorFn]

REGISTRY: dict[str, Factory] = {}
# accepted config keys per operator — build_operator REJECTS configs with
# keys outside this set, mirroring the reference's Init-time config
# validation posture (a silently-dropped key is a misconfigured pipeline)
KNOWN_KEYS: dict[str, frozenset] = {}
# alias name -> (base name, extra keys): resolved into KNOWN_KEYS after all
# operator modules have imported (aliases can precede their base in import
# order)
DEFERRED_KEYS: dict[str, tuple] = {}

# the CommonParserOptions matrix every parse_* operator accepts
# (core/plugin/processor/CommonParserOptions.h:27-40)
COMMON_PARSE_KEYS = frozenset({
    "SourceKey", "KeepingSourceWhenParseFail", "KeepingSourceWhenParseSucceed",
    "RenamedSourceKey",
})


def register(name: str, keys=None) -> Callable[[Factory], Factory]:
    def deco(fn: Factory) -> Factory:
        REGISTRY[name] = fn
        if keys is not None:
            KNOWN_KEYS[name] = frozenset(keys)
        return fn

    return deco


def build_operator(config: dict[str, Any]) -> OperatorFn:
    """Config dict (with ``Type``) → DataFrame transform. Raises at build
    time on unknown operator types AND on unknown config keys."""
    typ = config["Type"]
    if typ not in REGISTRY:
        raise KeyError(f"unknown operator type {typ!r}; known: {sorted(REGISTRY)}")
    cfg = {k: v for k, v in config.items() if k != "Type"}
    known = KNOWN_KEYS.get(typ)
    if known is not None:
        unknown = set(cfg) - set(known)
        if unknown:
            raise ValueError(
                f"{typ}: unknown/unhandled config keys {sorted(unknown)}; "
                f"accepted: {sorted(known)}"
            )
    return REGISTRY[typ](cfg)


def build_chain(configs: list[dict[str, Any]]) -> OperatorFn:
    """Processor chain: sequential composition, like the reference's
    pipeline processor line (CollectionPipeline.cpp:438-443) — Catalyst
    fuses the narrow stages into one codegen pass."""
    ops = [build_operator(c) for c in configs]

    def run(df: DataFrame) -> DataFrame:
        for op in ops:
            df = op(df)
        return df

    return run


# import for side effect: populates REGISTRY
from loongcollector_spark.operators import (  # noqa: E402,F401
    batcherops,
    canalops,
    condops,
    decoders,
    enrich,
    extras,
    fieldops,
    filterops,
    grok,
    hostmetaops,
    httpext,
    k8smetaops,
    metricops,
    multiline,
    otelops,
    parse,
    pbops,
    processops,
    prom,
    ratelimit,
    skywalkingops,
    snmpops,
    splitops,
    syslogops,
    systemops,
    timeops,
    wineventops,
)

for _name, (_base, _extra) in DEFERRED_KEYS.items():
    KNOWN_KEYS[_name] = KNOWN_KEYS[_base] | _extra
