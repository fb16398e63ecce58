"""Parse / projection operators.

Each mirrors one reference processor's semantics (citation in each factory)
but is expressed as native Spark SQL expressions so Catalyst fuses the whole
parse chain into one codegen stage — the Spark analog of the reference's
single-pass in-place group processing.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from loongcollector_spark.operators import COMMON_PARSE_KEYS, register
from loongcollector_spark.operators.common import anchored, apply_parse_result

_TYPE_MAP = {
    "string": T.StringType(),
    "int": T.LongType(),
    "long": T.LongType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def _cast(col, typ: str | None):
    if not typ or typ == "string":
        return col
    return col.try_cast(_TYPE_MAP[typ])


@register("processor_parse_regex", keys=COMMON_PARSE_KEYS | {"Regex", "Keys", "KeyTypes", "FullMatch"})
def parse_regex(cfg: dict):
    """Regex field extraction.

    Semantics matched: ProcessorParseRegexNative.cpp:186-253 — full-match
    the value of ``SourceKey`` against ``Regex``; capture group i becomes
    ``Keys[i]``; fail/success source handling per CommonParserOptions.
    Optional ``KeyTypes[i]`` casts (grok-style :int/:float hints).

    Spark: one anchored pattern, ``rlike`` for the success bit plus
    ``regexp_extract`` per key — all whole-stage-codegen, the regex is
    compiled once per generated stage (the analog of the reference's
    thread-local compiled regex, .cpp:255-257).
    """
    src = cfg.get("SourceKey", "text")
    # FullMatch=False (Go twin regex.go:32-44): match anywhere in the value
    full_match = cfg.get("FullMatch", True)
    pattern = anchored(cfg["Regex"]) if full_match else cfg["Regex"]
    keys = cfg["Keys"]
    types = cfg.get("KeyTypes") or [None] * len(keys)
    # \x01 never appears in log text; a pattern that could capture it must
    # fall back to the per-key extract path. Partial match also needs the
    # per-key path (regexp_replace would rewrite every occurrence).
    sep_safe = full_match and "\x01" not in cfg["Regex"]

    def run(df):
        ok = F.col(src).rlike(pattern)
        if sep_safe:
            # 2 regex passes total (validity + one regexp_replace mapping
            # the match to all capture groups) instead of 1 + len(keys) —
            # measured ~5x on the 11-group nginx benchmark pattern
            sep = "\x01"
            arr = F.split(
                F.regexp_replace(
                    F.when(ok, F.col(src)), pattern,
                    sep.join(f"${i + 1}" for i in range(len(keys))),
                ),
                sep,
            )
            # per-row guard: a greedy group can CAPTURE a literal \x01 from
            # the data, misaligning the split — those rows (size mismatch)
            # fall back to per-key regexp_extract; rows with ok=false stay
            # null (the already_masked contract)
            safe = F.size(arr) == len(keys)
            extracted = {
                k: _cast(
                    F.when(safe, F.element_at(arr, i + 1))
                    .when(ok, F.regexp_extract(F.col(src), pattern, i + 1)),
                    t,
                )
                for i, (k, t) in enumerate(zip(keys, types))
            }
            return apply_parse_result(df, src, ok, extracted, cfg,
                                      already_masked=True)
        extracted = {
            k: _cast(F.regexp_extract(F.col(src), pattern, i + 1), t)
            for i, (k, t) in enumerate(zip(keys, types))
        }
        return apply_parse_result(df, src, ok, extracted, cfg)

    return run


def _flatten_schema(schema: T.StructType, prefix: str, connector: str, depth: int,
                    max_depth: int):
    """Plan-time recursive flatten: nested struct fields become top-level
    ``a_b_c`` columns — the semantics of processor_json's ExpandDepth /
    ExpandConnector (processor_json.go:29-43: depth 0 = unlimited,
    connector default '_')."""
    out = []
    for f in schema.fields:
        name = f"{prefix}{f.name}" if prefix else f.name
        if isinstance(f.dataType, T.StructType) and (max_depth == 0 or depth < max_depth):
            out += _flatten_schema(
                f.dataType, f"{name}{connector}", connector, depth + 1, max_depth
            )
        else:
            out.append((name,))
    return out


def _flatten_columns(src_col, schema: T.StructType, prefix: str, connector: str,
                     depth: int, max_depth: int):
    """Typed columns from a JSON string column via map<string,string> parse
    + per-leaf casts (NOT a struct-schema from_json).

    Why: Spark's JsonToStructs with a StructType schema serializes badly
    under many concurrent tasks (measured 3x slower at local[32] than
    local[8] on this box), while the MapType path scales linearly. The map
    path is also the closer semantic match: the reference stringifies every
    scalar (ProcessorParseJsonNative.cpp:177) and treats contents as string
    KVs (LogEvent.h:23-24); types are re-applied at the edge by casts.
    Nested objects surface as their raw JSON text in the map, so struct
    fields recurse with another map parse. Identical from_json subtrees are
    deduplicated by codegen subexpression elimination — one parse per row
    per nesting level."""
    m = F.from_json(src_col, "map<string,string>")
    cols = {}
    for f in schema.fields:
        name = f"{prefix}{f.name}" if prefix else f.name
        child = m.getItem(f.name)
        if isinstance(f.dataType, T.StructType) and (max_depth == 0 or depth < max_depth):
            cols.update(
                _flatten_columns(child, f.dataType, f"{name}{connector}",
                                 connector, depth + 1, max_depth)
            )
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols[name] = F.from_json(child, f.dataType)
        elif isinstance(f.dataType, T.StringType):
            cols[name] = child
        else:
            cols[name] = child.try_cast(f.dataType)
    return cols


@register("processor_parse_json", keys=COMMON_PARSE_KEYS | {"ExpandConnector", "Prefix", "ExpandDepth", "Schema", "AttrsKey"})
def parse_json(cfg: dict):
    """JSON expansion.

    Semantics matched: processor_parse_json_native (scalars stringified,
    ProcessorParseJsonNative.cpp:177) + Go processor_json flattening
    (ExpandDepth 0=∞, ExpandConnector '_', Prefix — processor_json.go:29-43).

    Two modes:
    * ``Schema`` given (Spark DDL string) → ``from_json`` with typed
      columns, nested structs flattened plan-time with the connector.
    * no Schema → dynamic top-level expansion into a ``map<string,string>``
      column named ``AttrsKey`` (default ``attrs``) — the schema-less path.
    """
    src = cfg.get("SourceKey", "text")
    connector = cfg.get("ExpandConnector", "_")
    prefix = cfg.get("Prefix", "")
    max_depth = cfg.get("ExpandDepth", 0)
    schema_ddl = cfg.get("Schema")
    attrs_key = cfg.get("AttrsKey", "attrs")

    def run(df):
        # validity probe: struct-mode from_json is PERMISSIVE (returns a
        # null-filled struct on corrupt input), but map-mode returns NULL —
        # use it as the is-valid-JSON-object bit on both paths
        valid = F.from_json(F.col(src), "map<string,string>").isNotNull()
        if schema_ddl:
            schema = T.StructType.fromDDL(schema_ddl)
            ok = valid & F.col(src).rlike(r"^\s*\{")
            cols = _flatten_columns(F.col(src), schema, prefix, connector, 1, max_depth)
            return apply_parse_result(df, src, ok, cols, cfg)
        parsed = F.from_json(F.col(src), "map<string,string>")
        ok = parsed.isNotNull() & F.col(src).rlike(r"^\s*\{")
        return apply_parse_result(df, src, ok, {attrs_key: parsed}, cfg)

    return run


@register("processor_parse_delimiter", keys=COMMON_PARSE_KEYS | {"Separator", "Quote", "Keys", "AllowingShortenedFields", "OverflowedFieldsTreatment", "ExtendedColumns", "ExtendKeyPrefix", "TrimLeadingSpace"})
def parse_delimiter(cfg: dict):
    """Delimiter/CSV split.

    Semantics matched: ProcessorParseDelimiterNative.cpp:245-335 —
    ``Separator`` split into ``Keys``; ``AllowingShortenedFields`` permits
    fewer fields than keys (missing → null ⇒ fail if False);
    ``OverflowedFieldsTreatment``: keep (extras folded into last key),
    discard (dropped), extend (extra ``__column{N}__`` columns, cpp:368-400),
    preserve (remainder into ``_decode_preserve_`` — the Go processor_csv
    PreserveOthers semantics, processor_csv.go:30-44). ``TrimLeadingSpace``
    strips leading blanks per field (same twin). ``Quote`` set → from_csv
    quote-aware FSM path (DelimiterModeFsmParser).
    """
    src = cfg.get("SourceKey", "text")
    sep = cfg.get("Separator", ",")
    quote = cfg.get("Quote")
    keys = cfg["Keys"]
    allow_short = cfg.get("AllowingShortenedFields", False)
    overflow = cfg.get("OverflowedFieldsTreatment", "extend")
    n_extend = cfg.get("ExtendedColumns", 3)  # plan-time bound for 'extend'
    # extras named __column{N}__ (ProcessorParseDelimiterNative.cpp:368-400)
    # by default; the Go split_string twin passes its ExpandKeyPrefix for
    # <prefix>1..N naming (split_string.go:33-45)
    ext_prefix = cfg.get("ExtendKeyPrefix")
    trim_lead = cfg.get("TrimLeadingSpace", False)

    def run(df):
        if quote:
            ddl = ", ".join(f"`{k}` string" for k in keys)
            opts = {"sep": sep, "quote": quote}
            if trim_lead:
                opts["ignoreLeadingWhiteSpace"] = "true"
            parsed = F.from_csv(F.col(src), ddl, opts)
            ok = parsed.isNotNull()
            cols = {k: parsed.getField(k) for k in keys}
            return apply_parse_result(df, src, ok, cols, cfg)
        parts = F.split(F.col(src), re.escape(sep))
        if trim_lead:
            parts = F.transform(parts, lambda x: F.ltrim(x))
        n = F.size(parts)
        ok = (n >= len(keys)) if not allow_short else (n >= 1)
        cols = {}
        for i, k in enumerate(keys):
            c = F.when(n > i, F.element_at(parts, i + 1))
            if i == len(keys) - 1 and overflow == "keep":
                # fold overflow back into the last key
                c = F.when(
                    n > len(keys),
                    F.array_join(F.slice(parts, len(keys), 2**31 - 1), sep),
                ).otherwise(c)
            cols[k] = c
        if overflow == "extend":
            for j in range(n_extend):
                idx = len(keys) + j
                name = f"{ext_prefix}{j + 1}" if ext_prefix else f"__column{j}__"
                cols[name] = F.when(n > idx, F.element_at(parts, idx + 1))
        elif overflow == "preserve":
            cols["_decode_preserve_"] = F.when(
                n > len(keys),
                F.array_join(F.slice(parts, len(keys) + 1, 2**31 - 1), sep),
            )
        return apply_parse_result(df, src, ok, cols, cfg)

    return run


@register("processor_split_key_value",
          keys=COMMON_PARSE_KEYS | {"Delimiter", "Separator", "Keys",
                                    "AttrsKey", "AllowingMissingKeys",
                                    "EmptyKeyPrefix", "NoSeparatorKeyPrefix"})
def parse_kv(cfg: dict):
    """Key/value splitting (``a=1&b=2``).

    Semantics matched: key_value_splitter.go:26-45 — ``Delimiter`` between
    pairs, ``Separator`` between key and value; anomalous pairs keep their
    content under generated keys: a pair WITHOUT the separator lands at
    ``NoSeparatorKeyPrefix<idx>`` and a pair with an EMPTY key at
    ``EmptyKeyPrefix<idx>`` (idx = the pair's position — a deterministic
    variant of the reference's running counter). With ``Keys`` given, each
    listed key becomes a top-level column; otherwise the pairs land in a
    ``map<string,string>`` column ``AttrsKey``.

    Spark: ``str_to_map`` on the fast path; the anomaly-aware map is an
    indexed ``transform`` + ``map_from_entries`` — still pure codegen.
    """
    src = cfg.get("SourceKey", "text")
    delim = cfg.get("Delimiter", "&")
    sep = cfg.get("Separator", "=")
    keys = cfg.get("Keys")
    attrs_key = cfg.get("AttrsKey", "attrs")
    empty_prefix = cfg.get("EmptyKeyPrefix")
    nosep_prefix = cfg.get("NoSeparatorKeyPrefix")

    def run(df):
        ok = F.col(src).contains(sep)
        if keys:
            m = F.str_to_map(
                F.col(src), F.lit(re.escape(delim)), F.lit(re.escape(sep))
            )
            cols = {k: m.getItem(k) for k in keys}
            if not cfg.get("AllowingMissingKeys", False):
                for k in keys:
                    ok = ok & m.getItem(k).isNotNull()
            return apply_parse_result(df, src, ok, cols, cfg)
        if empty_prefix is None and nosep_prefix is None:
            m = F.str_to_map(
                F.col(src), F.lit(re.escape(delim)), F.lit(re.escape(sep))
            )
            return apply_parse_result(df, src, ok, {attrs_key: m}, cfg)
        # anomaly-aware path: per-pair key generation
        ep = empty_prefix if empty_prefix is not None else "empty_key_"
        np_ = nosep_prefix if nosep_prefix is not None else "no_separator_key_"
        pairs = F.split(F.col(src), re.escape(delim))
        entries = F.transform(
            pairs,
            lambda p, i: F.struct(
                F.when(~p.contains(sep),
                       F.concat(F.lit(np_), i.cast("string")))
                .when(F.substring_index(p, sep, 1) == "",
                      F.concat(F.lit(ep), i.cast("string")))
                .otherwise(F.substring_index(p, sep, 1))
                .alias("key"),
                F.when(~p.contains(sep), p)
                .otherwise(
                    F.substr(p, F.length(F.substring_index(p, sep, 1))
                             + len(sep) + 1)
                )
                .alias("value"),
            ),
        )
        m = F.map_from_entries(entries)
        return apply_parse_result(df, src, ok, {attrs_key: m}, cfg)

    return run


@register("processor_parse_apsara", keys=COMMON_PARSE_KEYS | {"AttrsKey"})
def parse_apsara(cfg: dict):
    """Apsara log format: ``[2026-01-01 00:00:00.123456]\\t[LEVEL]\\t[thread]
    \\t[file:line]\\tk:v\\tk:v...`` (ProcessorParseApsaraNative.cpp:205-232).

    Spark composition: regexp_extract for the bracketed header fields +
    str_to_map for the trailing kv pairs.
    """
    src = cfg.get("SourceKey", "text")
    attrs_key = cfg.get("AttrsKey", "attrs")
    header = r"^\[([^\]]+)\]\t\[(\w+)\]\t\[(\d+)\]\t\[([^\]:]+):(\d+)\]\t?(.*)$"

    def run(df):
        c = F.col(src)
        ok = c.rlike(header)
        rest = F.regexp_extract(c, header, 6)
        cols = {
            "microtime": F.regexp_extract(c, header, 1),
            "__LEVEL__": F.regexp_extract(c, header, 2),
            "__THREAD__": F.regexp_extract(c, header, 3).try_cast("long"),
            "__FILE__": F.regexp_extract(c, header, 4),
            "__LINE__": F.regexp_extract(c, header, 5).try_cast("long"),
            attrs_key: F.when(
                rest != "", F.str_to_map(rest, F.lit("\t"), F.lit(":"))
            ),
        }
        return apply_parse_result(df, src, ok, cols, cfg)

    return run


@register("processor_parse_timestamp", keys={"SourceKey", "SourceFormat", "SourceTimezone", "DestKey", "DropIfFail"})
def parse_timestamp(cfg: dict):
    """strptime-style event-time extraction.

    Semantics matched: ProcessorParseTimestampNative.cpp:140-205 — parse
    ``SourceKey`` with ``SourceFormat`` (Spark datetime pattern), optional
    ``SourceTimezone`` ('GMT+08:00' style), set the event time column
    (``DestKey``, default ``ts``); rows whose time can't parse are dropped
    iff ``DropIfFail`` (the reference's discard-unmatched behavior).
    """
    src = cfg["SourceKey"]
    fmt = cfg.get("SourceFormat", "yyyy-MM-dd HH:mm:ss")
    tz = cfg.get("SourceTimezone")
    dest = cfg.get("DestKey", "ts")
    drop_fail = cfg.get("DropIfFail", False)

    def run(df):
        parsed = F.try_to_timestamp(F.col(src), F.lit(fmt))
        if tz:
            parsed = F.to_utc_timestamp(parsed, tz)
        out = df.withColumn(dest, parsed)
        if drop_fail:
            out = out.filter(F.col(dest).isNotNull())
        return out

    return run
