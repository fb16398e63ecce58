"""Field-level operators: projection, renaming, masking, encoding.

Each factory cites the reference processor whose semantics it matches.
All are single codegen expressions — no shuffles, no UDFs (except the
regex-bounded md5 mask, which uses an Arrow-vectorized pandas UDF).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from loongcollector_spark.operators import register


@register("processor_drop", keys={"DropKeys"})
def drop_fields(cfg: dict):
    """Drop columns (processor_drop.go:24-29: delete fields in DropKeys)."""
    keys = cfg["DropKeys"]

    def run(df):
        return df.drop(*[k for k in keys if k in df.columns])

    return run


@register("processor_rename", keys={"SourceKeys", "DestKeys", "NoKeyError"})
def rename_fields(cfg: dict):
    """Rename SourceKeys[i] → DestKeys[i] (processor_rename.go:26-34).
    ``NoKeyError``: raise at plan time if a source column is absent."""
    src, dst = cfg["SourceKeys"], cfg["DestKeys"]
    no_key_error = cfg.get("NoKeyError", False)

    def run(df):
        for s, d in zip(src, dst):
            if s not in df.columns:
                if no_key_error:
                    raise KeyError(f"rename: missing column {s!r}")
                continue
            df = df.withColumnRenamed(s, d)
        return df

    return run


@register("processor_add_fields", keys={"Fields", "IgnoreIfExist"})
def add_fields(cfg: dict):
    """Add constant fields (processor_add_fields.go:26-31); ``IgnoreIfExist``
    keeps a pre-existing column."""
    fields = cfg["Fields"]
    ignore_exist = cfg.get("IgnoreIfExist", False)

    def run(df):
        for k, v in fields.items():
            if ignore_exist and k in df.columns:
                continue
            df = df.withColumn(k, F.lit(v))
        return df

    return run


@register("processor_pick_key", keys={"Include", "Exclude"})
def pick_key(cfg: dict):
    """Whitelist/blacklist projection (processor_pick_key.go:26-37)."""
    include = cfg.get("Include")
    exclude = cfg.get("Exclude")

    def run(df):
        if include:
            return df.select(*[c for c in df.columns if c in set(include)])
        if exclude:
            return df.drop(*[c for c in exclude if c in df.columns])
        return df

    return run


@register("processor_drop_last_key", keys={"DropKey", "Include"})
def drop_last_key(cfg: dict):
    """Drop the raw key once all Include keys parsed successfully
    (processor_drop_last_key.go:26-33) — per-row: null the raw where every
    parsed column is present."""
    drop_key = cfg["DropKey"]
    include = cfg["Include"]

    def run(df):
        cond = F.lit(True)
        for k in include:
            cond = cond & F.col(k).isNotNull()
        return df.withColumn(drop_key, F.when(~cond, F.col(drop_key)))

    return run


@register("processor_pack_json", keys={"SourceKeys", "DestKey"})
def pack_json(cfg: dict):
    """Pack SourceKeys into one JSON object DestKey
    (processor_packjson.go:26-33) — ``to_json(struct(...))``."""
    src = cfg["SourceKeys"]
    dest = cfg.get("DestKey", "packed")

    def run(df):
        return df.withColumn(dest, F.to_json(F.struct(*[F.col(k) for k in src])))

    return run


@register("processor_appender", keys={"Key", "Value"})
def appender(cfg: dict):
    """Append constant Value onto Key (processor_appender.go:31-42)."""
    key, value = cfg["Key"], cfg["Value"]

    def run(df):
        return df.withColumn(key, F.concat(F.coalesce(F.col(key), F.lit("")), F.lit(value)))

    return run


@register("processor_anchor", keys={"SourceKey", "Anchors", "NoAnchorError"})
def anchor(cfg: dict):
    """Substring extraction between Start/Stop literals per anchor
    (anchor.go:36-63). Start=='' anchors at string start; Stop=='' runs to
    end. Output FieldName per anchor. ``NoAnchorError`` only suppresses
    the reference's per-log error logging — accepted, no plan effect.
    ``FieldType: json`` + ``ExpondJson`` (anchor.go:77-90) parses the
    extracted substring; dynamic keys land in the FieldName column as a
    ``map<string,string>`` (this engine's schema-less JSON convention)."""
    src = cfg.get("SourceKey", "text")
    anchors = cfg["Anchors"]

    def run(df):
        c = F.col(src)
        for a in anchors:
            start, stop, name = a.get("Start", ""), a.get("Stop", ""), a["FieldName"]
            pat = (
                ("^" if not start else re.escape(start))
                + "(.*?)"
                + ("$" if not stop else re.escape(stop))
            )
            extracted = F.regexp_extract(c, pat, 1)
            is_json = str(a.get("FieldType", "string")).lower() == "json"
            expand = a.get("ExpondJson", a.get("ExpondJSON", False))
            if is_json and expand and a.get("MaxExpondDepth") != 1:
                extracted = F.from_json(extracted, "map<string,string>")
            df = df.withColumn(name, extracted)
        return df

    return run


@register("processor_base64_encoding", keys={"SourceKey", "NewKey"})
def base64_encode(cfg: dict):
    src, dest = cfg["SourceKey"], cfg.get("NewKey", cfg["SourceKey"])

    def run(df):
        return df.withColumn(dest, F.base64(F.col(src).cast("binary")))

    return run


@register("processor_base64_decoding", keys={"SourceKey", "NewKey"})
def base64_decode(cfg: dict):
    src, dest = cfg["SourceKey"], cfg.get("NewKey", cfg["SourceKey"])

    def run(df):
        # try_to_binary: malformed base64 yields null instead of failing
        # the job under ANSI mode (the Go twin logs and skips on decode
        # errors — a poisoned row must never kill the pipeline)
        return df.withColumn(
            dest, F.try_to_binary(F.col(src), F.lit("base64")).cast("string")
        )

    return run


@register("processor_md5", keys={"SourceKey", "MD5Key"})
def md5_op(cfg: dict):
    """md5 of a field into MD5Key (processor_md5.go:26-32)."""
    src, dest = cfg["SourceKey"], cfg.get("MD5Key", "md5")

    def run(df):
        return df.withColumn(dest, F.md5(F.col(src).cast("binary")))

    return run


@register("processor_string_replace", keys={"SourceKey", "Method", "Match", "ReplaceString", "DestKey"})
def string_replace(cfg: dict):
    """Replace in a field (processor_string_replace.go:41-56):
    Method ∈ {regex, const, unquote}; optional DestKey."""
    src = cfg["SourceKey"]
    method = cfg.get("Method", "regex")
    match = cfg.get("Match", "")
    repl = cfg.get("ReplaceString", "")
    dest = cfg.get("DestKey", src)

    def run(df):
        c = F.col(src)
        if method == "const":
            out = F.replace(c, F.lit(match), F.lit(repl))
        elif method == "unquote":
            out = F.regexp_replace(c, r'^"(.*)"$', "$1")
        else:
            out = F.regexp_replace(c, match, repl)
        return df.withColumn(dest, out)

    return run


def _md5_region_udf(begin_rx: str, content_rx: str):
    """Arrow-vectorized fallback for regex-bounded md5 masking — the one
    desensitize mode plain expressions can't express (per-match md5).
    Batch-vectorized pandas, never per-row Python driver loops."""
    import hashlib

    brx = re.compile(begin_rx) if begin_rx else None
    crx = re.compile(content_rx)

    @pandas_udf("string")
    def mask(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            start = 0
            if brx:
                m = brx.search(v)
                if not m:
                    return v
                start = m.end()
            return v[:start] + crx.sub(
                lambda mm: hashlib.md5(mm.group(0).encode()).hexdigest(), v[start:]
            )

        return s.map(one)

    return mask


@register("processor_desensitize", keys={"SourceKey", "Method", "RegexBegin", "RegexContent", "ReplacingString"})
def desensitize(cfg: dict):
    """Mask sensitive content (ProcessorDesensitizeNative.cpp:32-126 + Go
    twin): Method ∈ {const, md5}; whole value or regex-bounded region
    (RegexBegin locates the start, RegexContent the content to mask);
    ReplacingAll for const mode."""
    src = cfg["SourceKey"]
    method = cfg.get("Method", "const")
    begin = cfg.get("RegexBegin", "")
    content = cfg.get("RegexContent", "")
    repl = cfg.get("ReplacingString", "********")

    def run(df):
        c = F.col(src)
        if method == "const":
            if content:
                pat = (f"(?<={begin})" if begin else "") + content
                out = F.regexp_replace(c, pat, repl.replace("$", "\\$"))
            else:
                out = F.lit(repl)
            return df.withColumn(src, out)
        # md5 mode
        if not content:
            return df.withColumn(src, F.md5(c.cast("binary")))
        return df.withColumn(src, _md5_region_udf(begin, content)(c))

    return run
