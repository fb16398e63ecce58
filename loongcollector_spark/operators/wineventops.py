"""service_wineventlog — Windows event log decode (plugins/input/
input_wineventlog/).

The reference plugin reads rendered event XML from the Windows Event
Log API and converts each record with ``Record.ToEvent``
(eventlog/eventlog.go:67-132): a fixed six-field header plus zero-gated
``addValue`` fields and the ``addPairs`` JSON packing of EventData /
UserData.  The API-side XPath query (``win.Query`` built at
eventlog/wineventlog.go:233-239 from the winlogbeat query builder)
filters by event id grammar, level names, provider list and age.

What this module models, over a frame of forwarded event-XML rows:

* the XML → field extraction that winlogbeat's ``UnmarshalEventXML``
  performs (System attributes/elements, RenderingInfo strings,
  EventData/UserData ``<Data>`` pairs) — here as codegen regexps over
  the machine-generated XML;
* ``ToEvent`` exactly: the six unconditional fields, ``addValue``'s
  ignore-zero gating per field type (eventlog.go:137-143 — ``""`` for
  strings, ``0`` for numbers, empty slice for keyword lists), the
  ``addPairs`` renaming of unnamed/``Data`` keys to ``Data1..DataN`` in
  encounter order and its Go ``json.Marshal`` sorted-key object
  (eventlog.go:115-132), the ``user_data`` ``xml_name`` extra pair, and
  ``RemoveWindowsLineEndings`` on the message (``\\r\\n`` → ``\\n``,
  trailing newlines trimmed);
* the Level fallback ``win.EventLevel(LevelRaw).String()``
  (wineventlog.go:206-208): 1 Critical, 2 Error, 3 Warning, 5 Verbose,
  0/4 Information;
* the query filters with winlogbeat's grammar: ``EventID`` accepts
  ``4624``, ``4700-4800`` and ``-4735`` (comma-separated; includes
  ORed, minus-entries suppressed, no includes ⇒ all), ``Level`` accepts
  names (``information``/``info`` ⇒ raw 0 and 4, ``warning``/``warn``
  ⇒ 3, ``error``/``err`` ⇒ 2, ``critical``/``crit`` ⇒ 1, ``verbose``
  ⇒ 5) or raw numbers, ``Provider`` is a name list, ``IgnoreOlder``
  drops events older than N seconds before a caller-supplied reference
  time (deterministic stand-in for the XPath ``timediff``).

Off-Windows caveats, stated rather than hidden: message/level/task/
opcode/keywords strings come from the event's ``RenderingInfo`` block
(what a forwarder that rendered locally ships); SID → account lookup
(``PopulateAccount``) cannot run here, so ``user_name``/``user_domain``
/``user_type`` take the failed-lookup value ``""`` exactly like the
reference on an unresolvable SID (eventlog/wineventlog.go:192-196).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register
from loongcollector_spark.operators.common import go_jstr as _go_jstr

# win.EventLevel(raw).String() — winlogbeat sys/wineventlog levels
LEVEL_NAMES = {0: "Information", 1: "Critical", 2: "Error",
               3: "Warning", 4: "Information", 5: "Verbose"}

# winlogbeat query builder: level name -> raw values
_LEVEL_TOKENS = {
    "verbose": (5,), "information": (0, 4), "info": (0, 4),
    "warning": (3,), "warn": (3,), "error": (2,), "err": (2,),
    "critical": (1,), "crit": (1,),
}


def _xml_unescape(c: Column) -> Column:
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _attr(src: Column, elem: str, attr: str) -> Column:
    return _xml_unescape(F.regexp_extract(
        src, rf"<{elem}\b[^>]*\s{attr}=['\"]([^'\"]*)['\"]", 1))


def _elem(src: Column, elem: str) -> Column:
    return _xml_unescape(F.regexp_extract(
        src, rf"<{elem}(?:\s[^>]*)?>([^<]*)</{elem}>", 1))


def _data_tags(section: Column) -> Column:
    """``<Data>`` tags of one section, in document order."""
    return F.regexp_extract_all(
        section, F.lit(r"(?s)(<Data\b[^>]*?(?:/>|>.*?</Data>))"), 1)


def _data_names(tags: Column) -> Column:
    return F.transform(
        tags, lambda t: F.regexp_extract(t, r"\sName=['\"]([^'\"]*)['\"]", 1))


def _data_pairs(tags: Column, names: Column) -> Column:
    """Materialized tag + name arrays (MUST be column references — a
    captured regexp_extract_all expression re-evaluates per element, the
    dup_ngram_stats lesson) → array<struct<key,value>> with the addPairs
    renaming: empty/``Data`` names become Data1..DataN in encounter
    order (eventlog.go:117-126)."""
    unnamed = F.transform(names, lambda nm: (nm == "") | (nm == "Data"))
    return F.transform(
        tags,
        lambda t, i: F.struct(
            F.when(
                F.element_at(unnamed, i + 1),
                F.concat(
                    F.lit("Data"),
                    F.size(F.filter(
                        F.slice(unnamed, F.lit(1), i + 1), lambda u: u))
                    .cast("string")))
            .otherwise(_xml_unescape(F.element_at(names, i + 1)))
            .alias("key"),
            _xml_unescape(F.coalesce(
                F.regexp_extract(t, r"(?s)>(.*)</Data>", 1), F.lit("")))
            .alias("value"),
        ),
    )


def _go_json_pairs(entries: Column) -> Column:
    """array<struct<key,value>> → Go ``json.Marshal`` object: keys
    sorted, HTML-escaped strings, LAST occurrence of a duplicate key
    wins (addPairs inserts into a map in slice order — a renamed DataN
    can collide with a literal ``DataN`` name and Go emits it once);
    empty array → ``{}``.  MUST be called with a materialized column
    (the dedupe filter captures ``entries`` in a nested lambda)."""
    deduped = F.filter(
        entries,
        lambda e, i: F.size(F.filter(
            entries,
            lambda e2, j: (e2["key"] == e["key"]) & (j > i))) == 0)
    body = F.array_join(
        F.transform(
            F.array_sort(deduped),
            lambda e: F.concat(_go_jstr(e["key"]), F.lit(":"),
                               _go_jstr(e["value"]))),
        ",")
    return F.concat(F.lit("{"), F.coalesce(body, F.lit("")), F.lit("}"))


def _event_id_pred(grammar: str) -> "tuple":
    """winlogbeat's EventID grammar → (includes, ranges, excludes)."""
    incl, ranges, excl = [], [], []
    for tok in str(grammar).split(","):
        tok = tok.strip()
        if not tok:
            continue
        if tok.startswith("-"):
            excl.append(int(tok[1:]))
        elif "-" in tok:
            lo, hi = tok.split("-", 1)
            ranges.append((int(lo), int(hi)))
        else:
            incl.append(int(tok))
    return incl, ranges, excl


def _level_values(level: str) -> list[int]:
    vals: list[int] = []
    for tok in str(level).lower().split(","):
        tok = tok.strip()
        if not tok:
            continue
        if tok in _LEVEL_TOKENS:
            vals.extend(_LEVEL_TOKENS[tok])
        else:
            vals.append(int(tok))
    return vals


def wineventlog_decode(
    df: DataFrame, source_key: str = "xml",
    name: str = "", event_id: str = "", level: str = "",
    provider: list[str] | None = None, ignore_older: int = 0,
    ignore_zero: bool = False, reference_now: str | None = None,
) -> DataFrame:
    """Forwarded event XML → the ToEvent field map + the record's
    SystemTime (``collector.AddData(values, nil, r.TimeCreated.
    SystemTime)``, wineventlog.go:200).

    Plan shape: the query filters evaluate FIRST over the four cheap
    header extractions (the XPath query runs before any record is
    rendered in the reference too), so rejected events never pay the
    full decode; the ``<Data>`` tag / name arrays and the RenderingInfo
    block are materialized as columns in their own projections before
    any lambda references them (a captured regexp expression inside
    ``transform`` re-evaluates per element — the dup_ngram_stats
    lesson).  All codegen + array HOFs; no shuffle, no Python."""
    src = F.col(source_key)
    level_raw = F.regexp_extract(src, r"<Level>(\d+)</Level>", 1)

    # ---- stage 0: cheap filter columns, then the query filters -------
    pre = df.select(
        src.alias("_src"),
        F.coalesce(
            F.regexp_extract(src, r"<EventID[^>]*>(\d+)</EventID>", 1)
            .try_cast("int"), F.lit(-1)).alias("_eid"),
        F.coalesce(F.nullif(level_raw, F.lit("")).try_cast("int"),
                   F.lit(4)).alias("_lvl"),
        _attr(src, "Provider", "Name").alias("_prov"),
        _elem(src, "Channel").alias("_chan"),
        F.to_timestamp(F.regexp_replace(
            _attr(src, "TimeCreated", "SystemTime"),
            r"(\.\d{6})\d*(Z?)$", "$1$2")).alias("event_time"),
    )
    cond = F.lit(True)
    if name:
        cond &= F.col("_chan") == name
    if event_id:
        incl, ranges, excl = _event_id_pred(event_id)
        if incl or ranges:
            inc = F.lit(False)
            if incl:
                inc |= F.col("_eid").isin(*incl)
            for lo, hi in ranges:
                inc |= F.col("_eid").between(lo, hi)
            cond &= inc
        if excl:
            cond &= ~F.col("_eid").isin(*excl)
    if level:
        vals = _level_values(level)
        if vals:
            cond &= F.col("_lvl").isin(*vals)
    if provider:
        cond &= F.col("_prov").isin(*list(provider))
    if ignore_older and not reference_now:
        raise ValueError(
            "service_wineventlog: IgnoreOlder needs ReferenceNow as its "
            "deterministic anchor — refusing to silently skip the "
            "configured age filter")
    if ignore_older and reference_now:
        cond &= F.col("event_time") >= F.timestamp_add(
            "SECOND", F.lit(-int(ignore_older)),
            F.lit(reference_now).cast("timestamp"))
    pre = pre.filter(cond)

    # ---- stage 1: materialize the heavy blocks/arrays as columns -----
    src = F.col("_src")
    user_block = F.regexp_extract(
        src, r"(?s)<UserData\b[^>]*>(.*?)</UserData>", 1)
    mid = pre.select(
        "_src", "_eid", "_lvl", "_prov", "_chan", "event_time",
        F.regexp_extract(
            src, r"(?s)<RenderingInfo\b[^>]*>(.*?)</RenderingInfo>", 1)
        .alias("_rblock"),
        _data_tags(F.regexp_extract(
            src, r"(?s)<EventData\b[^>]*>(.*?)</EventData>", 1))
        .alias("_ed_tags"),
        _data_tags(user_block).alias("_ed_ud_tags"),
        F.regexp_extract(
            user_block, r"<\s*(?:[A-Za-z0-9_.-]+:)?([A-Za-z0-9_.-]+)", 1)
        .alias("_xml_name"),
    ).select(
        "*",
        _data_names(F.col("_ed_tags")).alias("_ed_names"),
        _data_names(F.col("_ed_ud_tags")).alias("_ud_names"),
    ).select(
        # pairs materialized as columns: _go_json_pairs' last-wins
        # dedupe captures its argument in a nested lambda, so the
        # argument must be an attribute, not a regexp expression
        "*",
        _data_pairs(F.col("_ed_tags"), F.col("_ed_names"))
        .alias("_ed_pairs"),
        F.concat(
            _data_pairs(F.col("_ed_ud_tags"), F.col("_ud_names")),
            F.array(F.struct(F.lit("xml_name").alias("key"),
                             F.col("_xml_name").alias("value"))))
        .alias("_ud_pairs"),
    )

    # ---- stage 2: ToEvent over the materialized columns --------------
    rblock = F.col("_rblock")

    def rendered(elem):
        return _xml_unescape(F.regexp_extract(
            rblock, rf"(?s)<{elem}(?:\s[^>]*)?>(.*?)</{elem}>", 1))

    rendered_level = rendered("Level")
    level_str = F.when(rendered_level != "", rendered_level).otherwise(
        F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(x) for kv in LEVEL_NAMES.items()
                               for x in kv]),
                F.col("_lvl")),
            F.lit("")))
    # sys.RemoveWindowsLineEndings
    message = F.regexp_replace(
        F.regexp_replace(rendered("Message"), "\r\n", "\n"), "\n+$", "")
    keywords = F.regexp_extract_all(
        F.regexp_extract(rblock, r"(?s)<Keywords>(.*?)</Keywords>", 1),
        F.lit(r"<Keyword>([^<]*)</Keyword>"), 1)
    kw_str = F.concat(F.lit("["), F.array_join(
        F.transform(keywords, _xml_unescape), " "), F.lit("]"))

    user_sid = _attr(src, "Security", "UserID")

    # (key, value, zero-literal-or-None). None = unconditional
    # (eventlog.go:69-76); otherwise addValue drops the zero value when
    # IgnoreZeroValue is set.
    fields: list[tuple[str, Column, str | None]] = [
        ("type", F.lit("wineventlog"), None),
        ("log_name", F.col("_chan"), None),
        ("source_name", F.col("_prov"), None),
        ("computer_name", _elem(src, "Computer"), None),
        ("record_number", _elem(src, "EventRecordID"), None),
        ("event_id",
         F.when(F.col("_eid") >= 0, F.col("_eid").cast("string"))
         .otherwise(F.lit("")), None),
        ("xml", src, ""),
        ("provider_guid", _attr(src, "Provider", "Guid"), ""),
        ("version", F.coalesce(
            F.nullif(_elem(src, "Version"), F.lit("")), F.lit("0")), "0"),
        ("level", level_str, ""),
        ("task", rendered("Task"), ""),
        ("opcode", rendered("Opcode"), ""),
        ("keywords", kw_str, "[]"),
        ("message", message, ""),
        ("activity_id", _attr(src, "Correlation", "ActivityID"), ""),
        ("related_activity_id",
         _attr(src, "Correlation", "RelatedActivityID"), ""),
    ]
    for key, attr in (("process_id", "ProcessID"),
                      ("thread_id", "ThreadID"),
                      ("processor_id", "ProcessorID"),
                      ("session_id", "SessionID"),
                      ("kernel_time", "KernelTime"),
                      ("user_time", "UserTime"),
                      ("processor_time", "ProcessorTime")):
        fields.append((key, F.coalesce(
            F.nullif(_attr(src, "Execution", attr), F.lit("")),
            F.lit("0")), "0"))
    entries = []
    for key, val, zero in fields:
        val = F.coalesce(val, F.lit(""))
        e = F.struct(F.lit(key).alias("key"), val.alias("value"))
        if zero is None:
            entries.append(e)
        elif ignore_zero:
            entries.append(F.when(val != zero, e))
        else:
            entries.append(e)
    # user fields gated on a present SID (eventlog.go:100-105); account
    # lookup is a Windows API — ship the failed-lookup "" like the
    # reference does on unresolvable SIDs.
    for key in ("user_identifier", "user_name", "user_domain",
                "user_type"):
        val = user_sid if key == "user_identifier" else F.lit("")
        e = F.struct(F.lit(key).alias("key"), val.alias("value"))
        keep = (user_sid != "") & (
            F.lit(True) if (key == "user_identifier" or not ignore_zero)
            else F.lit(False))
        entries.append(F.when(keep, e))
    entries.append(F.struct(
        F.lit("event_data").alias("key"),
        _go_json_pairs(F.col("_ed_pairs")).alias("value")))
    entries.append(F.struct(
        F.lit("user_data").alias("key"),
        _go_json_pairs(F.col("_ud_pairs")).alias("value")))

    return mid.select(
        F.map_from_entries(
            F.filter(F.array(*entries), lambda e: e.isNotNull()))
        .alias("fields"),
        F.col("event_time"),
    )


@register("service_wineventlog",
          keys={"SourceKey", "Name", "EventID", "Level", "Provider",
                "IgnoreOlder", "IgnoreZeroValue", "ReferenceNow"})
def service_wineventlog(cfg: dict):
    """Registry twin of the plugin config (wineventlog.go:37-71):
    Name/EventID/Level/Provider/IgnoreOlder/IgnoreZeroValue, plus
    SourceKey for the forwarded-XML column and ReferenceNow as the
    deterministic ``IgnoreOlder`` anchor."""
    def run(df: DataFrame) -> DataFrame:
        return wineventlog_decode(
            df, source_key=cfg.get("SourceKey", "xml"),
            name=str(cfg.get("Name", "")),
            event_id=str(cfg.get("EventID", "")),
            level=str(cfg.get("Level", "")),
            provider=cfg.get("Provider"),
            ignore_older=int(cfg.get("IgnoreOlder", 0)),
            ignore_zero=bool(cfg.get("IgnoreZeroValue", False)),
            reference_now=cfg.get("ReferenceNow"),
        )

    return run
