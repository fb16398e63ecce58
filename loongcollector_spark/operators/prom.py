r"""Prometheus text-exposition parse + relabel — Spark-native.

Reference semantics:

* ``processor_prom_parse_metric_native``
  (core/plugin/processor/inner/ProcessorPromParseMetricNative.cpp:27-67,
  core/prometheus/labels/TextParser.cpp:70-321): a per-line char FSM over
  the exposition format ``name{k="v",...} value [timestamp] [# exemplar]``.
  Here the whole grammar compiles to ONE Java regex with possessive
  quantifiers (``*+``/``++``), which makes the regex token-greedy exactly
  like the FSM (no backtracking re-splits, e.g. ``fooInf`` can never
  re-parse as name ``foo`` + value ``Inf``) — so parse is a codegen
  ``rlike`` + ``regexp_extract``/``regexp_extract_all`` pipeline, no UDF.

  Matching FSM details carried over: label-value escapes ``\\``, ``\"``,
  ``\n`` decode, any other ``\x`` stays verbatim (TextParser.cpp:179-193);
  timestamps < 2^31 are seconds, larger are milliseconds
  (TextParser.cpp:305-307); with HonorTimestamps an explicit timestamp
  under 10 digits of seconds invalidates the line (TextParser.cpp:311-315),
  without HonorTimestamps the scrape default always wins; a ``#`` after
  the value starts an ignored exemplar; value grammar is the reference's
  IsValidNumberChar set (digits ``.+-eE`` and the Inf/NaN letters).
  Documented divergence: hex-float literals (``0x1A``) parse via strtod in
  C++ but are rejected here — they do not occur in exposition output.

* ``processor_prom_relabel_metric_native``
  (core/prometheus/labels/Relabel.cpp:136-252): the prometheus relabel
  action list (replace/keep/drop/keepequal/dropequal/hashmod/labelmap/
  labeldrop/labelkeep/lowercase/uppercase/dropmetric) over a label set.
  Labels live in one ``map<string,string>`` column (``__name__`` is a
  label, as in the reference's Labels wrapper), and every action is a map
  expression: row filters for keep/drop/dropmetric, ``map_concat`` upsert
  (LAST_WIN session policy) for replace/lowercase/uppercase/hashmod,
  ``map_filter`` for labeldrop/labelkeep. hashmod is the reference's
  md5-last-8-bytes mod N (Relabel.cpp:195-205) via
  ``conv(substr(md5(v),17,16),16,10)`` — JVM-side, byte-identical.
  Documented divergence: the reference applies ``replace`` with an
  UNanchored regex_search (Relabel.cpp:173), while upstream Prometheus —
  whose configs these are — always fully anchors the regex; we follow the
  anchored upstream semantics (``^(?:re)$``).

Scale shape: parse is one scan → codegen regex ops, no shuffle; relabel
is per-row map algebra, no shuffle; both fuse into whole-stage codegen
with whatever pipeline surrounds them. The only interpreted pieces are
map lambda HOFs over ≤dozens of label entries per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register

# --- the exposition-format grammar as one possessive-quantifier regex ---
_WS = "[ \\t]*+"
_LABEL_PAIR = '[A-Za-z_][A-Za-z_0-9]*+[ \\t]*+=[ \\t]*+"(?:[^"\\\\]|\\\\.)*+"'
_NUMCHARS = "[0-9.+\\-eEiInNfFtTyYxXaA]"
PROM_LINE_RE = (
    "^" + _WS
    + "([A-Za-z_:][A-Za-z_:0-9]*+)" + _WS                       # 1: name
    + "(?:\\{" + _WS
    + "((?:" + _LABEL_PAIR + "(?:" + _WS + "," + _WS + _LABEL_PAIR + ")*+)?+"
    + "(?:" + _WS + ",)?+)" + _WS                                # 2: labels
    + "\\}" + _WS + ")?+"
    + "(" + _NUMCHARS + "++)" + ""                               # 3: value
    + "(?:[ \\t]++(" + _NUMCHARS + "++))?+"                      # 4: timestamp
    + _WS + "(?:#.*)?+$"
)
_PAIR_RE = '([A-Za-z_][A-Za-z_0-9]*)[ \\t]*=[ \\t]*"((?:[^"\\\\]|\\\\.)*)"'

_SENT = "\x00"  # never occurs in exposition text


def _unescape(col: Column) -> Column:
    """Label-value unescape: ``\\\\``→``\\``, ``\\"``→``"``, ``\\n``→LF,
    any other ``\\x`` kept verbatim (TextParser.cpp:179-193). The sentinel
    swap makes the chained replaces equivalent to the FSM's one pass."""
    c = F.replace(col, F.lit("\\\\"), F.lit(_SENT))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    return F.replace(c, F.lit(_SENT), F.lit("\\"))


def _value_to_double(tok: Column) -> Column:
    """Sample-value text → double incl. the OpenMetrics Inf/NaN spellings
    (TextParserUnittest.cpp:243-268). NULL ⇒ invalid line."""
    low = F.lower(tok)
    bare = F.ltrim(F.regexp_replace(low, r"^\+", ""))
    return (
        F.when(bare.isin("inf", "infinity"), F.lit(float("inf")))
        .when(low.isin("-inf", "-infinity"), F.lit(float("-inf")))
        .when(bare.isin("nan") | low.isin("-nan"), F.lit(float("nan")))
        .otherwise(tok.try_cast("double"))
    )


def prom_parse_metric(
    df: DataFrame,
    source_col: str = "content",
    honor_timestamps: bool = True,
    default_ts_ms: int = 0,
) -> DataFrame:
    """Parse one exposition line per row → ``__name__``, ``labels``
    (map, including ``__name__`` as the reference's SetTag(NAME) does),
    ``value`` double, ``ts_ms`` long. Unparseable lines drop (the FSM's
    HandleError path). All other columns pass through."""
    line = F.col(source_col)
    name = F.regexp_extract(line, PROM_LINE_RE, 1)
    body = F.regexp_extract(line, PROM_LINE_RE, 2)
    vtok = F.regexp_extract(line, PROM_LINE_RE, 3)
    tstok = F.regexp_extract(line, PROM_LINE_RE, 4)

    value = _value_to_double(vtok)

    # timestamp: float millis; <2^31 means seconds (TextParser.cpp:305)
    tsd = tstok.try_cast("double")
    ts_valid = tsd.isNotNull() & ~F.isnan(tsd) & (tsd <= F.lit(float(2**63)))
    ms = F.when(tsd < F.lit(float(2**31)), tsd * 1000).otherwise(tsd)
    ms_long = ms.cast("long")
    if honor_timestamps:
        # explicit timestamp under 10 digits of seconds ⇒ line invalid
        ts_ok = F.when(tstok == "", F.lit(True)).otherwise(
            ts_valid & (ms_long >= F.lit(1_000_000_000_000))
        )
        ts_ms = F.when(tstok == "", F.lit(default_ts_ms)).otherwise(ms_long)
    else:
        ts_ok = F.when(tstok == "", F.lit(True)).otherwise(ts_valid)
        ts_ms = F.lit(default_ts_ms)

    keys = F.regexp_extract_all(body, F.lit(_PAIR_RE), F.lit(1))
    vals = F.transform(
        F.regexp_extract_all(body, F.lit(_PAIR_RE), F.lit(2)), _unescape
    )
    labels = F.map_concat(
        F.map_from_arrays(keys, vals),
        F.create_map(F.lit("__name__"), name),
    )

    passthrough = [c for c in df.columns if c != source_col]
    return (
        df.filter(line.rlike(PROM_LINE_RE))
        .select(
            *passthrough,
            name.alias("__name__"),
            labels.alias("labels"),
            value.alias("value"),
            ts_ms.alias("ts_ms"),
            ts_ok.alias("_ts_ok"),
        )
        .filter(F.col("value").isNotNull() & F.col("_ts_ok"))
        .drop("_ts_ok")
    )


# ----------------------------- relabel ---------------------------------

_DEFAULT_REGEX = "(.*)"


def _bind(col: Column, fn) -> Column:
    """Evaluate ``fn`` with ``col`` bound ONCE to a lambda variable.

    Chained relabel actions each use their input map several times
    (condition + old value + rewrite). If the action body referenced the
    previous action's *expression* directly, Catalyst's project collapse /
    predicate pushdown would substitute a full copy per reference —
    measured 626 inlined copies of the upstream parse regex (a 1.4 MB
    plan) for a 6-action chain. Routing the input through a 1-element
    ``transform`` makes every level reference its predecessor exactly
    once (the lambda variable is free to appear many times), so an
    N-action chain stays O(N) plan size and the parse runs once per row.
    """
    from loongcollector_spark.operators.common import bind_once

    return bind_once(col, fn)


def _anchored(regex: str) -> str:
    return "^(?:" + regex + ")$"


def _java_repl(repl: str) -> str:
    """boost/prometheus ``${1}`` group refs → Java's ``$1`` form."""
    import re as _pyre

    return _pyre.sub(r"\$\{(\d+)\}", r"$\1", repl)


def _src_value(cfg: dict, labels: Column) -> Column:
    sep = cfg.get("separator", ";")
    srcs = cfg.get("source_labels", [])
    if not srcs:
        return F.lit("")
    return F.concat_ws(
        sep, *[F.coalesce(labels[s], F.lit("")) for s in srcs]
    )


def _set_label(labels: Column, key: Column, val: Column) -> Column:
    # LAST_WIN map_concat = upsert (session.py sets the policy)
    return F.map_concat(labels, F.create_map(key, val))


def _apply_one(df: DataFrame, cfg: dict) -> DataFrame:
    """One RelabelConfig (Relabel.cpp:136-252). Row-dropping actions are
    filters; label-editing actions rewrite the ``labels`` map column."""
    action = cfg["action"].lower()
    regex = cfg.get("regex", _DEFAULT_REGEX)
    full = _anchored(regex)
    replacement = _java_repl(cfg.get("replacement", "$1"))
    target = _java_repl(cfg.get("target_label", ""))
    labels = F.col("labels")
    val = _src_value(cfg, labels)

    if action == "keep":
        return df.filter(val.rlike(full))
    if action == "drop":
        return df.filter(~val.rlike(full))
    if action == "keepequal":
        return df.filter(F.coalesce(labels[target], F.lit("")) == val)
    if action == "dropequal":
        return df.filter(F.coalesce(labels[target], F.lit("")) != val)
    if action == "dropmetric":
        # source is the metric name (Relabel.cpp Init appends __name__)
        name = F.coalesce(labels["__name__"], F.lit(""))
        return df.filter(~name.isin(list(cfg.get("match_list", []))))

    # label-editing actions: body uses its input map several times, so it
    # runs under _bind — the previous action's output is referenced once.
    if action == "replace":
        def body(l: Column) -> Column:
            v = _src_value(cfg, l)
            matched = v.rlike(full)
            tgt = F.regexp_replace(v, full, target)    # $n interpolation
            res = F.regexp_replace(v, full, replacement)
            deleted = F.map_filter(l, lambda k, _v: k != tgt)
            return (
                F.when(~matched, l)
                .when(res == "", deleted)
                .otherwise(_set_label(l, tgt, res))
            )
        return df.withColumn("labels", _bind(labels, body))
    if action == "lowercase":
        return df.withColumn("labels", _bind(labels, lambda l: _set_label(
            l, F.lit(target), F.lower(_src_value(cfg, l)))))
    if action == "uppercase":
        return df.withColumn("labels", _bind(labels, lambda l: _set_label(
            l, F.lit(target), F.upper(_src_value(cfg, l)))))
    if action == "hashmod":
        modulus = int(cfg["modulus"])

        def body(l: Column) -> Column:
            # md5 last 8 bytes as uint64, mod N (Relabel.cpp:195-205)
            h = F.conv(
                F.substring(F.md5(_src_value(cfg, l)), 17, 16), 16, 10
            ).cast("decimal(20,0)")
            mod = F.pmod(h, F.lit(modulus)).cast("long").cast("string")
            return _set_label(l, F.lit(target), mod)
        return df.withColumn("labels", _bind(labels, body))
    if action == "labelmap":
        def body(l: Column) -> Column:
            mapped = F.map_from_entries(
                F.transform(
                    F.filter(F.map_entries(l), lambda e: e.key.rlike(full)),
                    lambda e: F.struct(
                        F.regexp_replace(e.key, full, replacement).alias("key"),
                        e.value.alias("value"),
                    ),
                )
            )
            # empty map_from_entries([]) is fine; LAST_WIN keeps mapped
            return F.map_concat(l, mapped)
        return df.withColumn("labels", _bind(labels, body))
    if action == "labeldrop":
        return df.withColumn(
            "labels", F.map_filter(labels, lambda k, _v: ~k.rlike(full))
        )
    if action == "labelkeep":
        return df.withColumn(
            "labels", F.map_filter(labels, lambda k, _v: k.rlike(full))
        )
    raise ValueError(f"unknown relabel action {action!r}")


def prom_relabel(df: DataFrame, configs: list[dict]) -> DataFrame:
    """Apply a relabel config list in order (RelabelConfigList::Process).
    ``df`` must carry a ``labels`` map column (``prom_parse_metric``
    output shape)."""
    for cfg in configs:
        df = _apply_one(df, cfg)
    return df


# --------------------------- registry glue ------------------------------

@register(
    "processor_prom_parse_metric",
    keys={"SourceKey", "HonorTimestamps", "DefaultTimestampMs"},
)
def _parse_factory(cfg: dict):
    src = cfg.get("SourceKey", "content")
    honor = bool(cfg.get("HonorTimestamps", True))
    default_ms = int(cfg.get("DefaultTimestampMs", 0))

    def run(df: DataFrame) -> DataFrame:
        return prom_parse_metric(df, src, honor, default_ms)

    return run


@register("processor_prom_relabel_metric", keys={"RelabelConfigs"})
def _relabel_factory(cfg: dict):
    configs = cfg.get("RelabelConfigs", [])
    for c in configs:
        if "action" not in c:
            raise ValueError("relabel config requires 'action'")  # Relabel.cpp:262

    def run(df: DataFrame) -> DataFrame:
        return prom_relabel(df, configs)

    return run


def to_sls_metric_events(df: DataFrame) -> DataFrame:
    """Parsed exposition rows → the SLS metric-event shape the native
    processor emits into the pipeline (__name__/__labels__/__value__/
    __time_nano__): labels sorted by key and joined ``k#$#v|...``
    excluding the ``__name__`` tag, value formatted with the Go 'g'
    float repr the send path uses, timestamp widened to nanoseconds."""
    from loongcollector_spark.operators.decoders import go_g_str

    entries = F.filter(
        F.map_entries(F.col("labels")),
        lambda e: e["key"] != "__name__",
    )
    labels_str = F.array_join(
        F.transform(F.array_sort(entries),
                    lambda e: F.concat(e["key"], F.lit("#$#"), e["value"])),
        "|",
    )
    return df.select(
        "__name__",
        labels_str.alias("__labels__"),
        go_g_str(F.col("value")).alias("__value__"),
        (F.col("ts_ms") * 1_000_000).cast("string").alias("__time_nano__"),
    )
