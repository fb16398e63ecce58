"""Multiline merge/split — the full reference state machine.

Mirrors ProcessorMergeMultilineLogNative (BY_REGEX + BY_FLAG) and
ProcessorSplitMultilineLogStringNative semantics:

* pattern preprocessing (``MultilineOptions::ParseRegex``,
  core/file_server/MultilineOptions.cpp:205-222): one trailing ``$`` is
  stripped, then trailing ``.*`` repeatedly; an empty remainder means the
  pattern is ABSENT (matches everything ⇒ no constraint).
* matching is prefix-anchored search (``BoostRegexSearch`` with
  ``match_continuous``, core/common/StringTools.cpp:244-267) — Python
  ``re.match`` / Spark ``rlike('^(?:p)')``.
* supported combinations (ProcessorMergeMultilineLogNative.cpp:161-167):
  start / start+continue / start+end / continue+end / end. Continue-only
  is ignored; when all three are given, continue is ignored
  (MultilineOptions.cpp:125-156).
* unmatched rows (``HandleUnmatchLogs``): ``single_line`` keeps each as
  its own event, ``discard`` drops them.

Spark shapes, chosen per combination:

* **start-only, start+continue, BY_FLAG** — pure window algebra (one
  shuffle on the group key, whole-stage codegen, no Python). For
  start+continue the partial state has a closed form: with running maxes
  ``S = max(pos where start-match)`` and ``L = max(pos where NOT
  continue-match)``, a row is inside a merged event iff ``S >= L`` —
  the latest start is at/after the latest continue-break.
* **start+end, continue+end, end-only** — the close state alternates
  (begin→first end→begin…), which is a genuine recurrence no fixed
  number of window passes expresses; these run the exact reference FSM
  per group via ``applyInPandas`` (Arrow-batched, one shuffle — the
  tier (b) escape hatch for semantics built-ins can't express).
"""

from __future__ import annotations

import re

from pyspark.sql import Window, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from loongcollector_spark.operators import register

_MERGE_KEYS = {
    "SourceKey", "MergeType", "StartPattern", "ContinuePattern", "EndPattern",
    "Multiline", "UnmatchedContentTreatment", "IgnoringUnmatchWarning",
    "GroupKeys", "OrderKey", "FlagKey",
}


def strip_pattern(pattern):
    """ParseRegex twin: trailing ``$`` then trailing ``.*``s stripped;
    empty/None ⇒ None (= pattern absent)."""
    if pattern is None:
        return None
    p = str(pattern)
    if p.endswith("$"):
        p = p[:-1]
    while p.endswith(".*"):
        p = p[:-2]
    return p or None


def _match_expr(col, stripped: str):
    """Prefix-anchored search, the Spark twin of match_continuous."""
    return F.coalesce(col, F.lit("")).rlike("^(?:" + stripped + ")")


def _patterns(cfg: dict):
    """Resolve Start/Continue/End from nested ``Multiline`` or flat keys,
    then apply the reference's combination rules."""
    ml = cfg.get("Multiline") or {}
    start = strip_pattern(cfg.get("StartPattern", ml.get("StartPattern")))
    cont = strip_pattern(cfg.get("ContinuePattern", ml.get("ContinuePattern")))
    end = strip_pattern(cfg.get("EndPattern", ml.get("EndPattern")))
    if cont and not start and not end:
        cont = None  # continue-only: ignored (MultilineOptions.cpp:125-139)
    if start and cont and end:
        cont = None  # all three: continue ignored (MultilineOptions.cpp:140-156)
    if not start and not cont and not end:
        raise ValueError(
            "multiline config needs at least one of StartPattern/EndPattern "
            "(a bare '.*' pattern is treated as absent, like the reference)"
        )
    return start, cont, end


def fsm_events(vals, sp, cp, ep, single_line, eof=True):
    """The exact reference merge FSM over one group's ordered lines
    (ProcessorMergeMultilineLogNative::MergeLogsByRegex, cpp:161-326).
    Returns a list of events, each a list of line indices; unmatched
    lines appear as single-index events when ``single_line``.

    With ``eof=False`` (the streaming caller), the trailing
    still-collecting event is NOT flushed; use :func:`fsm_events_open`
    to also get its indices back for carry-over state."""
    out, events = [], []
    is_partial = sp is None and cp is None and ep is not None
    begin = 0
    n = len(vals)
    for cur in range(n):
        v = vals[cur] or ""
        if not is_partial:
            r = sp if sp is not None else cp
            if r.match(v):
                events = [cur]
                begin = cur
                is_partial = True
            elif ep is not None and sp is None and cp is not None and ep.match(v):
                # continue+end: line matches end, not continue → 1-line event
                out.append([cur])
            elif single_line:
                out.append([cur])  # unmatched
        else:
            if cp is not None and cp.match(v):
                events.append(cur)
                continue
            if ep is not None:
                events.append(cur)
                if cp is not None:  # continue+end
                    if ep.match(v):
                        out.append(events)
                    elif single_line:
                        out.extend([k] for k in range(begin, cur + 1))
                    events = []
                    is_partial = False
                else:  # start+end or end-only
                    if ep.match(v):
                        out.append(events)
                        events = []
                        if sp is not None:
                            is_partial = False
                        else:
                            begin = cur + 1  # end-only: next log starts after
                    # else: wait for the end line
            elif cp is None:  # start-only
                if not sp.match(v):
                    events.append(cur)
                else:
                    out.append(events)
                    begin = cur
                    events = [cur]
            else:  # start+continue, line not matched by continue
                out.append(events)
                events = []
                if not sp.match(v):
                    if single_line:
                        out.append([cur])
                    is_partial = False
                else:
                    begin = cur
                    events = [cur]
    if eof and is_partial and begin < n:
        if ep is None:
            out.append(events)
        elif single_line:  # end never seen → whole tail unmatched (cpp:316-323)
            out.extend([k] for k in range(begin, n))
    return out


def fsm_events_open(vals, sp, cp, ep, single_line):
    """Streaming variant: (closed_events, open_tail_indices). The open
    tail is the still-collecting event a later batch (or a flush
    timeout) will close; closed events are safe to emit now."""
    closed = fsm_events(vals, sp, cp, ep, single_line, eof=False)
    emitted = {i for ev in closed for i in ev}
    # the open tail = the ordered suffix the eof=False run didn't emit,
    # starting after the last emitted index (earlier unemitted indices
    # were discard-mode unmatched lines, already dropped for good)
    last = max(emitted) if emitted else -1
    open_tail = list(range(last + 1, len(vals)))
    return closed, open_tail


def json_events(vals, single_line):
    """Multiline.Mode=JSON (JsonLogFileReader::FindJsonMatch,
    core/file_server/reader/JsonLogFileReader.cpp:47-120): an event
    starts at a line whose first non-blank char is ``{`` and closes on
    the line where quote-aware brace depth returns to zero; any other
    line is its own single-line log. Negative depth (brace mismatch)
    voids the buffer back to unmatched lines. Line granularity: the
    event closes at end-of-line of the balancing brace."""
    out, buf = [], []
    depth, inq, esc = 0, False, False
    for i, v in enumerate(vals):
        s = v or ""
        if not buf:
            if not s.lstrip(" \t\0").startswith("{"):
                out.append([i])
                continue
            depth, inq, esc = 0, False, False
        buf.append(i)
        bad = False
        for ch in s:
            if esc:
                esc = False
                continue
            if inq:
                if ch == "\\":
                    esc = True
                elif ch == '"':
                    inq = False
                continue
            if ch == '"':
                inq = True
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth < 0:
                    bad = True
                    break
        if bad:
            if single_line:
                out.extend([k] for k in buf)
            buf = []
        elif depth == 0 and not inq:
            out.append(buf)
            buf = []
    if buf and single_line:  # EOF with an unbalanced object: unmatched
        out.extend([k] for k in buf)
    return out


def _merge_json_mode(df, src, group_keys, order_key, single_line):
    """JSON multiline via the same grouped-FSM shape as the end-pattern
    combos (quote-aware brace matching has no window closed form)."""
    return _merge_fsm(
        df, src, group_keys, order_key, None, None, None, single_line,
        events_fn=lambda vals: json_events(vals, single_line),
    )


def _agg_merged(df, src, group_keys, order_key, joiner="\n"):
    """Shared tail: collapse ``_mgid`` groups into merged events in stable
    order. Map-side-combinable; one shuffle on (group_keys, _mgid)."""
    aggs = [
        F.concat_ws(
            joiner,
            F.transform(
                F.array_sort(F.collect_list(F.struct(order_key, src))),
                lambda s: s[src],
            ),
        ).alias(src),
        F.min(order_key).alias(order_key),
        F.count("*").alias("n_merged"),
    ]
    if "ts" in df.columns:
        aggs.append(F.min("ts").alias("ts"))
    return df.groupBy(*group_keys, "_mgid").agg(*aggs).drop("_mgid")


def _merge_start_continue(df, src, group_keys, order_key, start, cont, single_line):
    """start-only / start+continue as pure window algebra (codegen)."""
    wo = Window.partitionBy(*group_keys).orderBy(order_key)
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = F.col(src)
    df = df.withColumn("_pos", F.row_number().over(wo))
    df = df.withColumn("_s", _match_expr(c, start))
    if cont is None:
        # classic cumsum sessionization; pre-start rows are unmatched
        df = df.withColumn("_partial", F.sum(F.col("_s").cast("long")).over(wc) > 0)
        gid = F.sum(F.col("_s").cast("long")).over(wc)
    else:
        df = df.withColumn("_c", _match_expr(c, cont))
        s_pos = F.max(F.when(F.col("_s"), F.col("_pos"))).over(wc)
        l_pos = F.max(F.when(~F.col("_c"), F.col("_pos"))).over(wc)
        df = df.withColumn(
            "_partial", s_pos.isNotNull() & (l_pos.isNull() | (s_pos >= l_pos))
        )
        prev_partial = F.coalesce(F.lag("_partial").over(wo), F.lit(False))
        begins = F.col("_s") & ~(prev_partial & F.col("_c"))
        gid = F.sum(begins.cast("long")).over(wc)
    df = df.withColumn(
        "_mgid", F.when(F.col("_partial"), gid).otherwise(-F.col("_pos").cast("long"))
    )
    if not single_line:
        df = df.filter(F.col("_partial"))
    return _agg_merged(
        df.drop("_pos", "_s", "_c", "_partial") if cont is not None
        else df.drop("_pos", "_s", "_partial"),
        src, group_keys, order_key,
    )


def _merge_end_only(df, src, group_keys, order_key, end, single_line):
    """End-only as pure window algebra (codegen): the FSM sticks to the
    collecting state (cpp:178-181 — only-end starts partial), so event k
    is exactly the rows with k prior end-matches; rows after the last
    end are unmatched (cpp:316-323)."""
    wo = Window.partitionBy(*group_keys).orderBy(order_key)
    wprev = wo.rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy(*group_keys)
    e = _match_expr(F.col(src), end).cast("long")
    df = df.withColumn("_pos", F.row_number().over(wo)).withColumn("_e", e)
    prior = F.coalesce(F.sum("_e").over(wprev), F.lit(0))
    tot = F.sum("_e").over(wall)
    df = df.withColumn(
        "_mgid", F.when(prior < tot, prior).otherwise(-F.col("_pos").cast("long"))
    ).withColumn("_matched", prior < tot)
    if not single_line:
        df = df.filter(F.col("_matched"))
    return _agg_merged(df.drop("_pos", "_e", "_matched"), src, group_keys, order_key)


def _merge_by_flag(df, src, group_keys, order_key, flag_key):
    """BY_FLAG (MergeLogsByFlag, cpp:115-160): runs of partial-flag rows
    merge with the first following non-partial row, concatenated WITHOUT
    line breaks. Window codegen: an event begins where the previous row
    was not partial."""
    wo = Window.partitionBy(*group_keys).orderBy(order_key)
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_p = F.coalesce(F.lag(F.col(flag_key)).over(wo), F.lit(False))
    df = df.withColumn("_mgid", F.sum((~prev_p).cast("long")).over(wc))
    return _agg_merged(df.drop(flag_key), src, group_keys, order_key, joiner="")


def _merge_fsm(df, src, group_keys, order_key, start, cont, end, single_line,
               events_fn=None):
    """End-pattern combinations (and JSON mode via ``events_fn``): exact
    reference FSM per group via applyInPandas (Arrow batches; groups are
    conversations, so state stays bounded and the shuffle is the same
    group-key exchange)."""
    in_fields = {f.name: f for f in df.schema.fields}
    out_fields = [in_fields[k] for k in group_keys] + [
        StructField(src, StringType()),
        in_fields[order_key],
        StructField("n_merged", LongType()),
    ]
    has_ts = "ts" in in_fields
    if has_ts:
        out_fields.append(in_fields["ts"])
    schema = StructType(out_fields)
    sp = re.compile(start) if start else None
    cp = re.compile(cont) if cont else None
    ep = re.compile(end) if end else None
    out_cols = [f.name for f in out_fields]

    def run_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_key).reset_index(drop=True)
        vals = ["" if v is None else str(v) for v in pdf[src]]
        if events_fn is not None:
            events = events_fn(vals)
        else:
            events = fsm_events(vals, sp, cp, ep, single_line)
        rows = []
        for ev in events:
            head = pdf.iloc[ev[0]]
            row = [head[k] for k in group_keys]
            row.append("\n".join(vals[i] for i in ev))
            row.append(min(pdf[order_key].iloc[i] for i in ev))
            row.append(len(ev))
            if has_ts:
                row.append(min(pdf["ts"].iloc[i] for i in ev))
            rows.append(row)
        return pd.DataFrame(rows, columns=out_cols)

    return df.groupBy(*group_keys).applyInPandas(run_group, schema)


def merge_lines(df, cfg: dict):
    """Dispatch one merge config onto the cheapest correct Spark shape."""
    src = cfg.get("SourceKey", "text")
    group_keys = cfg.get("GroupKeys", ["conv_id"])
    order_key = cfg.get("OrderKey", "turn_idx")
    ml = cfg.get("Multiline") or {}
    single_line = cfg.get(
        "UnmatchedContentTreatment",
        ml.get("UnmatchedContentTreatment", "single_line"),
    ) != "discard"
    if cfg.get("MergeType", "regex") == "flag":
        return _merge_by_flag(df, src, group_keys, order_key,
                              cfg.get("FlagKey", "_part_"))
    if ml.get("Mode") == "JSON":
        return _merge_json_mode(df, src, group_keys, order_key, single_line)
    start, cont, end = _patterns(cfg)
    if end is None:
        return _merge_start_continue(
            df, src, group_keys, order_key, start, cont, single_line
        )
    if start is None and cont is None:
        return _merge_end_only(df, src, group_keys, order_key, end, single_line)
    return _merge_fsm(df, src, group_keys, order_key, start, cont, end, single_line)


@register("processor_merge_multiline_log", keys=_MERGE_KEYS)
def merge_multiline_log(cfg: dict):
    """Full multiline merge (ProcessorMergeMultilineLogNative.cpp:84-96):
    MergeType regex (start/start+continue/start+end/continue+end/end) or
    flag (container partial-log ``P`` runs)."""
    return lambda df: merge_lines(df, cfg)


@register(
    "processor_split_multiline_log_string",
    keys=_MERGE_KEYS | {"OrderKeys", "KeepingEmptyLines"},
)
def split_multiline_log_string(cfg: dict):
    """Blob → N multiline events (ProcessorSplitMultilineLogStringNative
    .cpp:150-307): split the blob on newlines, then run the same
    start/continue/end machine over the lines of each source row."""
    src = cfg.get("SourceKey", "text")
    order_cols = cfg.get("OrderKeys", cfg.get("GroupKeys", ["conv_id", "turn_idx"]))

    def run(df):
        others = [c for c in df.columns if c != src]
        # each SOURCE ROW splits independently (the reference walks one
        # event's content at a time) — tag rows pre-explode so two blobs
        # sharing the same GroupKeys values can never interleave their
        # line_idx sequences inside one merge group
        blob_id = F.monotonically_increasing_id().alias("_blob_id")
        lines = df.select(*others, F.col(src), blob_id).select(
            *others, "_blob_id",
            F.posexplode(F.split(F.col(src), "\n")).alias("line_idx", src),
        )
        if not cfg.get("KeepingEmptyLines", True):
            lines = lines.filter(F.col(src) != "")
        inner = dict(cfg)
        inner.pop("OrderKeys", None)
        inner.pop("KeepingEmptyLines", None)
        inner.update({"GroupKeys": list(order_cols) + ["_blob_id"],
                      "OrderKey": "line_idx"})
        return merge_lines(lines, inner).drop("_blob_id")

    return run
