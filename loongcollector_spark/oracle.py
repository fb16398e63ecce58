"""Pure-Python (pandas) oracle for the transcript pipeline.

Implements parse → enrich → route → aggregate row-by-row with plain
Python regex/json — completely independent of the Spark code paths — and
produces the golden outputs pytest compares against (FIXTURES.md §4):
per-sink routed row sets, per-sink hourly counters, per-stage metrics.
"""

from __future__ import annotations

import json
import re

import pandas as pd

from loongcollector_spark.datagen import ROLE_DICT, TOOL_DICT
from loongcollector_spark.plans.pipeline import NGINX_RX

_NGINX = re.compile(NGINX_RX)
_KV_SNIFF = re.compile(r"^\w+=[^ ]*&")
_APP_SNIFF = re.compile(r"^\d+\.\d+\.\d+\.\d+ \w+ /")
_APP = re.compile(
    r"^((?:\d{1,3}\.){3}\d{1,3}) (\w+) ((?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_\-]*)+(?:\?\S*)?) "
    r"([+-]?\d+(?:\.\d+)?) ([+-]?\d+(?:\.\d+)?)$"
)


def parse_row(text: str) -> dict:
    out = {
        "_fmt": "unknown", "_parse_ok": False, "client_ip": None, "method": None,
        "request": None, "response_code": None, "bytes": None, "action": None,
        "lat_ms": None, "tok": None, "model": None,
    }
    if text.startswith("{"):
        out["_fmt"] = "json"
        try:
            obj = json.loads(text)
        except (ValueError, TypeError):
            return out
        if not isinstance(obj, dict) or "action" not in obj or obj["action"] is None:
            return out
        out["_parse_ok"] = True
        out["action"] = obj.get("action")
        out["lat_ms"] = obj.get("lat_ms")
        meta = obj.get("meta") or {}
        out["tok"] = meta.get("tok")
        out["model"] = meta.get("model")
        return out
    if re.match(r"\S+ \S+ \S+ \[", text):
        out["_fmt"] = "nginx"
        m = _NGINX.match(text)
        if not m:
            return out
        out["_parse_ok"] = True
        out["client_ip"] = m.group(1)
        out["method"] = m.group(5)
        out["request"] = m.group(6)
        out["response_code"] = m.group(8)
        out["bytes"] = int(m.group(9))
        return out
    if _KV_SNIFF.match(text):
        out["_fmt"] = "kv"
        pairs = dict(
            p.split("=", 1) for p in text.split("&") if "=" in p
        )
        if not all(k in pairs for k in ("action", "lat_ms", "tok")):
            return out
        out["_parse_ok"] = True
        out["action"] = pairs["action"]
        out["lat_ms"] = int(pairs["lat_ms"])
        out["tok"] = int(pairs["tok"])
        return out
    if _APP_SNIFF.match(text):
        out["_fmt"] = "app"
        m = _APP.match(text)
        if not m:
            return out
        out["_parse_ok"] = True
        out["client_ip"] = m.group(1)
        out["method"] = m.group(2)
        out["request"] = m.group(3)
        out["bytes"] = int(m.group(4))
        return out
    return out


def enrich_row(row: dict) -> dict:
    tool = row["tool"]
    if tool == "":
        row["tool_category"] = ""
    else:
        row["tool_category"] = TOOL_DICT.get(tool, "Unknown")
    row["route_class"] = ROLE_DICT.get(row["role"], "Unknown")
    return row


_5XX = re.compile(r"^5\d\d$")


def route_row(row: dict) -> list[str]:
    sinks = []
    if row["tool_category"] != "":
        sinks.append("sink_tool")
    rc = row["response_code"]
    if (not row["_parse_ok"]) or (rc is not None and _5XX.match(str(rc))):
        sinks.append("sink_errors")
    if row["role"] == "assistant":
        sinks.append("sink_assistant")
    sinks.append("sink_default")
    return sinks


def run_oracle(pdf: pd.DataFrame) -> dict:
    """Full pipeline on a transcripts pandas frame. Returns
    {'sinks': {name: DataFrame}, 'counters': DataFrame, 'metrics': {...}}.
    Sink frames are canonically sorted by (conv_id, turn_idx)."""
    rows = pdf.to_dict("records")
    routed = []
    for r in rows:
        parsed = parse_row(r["text"])
        full = {**r, **parsed}
        enrich_row(full)
        full["_sinks"] = route_row(full)
        routed.append(full)

    sink_rows: dict[str, list[dict]] = {
        s: [] for s in ("sink_tool", "sink_errors", "sink_assistant", "sink_default")
    }
    for r in routed:
        for s in r["_sinks"]:
            rr = {k: v for k, v in r.items() if k != "_sinks"}
            sink_rows[s].append(rr)

    sinks = {}
    counter_records = []
    for name, rws in sink_rows.items():
        sdf = pd.DataFrame(rws)
        if len(sdf):
            sdf = sdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            cnt = (
                sdf.assign(window_start=sdf["ts"].dt.floor("h"))
                .groupby(["window_start", "role"])
                .size()
                .reset_index(name="n_rows")
            )
            cnt.insert(0, "sink", name)
            counter_records.append(cnt)
        sinks[name] = sdf

    counters = (
        pd.concat(counter_records, ignore_index=True)
        if counter_records
        else pd.DataFrame(columns=["sink", "window_start", "role", "n_rows"])
    )
    metrics = {
        "in_rows": len(pdf),
        "routed_rows": len(routed),
        "per_sink_rows": {k: len(v) for k, v in sink_rows.items()},
    }
    return {"sinks": sinks, "counters": counters, "metrics": metrics}
