"""Grok: plan-time pattern compiler + extraction operator.

Semantics matched (plugins/processor/grok/processor_grok.go):
* ``%{NAME}`` / ``%{NAME:alias}`` / ``%{NAME:alias:type}`` syntax, type ∈
  {string,int,float} (the validation pattern at processor_grok.go:378);
* patterns denormalize recursively against a pattern library — the
  reference topo-sorts the library then substitutes (go:238-315); we
  substitute recursively with cycle detection (equivalent result);
* ``Match`` is an ordered list; the FIRST pattern that matches wins
  (go:147-193);
* ``KeepSource`` / ``IgnoreParseFailure`` map onto the shared
  CommonParserOptions matrix.

The compiler runs in plain Python at PLAN time; execution is pure
``rlike`` + ``regexp_extract`` codegen — no Python on the data path.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from loongcollector_spark.operators import COMMON_PARSE_KEYS, register
from loongcollector_spark.operators.common import apply_parse_result
from loongcollector_spark.operators.parse import _cast

# A compact default pattern library. These are the standard public grok
# base patterns (same ones shipped by logstash/grok ports everywhere, incl.
# the reference's processor_grok_default_patterns.go) — reproduced from
# public knowledge of the grok format, restricted to RE2/Java-compatible
# constructs.
DEFAULT_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IPV6": r"(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{ISO8601_TIMEZONE}",
    "MONTH": r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\b",
    "MONTHDAY": r"(?:3[01]|[12][0-9]|0?[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "TIME": r"(?:2[0123]|[01]?[0-9]):(?:[0-5][0-9]):(?:[0-5][0-9])(?:\.[0-9]+)?",
    "ISO8601_TIMEZONE": r"(?:Z|[+-](?:2[0123]|[01][0-9])(?::?(?:[0-5][0-9])))",
    "TIMESTAMP_ISO8601": r"%{YEAR}-(?:0[1-9]|1[0-2])-%{MONTHDAY}[T ]%{TIME}%{ISO8601_TIMEZONE}?",
    # equivalent language to the logstash (?:X+)+ form without the
    # exponential-backtracking ambiguity ((?:X+)+ ≡ X+)
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]+",
    "URIHOST": r"%{IPORHOST}(?::%{INT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    # numbers / ids
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "BASE16FLOAT": r"\b(?:0[xX])?(?:[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?|\.[0-9A-Fa-f]+)\b",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "URN": r"urn:[0-9A-Za-z][0-9A-Za-z-]{0,31}:(?:%[0-9a-fA-F]{2}|[0-9A-Za-z()+,.:=@;$_!*'/?#-])+",
    # mail / users
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HTTPDUSER": r"%{EMAILADDRESS}|%{USER}",
    # mac addresses
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    # hosts / paths
    "HOST": r"%{HOSTNAME}",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "TTY": r"(?:/dev/(?:pts|tty(?:[pq])?)(?:\w+)?/?(?:[0-9]+))",
    "WINPATH": r"(?:[A-Za-z]:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    # dates / times
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "ISO8601_SECOND": r"(?:%{SECOND}|60)",
    "TZ": r"(?:[A-Z]{1,4})",
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822": r"%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG": r"%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    "HTTPDERROR_DATE": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    # syslog / httpd composites
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "QS": r"%{QUOTEDSTRING}",
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} "
        r"\[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
    "HTTPD20_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] \[%{LOGLEVEL:loglevel}\] "
        r"(?:\[client %{IPORHOST:clientip}\] )?%{GREEDYDATA:errormsg}"
    ),
}

_GROK_RX = re.compile(r"%\{(\w+)(?::([\w.\-\[\]]+))?(?::(string|int|float))?\}")


def _count_capturing(rx: str) -> int:
    """Count capturing groups in a regex fragment: '(' not escaped and not
    followed by '?' (and '(?<name>' named groups DO capture)."""
    n = 0
    i = 0
    in_class = False
    while i < len(rx):
        c = rx[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            nxt = rx[i + 1 : i + 2]
            if nxt != "?":
                n += 1  # plain capturing group
            elif rx[i + 2 : i + 3] == "<" and rx[i + 3 : i + 4] not in ("=", "!"):
                n += 1  # (?<name>...) named group captures; lookbehind doesn't
        i += 1
    return n


def _unbounded_at(rx: str, j: int) -> int:
    """Length of an unbounded quantifier starting at rx[j], else 0."""
    if j < len(rx) and rx[j] in "*+":
        return 1
    if j < len(rx) and rx[j] == "{":
        m = re.match(r"\{\d+,\}", rx[j:])
        if m:
            return len(m.group(0))
    return 0


def _class_matches(atom: str, ch: str) -> bool:
    """Can regex atom (a char class / escape / literal) match ``ch``?
    Conservative: returns True when unsure."""
    if atom.startswith("["):
        body = atom[1:-1]
        neg = body.startswith("^")
        if neg:
            body = body[1:]
        hit = False
        k = 0
        while k < len(body):
            if body[k] == "\\" and k + 1 < len(body):
                esc = body[k : k + 2]
                if _class_matches(esc, ch):
                    hit = True
                k += 2
            elif k + 2 < len(body) and body[k + 1] == "-" and body[k + 2] != "]":
                if body[k] <= ch <= body[k + 2]:
                    hit = True
                k += 3
            else:
                if body[k] == ch:
                    hit = True
                k += 1
        return hit != neg
    if atom == ".":
        return ch != "\n"
    if atom.startswith("\\"):
        e = atom[1]
        table = {
            "w": ch.isalnum() or ch == "_", "W": not (ch.isalnum() or ch == "_"),
            "d": ch.isdigit(), "D": not ch.isdigit(),
            "s": ch.isspace(), "S": not ch.isspace(),
        }
        return table.get(e, e == ch)
    return atom == ch


def _inner_unbounded_atoms(body: str) -> list[str]:
    """Atoms under an unbounded quantifier anywhere in ``body``.
    A quantified GROUP is reported as '(' (→ unprovable → unsafe)."""
    atoms, i, n = [], 0, len(body)
    last = ""
    while i < n:
        ch = body[i]
        if ch == "\\":
            last = body[i : i + 2]
            i += 2
        elif ch == "[":
            j = i + 1
            if j < n and body[j] == "^":
                j += 1
            if j < n and body[j] == "]":
                j += 1
            while j < n and body[j] != "]":
                j += 2 if body[j] == "\\" else 1
            last = body[i : j + 1]
            i = j + 1
        elif ch == ")":
            last = "("
            i += 1
        else:
            last = ch
            i += 1
        q = _unbounded_at(body, i)
        if q:
            atoms.append(last)
            i += q
    return atoms


def _leading_literal(body: str) -> str | None:
    """The group body's first REQUIRED atom if it is a literal char
    (optionally escaped); None when the body starts with anything whose
    consumption the lint can't prove (class, group, anchor, …) or when an
    alternation could bypass the leading atom."""
    k = 0
    while k < len(body):  # any unescaped | outside a class → not required
        if body[k] == "\\":
            k += 2
        elif body[k] == "[":
            k += 1
            while k < len(body) and body[k] != "]":
                k += 2 if body[k] == "\\" else 1
            k += 1
        elif body[k] == "|":
            return None
        else:
            k += 1
    while body[:3] == "(?:" or body[:1] == "(":
        body = body[3:] if body[:3] == "(?:" else body[1:]
    if not body:
        return None
    if body[0] == "\\" and len(body) > 1 and not body[1].isalnum():
        lit, rest = body[1], body[2:]
    elif body[0] not in "[(.^$|\\":
        lit, rest = body[0], body[1:]
    else:
        return None
    if rest[:1] in "*?{":  # optional / re-quantified → not required
        return None
    return lit


def lint_backtracking(rx: str) -> str | None:
    """Plan-time catastrophic-backtracking heuristic.

    The reference caps grok evaluation at 100 ms per log via regexp2's
    MatchTimeout (processor_grok.go:41-58); Java regex has no timeout, so
    a pathological pattern would pin an executor core for the whole task.
    This lint rejects the classic exponential shape at BUILD time instead:
    an unbounded quantifier (``*``, ``+``, ``{n,}``) applied to a group
    whose body itself contains an unbounded quantifier — ``(x+)+``,
    ``(?:\\w*)*``, ``(a|b+)*`` …

    Safe-shape carve-out: path-style patterns like ``(?:/[^/]*)+`` are
    unambiguous because every outer iteration must consume a leading
    literal the inner repeated class cannot match — those are allowed
    (the standard grok URIPATH/UNIXPATH/WINPATH shapes).

    Returns a description of the first offending site, or None.
    """
    i, n = 0, len(rx)
    # stack of [group_start, body_has_unbounded_quantifier]
    stack: list[list] = []

    def note_quant(q: int):
        if q and stack:
            stack[-1][1] = True

    while i < n:
        ch = rx[i]
        if ch == "\\":
            i += 2
            q = _unbounded_at(rx, i)
            i += q
            note_quant(q)
            continue
        if ch == "[":  # character class: skip to unescaped ]
            i += 1
            if i < n and rx[i] == "^":
                i += 1
            if i < n and rx[i] == "]":
                i += 1
            while i < n and rx[i] != "]":
                i += 2 if rx[i] == "\\" else 1
            i += 1
            q = _unbounded_at(rx, i)
            i += q
            note_quant(q)
            continue
        if ch == "(":
            stack.append([i, False])
            i += 1
            continue
        if ch == ")":
            start, had = stack.pop() if stack else (0, False)
            i += 1
            q = _unbounded_at(rx, i)
            if q and had:
                body = rx[start : i - 1]
                lit = _leading_literal(body)
                inner = _inner_unbounded_atoms(body)
                safe = lit is not None and inner and all(
                    not _class_matches(a, lit) for a in inner
                )
                if not safe:
                    return (
                        f"unbounded quantifier at offset {i} applied to a "
                        f"group that itself contains an unbounded "
                        f"quantifier: …{rx[start:i + q]}… (exponential "
                        f"backtracking risk)"
                    )
            i += q
            if had or q:
                note_quant(1)
            continue
        i += 1
        q = _unbounded_at(rx, i)
        i += q
        note_quant(q)
    return None


class GrokCompiler:
    """Compile grok expressions to (java_regex, [(group_idx, alias, type)]).

    Equivalent outcome to the reference's topo-sort + denormalize
    (processor_grok.go:238-315): library entries are substituted
    recursively (cycle-checked); un-aliased sub-patterns become
    NON-capturing groups so alias→group-index bookkeeping stays exact even
    when library bodies contain their own parentheses.
    """

    def __init__(self, custom_patterns: dict[str, str] | None = None):
        self.lib = dict(DEFAULT_PATTERNS)
        if custom_patterns:
            self.lib.update(custom_patterns)

    def _expand(self, pattern: str, stack: tuple[str, ...], captures: list, counter: list):
        out = []
        pos = 0
        for m in _GROK_RX.finditer(pattern):
            out.append(pattern[pos : m.start()])
            name, alias, typ = m.group(1), m.group(2), m.group(3)
            if name not in self.lib:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            if name in stack:
                raise ValueError(f"grok pattern cycle at {name}")
            if alias:
                counter[0] += 1
                captures.append((counter[0], alias, typ or "string"))
                out.append("(")
            else:
                out.append("(?:")
            out.append(self._expand(self.lib[name], stack + (name,), captures, counter))
            out.append(")")
            pos = m.end()
        tail = pattern[pos:]
        counter[0] += _count_capturing(tail)
        out.append(tail)
        return "".join(out)

    def compile(self, pattern: str) -> tuple[str, list[tuple[int, str, str]]]:
        captures: list[tuple[int, str, str]] = []
        counter = [0]
        rx = self._expand(pattern, (), captures, counter)
        return rx, captures


@register("processor_grok", keys=COMMON_PARSE_KEYS | {"Match", "CustomPatterns", "KeepSource", "IgnoreParseFailure", "AllowRiskyPatterns"})
def grok_op(cfg: dict):
    """Grok extraction with ordered first-match-wins cascade.

    ``Match``: ordered list of grok expressions; first that matches the
    value wins (processor_grok.go:147-193). ``CustomPatterns`` extends the
    library. ``KeepSource`` (default True) ~ KeepingSourceWhenParseSucceed;
    ``IgnoreParseFailure`` (default True) ~ KeepingSourceWhenParseFail.

    Spark: per pattern an ``rlike`` ok-bit; each output key is a
    ``when(ok1, extract1).when(ok2, extract2)...`` priority chain —
    the coalesce-cascade preserving match order, all codegen.
    """
    src = cfg.get("SourceKey", "text")
    compiler = GrokCompiler(cfg.get("CustomPatterns"))
    compiled = [compiler.compile(p) for p in cfg["Match"]]
    if not cfg.get("AllowRiskyPatterns"):
        for raw, (rx, _caps) in zip(cfg["Match"], compiled):
            risk = lint_backtracking(rx)
            if risk:
                raise ValueError(
                    f"processor_grok Match pattern {raw!r} rejected at build "
                    f"time: {risk}. The reference bounds this with a 100 ms "
                    f"regexp2 timeout (processor_grok.go:41-58); Java regex "
                    f"has none, so an adversarial log line would pin an "
                    f"executor. Set AllowRiskyPatterns: true to override."
                )
    cfg = dict(cfg)
    cfg.setdefault("KeepingSourceWhenParseSucceed", cfg.get("KeepSource", True))
    cfg.setdefault("KeepingSourceWhenParseFail", cfg.get("IgnoreParseFailure", True))

    all_keys: list[str] = []
    for _, caps in compiled:
        for _, alias, _t in caps:
            if alias not in all_keys:
                all_keys.append(alias)
    key_type = {}
    for _, caps in compiled:
        for _, alias, typ in caps:
            key_type.setdefault(alias, typ)

    def run(df):
        c = F.col(src)
        # anchored full match per reference (grok wraps with ^...$ when
        # FullMatch; we follow the regex-parse convention)
        if len(compiled) == 1:
            # single-pattern fast path: 2 regex passes total (validity +
            # one regexp_replace mapping all captures), masked input so
            # the shared split tree stays unconditional and dedup'd
            rx, caps = compiled[0]
            rx = "^" + rx + "$"
            ok = c.rlike(rx)
            sep = "\x01"
            arr = F.split(
                F.regexp_replace(F.when(ok, c), rx,
                                 sep.join(f"${i}" for i, _a, _t in caps)),
                sep,
            )
            # same separator-collision guard as parse_regex: a capture that
            # contains a literal \x01 misaligns the split — size-mismatch
            # rows fall back to per-group regexp_extract
            safe = F.size(arr) == len(caps)
            extracted = {
                alias: _cast(
                    F.when(safe, F.element_at(arr, j + 1))
                    .when(ok, F.regexp_extract(c, rx, i)),
                    typ,
                )
                for j, (i, alias, typ) in enumerate(caps)
            }
            return apply_parse_result(df, src, ok, extracted, cfg,
                                      already_masked=True)
        oks = [c.rlike("^" + rx + "$") for rx, _ in compiled]
        ok_any = oks[0]
        for o in oks[1:]:
            ok_any = ok_any | o
        extracted = {}
        for key in all_keys:
            expr = None
            for (rx, caps), okb in zip(compiled, oks):
                idx = next((i for i, a, _t in caps if a == key), None)
                if idx is None:
                    continue
                val = F.regexp_extract(c, "^" + rx + "$", idx)
                expr = F.when(okb, val) if expr is None else expr.when(okb, val)
            extracted[key] = _cast(expr, key_type[key])
        return apply_parse_result(df, src, ok_any, extracted, cfg)

    return run
