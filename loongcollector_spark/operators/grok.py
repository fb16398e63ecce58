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
    "URIPROTO": r"[A-Za-z](?:[A-Za-z0-9+.-]+)+",
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


@register("processor_grok", keys=COMMON_PARSE_KEYS | {"Match", "CustomPatterns", "KeepSource", "IgnoreParseFailure"})
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
