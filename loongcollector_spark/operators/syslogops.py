r"""service_syslog's line parser as native Spark expressions.

Reference: plugins/input/syslog/parser.go:84-199 (rfc3164 / rfc5424 /
auto parser chain — auto tries 3164 first, then 5424) and
syslog.go:401-445 (field emission: ``_program_ _priority_ _facility_
_severity_ _unixtimestamp_ _hostname_ _client_ip_ _content_`` plus the
RFC5424-only ``_structured_data_`` (json.Marshal of the SD map, sorted
keys) / ``_message_id_`` / ``_process_id_``). facility = priority >> 3,
severity = priority & 7 per RFC. Unparseable lines keep the raw line in
``_content_`` when IgnoreParseFailure (parser.go:55-61), else are
dropped (syslog.go:403-409).

Spark shape: one ``regexp_extract`` family per RFC grammar, all codegen;
the auto chain is a ``when`` cascade, no Python anywhere. Divergences,
documented: RFC3164 has no year — the reference stamps the collector's
current year via time.Local, here it is the ``year`` parameter so runs
are reproducible; the reference fills hostname/_ip_ from the collecting
host, here they are parameters (defaults empty); RFC5424 escape
sequences (\\" \\] \\\\) inside SD param values are not unescaped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register

# <PRI>Mmm [d]d hh:mm:ss HOSTNAME TAG[pid]: CONTENT   (jeromer rfc3164)
_RFC3164 = (
    r"^<(\d{1,3})>([A-Z][a-z]{2}) {1,2}(\d{1,2}) "
    r"(\d{2}:\d{2}:\d{2}) (\S+) ([^:\[\s]+)(?:\[([^\]]*)\])?: ?(.*)$"
)
# <PRI>1 TIMESTAMP HOSTNAME APP-NAME PROCID MSGID SD [MSG]
_RFC5424 = (
    r"^<(\d{1,3})>1 (\S+) (\S+) (\S+) (\S+) (\S+) "
    r"(-|(?:\[[^\]]*\])+)(?: (.*))?$"
)

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _sd_json(sd: Column) -> Column:
    """``[id k="v" ...]...`` → the json.Marshal shape
    ``{"id":{"k":"v"},...}`` with both key levels sorted (Go sorts map
    keys)."""
    elems = F.regexp_extract_all(sd, F.lit(r"\[([^\]]*)\]"), 1)
    per_elem = F.array_sort(F.transform(
        elems,
        lambda e: F.struct(
            F.regexp_extract(e, r"^(\S+)", 1).alias("id"),
            F.array_sort(F.transform(
                F.regexp_extract_all(e, F.lit(r'(\S+="[^"]*")'), 1),
                lambda kv: F.struct(
                    F.regexp_extract(kv, r'^([^=]+)=', 1).alias("k"),
                    F.regexp_extract(kv, r'="([^"]*)"', 1).alias("v"),
                ),
            )).alias("kvs"),
        ),
    ))
    # map entry order survives map_from_entries → to_json, so sorting
    # the entry arrays first reproduces Go's sorted-key marshal
    entries = F.transform(
        per_elem,
        lambda s: F.struct(
            s["id"].alias("key"),
            F.map_from_entries(s["kvs"]).alias("value"),
        ),
    )
    return F.to_json(F.map_from_entries(entries))


def parse_syslog(df: DataFrame, source: str = "content",
                 protocol: str = "auto", year: int = 2026,
                 hostname: str = "", client_ip: str = "",
                 ignore_parse_failure: bool = True) -> DataFrame:
    """Parse syslog lines in ``source`` into the reference's field set.

    ``protocol``: rfc3164 | rfc5424 | auto (3164 first, parser.go:180).
    Emits typed ``_ts_`` (timestamp) alongside the reference's string
    ``_unixtimestamp_`` nanoseconds.
    """
    if protocol not in ("rfc3164", "rfc5424", "auto"):
        raise ValueError(f"service_syslog: unknown protocol {protocol!r}")
    line = F.col(source)
    is3164 = line.rlike(_RFC3164) if protocol != "rfc5424" else F.lit(False)
    is5424 = line.rlike(_RFC5424) if protocol != "rfc3164" else F.lit(False)

    def g3(i):
        return F.regexp_extract(line, _RFC3164, i)

    def g5(i):
        return F.regexp_extract(line, _RFC5424, i)

    # PRI is 0..191 (facility 0-23 × severity 0-7); the jeromer/RFC
    # parsers FAIL lines like <999>..., they never emit facility 124 —
    # gate the match itself so such lines take the parse-failure path
    if protocol != "rfc5424":
        is3164 = is3164 & (g3(1).cast("int") <= 191)
    if protocol != "rfc3164":
        is5424 = is5424 & (g5(1).cast("int") <= 191)

    month3 = F.array_position(
        F.array(*[F.lit(m) for m in _MONTHS]), g3(2)).cast("int")
    ts3 = F.to_timestamp(
        F.concat_ws(
            " ", F.lit(str(year)),
            F.lpad(month3.cast("string"), 2, "0"),
            F.lpad(g3(3), 2, "0"), g3(4)),
        "yyyy MM dd HH:mm:ss",
    )
    # RFC5424 nil timestamp '-' stays NULL (the reference stamps now())
    ts5 = F.when(g5(2) != "-", F.to_timestamp(g5(2)))

    pri = (
        F.when(is3164, g3(1)).when(is5424, g5(1)).otherwise(F.lit(None))
        .cast("int")
    )
    nil5 = lambda c: F.when(c != "-", c).otherwise(F.lit(None))  # noqa: E731
    ts = F.when(is3164, ts3).when(is5424, ts5)
    out = df.withColumns({
        "_parse_ok": is3164 | is5424,
        "_priority_": F.coalesce(pri, F.lit(-1)).cast("string"),
        "_facility_": F.coalesce(
            F.shiftright(pri, 3), F.lit(-1)).cast("string"),
        "_severity_": F.coalesce(
            pri.bitwiseAND(F.lit(7)), F.lit(-1)).cast("string"),
        "_ts_": ts,
        "_unixtimestamp_": (F.unix_micros(ts) * 1000).cast("string"),
        "_hostname_": F.when(is3164, g3(5)).when(is5424, g5(3))
        .otherwise(F.lit(hostname)),
        "_program_": F.when(is3164, g3(6))
        .when(is5424, F.coalesce(nil5(g5(4)), F.lit("")))
        .otherwise(F.lit("")),
        # the Go rfc3164 lib drops the [pid] suffix entirely (tag stops
        # at '['), so _process_id_ is RFC5424-only like the reference
        "_process_id_": F.when(is5424, nil5(g5(5))),
        "_message_id_": F.when(is5424, nil5(g5(6))),
        "_structured_data_": F.when(is5424 & (g5(7) != "-"),
                                    _sd_json(g5(7))),
        "_content_": F.when(is3164, g3(8))
        .when(is5424, F.coalesce(g5(8), F.lit("")))
        .otherwise(line),
        "_client_ip_": F.lit(client_ip.split(":")[0] if client_ip else ""),
    })
    if not ignore_parse_failure:
        out = out.filter("_parse_ok")  # drop like syslog.go:403-409
    return out


@register("service_syslog",
          keys={"SourceKey", "ParseProtocol", "Year", "Hostname",
                "ClientIP", "IgnoreParseFailure"})
def service_syslog(cfg: dict):
    source = cfg.get("SourceKey", "content")
    protocol = cfg.get("ParseProtocol", "rfc3164") or "rfc3164"
    year = int(cfg.get("Year", 2026))
    hostname = cfg.get("Hostname", "")
    client_ip = cfg.get("ClientIP", "")
    ignore = bool(cfg.get("IgnoreParseFailure", True))

    def run(df: DataFrame) -> DataFrame:
        return parse_syslog(df, source, protocol, year, hostname,
                            client_ip, ignore)

    return run
