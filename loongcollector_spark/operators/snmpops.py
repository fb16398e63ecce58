"""service_snmp varbind → log conversion (plugins/input/snmp/
input_snmp.go).

The gosnmp poll loop itself (Connect/Get/BulkWalk against live agents,
input_snmp.go:464-505) is deployment-side transport, like the kafka
broker or the mysqld replication tap.  What the plugin *computes* per
polled varbind — and what this module models as one codegen projection —
is input_snmp.go:505-563:

* ``Conversion`` rewrites applied before stringification: ``hwaddr``
  (bytes → ``net.HardwareAddr.String()``, colon-joined lower hex) and
  ``ipaddr`` (4/16 bytes → ``net.IP.String()``; 16-byte values that are
  IPv4-mapped print dotted, everything else prints RFC 5952 compressed
  lower-hex — leftmost longest run of ≥2 zero groups becomes ``::``);
* the content switch: ``OctetString`` values pass through as raw text,
  every other type prints ``gosnmp.ToBigInt(value).String()`` (decimal);
* the BER tag → type-name table ``Asn1BER2String``
  (input_snmp.go:275-322), reproduced verbatim including the
  ``"Boolean "`` trailing-space quirk and ``""`` for unknown tags;
* the fixed 7-field log shape ``_targetindex_ / _target_ / _field_ /
  _oid_ / _conversion_ / _type_ / _content_`` (input_snmp.go:556-563).

Input contract (the shape a poll archive lands in): one row per varbind
with ``target_index int, target string, field string, oid string,
conversion string, type_code int, value_bytes binary, value_num long``.
Byte-typed results (OctetString / hwaddr / ipaddr) ride in
``value_bytes``; integer-typed results ride in ``value_num``.

The Go code aborts a target's whole poll on an invalid conversion length
(input_snmp.go:515-537 returns an error).  A batch engine must not throw
a job for one bad row: rows whose conversion input is the wrong length
come back with ``_decode_ok = false`` and a NULL ``_content_`` instead
(the lumberjack/pb marker-row convention used across this repo).

Documented divergence: after a hwaddr/ipaddr conversion the reference's
literal type switch (input_snmp.go:540-546) re-dispatches on the BER
tag — an OctetString-typed converted value would hit a ``[]byte`` type
assertion on a string, and an IPAddress-typed one would fall through to
``ToBigInt`` on a dotted string (→ 0).  Neither can be the intended
output of a Conversion; this model emits the converted string as
``_content_``, which is what the MIB-driven ``Conversion`` field exists
to produce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register

# input_snmp.go:275-322 — verbatim, including "Boolean " and the
# default "" for unmapped tags.
ASN1_NAMES = {
    0x00: "UnknownType", 0x01: "Boolean ", 0x02: "Integer",
    0x03: "BitString", 0x04: "OctetString", 0x05: "Null",
    0x06: "ObjectIdentifier", 0x07: "ObjectDescription",
    0x40: "IPAddress", 0x41: "Counter32", 0x42: "Gauge32",
    0x43: "TimeTicks", 0x44: "Opaque", 0x45: "NsapAddress",
    0x46: "Counter64", 0x47: "Uinteger32", 0x78: "OpaqueFloat",
    0x79: "OpaqueDouble", 0x80: "NoSuchObject", 0x81: "NoSuchInstance",
    0x82: "EndOfMibView",
}


def asn1_type_name(code: Column) -> Column:
    """BER tag → reference type name; unmapped tags → ``""``."""
    m = F.create_map(*[
        F.lit(x) for kv in ASN1_NAMES.items() for x in kv])
    return F.coalesce(F.element_at(m, code.cast("int")), F.lit(""))


def mac_string(b: Column) -> Column:
    """``net.HardwareAddr.String()``: lower hex pairs joined by ``:``
    (any byte length; empty bytes → empty string)."""
    return F.lower(F.regexp_replace(F.hex(b), "(..)(?!$)", "$1:"))


def _ipv6_groups(hexstr: Column) -> Column:
    """32 hex chars → 8 lower-case groups with leading zeros trimmed
    (``"0000"`` → ``"0"``)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.lower(
            F.regexp_replace(
                F.substring(hexstr, i * 4 + 1, 4), "^0{1,3}", "")),
    )


def ip_string(b: Column) -> Column:
    """``net.IP.String()`` over 4- or 16-byte values.  16-byte
    IPv4-mapped (``::ffff:a.b.c.d``) prints dotted like Go's ``To4()``
    path; other 16-byte values print RFC 5952 compressed (Go compresses
    the LEFTMOST LONGEST run of two or more zero groups).  Any other
    length → NULL (caller surfaces ``_decode_ok=false``)."""
    h = F.hex(b)
    n = F.length(b)

    def dotted(hex_off: int) -> Column:
        return F.concat_ws(".", *[
            F.conv(F.substring(h, hex_off + i * 2, 2), 16, 10)
            for i in range(4)])

    groups = _ipv6_groups(h)
    zero_l = F.lit("0")
    # Enumerate (length desc, start asc) so the FIRST matching branch is
    # the leftmost longest zero run — 28 constant-folded conditions over
    # the fixed 8 groups; compression needs runs of >=2 (net/ip.go).
    compressed = F.array_join(groups, ":")
    branches = []
    for run in range(8, 1, -1):
        for start in range(0, 9 - run):
            cond = F.slice(groups, start + 1, run) == F.array_repeat(
                zero_l, run)
            head = F.array_join(F.slice(groups, 1, start), ":")
            tail = F.array_join(
                F.slice(groups, start + run + 1, 8 - start - run), ":")
            branches.append((cond, F.concat(head, F.lit("::"), tail)))
    for cond, val in reversed(branches):
        compressed = F.when(cond, val).otherwise(compressed)

    v4_mapped = h.startswith("00000000000000000000FFFF")
    return (
        F.when(n == 4, dotted(1))
        .when(n == 16, F.when(v4_mapped, dotted(25)).otherwise(compressed))
    )


def snmp_varbind_logs(
    df: DataFrame,
    target_index: str = "target_index", target: str = "target",
    field: str = "field", oid: str = "oid",
    conversion: str = "conversion", type_code: str = "type_code",
    value_bytes: str = "value_bytes", value_num: str = "value_num",
) -> DataFrame:
    """The AddData projection (input_snmp.go:505-563): one output row
    per varbind with the reference's 7 string fields plus
    ``_decode_ok``.  Pure codegen — no shuffle, no Python on the rows."""
    conv = F.coalesce(F.col(conversion), F.lit(""))
    tname = asn1_type_name(F.col(type_code))
    vb = F.col(value_bytes)
    blen = F.length(vb)

    ip = ip_string(vb)
    content = (
        F.when(conv == "hwaddr", mac_string(vb))
        .when(conv == "ipaddr", ip)
        .when(F.col(type_code).cast("int") == 0x04,
              # Go string(nil []byte) == "" — a null octet value must
              # not break the NULL-content ⇒ _decode_ok=false pairing
              F.coalesce(vb.cast("string"), F.lit("")))
        .otherwise(F.coalesce(F.col(value_num), F.lit(0)).cast("string"))
    )
    # the Go code errors the poll on these; we mark the row instead
    bad = (
        ((conv == "hwaddr") & vb.isNull())
        | ((conv == "ipaddr") & (vb.isNull() | ~blen.isin(4, 16)))
    )
    return df.select(
        F.col(target_index).cast("string").alias("_targetindex_"),
        F.col(target).alias("_target_"),
        F.col(field).alias("_field_"),
        F.col(oid).alias("_oid_"),
        conv.alias("_conversion_"),
        tname.alias("_type_"),
        F.when(~bad, content).alias("_content_"),
        (~bad).alias("_decode_ok"),
    )


@register("service_snmp",
          keys={"TargetIndexKey", "TargetKey", "FieldKey", "OidKey",
                "ConversionKey", "TypeCodeKey", "ValueBytesKey",
                "ValueNumKey"})
def service_snmp(cfg: dict):
    """Registry twin: column names configurable, defaults match the
    poll-archive contract above."""
    names = dict(
        target_index=cfg.get("TargetIndexKey", "target_index"),
        target=cfg.get("TargetKey", "target"),
        field=cfg.get("FieldKey", "field"),
        oid=cfg.get("OidKey", "oid"),
        conversion=cfg.get("ConversionKey", "conversion"),
        type_code=cfg.get("TypeCodeKey", "type_code"),
        value_bytes=cfg.get("ValueBytesKey", "value_bytes"),
        value_num=cfg.get("ValueNumKey", "value_num"),
    )

    def run(df: DataFrame) -> DataFrame:
        return snmp_varbind_logs(df, **names)

    return run
