"""service_snmp varbind conversion (plugins/input/snmp/input_snmp.go
:505-563): hwaddr/ipaddr conversions, OctetString-vs-ToBigInt content
switch, Asn1BER2String table, the 7-field log shape.  IPv6 formatting is
cross-checked against Python's ``ipaddress`` module — both it and Go's
``net.IP.String()`` implement RFC 5952 (lower hex, leading zeros
trimmed, leftmost longest ≥2 zero-group run compressed)."""

from __future__ import annotations

import ipaddress

from pyspark.sql import functions as F

from loongcollector_spark.operators import build_operator
from loongcollector_spark.operators.snmpops import ASN1_NAMES

IPV6_VECTORS = [
    "20010db8000000000000000000000001",   # 2001:db8::1
    "00000000000000000000000000000000",   # ::
    "00000000000000000000000000000001",   # ::1
    "00010000000000010000000000000001",   # longest run later wins
    "00010000000000010001000000000001",   # tie -> leftmost
    "20010db8000100020003000400050006",   # no zero run at all
    "00010002000300040005000600070000",   # single trailing zero group:
                                          # run of 1 is NOT compressed
    "fe800000000000000202b3fffe1e8329",
]


def _run(spark, rows):
    df = spark.createDataFrame(
        rows,
        "target_index int, target string, field string, oid string, "
        "conversion string, type_code int, value_bytes binary, "
        "value_num long",
    )
    return {
        (r["_field_"]): r
        for r in build_operator({"Type": "service_snmp"})(df).collect()
    }


def test_conversions_and_type_table(spark):
    rows = [
        (0, "10.0.0.1:161", "ifPhysAddress", ".1.3.6.1.2.1.2.2.1.6",
         "hwaddr", 0x04, bytes([0x00, 0x16, 0x3E, 0x00, 0x00, 0x01]), None),
        (0, "10.0.0.1:161", "ipAdEntAddr", ".1.3.6.1.2.1.4.20.1.1",
         "ipaddr", 0x40, bytes([10, 1, 2, 3]), None),
        (0, "10.0.0.1:161", "sysDescr", ".1.3.6.1.2.1.1.1",
         "", 0x04, b"Linux host 6.1", None),
        (0, "10.0.0.1:161", "ifInOctets", ".1.3.6.1.2.1.2.2.1.10",
         "", 0x41, None, 123456789),
        (1, "10.0.0.2:161", "hrSystemUptime", ".1.3.6.1.2.1.25.1.1",
         "", 0x43, None, 42),
        (1, "10.0.0.2:161", "bigCounter", ".1.3.6.1.2.1.31.1.1.1.6",
         "", 0x46, None, 2**62),
        (1, "10.0.0.2:161", "missing", ".1.3.6.1.9.9",
         "", 0x80, None, None),        # NoSuchObject: nil -> "0"
        (1, "10.0.0.2:161", "mystery", ".1.3.6.1.9.10",
         "", 0x55, None, 7),           # unmapped tag -> ""
    ]
    out = _run(spark, rows)
    assert out["ifPhysAddress"]["_content_"] == "00:16:3e:00:00:01"
    assert out["ifPhysAddress"]["_type_"] == "OctetString"
    assert out["ipAdEntAddr"]["_content_"] == "10.1.2.3"
    assert out["ipAdEntAddr"]["_type_"] == "IPAddress"
    assert out["sysDescr"]["_content_"] == "Linux host 6.1"
    assert out["ifInOctets"]["_content_"] == "123456789"
    assert out["ifInOctets"]["_type_"] == "Counter32"
    assert out["hrSystemUptime"]["_type_"] == "TimeTicks"
    assert out["bigCounter"]["_content_"] == str(2**62)
    assert out["missing"]["_content_"] == "0"
    assert out["missing"]["_type_"] == "NoSuchObject"
    assert out["mystery"]["_type_"] == ""
    assert all(r["_decode_ok"] for r in out.values())
    assert out["ipAdEntAddr"]["_targetindex_"] == "0"
    assert out["bigCounter"]["_target_"] == "10.0.0.2:161"


def test_ipv6_matches_rfc5952(spark):
    rows = [
        (0, "t", f"v{i}", ".1", "ipaddr", 0x04, bytes.fromhex(h), None)
        for i, h in enumerate(IPV6_VECTORS)
    ]
    out = _run(spark, rows)
    for i, h in enumerate(IPV6_VECTORS):
        expected = str(ipaddress.IPv6Address(bytes.fromhex(h)))
        assert out[f"v{i}"]["_content_"] == expected, (h, expected)


def test_ipv4_mapped_prints_dotted(spark):
    h = "00000000000000000000ffff0a010203"  # ::ffff:10.1.2.3 -> To4()
    out = _run(spark, [(0, "t", "v", ".1", "ipaddr", 0x04,
                        bytes.fromhex(h), None)])
    assert out["v"]["_content_"] == "10.1.2.3"


def test_bad_conversion_lengths_mark_not_throw(spark):
    rows = [
        (0, "t", "short_ip", ".1", "ipaddr", 0x04, bytes([1, 2, 3]), None),
        (0, "t", "null_mac", ".1", "hwaddr", 0x04, None, None),
    ]
    out = _run(spark, rows)
    assert not out["short_ip"]["_decode_ok"]
    assert out["short_ip"]["_content_"] is None
    assert not out["null_mac"]["_decode_ok"]


def test_type_table_is_the_reference_table():
    # input_snmp.go:275-322 — spot the quirk entries survived
    assert ASN1_NAMES[0x01] == "Boolean "   # trailing space, verbatim
    assert ASN1_NAMES[0x82] == "EndOfMibView"
    assert len(ASN1_NAMES) == 21
