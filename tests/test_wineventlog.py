"""service_wineventlog (plugins/input/input_wineventlog/): ToEvent
field mapping (eventlog/eventlog.go:67-132), addPairs DataN renaming +
Go-JSON packing, ignore-zero gating, level fallback, and the winlogbeat
EventID/Level/Provider/IgnoreOlder query grammar."""

from __future__ import annotations

import json

from loongcollector_spark.operators import build_operator

FULL_XML = (
    "<Event xmlns='http://schemas.microsoft.com/win/2004/08/events/event'>"
    "<System>"
    "<Provider Name='Service Control Manager' "
    "Guid='{555908d1-a6d7-4695-8e1e-26931d2012f4}' "
    "EventSourceName='Service Control Manager'/>"
    "<EventID Qualifiers='16384'>7036</EventID>"
    "<Version>0</Version><Level>4</Level><Task>0</Task><Opcode>0</Opcode>"
    "<Keywords>0x8080000000000000</Keywords>"
    "<TimeCreated SystemTime='2026-01-02T03:04:05.678901Z'/>"
    "<EventRecordID>12345</EventRecordID>"
    "<Correlation ActivityID='{aaaa-bbbb}'/>"
    "<Execution ProcessID='588' ThreadID='704'/>"
    "<Channel>System</Channel><Computer>WIN-ABC</Computer>"
    "<Security UserID='S-1-5-18'/>"
    "</System>"
    "<EventData>"
    "<Data Name='param1'>Windows Update</Data>"
    "<Data Name='param2'>running</Data>"
    "<Data>unnamed &amp; escaped</Data>"
    "<Data Name='Data'>reserved-name</Data>"
    "</EventData>"
    "<RenderingInfo Culture='en-US'>"
    "<Message>The Windows Update service entered the running state."
    "\r\nExtra line.\r\n</Message>"
    "<Level>Information</Level><Task></Task><Opcode>Info</Opcode>"
    "<Keywords><Keyword>Classic</Keyword><Keyword>Audit</Keyword>"
    "</Keywords></RenderingInfo>"
    "</Event>"
)

MINIMAL_XML = (
    "<Event><System><Provider Name='app'/>"
    "<EventID>42</EventID><Level>2</Level>"
    "<TimeCreated SystemTime='2026-01-02T00:00:00.000000Z'/>"
    "<EventRecordID>1</EventRecordID>"
    "<Channel>Application</Channel><Computer>host</Computer>"
    "</System></Event>"
)


def _decode(spark, xmls, **cfg):
    df = spark.createDataFrame([(x,) for x in xmls], "xml string")
    out = build_operator({"Type": "service_wineventlog", **cfg})(df)
    return out.collect()


def test_full_event_to_event_fields(spark):
    [r] = _decode(spark, [FULL_XML])
    f = r["fields"]
    assert f["type"] == "wineventlog"
    assert f["log_name"] == "System"
    assert f["source_name"] == "Service Control Manager"
    assert f["computer_name"] == "WIN-ABC"
    assert f["record_number"] == "12345"
    assert f["event_id"] == "7036"
    assert f["provider_guid"] == "{555908d1-a6d7-4695-8e1e-26931d2012f4}"
    assert f["version"] == "0"
    assert f["level"] == "Information"      # RenderingInfo wins
    assert f["opcode"] == "Info"
    assert f["keywords"] == "[Classic Audit]"   # Go []string print
    # RemoveWindowsLineEndings: \r\n -> \n, trailing newline trimmed
    assert f["message"] == (
        "The Windows Update service entered the running state.\nExtra line.")
    assert f["activity_id"] == "{aaaa-bbbb}"
    assert f["process_id"] == "588" and f["thread_id"] == "704"
    assert f["user_identifier"] == "S-1-5-18"
    assert f["user_name"] == ""             # failed-lookup value
    # addPairs: named keys kept, unnamed/"Data" renamed in order
    ed = json.loads(f["event_data"])
    assert ed == {"param1": "Windows Update", "param2": "running",
                  "Data1": "unnamed & escaped", "Data2": "reserved-name"}
    # Go json.Marshal sorts keys
    assert list(ed) == sorted(ed)
    ud = json.loads(f["user_data"])
    assert ud == {"xml_name": ""}
    assert str(r["event_time"]).startswith("2026-01-02 03:04:05.678901")


def test_level_fallback_and_minimal_event(spark):
    [r] = _decode(spark, [MINIMAL_XML])
    f = r["fields"]
    assert f["level"] == "Error"            # LevelRaw=2 fallback
    assert f["event_data"] == "{}"
    assert f["keywords"] == "[]"
    assert "user_identifier" not in f       # no Security UserID
    assert f["message"] == ""               # no RenderingInfo


def test_ignore_zero_value_drops_zero_fields(spark):
    [r] = _decode(spark, [MINIMAL_XML], IgnoreZeroValue=True)
    f = r["fields"]
    for gone in ("message", "task", "opcode", "keywords", "version",
                 "process_id", "provider_guid"):
        assert gone not in f, gone
    assert f["level"] == "Error"            # non-zero survives
    assert f["event_id"] == "42"            # unconditional header stays
    # event_data / user_data are addPairs, never zero-gated
    assert f["event_data"] == "{}"


def test_event_id_grammar(spark):
    def mk(eid):
        return MINIMAL_XML.replace("<EventID>42</EventID>",
                                   f"<EventID>{eid}</EventID>")
    xmls = [mk(i) for i in (42, 4624, 4700, 4750, 4800, 4735, 5000)]
    got = {r["fields"]["event_id"] for r in _decode(
        spark, xmls, EventID="4624, 4700-4800, -4735")}
    assert got == {"4624", "4700", "4750", "4800"}
    # exclusion-only grammar: include everything except
    got = {r["fields"]["event_id"] for r in _decode(
        spark, xmls, EventID="-42,-5000")}
    assert got == {"4624", "4700", "4750", "4800", "4735"}


def test_level_provider_and_age_filters(spark):
    def mk(level, prov, ts):
        return (
            f"<Event><System><Provider Name='{prov}'/>"
            f"<EventID>1</EventID><Level>{level}</Level>"
            f"<TimeCreated SystemTime='{ts}'/>"
            "<EventRecordID>1</EventRecordID>"
            "<Channel>Application</Channel><Computer>h</Computer>"
            "</System></Event>")
    xmls = [mk(1, "a", "2026-01-02T00:00:00.000000Z"),
            mk(2, "a", "2026-01-02T00:00:00.000000Z"),
            mk(3, "b", "2026-01-02T00:00:00.000000Z"),
            mk(4, "a", "2026-01-01T00:00:00.000000Z"),
            mk(0, "a", "2026-01-02T00:00:00.000000Z")]
    # info covers raw 0 AND 4 (winlogbeat level grammar)
    got = [r["fields"]["level"] for r in _decode(
        spark, xmls, Level="info,critical")]
    assert sorted(got) == ["Critical", "Information", "Information"]
    got = _decode(spark, xmls, Provider=["b"])
    assert len(got) == 1 and got[0]["fields"]["level"] == "Warning"
    got = _decode(spark, xmls, IgnoreOlder=3600,
                  ReferenceNow="2026-01-02 00:30:00")
    assert len(got) == 4                    # the Jan-1 event is too old


def test_channel_name_filter(spark):
    xmls = [MINIMAL_XML,
            MINIMAL_XML.replace("<Channel>Application</Channel>",
                                "<Channel>Security</Channel>")]
    got = _decode(spark, xmls, Name="Security")
    assert len(got) == 1 and got[0]["fields"]["log_name"] == "Security"


def test_event_data_duplicate_keys_last_wins(spark):
    """addPairs builds a Go map in slice order: a renamed DataN that
    collides with a literal DataN name overwrites it, and json.Marshal
    emits each key once."""
    xml = MINIMAL_XML.replace(
        "</System>",
        "</System><EventData>"
        "<Data Name='Data1'>named</Data>"
        "<Data>unnamed</Data>"
        "<Data Name='dup'>first</Data>"
        "<Data Name='dup'>second</Data>"
        "</EventData>")
    [r] = _decode(spark, [xml])
    ed = json.loads(r["fields"]["event_data"])
    assert ed == {"Data1": "unnamed", "dup": "second"}
    assert r["fields"]["event_data"].count('"Data1"') == 1
