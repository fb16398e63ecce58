"""service_canal binlog event→log conversion (input_canal.go) — unit
goldens for row pairing / meta fields / DDL gates / PackValues, plus the
reference's own input_canal e2e case replayed over a binlog-event frame."""

import os

import pytest
import yaml

from pyspark.sql import functions as F

from loongcollector_spark.operators import build_operator

CASES = "/root/reference/test/e2e/test_cases"

BINLOG_SCHEMA = (
    "event_seq long, action string, db string, tbl string, "
    "columns array<string>, rows array<array<string>>, "
    "gtid string, filename string, log_pos long, "
    "event_time long, event_size long, server_id long, "
    "query string, error_code long, exec_time long, status_vars string"
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, BINLOG_SCHEMA)


def _row_event(seq, action, rows, db="mysql", tbl="specialalarmtest",
               columns=("id", "alarm"), **kw):
    base = dict(
        event_seq=seq, action=action, db=db, tbl=tbl,
        columns=list(columns) if columns else None, rows=rows,
        gtid=f"uuid:{seq}", filename="mysql-bin.000001", log_pos=1000 + seq,
        event_time=1700000000 + seq, event_size=120, server_id=9966,
        query=None, error_code=None, exec_time=None, status_vars=None,
    )
    base.update(kw)
    return base


def test_update_pairs_old_prefix_and_meta(spark):
    df = _frame(spark, [_row_event(
        7, "update",
        [["1", "a"], ["1", "b"], ["2", "x"], ["2", "y"]],
    )])
    out = build_operator({"Type": "service_canal", "Host": "db1"})(df)
    rows = sorted(out.collect(), key=lambda r: r.log_idx)
    assert len(rows) == 2  # two (old,new) pairs
    c = rows[0].contents
    assert c["_event_"] == "row_update" and c["_host_"] == "db1"
    assert c["_db_"] == "mysql" and c["_table_"] == "specialalarmtest"
    assert c["_id_"] == "7"
    # GTID trio on by default (EnableGTID, input_canal.go:872)
    assert c["_gtid_"] == "uuid:7" and c["_filename_"] == "mysql-bin.000001"
    assert c["_offset_"] == "1007"
    assert c["_old_id"] == "1" and c["_old_alarm"] == "a"
    assert c["id"] == "1" and c["alarm"] == "b"
    c2 = rows[1].contents
    assert c2["_old_alarm"] == "x" and c2["alarm"] == "y"


def test_update_odd_row_count_drops_event(spark):
    df = _frame(spark, [_row_event(1, "update", [["1", "a"], ["1", "b"],
                                                 ["2", "x"]])])
    out = build_operator({"Type": "service_canal"})(df)
    assert out.count() == 0  # CANAL_INVALID_ALARM (input_canal.go:366-369)


def test_insert_delete_unknown_cols_and_nil(spark):
    df = _frame(spark, [
        _row_event(1, "insert", [["1", "a", "extra"]]),
        _row_event(2, "delete", [["2", None]]),
    ])
    out = build_operator({"Type": "service_canal"})(df).collect()
    by_ev = {r.contents["_event_"]: r.contents for r in out}
    ins = by_ev["row_insert"]
    assert ins["unknow_col_2"] == "extra"  # :429 (reference misspelling)
    assert by_ev["row_delete"]["alarm"] == "<nil>"  # fmt.Sprint(nil)


def test_action_gates_and_event_meta(spark):
    df = _frame(spark, [
        _row_event(1, "insert", [["1", "a"]]),
        _row_event(2, "delete", [["2", "b"]]),
        _row_event(3, "update", [["3", "c"], ["3", "d"]]),
    ])
    op = build_operator({
        "Type": "service_canal", "EnableInsert": False,
        "EnableDelete": False, "EnableEventMeta": True,
        "EnableGTID": False,
    })
    rows = op(df).collect()
    assert [r.contents["_event_"] for r in rows] == ["row_update"]
    c = rows[0].contents
    assert "_gtid_" not in c and "_offset_" not in c
    assert c["_event_time_"] == "1700000003"
    assert c["_event_log_postion_"] == "1003" and c["_event_size_"] == "120"
    assert c["_event_server_id_"] == "9966"


def test_ddl_gate_and_fields(spark):
    ev = _row_event(5, "ddl", None, columns=None,
                    query="ALTER TABLE t ADD c INT", error_code=0,
                    exec_time=1, status_vars="sv")
    df = _frame(spark, [ev])
    assert build_operator({"Type": "service_canal"})(df).count() == 0  # default off
    out = build_operator({"Type": "service_canal", "EnableDDL": True})(df)
    c = out.collect()[0].contents
    assert c["_event_"] == "ddl" and c["Query"] == "ALTER TABLE t ADD c INT"
    assert c["ErrorCode"] == "0" and c["ExecutionTime"] == "1"
    assert c["StatusVars"] == "sv" and c["_gtid_"] == "uuid:5"
    assert "_table_" not in c and "_id_" not in c


def test_pack_values_go_json(spark):
    df = _frame(spark, [
        _row_event(1, "update", [["1", 'a"<b'], ["1", "b"]]),
        _row_event(2, "insert", [["9", "z"]]),
    ])
    out = build_operator({"Type": "service_canal", "PackValues": True})(df)
    by_ev = {r.contents["_event_"]: r.contents for r in out.collect()}
    upd = by_ev["row_update"]
    # sorted keys, Go HTML escaping of < inside the value
    assert upd["old_data"] == '{"_old_alarm":"a\\"\\u003cb","_old_id":"1"}'
    assert upd["data"] == '{"alarm":"b","id":"1"}'
    assert upd["_db_"] == "mysql" and "id" not in upd
    ins = by_ev["row_insert"]
    assert ins["old_data"] == ""  # empty map marshals to "" (:246-249)
    assert ins["data"] == '{"alarm":"z","id":"9"}'


def test_include_exclude_tables(spark):
    df = _frame(spark, [
        _row_event(1, "insert", [["1", "a"]], db="mysql", tbl="keep"),
        _row_event(2, "insert", [["2", "b"]], db="other", tbl="drop"),
    ])
    out = build_operator({
        "Type": "service_canal", "IncludeTables": [r"mysql\..*"],
    })(df).collect()
    assert [r.contents["_table_"] for r in out] == ["keep"]
    out2 = build_operator({
        "Type": "service_canal", "ExcludeTables": [r"^other\."],
    })(df).collect()
    assert [r.contents["_table_"] for r in out2] == ["keep"]


@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference not present")
def test_input_canal_e2e_case(spark):
    """The reference's input_canal case: its verbatim YAML input config
    over a binlog frame must emit at least {10} logs carrying the
    asserted field list (_db_/_gtid_/_event_/_filename_/_host_/_offset_)."""
    from tests.test_e2e_corpus import parse_feature

    case = parse_feature("input_canal")
    cfg = yaml.safe_load(case["config"])["inputs"][0]
    # the case writes the regex with a Go-source-style double backslash
    # inside a YAML plain scalar (no escape processing) — normalize to
    # the regex the author meant
    cfg["IncludeTables"] = [
        rx.replace("\\\\", "\\") for rx in cfg["IncludeTables"]]
    df = _frame(spark, [
        _row_event(i, "insert", [[str(i), f"alarm{i}"]]) for i in range(10)
    ])
    out = build_operator(cfg)(df)
    rows = out.collect()
    assert len(rows) >= case["at_least"]
    for field in case["field_list"]:
        for r in rows:
            assert field in r.contents, field
    # the case's IncludeTables regex admits mysql.specialalarmtest only
    other = _frame(spark, [_row_event(99, "insert", [["9", "x"]],
                                      db="appdb", tbl="orders")])
    assert build_operator(cfg)(other).count() == 0


def test_canal_plan_is_single_stage(spark):
    """The event→logs conversion is one codegen projection + generate —
    no exchange anywhere (scale posture: a 10^12-event binlog archive
    converts embarrassingly parallel)."""
    df = _frame(spark, [_row_event(1, "insert", [["1", "a"]])])
    out = build_operator({"Type": "service_canal", "PackValues": True})(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
