"""service_canal — MySQL binlog row/DDL events → log rows.

Reference: plugins/input/canal/input_canal.go. The reference embeds a
go-mysql replication client; the binlog *tap* (connecting to mysqld,
checkpointing file/offset/GTID) is deployment-side runtime, exactly like
the kafka broker and docker daemon inputs. What replays here is the
event→log conversion contract, the part every downstream processor
depends on:

- OnRow (input_canal.go:346-460): one log per row image with meta fields
  ``_host_/_db_/_table_/_event_("row_"+action)/_id_`` plus the GTID trio
  ``_gtid_/_filename_/_offset_`` (EnableGTID, default true) and the
  header quad ``_event_time_/_event_log_postion_/_event_size_/
  _event_server_id_`` (EnableEventMeta). Update events pair consecutive
  row images (old, new): old columns get the ``_old_`` prefix
  (input_canal.go:404-408); values past the table meta become
  ``unknow_col_<i>`` / ``_old_unknow_col_<i>`` (:393,:399 — the
  reference's misspelling is the wire contract). Insert/update/delete
  are individually gated by EnableInsert/EnableUpdate/EnableDelete
  (all default true); an update with an odd row-image count is dropped
  whole (CANAL_INVALID_ALARM, :366-369).
- OnDDL (input_canal.go:273-297, EnableDDL default false): fields
  ``_host_/ErrorCode/ExecutionTime/_db_/Query/StatusVars/_event_=ddl``
  plus the GTID trio.
- addData PackValues (input_canal.go:217-262): meta fields
  (canalMetaFields, :211-213) stay top-level; ``_old_*`` fields marshal
  into ``old_data`` and the rest into ``data`` as Go ``json.Marshal``
  strings (sorted keys, HTML-escaped ``<>&``), empty maps as ``""``.
- IncludeTables/ExcludeTables: regex lists matched against
  ``schema.table`` (go-mysql canal config; row events only — OnDDL is
  not table-filtered).

Spark shape: the input is a binlog-event frame — one row per
replication event, the landed form of a CDC tap:

  event_seq:long          -- arrival order (checkpoint.ID analog)
  action:string           -- insert | update | delete | ddl
  db:string, tbl:string
  columns:array<string>   -- table-meta column names
  rows:array<array<string>> -- row images, stringified upstream
                             (columnValueToString runs at tap time:
                              enum/set expansion, TextToString — string
                              typing is the tap's job; NULL → "<nil>",
                              fmt.Sprint of a nil interface)
  gtid:string, filename:string, log_pos:long
  event_time:long, event_size:long, server_id:long   -- header meta
  query:string, error_code:long, exec_time:long, status_vars:string

Everything below is pure codegen (HOF transforms + map algebra, no
Python on the row path); one event explodes into its logs in a single
projection. Session sets mapKeyDedupPolicy=LAST_WIN, so a data column
that collides with a meta field overwrites it — the Go map-write order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register
from loongcollector_spark.operators.common import go_jstr as _go_jstr

# input_canal.go:211-213 (verbatim, including the misspelling)
CANAL_META_FIELDS = (
    "_db_", "_event_", "_gtid_", "_host_", "_id_",
    "_table_", "_filename_", "_offset_", "_event_time_",
    "_event_log_postion_", "_event_size_", "_event_server_id_",
)


def _go_json_obj(m: Column) -> Column:
    """map<string,string> → Go json.Marshal object string: keys sorted,
    empty map → "" (the marshal() helper, input_canal.go:245-260)."""
    entries = F.array_sort(F.map_entries(m))
    body = F.array_join(
        F.transform(
            entries,
            lambda e: F.concat(_go_jstr(e["key"]), F.lit(":"),
                               _go_jstr(e["value"])),
        ),
        ",",
    )
    return F.when(F.size(entries) <= 0, F.lit("")).otherwise(
        F.concat(F.lit("{"), body, F.lit("}"))
    )


def _named_map(cols: Column, vals: Column, prefix: str = "") -> Column:
    """Positional row image + table-meta names → field map. Indices past
    the meta become ``<prefix>unknow_col_<i>`` (input_canal.go:393,399);
    NULL values print as fmt.Sprint(nil) = "<nil>"."""
    keys = F.transform(
        F.sequence(F.lit(1), F.size(vals)),
        lambda j: F.when(
            j <= F.size(cols), F.concat(F.lit(prefix), F.element_at(cols, j))
        ).otherwise(
            F.concat(F.lit(prefix + "unknow_col_"), (j - 1).cast("string"))
        ),
    )
    safe = F.transform(vals, lambda v: F.coalesce(v, F.lit("<nil>")))
    return F.map_from_arrays(keys, safe)


def _pack_values(m: Column) -> Column:
    """addData PackValues=true (input_canal.go:222-262): meta fields stay,
    ``_old_*`` → old_data JSON, the rest → data JSON."""
    is_meta = lambda k: k.isin(*CANAL_META_FIELDS)  # noqa: E731
    meta = F.map_filter(m, lambda k, v: is_meta(k))
    old = F.map_filter(m, lambda k, v: ~is_meta(k) & k.startswith("_old_"))
    new = F.map_filter(m, lambda k, v: ~is_meta(k) & ~k.startswith("_old_"))
    return F.map_concat(
        meta,
        F.create_map(
            F.lit("old_data"), _go_json_obj(old),
            F.lit("data"), _go_json_obj(new),
        ),
    )


def canal_events_to_logs(
    df: DataFrame,
    host: str = "127.0.0.1",
    enable_gtid: bool = True,
    enable_insert: bool = True,
    enable_update: bool = True,
    enable_delete: bool = True,
    enable_ddl: bool = False,
    enable_event_meta: bool = False,
    pack_values: bool = False,
    include_tables: list[str] | None = None,
    exclude_tables: list[str] | None = None,
) -> DataFrame:
    """Binlog-event frame → (event_seq, log_idx, contents) log rows."""
    meta_pairs = [
        (F.lit("_host_"), F.lit(host)),
        (F.lit("_db_"), F.coalesce(F.col("db"), F.lit(""))),
        (F.lit("_table_"), F.coalesce(F.col("tbl"), F.lit(""))),
        (F.lit("_event_"), F.concat(F.lit("row_"), F.col("action"))),
        (F.lit("_id_"), F.col("event_seq").cast("string")),
    ]
    gtid_pairs = [
        (F.lit("_gtid_"), F.coalesce(F.col("gtid"), F.lit(""))),
        (F.lit("_filename_"), F.coalesce(F.col("filename"), F.lit(""))),
        (F.lit("_offset_"), F.col("log_pos").cast("string")),
    ]
    if enable_gtid:
        meta_pairs += gtid_pairs
    if enable_event_meta:
        meta_pairs += [
            (F.lit("_event_time_"), F.col("event_time").cast("string")),
            (F.lit("_event_log_postion_"), F.col("log_pos").cast("string")),
            (F.lit("_event_size_"), F.col("event_size").cast("string")),
            (F.lit("_event_server_id_"), F.col("server_id").cast("string")),
        ]
    meta_map = F.create_map(*[c for kv in meta_pairs for c in kv])

    cols, rows = F.col("columns"), F.col("rows")
    empty = F.array().cast("array<map<string,string>>")

    # update: consecutive (old, new) row-image pairs; odd count → drop
    # the whole event (input_canal.go:366-369)
    n_pairs = (F.size(rows) / 2).cast("int")
    update_logs = F.when(
        (F.size(rows) > 0) & (F.size(rows) % 2 == 0),
        F.transform(
            F.sequence(F.lit(1), n_pairs),
            lambda i: F.map_concat(
                meta_map,
                _named_map(cols, F.element_at(rows, i * 2 - 1), "_old_"),
                _named_map(cols, F.element_at(rows, i * 2)),
            ),
        ),
    ).otherwise(empty)
    plain_logs = F.transform(
        rows, lambda r: F.map_concat(meta_map, _named_map(cols, r))
    )

    ddl_pairs = [
        (F.lit("_host_"), F.lit(host)),
        (F.lit("ErrorCode"), F.coalesce(F.col("error_code").cast("string"),
                                        F.lit("0"))),
        (F.lit("ExecutionTime"), F.coalesce(F.col("exec_time").cast("string"),
                                            F.lit("0"))),
        (F.lit("_db_"), F.coalesce(F.col("db"), F.lit(""))),
        (F.lit("Query"), F.coalesce(F.col("query"), F.lit(""))),
        (F.lit("StatusVars"), F.coalesce(F.col("status_vars"), F.lit(""))),
        (F.lit("_event_"), F.lit("ddl")),
    ] + (gtid_pairs if enable_gtid else [])
    ddl_logs = F.array(F.create_map(*[c for kv in ddl_pairs for c in kv]))

    act = F.col("action")
    logs = (
        F.when(act == F.lit("ddl"), ddl_logs if enable_ddl else empty)
        .when(act == F.lit("update"), update_logs if enable_update else empty)
        .when(act == F.lit("delete"), plain_logs if enable_delete else empty)
        .when(act == F.lit("insert"), plain_logs if enable_insert else empty)
        .otherwise(empty)
    )

    # IncludeTables/ExcludeTables regex over "schema.table" — row events
    # only (the canal lib filters OnRow; OnDDL is unfiltered)
    if include_tables or exclude_tables:
        full = F.concat_ws(".", F.col("db"), F.col("tbl"))
        keep = F.lit(True)
        if include_tables:
            inc = F.lit(False)
            for rx in include_tables:
                inc = inc | full.rlike(rx)
            keep = keep & inc
        for rx in exclude_tables or []:
            keep = keep & ~full.rlike(rx)
        df = df.filter((F.col("action") == "ddl") | keep)

    out = df.select(
        "event_seq",
        F.posexplode(logs).alias("log_idx", "contents"),
    )
    if pack_values:
        out = out.withColumn("contents", _pack_values(F.col("contents")))
    return out


_CANAL_KEYS = {
    # conversion knobs honored here
    "Host", "EnableGTID", "EnableInsert", "EnableUpdate", "EnableDelete",
    "EnableDDL", "EnableEventMeta", "PackValues",
    "IncludeTables", "ExcludeTables",
    # tap-side connection/checkpoint/typing knobs (NewServiceCanal
    # defaults, input_canal.go:864-882) — deployment/runtime config,
    # accepted for YAML compatibility; value typing (TextToString /
    # SetToString / ByteValueToString / Charset / UseDecimal) runs where
    # the tap stringifies row images
    "Port", "User", "Password", "ServerID", "ServerId", "Flavor",
    "StartGTID", "StartBinName", "StartBinLogPos", "HeartBeatPeriod",
    "ReadTimeout", "EnableXID", "TextToString", "SetToString",
    "ByteValueToString", "Charset", "UseDecimal", "StartFromBegining",
}


@register("service_canal", keys=_CANAL_KEYS)
def service_canal(cfg: dict):
    """Registry twin: the e2e input_canal config (User/Host/ServerId/
    Password/IncludeTables/TextToString/EnableDDL) builds this operator
    over a binlog-event frame."""
    def run(df: DataFrame) -> DataFrame:
        return canal_events_to_logs(
            df,
            host=str(cfg.get("Host", "127.0.0.1")),
            enable_gtid=cfg.get("EnableGTID", True),
            enable_insert=cfg.get("EnableInsert", True),
            enable_update=cfg.get("EnableUpdate", True),
            enable_delete=cfg.get("EnableDelete", True),
            enable_ddl=cfg.get("EnableDDL", False),
            enable_event_meta=cfg.get("EnableEventMeta", False),
            pack_values=cfg.get("PackValues", False),
            include_tables=cfg.get("IncludeTables"),
            exclude_tables=cfg.get("ExcludeTables"),
        )

    return run
