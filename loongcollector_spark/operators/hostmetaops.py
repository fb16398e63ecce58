"""metric_meta_host — host/process metadata nodes
(plugins/input/hostmeta/input_host_meta.go, host_meta_collect.go,
pkg/helper/meta_helper.go).

The gopsutil/procfs scraping is host-bound; the modeled compute is the
MetaNode → log projection (makeMetaLog, meta_helper.go:106-129): every
node emits one log with the fixed key set ``id, type, attributes,
labels, parents`` where attributes/labels are JSON objects and parents
a JSON string array.

* HOST node (input_host_meta.go:115-146): id = hostID + "_" + ip,
  labels = hostname/ip/boot_time/os/platform*/kernel*/virtualization*/
  host_id + custom Labels; attributes keyed by category — CPU
  (processor/core counts, vendor/family/model/mhz/cache_size,
  host_meta_collect.go:40-66), DISK (partition device/opts/fstype/
  mount_point array), MEM (mem/swap/vsz totals), NET (interface
  index/name/mtu/hwaddr/flags/addrs array) — per the CPU/Memory/Disk/
  Net switches;
* PROCESS nodes (input_host_meta_linux.go:31-82): skipped when cmdline
  is empty or RSS is 0; ProcessNamesRegex matches cmd OR exe (empty
  list = all); id = hostname_ip_PROCESS_pid_starttime
  (genProcessNodeID); attributes pid/command/exe/name/ppid with the
  formatCmd 8000-char squeeze (first 4000 + " ... " + last 4000);
  parents = ["HOST:<hostID_ip>:<hostname>"] (WithParent's
  key:id:name join).

Determinism note: the reference marshals Attributes/Labels with
easyjson map iteration (Go map order — nondeterministic run to run);
this engine emits sorted keys at every level, the deterministic
refinement the hash oracle needs. Numeric attribute values stay
unquoted JSON numbers; integral floats (mhz) print without a decimal
point like Go's shortest-repr marshal.

Input contract: one row per host —
``host_id, hostname, ip string, boot_time long, os, platform,
platform_family, platform_version, kernel_version, kernel_arch,
virtualization_system, virtualization_role string, processor_count
int, core_count int, vendor_id, family, model, model_name string, mhz
double, cache_size int, mem_total long, swap_total long, vsz_total
long, disks array<struct<device, opts, fstype, mount_point: string>>,
nets array<struct<index:int, name:string, mtu:int,
hardware_address:string, flags:array<string>, addrs:array<string>>>,
processes array<struct<pid:int, cmdline:string, exe:string,
comm:string, ppid:int, start_time:long, rss:long>>, ts timestamp``.

Scale shape: pure projections + one explode for the process fan-out;
no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register
from loongcollector_spark.operators.common import go_jstr as _go_jstr


def _jnum(col: Column) -> Column:
    """A numeric attribute as Go json.Marshal prints it: integral
    doubles without a decimal point, else the plain decimal form."""
    d = col.cast("double")
    return F.when(d == F.floor(d), d.cast("long").cast("string")) \
        .otherwise(d.cast("string"))


def _jobj(pairs) -> Column:
    """JSON object from (literal_key, value_col, is_string) triples,
    keys pre-sorted by the caller."""
    parts = []
    for k, v, is_str in pairs:
        val = _go_jstr(F.coalesce(v, F.lit(""))) if is_str else v
        parts.append(F.concat(F.lit(f'"{k}":'), val))
    return F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}"))


def host_meta_nodes(
    df: DataFrame,
    cpu: bool = True,
    memory: bool = True,
    disk: bool = False,
    net: bool = False,
    process: bool = False,
    process_names_regex: tuple = (),
    labels: dict | None = None,
) -> DataFrame:
    labels = dict(labels or {})
    host_id_full = F.concat(F.col("host_id"), F.lit("_"), F.col("ip"))

    label_pairs = sorted([
        ("hostname", F.col("hostname")), ("ip", F.col("ip")),
        ("boot_time", F.col("boot_time").cast("string")),
        ("os", F.col("os")), ("platform", F.col("platform")),
        ("platform_family", F.col("platform_family")),
        ("platform_version", F.col("platform_version")),
        ("kernel_version", F.col("kernel_version")),
        ("kernel_arch", F.col("kernel_arch")),
        ("virtualization_system", F.col("virtualization_system")),
        ("virtualization_role", F.col("virtualization_role")),
        ("host_id", F.col("host_id")),
        *[(k, F.lit(v)) for k, v in labels.items()],
    ])
    host_labels = _jobj([(k, v, True) for k, v in label_pairs])

    cats = []
    if cpu:
        cats.append(("CPU", _jobj([
            ("cache_size", F.col("cache_size").cast("string"), False),
            ("core_count", F.col("core_count").cast("string"), False),
            ("family", F.col("family"), True),
            ("mhz", _jnum(F.col("mhz")), False),
            ("model", F.col("model"), True),
            ("model_name", F.col("model_name"), True),
            ("processor_count",
             F.col("processor_count").cast("string"), False),
            ("vendor_id", F.col("vendor_id"), True),
        ])))
    if disk:
        dev = F.transform(F.col("disks"), lambda d: F.concat(
            F.lit('{"device":'), _go_jstr(F.coalesce(d["device"], F.lit(""))),
            F.lit(',"fstype":'), _go_jstr(F.coalesce(d["fstype"], F.lit(""))),
            F.lit(',"mount_point":'),
            _go_jstr(F.coalesce(d["mount_point"], F.lit(""))),
            F.lit(',"opts":'), _go_jstr(F.coalesce(d["opts"], F.lit(""))),
            F.lit("}")))
        cats.append(("DISK", F.concat(
            F.lit("["), F.array_join(dev, ","), F.lit("]"))))
    if memory:
        cats.append(("MEM", _jobj([
            ("mem_total", F.col("mem_total").cast("string"), False),
            ("swap_total", F.col("swap_total").cast("string"), False),
            ("vsz_total", F.col("vsz_total").cast("string"), False),
        ])))
    if net:
        itf = F.transform(F.col("nets"), lambda n: F.concat(
            F.lit('{"addrs":['),
            F.array_join(F.transform(
                n["addrs"],
                lambda a: F.concat(F.lit('{"addr":'), _go_jstr(a),
                                   F.lit("}"))), ","),
            F.lit('],"flags":['),
            F.array_join(F.transform(n["flags"], _go_jstr), ","),
            F.lit('],"hardware_address":'),
            _go_jstr(F.coalesce(n["hardware_address"], F.lit(""))),
            F.lit(',"index":'), n["index"].cast("string"),
            F.lit(',"mtu":'), n["mtu"].cast("string"),
            F.lit(',"name":'), _go_jstr(F.coalesce(n["name"], F.lit(""))),
            F.lit("}")))
        cats.append(("NET", F.concat(
            F.lit("["), F.array_join(itf, ","), F.lit("]"))))

    host_attrs = (
        F.concat(
            F.lit("{"),
            F.concat_ws(",", *[
                F.concat(F.lit(f'"{k}":'), v) for k, v in cats]),
            F.lit("}"))
        if cats else F.lit("")
    )
    out = None
    if cats:
        out = df.select(
            host_id_full.alias("id"), F.lit("HOST").alias("type"),
            host_attrs.alias("attributes"), host_labels.alias("labels"),
            F.lit("[]").alias("parents"), F.col("ts"),
        )
    if not process:
        if out is None:
            raise ValueError(
                "metric_meta_host: every collector switch is off — "
                "nothing to emit")
        return out

    p = F.col("_p")
    keep = (p["cmdline"] != "") & p["cmdline"].isNotNull() \
        & (p["rss"] > 0)
    if process_names_regex:
        m = F.lit(False)
        for rx in process_names_regex:
            m = m | p["cmdline"].rlike(rx) | p["exe"].rlike(rx)
        keep = keep & m
    cmd = p["cmdline"]
    squeezed = F.when(
        F.length(cmd) > 8000,
        F.concat(F.substring(cmd, 1, 4000), F.lit(" ... "),
                 F.substring(cmd, -4000, 4000)),
    ).otherwise(cmd)
    proc_labels = _jobj([(k, v, True) for k, v in sorted([
        ("hostname", F.col("hostname")), ("ip", F.col("ip")),
        *[(k, F.lit(v)) for k, v in labels.items()],
    ])])
    proc_attrs = _jobj([
        ("command", squeezed, True),
        ("exe", p["exe"], True),
        ("name", p["comm"], True),
        ("pid", p["pid"].cast("string"), False),
        ("ppid", p["ppid"].cast("string"), False),
    ])
    procs = (
        df.select("*", F.explode(F.col("processes")).alias("_p"))
        .filter(keep)
        .select(
            F.concat_ws("_", F.col("hostname"), F.col("ip"),
                        F.lit("PROCESS"), p["pid"].cast("string"),
                        p["start_time"].cast("string")).alias("id"),
            F.lit("PROCESS").alias("type"),
            proc_attrs.alias("attributes"),
            proc_labels.alias("labels"),
            F.concat(F.lit('["HOST:'), host_id_full, F.lit(":"),
                     F.col("hostname"), F.lit('"]')).alias("parents"),
            F.col("ts"),
        )
    )
    return procs if out is None else out.unionByName(procs)


@register("metric_meta_host",
          keys={"CPU", "Memory", "Net", "Disk", "Process",
                "ProcessNamesRegex", "Labels", "ProcessIntervalRound"})
def metric_meta_host(cfg: dict):
    """Registry twin with the reference defaults (input_host_meta.go:
    193-201: CPU and Memory on, ProcessIntervalRound=5 — a scrape-timer
    cadence, accepted without a per-row effect)."""
    def run(df: DataFrame) -> DataFrame:
        return host_meta_nodes(
            df,
            cpu=bool(cfg.get("CPU", True)),
            memory=bool(cfg.get("Memory", True)),
            disk=bool(cfg.get("Disk", False)),
            net=bool(cfg.get("Net", False)),
            process=bool(cfg.get("Process", False)),
            process_names_regex=tuple(cfg.get("ProcessNamesRegex", []) or ()),
            labels=cfg.get("Labels") or {},
        )

    return run
