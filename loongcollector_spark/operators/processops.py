"""metric_process_v2 — host process metric collection
(plugins/input/process/input_process.go).

The /proc scraping itself is host-bound (procfs/gopsutil); what the
plugin COMPUTES per collection round is modeled exactly, over an
observed-process frame (the wineventlog/kubernetesmeta column-contract
pattern):

* regex selection (:128-156): keep a process when ANY ProcessNamesRegex
  matches its exe OR cmdline (no regexes = keep all);
* threshold selection (:159-181): CPU-threshold matches first in scan
  order, then memory-threshold matches appended (rss >=
  MinMemoryLimitKB*1024) — the APPEND ORDER is load-bearing because the
  MaxProcessCount cap truncates it;
* top-N selection (:182-219): TopNCPU by cpu desc capped at
  min(MaxProcessCount, TopNCPU); TopNMem iterates only the first
  min(MaxProcessCount, TopNMem) mem-sorted entries, skips ones already
  selected, and stops when the total hits MaxProcessCount. Go's
  sort.Slice is UNSTABLE, so reference tie order is nondeterministic —
  this engine breaks ties on scan_idx (the deterministic refinement);
* metric emission (:221-272): always cpu percent/stime/utime + mem
  rss/swap/vsz/data; Thread/OpenFD/NetIO/IO switches add their groups;
  labels = sorted ``k#$#v|…`` of hostname/ip/custom labels + pid +
  comm truncated at MaxIdentifierLength (input_process_cache_linux.go:
  145-162), the helper.MetricLabels contract metricops already pins.

Input contract: one row per observed process with ``scan_idx long``
(the /proc scan order), ``pid int, exe string, cmdline string,
comm string, cpu_percent double, stime_percent double, utime_percent
double, rss long, swap long, vsz long, data long, threads_num int,
fds_num int, net_in_bytes long, net_in_packet long, net_out_bytes
long, net_out_packet long, read_bytes long, write_bytes long,
read_count long, write_count long, ts timestamp``.

Scale shape: selection is rank windows over a host's process inventory
(bounded by the host, thousands of rows — a single-partition sort is
the honest cost, same as the reference's in-memory sort); emission is
one explode of an inline (name, value) array, the log_to_metric
pattern, so nothing re-reads the input per metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from loongcollector_spark.operators import register


def input_process_metrics(
    df: DataFrame,
    max_process_count: int = 100,
    max_identifier_length: int = 100,
    top_n_cpu: int = 0,
    top_n_mem: int = 0,
    min_cpu_limit_percent: float = 0.0,
    min_memory_limit_kb: int = 0,
    process_names_regex: tuple = (),
    labels: dict | None = None,
    open_fd: bool = False,
    thread: bool = False,
    net_io: bool = False,
    io: bool = False,
    hostname: str = "host",
    ip: str = "127.0.0.1",
) -> DataFrame:
    sel = df
    if process_names_regex:
        cond = F.lit(False)
        for rx in process_names_regex:
            cond = cond | F.col("exe").rlike(rx) | F.col("cmdline").rlike(rx)
        sel = sel.filter(cond)

    cpu_ok = F.col("cpu_percent") >= F.lit(float(min_cpu_limit_percent))
    mem_ok = F.col("rss") >= F.lit(int(min_memory_limit_kb) * 1024)
    thr = sel.filter(cpu_ok | mem_ok).withColumn(
        "_phase", F.when(cpu_ok, F.lit(0)).otherwise(F.lit(1)))

    if top_n_cpu <= 0 and top_n_mem <= 0:
        # cap in threshold-append order: CPU matches (scan order), then
        # memory-only matches (scan order)
        rk = F.row_number().over(Window.orderBy("_phase", "scan_idx"))
        selected = thr.withColumn("_rk", rk).filter(
            F.col("_rk") <= max_process_count)
    else:
        parts = []
        if top_n_cpu > 0:
            crk = F.row_number().over(
                Window.orderBy(F.col("cpu_percent").desc(), "scan_idx"))
            parts.append(
                thr.withColumn("_rk", crk)
                .filter(F.col("_rk") <= min(max_process_count, top_n_cpu)))
        if top_n_mem > 0:
            mrk = F.row_number().over(
                Window.orderBy(F.col("rss").desc(), "scan_idx"))
            mem_cand = thr.withColumn("_mrk", mrk).filter(
                F.col("_mrk") <= min(max_process_count, top_n_mem))
            if parts:
                cpu_sel = parts[0]
                # skip already-selected; stop when the TOTAL hits the cap
                mem_cand = mem_cand.join(
                    cpu_sel.select("scan_idx"), "scan_idx", "left_anti")
                n_cpu = cpu_sel.select(
                    F.count("*").alias("_n_cpu"))
                mem_cand = mem_cand.crossJoin(F.broadcast(n_cpu))
                slot = F.row_number().over(Window.orderBy("_mrk"))
                mem_cand = (
                    mem_cand.withColumn("_slot", slot)
                    .filter(F.col("_slot")
                            <= F.lit(max_process_count) - F.col("_n_cpu"))
                    .drop("_n_cpu", "_slot")
                )
                parts.append(mem_cand.withColumnRenamed("_mrk", "_rk"))
            else:
                parts.append(mem_cand.withColumnRenamed("_mrk", "_rk"))
        selected = parts[0]
        for p in parts[1:]:
            selected = selected.unionByName(p)

    # labels: sorted k#$#v pairs of common (hostname/ip/custom) + pid +
    # comm (truncated at MaxIdentifierLength)
    const_pairs = {"hostname": hostname, "ip": ip, **(labels or {})}
    pairs = F.array(
        *[F.struct(F.lit(k).alias("k"), F.lit(v).alias("v"))
          for k, v in const_pairs.items()],
        F.struct(F.lit("pid").alias("k"),
                 F.col("pid").cast("string").alias("v")),
        F.struct(F.lit("comm").alias("k"),
                 F.substring(F.col("comm"), 1, int(max_identifier_length))
                 .alias("v")),
    )
    label_str = F.array_join(
        F.transform(F.array_sort(pairs),
                    lambda s: F.concat(s["k"], F.lit("#$#"), s["v"])),
        "|")

    metrics = [
        ("process_cpu_percent", F.col("cpu_percent")),
        ("process_cpu_stime_percent", F.col("stime_percent")),
        ("process_cpu_utime_percent", F.col("utime_percent")),
        ("process_mem_rss", F.col("rss").cast("double")),
        ("process_mem_swap", F.col("swap").cast("double")),
        ("process_mem_vsz", F.col("vsz").cast("double")),
        ("process_mem_data", F.col("data").cast("double")),
    ]
    if thread:
        metrics.append(("process_threads",
                        F.col("threads_num").cast("double")))
    if open_fd:
        metrics.append(("process_fds", F.col("fds_num").cast("double")))
    if net_io:
        metrics += [
            ("process_net_in_bytes", F.col("net_in_bytes").cast("double")),
            ("process_net_in_packet", F.col("net_in_packet").cast("double")),
            ("process_net_out_bytes", F.col("net_out_bytes").cast("double")),
            ("process_net_out_packet",
             F.col("net_out_packet").cast("double")),
        ]
    if io:
        metrics += [
            ("process_read_bytes", F.col("read_bytes").cast("double")),
            ("process_write_bytes", F.col("write_bytes").cast("double")),
            ("process_read_count", F.col("read_count").cast("double")),
            ("process_write_count", F.col("write_count").cast("double")),
        ]
    m = F.explode(F.array(*[
        F.struct(F.lit(name).alias("n"), expr.alias("v"))
        for name, expr in metrics
    ]))
    return selected.select(
        m.alias("_m"), label_str.alias("__labels__"),
        (F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        .alias("__time_nano__"),
    ).select(
        F.col("_m.n").alias("__name__"), "__labels__",
        F.col("_m.v").alias("__value__"), "__time_nano__",
    )


@register("metric_process_v2",
          keys={"MaxIdentifierLength", "MaxProcessCount", "TopNCPU",
                "TopNMem", "MinCPULimitPercent", "MinMemoryLimitKB",
                "ProcessNamesRegex", "Labels", "OpenFD", "Thread",
                "NetIO", "IO", "Hostname", "IP"})
def metric_process_v2(cfg: dict):
    """Registry twin with the reference's defaults (input_process.go:
    275-283): TopNCPU=5, MinMemoryLimitKB=100, MaxProcessCount=100,
    MaxIdentifierLength=100."""
    def run(df: DataFrame) -> DataFrame:
        return input_process_metrics(
            df,
            max_process_count=int(cfg.get("MaxProcessCount") or 100),
            max_identifier_length=int(cfg.get("MaxIdentifierLength") or 100),
            top_n_cpu=int(cfg.get("TopNCPU", 5)),
            top_n_mem=int(cfg.get("TopNMem", 0)),
            min_cpu_limit_percent=float(cfg.get("MinCPULimitPercent", 0.0)),
            min_memory_limit_kb=int(cfg.get("MinMemoryLimitKB", 100)),
            process_names_regex=tuple(cfg.get("ProcessNamesRegex", []) or ()),
            labels=cfg.get("Labels") or {},
            open_fd=bool(cfg.get("OpenFD", False)),
            thread=bool(cfg.get("Thread", False)),
            net_io=bool(cfg.get("NetIO", False)),
            io=bool(cfg.get("IO", False)),
            hostname=str(cfg.get("Hostname", "host")),
            ip=str(cfg.get("IP", "127.0.0.1")),
        )

    return run
