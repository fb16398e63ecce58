"""metric_system_v2 — host system metric collection
(plugins/input/systemv2/input_system_v2.go).

Like metric_process_v2, the gopsutil scraping is host-bound; what the
plugin COMPUTES per collection round — the delta-rate formulas between
the previous and current counter snapshots — is modeled exactly, over a
TWO-SNAPSHOT observed frame (one row per (host, snap_idx in {0,1})).

Formulas carried over exactly (input_system_v2.go):

* CPU (:128-172): busy = guest_nice+guest+nice+softirq+irq+user+system,
  total = busy+idle+iowait+steal; each util = 100·Δfield/Δtotal·share
  (cpuShareFactor: the SIGMA_CPU_REQUEST env becomes the
  ``cpu_share_factor`` parameter), emitted only when a previous
  snapshot exists and Δtotal > 0; ``cpu_count`` always;
* core (:111-126): load1/5/15 + boot_time gauges from the current
  snapshot;
* mem (:178-196): util/cache/free/available/used/total + swap_util
  gauges;
* disk (:198-261): per-device Δbytes/Δt and Δops/Δt rates, Δtime/Δops
  latencies (NaN when no ops — kept), Δio_time·100/1000/Δt utilization
  (not for "total"); the "total" device sums current devices whose name
  does NOT end in a digit (partitions excluded, empty names skipped)
  against LAST round's own sum — asymmetric like lastDiskStat, so a
  newly appearing disk's full counters enter the total delta — while
  per-device rows are emitted only for devices present in both
  snapshots;
* net (:264-337): per-interface Δ rates + the summed "total" interface
  (only interfaces present in both snapshots contribute), drop/err
  percentages only when Δpackets_total != 0;
* protocol (:338-373): TCP OutSegs/InSegs/RetransSegs deltas +
  retransmission percentage (0 when ΔOutSegs <= 0).

Labels: sorted ``k#$#v|…`` of hostname/ip/custom (+ ``disk``/
``interface`` for the per-device families) — helper.MetricLabels, the
same contract metricops/processops pin. ``__value__`` rides as double;
``__time_nano__`` is the current snapshot's time.

Scale shape: one self-join per host (two snapshots), explodes for the
device families, all codegen; a fleet of hosts parallelizes on the
host key with no other shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from loongcollector_spark.operators import register

_CPU_FIELDS = ("user", "system", "nice", "irq", "softirq", "guest",
               "guest_nice", "idle", "iowait", "steal")

_DISK_FIELDS = ("read_bytes", "write_bytes", "read_count", "write_count",
                "read_time", "write_time", "io_time")

_NET_FIELDS = ("bytes_recv", "bytes_sent", "packets_recv", "packets_sent",
               "errin", "errout", "dropin", "dropout")


def _labels(const_pairs: dict, extra=None):
    pairs = [F.struct(F.lit(k).alias("k"), F.lit(v).alias("v"))
             for k, v in const_pairs.items()]
    if extra is not None:
        pairs.append(F.struct(F.lit(extra[0]).alias("k"),
                              extra[1].alias("v")))
    return F.array_join(
        F.transform(F.array_sort(F.array(*pairs)),
                    lambda s: F.concat(s["k"], F.lit("#$#"), s["v"])),
        "|")


def input_system_metrics(
    df: DataFrame,
    cpu: bool = True,
    mem: bool = True,
    disk: bool = True,
    net: bool = True,
    protocol: bool = True,
    core: bool = True,
    cpu_percent: bool = True,
    cpu_share_factor: float = 1.0,
    labels: dict | None = None,
    hostname: str = "host",
    ip: str = "127.0.0.1",
) -> DataFrame:
    const_pairs = {"hostname": hostname, "ip": ip, **(labels or {})}
    prev = df.filter(F.col("snap_idx") == 0).alias("p")
    cur = df.filter(F.col("snap_idx") == 1).alias("c")
    j = cur.join(prev, F.col("c.host") == F.col("p.host"), "left")
    tnano = (F.unix_micros(F.col("c.snap_ts").cast("timestamp")) * 1000)
    dt = (F.unix_micros(F.col("c.snap_ts").cast("timestamp"))
          - F.unix_micros(F.col("p.snap_ts").cast("timestamp"))) / 1e6

    host_metrics = []  # (name, value) with common labels

    if core:
        for g in ("load1", "load5", "load15"):
            host_metrics.append((f"system_{g}", F.col(f"c.{g}")))
        host_metrics.append(("system_boot_time",
                             F.col("c.boot_time").cast("double")))

    if cpu:
        def s(side, f):
            return F.coalesce(F.col(f"{side}.cpu_{f}"), F.lit(0.0))

        def busy(side):
            return (s(side, "guest_nice") + s(side, "guest")
                    + s(side, "nice") + s(side, "softirq") + s(side, "irq")
                    + s(side, "user") + s(side, "system"))

        def total(side):
            return (busy(side) + s(side, "idle") + s(side, "iowait")
                    + s(side, "steal"))

        host_metrics.append(("cpu_count", F.col("c.ncpus").cast("double")))
        if cpu_percent:
            d_total = total("c") - total("p")
            have_prev = F.col("p.host").isNotNull() & (d_total > 0)
            share = F.lit(float(cpu_share_factor))

            def util(d):
                return F.when(have_prev, F.lit(100.0) * d / d_total * share)

            host_metrics += [
                ("cpu_util", util(busy("c") - busy("p"))),
                ("cpu_wait_util", util(s("c", "iowait") - s("p", "iowait"))),
                ("cpu_sys_util", util(s("c", "system") - s("p", "system"))),
                ("cpu_user_util", util(s("c", "user") - s("p", "user"))),
                ("cpu_irq_util", util(s("c", "irq") - s("p", "irq"))),
                ("cpu_softirq_util",
                 util(s("c", "softirq") - s("p", "softirq"))),
                ("cpu_nice_util", util(s("c", "nice") - s("p", "nice"))),
                ("cpu_steal_util", util(s("c", "steal") - s("p", "steal"))),
                ("cpu_guest_util", util(s("c", "guest") - s("p", "guest"))),
                ("cpu_guestnice_util",
                 util(s("c", "guest_nice") - s("p", "guest_nice"))),
            ]

    if mem:
        host_metrics += [
            ("mem_util", F.col("c.mem_util_pct")),
            ("mem_cache", F.col("c.mem_cache").cast("double")),
            ("mem_free", F.col("c.mem_free").cast("double")),
            ("mem_available", F.col("c.mem_available").cast("double")),
            ("mem_used", F.col("c.mem_used").cast("double")),
            ("mem_total", F.col("c.mem_total").cast("double")),
            ("mem_swap_util", F.col("c.swap_util_pct")),
        ]

    if protocol:
        d_out = (F.col("c.tcp_out_segs") - F.col("p.tcp_out_segs")
                 ).cast("double")
        d_in = (F.col("c.tcp_in_segs") - F.col("p.tcp_in_segs")
                ).cast("double")
        d_re = (F.col("c.tcp_retrans_segs") - F.col("p.tcp_retrans_segs")
                ).cast("double")
        have = F.col("p.host").isNotNull()
        host_metrics += [
            ("protocol_tcp_outsegs", F.when(have, d_out)),
            ("protocol_tcp_insegs", F.when(have, d_in)),
            ("protocol_tcp_retran_segs", F.when(have, d_re)),
            ("protocol_tcp_retran_util",
             F.when(have & (d_out <= 0), F.lit(0.0))
             .when(have, F.lit(100.0) * d_re / d_out)),
        ]

    hm = F.explode(F.array(*[
        F.struct(F.lit(n).alias("n"), v.cast("double").alias("v"))
        for n, v in host_metrics
    ]))
    out = (
        j.select(hm.alias("_m"),
                 _labels(const_pairs).alias("__labels__"),
                 tnano.alias("__time_nano__"))
        .filter(F.col("_m.v").isNotNull())
        .select(F.col("_m.n").alias("__name__"), "__labels__",
                F.col("_m.v").alias("__value__"), "__time_nano__")
    )

    def device_rates(col_name, fields, build_metrics, label_key,
                     with_total, total_filter=None,
                     asym_total_filter=None):
        """Per-device deltas: explode both snapshots' device arrays,
        join on (host, device name), plus the summed 'total' device."""
        c_dev = (
            cur.select(F.col("host"), F.col("snap_ts"),
                       F.explode(F.col(col_name)).alias("d"))
            .select("host", "snap_ts", F.col("d.name").alias("name"),
                    *[F.col(f"d.{f}").alias(f"c_{f}") for f in fields])
        )
        p_dev = (
            prev.select(F.col("host").alias("p_host"),
                        F.col("snap_ts").alias("p_ts"),
                        F.explode(F.col(col_name)).alias("d"))
            .select("p_host", "p_ts", F.col("d.name").alias("p_name"),
                    *[F.col(f"d.{f}").alias(f"p_{f}") for f in fields])
        )
        # only devices present in BOTH snapshots emit (the lastStatMap
        # lookup); inner join is exactly that
        both = c_dev.join(
            p_dev, (F.col("host") == F.col("p_host"))
            & (F.col("name") == F.col("p_name")))
        if with_total and asym_total_filter is not None:
            # CollectDisk's ASYMMETRIC total (input_system_v2.go:223-259):
            # the current total sums ALL current qualifying devices while
            # the previous total is last round's own sum (lastDiskStat) —
            # a device appearing only in the current snapshot contributes
            # its full counters to the total delta even though it emits
            # no per-device row.
            c_tot = (c_dev.filter(asym_total_filter("name"))
                     .groupBy("host", "snap_ts")
                     .agg(*[F.sum(f"c_{f}").alias(f"c_{f}")
                            for f in fields]))
            p_tot = (p_dev.filter(asym_total_filter("p_name"))
                     .groupBy("p_host", "p_ts")
                     .agg(*[F.sum(f"p_{f}").alias(f"p_{f}")
                            for f in fields]))
            totals = (c_tot.join(p_tot, F.col("host") == F.col("p_host"))
                      .drop("p_host")
                      .withColumn("name", F.lit("total")))
            both = both.drop("p_host", "p_name").unionByName(
                totals, allowMissingColumns=True)
        elif with_total:
            agg_src = both if total_filter is None else both.filter(
                total_filter)
            totals = agg_src.groupBy("host", "snap_ts", "p_ts").agg(
                *[F.sum(f"c_{f}").alias(f"c_{f}") for f in fields],
                *[F.sum(f"p_{f}").alias(f"p_{f}") for f in fields],
            ).withColumn("name", F.lit("total"))
            both = both.drop("p_host", "p_name").unionByName(
                totals, allowMissingColumns=True)
        dts = (F.unix_micros(F.col("snap_ts").cast("timestamp"))
               - F.unix_micros(F.col("p_ts").cast("timestamp"))) / 1e6
        ms = build_metrics(dts)
        ex = F.explode(F.array(*[
            F.struct(F.lit(n).alias("n"), v.cast("double").alias("v"))
            for n, v in ms
        ]))
        return (
            both.select(
                ex.alias("_m"),
                _labels(const_pairs, (label_key, F.col("name")))
                .alias("__labels__"),
                (F.unix_micros(F.col("snap_ts").cast("timestamp")) * 1000)
                .alias("__time_nano__"))
            .filter(F.col("_m.v").isNotNull())
            .select(F.col("_m.n").alias("__name__"), "__labels__",
                    F.col("_m.v").alias("__value__"), "__time_nano__")
        )

    if disk:
        def disk_metrics(dts):
            def d(f):
                return (F.col(f"c_{f}") - F.col(f"p_{f}")).cast("double")

            rlat = F.when(d("read_count") > 0,
                          d("read_time") / d("read_count"))
            wlat = F.when(d("write_count") > 0,
                          d("write_time") / d("write_count"))
            return [
                ("disk_rbps", d("read_bytes") / dts),
                ("disk_wbps", d("write_bytes") / dts),
                ("disk_riops", d("read_count") / dts),
                ("disk_wiops", d("write_count") / dts),
                # reference emits NaN latencies on zero ops; NULL here —
                # a NaN __value__ poisons downstream aggregation either
                # way, and absent-vs-NaN is observable only via the row
                ("disk_rlatency", rlat),
                ("disk_wlatency", wlat),
                ("disk_util",
                 F.when(F.col("name") != "total",
                        d("io_time") * 100.0 / 1000.0 / dts)),
            ]

        # partitions (name ending in a digit) and empty names are
        # excluded from "total"; the total is the reference's asymmetric
        # all-current vs last-round sum, not present-in-both
        out = out.unionByName(device_rates(
            "disks", _DISK_FIELDS, disk_metrics, "disk", True,
            asym_total_filter=lambda c: (F.col(c) != "")
            & ~F.col(c).rlike("[0-9]$")))

    if net:
        def net_metrics(dts):
            def d(f):
                return (F.col(f"c_{f}") - F.col(f"p_{f}")).cast("double")

            pk_total = (d("packets_sent") + d("packets_recv"))
            return [
                ("net_in", d("bytes_recv") / dts),
                ("net_out", d("bytes_sent") / dts),
                ("net_in_pkt", d("packets_recv") / dts),
                ("net_out_pkt", d("packets_sent") / dts),
                ("net_drop_util",
                 F.when(pk_total != 0,
                        F.lit(100.0) * (d("dropin") + d("dropout"))
                        / pk_total)),
                ("net_err_util",
                 F.when(pk_total != 0,
                        F.lit(100.0) * (d("errin") + d("errout"))
                        / pk_total)),
            ]

        out = out.unionByName(device_rates(
            "interfaces", _NET_FIELDS, net_metrics, "interface", True))

    return out


def gpu_metric_fields(df: DataFrame) -> DataFrame:
    """service_gpu_metric (plugins/input/gpu/input_gpu_metric.go:88-121):
    per-device NVML reading → the plugin's string field set —
    metric_type=gpu, device index, power mW→W (integer division),
    temperature, gpu/memory utilization percents, memory bytes→MiB
    (integer division, free = total-used). Input contract: one row per
    (device int, power_usage_mw long, temperature long, gpu_util long,
    memory_util long, total_memory long, used_memory long, ts
    timestamp) — the NVML scrape is host-bound, the field projection is
    what the plugin computes."""
    mib = 1024 * 1024
    return df.select(
        F.lit("gpu").alias("metric_type"),
        F.col("device").cast("string").alias("device"),
        F.expr("power_usage_mw div 1000").cast("string")
        .alias("gpu_power_usage"),
        F.col("temperature").cast("string").alias("gpu_temperature"),
        F.col("gpu_util").cast("string").alias("gpu_util"),
        F.col("memory_util").cast("string").alias("gpu_memory_util"),
        F.expr(f"used_memory div {mib}").cast("string")
        .alias("gpu_used_memory"),
        F.expr(f"total_memory div {mib}").cast("string")
        .alias("gpu_total_memory"),
        F.expr(f"(total_memory - used_memory) div {mib}").cast("string")
        .alias("gpu_free_memory"),
        F.col("ts"),
    )


@register("service_gpu_metric", keys={"CollectIntervalMs"})
def service_gpu_metric(cfg: dict):
    """Registry twin; CollectIntervalMs is the scrape timer (streaming
    trigger knob here), accepted without a per-row effect."""
    def run(df: DataFrame) -> DataFrame:
        return gpu_metric_fields(df)

    return run


@register("metric_system_v2",
          keys={"CPU", "Mem", "Disk", "Net", "Protocol", "Core",
                "CPUPercent", "CPUShareFactor", "Labels", "Hostname",
                "IP", "Disks", "ExcludeDiskFsType", "ExcludeDiskPath",
                "OpenFd", "TCP"})
def metric_system_v2(cfg: dict):
    """Registry twin. Disks/ExcludeDiskFsType/ExcludeDiskPath filter the
    scrape itself host-side (which devices land in the observed frame),
    so they are accepted without a plan effect; OpenFd/TCP detail
    tables are out of the metric-log path in the reference too."""
    def run(df: DataFrame) -> DataFrame:
        return input_system_metrics(
            df,
            cpu=bool(cfg.get("CPU", True)),
            mem=bool(cfg.get("Mem", True)),
            disk=bool(cfg.get("Disk", True)),
            net=bool(cfg.get("Net", True)),
            protocol=bool(cfg.get("Protocol", True)),
            core=bool(cfg.get("Core", True)),
            cpu_percent=bool(cfg.get("CPUPercent", True)),
            cpu_share_factor=float(cfg.get("CPUShareFactor", 1.0)),
            labels=cfg.get("Labels") or {},
            hostname=str(cfg.get("Hostname", "host")),
            ip=str(cfg.get("IP", "127.0.0.1")),
        )

    return run
