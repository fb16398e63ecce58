"""metric_process_v2 selection + emission semantics
(plugins/input/process/input_process.go:115-272)."""

from __future__ import annotations

from loongcollector_spark.operators import build_operator

SCHEMA = (
    "scan_idx long, pid int, exe string, cmdline string, comm string, "
    "cpu_percent double, stime_percent double, utime_percent double, "
    "rss long, swap long, vsz long, data long, threads_num int, "
    "fds_num int, net_in_bytes long, net_in_packet long, "
    "net_out_bytes long, net_out_packet long, read_bytes long, "
    "write_bytes long, read_count long, write_count long, ts timestamp"
)


def _proc(i, pid, comm, cpu, rss_kb):
    return (i, pid, f"/usr/bin/{comm}", f"/usr/bin/{comm} --run", comm,
            float(cpu), cpu / 3.0, cpu / 2.0, rss_kb * 1024, 1, 2, 3,
            4, 5, 10, 11, 12, 13, 14, 15, 16, 17, None)


def _pids(rows):
    out = set()
    for r in rows:
        for part in r["__labels__"].split("|"):
            k, _, v = part.partition("#$#")
            if k == "pid":
                out.add(int(v))
    return out


def test_topn_cap_and_dedup(spark):
    """TopNCPU picks by cpu desc; TopNMem iterates only its own top
    slice, skips already-selected processes, and stops at
    MaxProcessCount total (input_process.go:182-219)."""
    rows = [
        _proc(0, 100, "click", 90.0, 500),   # cpu top1, also mem big
        _proc(1, 101, "click", 80.0, 900),   # cpu top2, mem top1
        _proc(2, 102, "click", 10.0, 800),   # mem top2
        _proc(3, 103, "click", 9.0, 700),    # mem top3
        _proc(4, 104, "click", 8.0, 600),
        _proc(5, 105, "click", 1.0, 50),     # below both thresholds
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = build_operator({
        "Type": "metric_process_v2", "TopNCPU": 2, "TopNMem": 2,
        "MinCPULimitPercent": 5.0, "MinMemoryLimitKB": 100,
        "MaxProcessCount": 3,
    })(df).collect()
    # cpu top2 = {100, 101}; mem candidates = first 2 by rss = 101
    # (dup, skipped) and 102; cap 3 leaves one slot -> 102 joins
    assert _pids(out) == {100, 101, 102}
    # 7 always-on metrics per process, no optional switches
    assert len(out) == 3 * 7


def test_threshold_append_order_cap(spark):
    """Without TopN the cap truncates in append order: CPU-threshold
    matches (scan order) first, then memory-only matches."""
    rows = [
        _proc(0, 200, "view", 1.0, 999),   # mem-only
        _proc(1, 201, "view", 50.0, 10),   # cpu
        _proc(2, 202, "view", 60.0, 10),   # cpu
        _proc(3, 203, "view", 2.0, 888),   # mem-only
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = build_operator({
        "Type": "metric_process_v2", "TopNCPU": 0, "TopNMem": 0,
        "MinCPULimitPercent": 10.0, "MinMemoryLimitKB": 100,
        "MaxProcessCount": 3,
    })(df).collect()
    # append order: 201, 202 (cpu, scan order) then 200 (first mem-only)
    assert _pids(out) == {200, 201, 202}


def test_regex_filter_switches_and_labels(spark):
    """ProcessNamesRegex matches exe OR cmdline; optional switches add
    their metric groups; labels are sorted k#$#v with comm truncated at
    MaxIdentifierLength."""
    rows = [_proc(0, 300, "postgres-very-long-name", 50.0, 500),
            _proc(1, 301, "nginx", 50.0, 500)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = build_operator({
        "Type": "metric_process_v2", "TopNCPU": 0, "TopNMem": 0,
        "MaxProcessCount": 10, "MaxIdentifierLength": 8,
        "ProcessNamesRegex": ["postgres"],
        "Thread": True, "OpenFD": True, "NetIO": True, "IO": True,
        "Labels": {"env": "prod"}, "Hostname": "h1", "IP": "1.2.3.4",
    })(df).collect()
    assert _pids(out) == {300}
    names = {r["__name__"] for r in out}
    assert names == {
        "process_cpu_percent", "process_cpu_stime_percent",
        "process_cpu_utime_percent", "process_mem_rss",
        "process_mem_swap", "process_mem_vsz", "process_mem_data",
        "process_threads", "process_fds",
        "process_net_in_bytes", "process_net_in_packet",
        "process_net_out_bytes", "process_net_out_packet",
        "process_read_bytes", "process_write_bytes",
        "process_read_count", "process_write_count",
    }
    lbl = out[0]["__labels__"]
    assert lbl == ("comm#$#postgres|env#$#prod|hostname#$#h1"
                   "|ip#$#1.2.3.4|pid#$#300")
    vals = {r["__name__"]: r["__value__"] for r in out}
    assert vals["process_mem_rss"] == 500 * 1024.0
    assert vals["process_threads"] == 4.0


SYS_SCHEMA = (
    "host string, snap_idx int, snap_ts timestamp, "
    "cpu_user double, cpu_system double, cpu_nice double, "
    "cpu_irq double, cpu_softirq double, cpu_guest double, "
    "cpu_guest_nice double, cpu_idle double, cpu_iowait double, "
    "cpu_steal double, ncpus int, mem_util_pct double, mem_cache long, "
    "mem_free long, mem_available long, mem_used long, mem_total long, "
    "swap_util_pct double, load1 double, load5 double, load15 double, "
    "boot_time long, tcp_out_segs long, tcp_in_segs long, "
    "tcp_retrans_segs long, "
    "disks array<struct<name:string, read_bytes:long, write_bytes:long, "
    "read_count:long, write_count:long, read_time:long, write_time:long, "
    "io_time:long>>, "
    "interfaces array<struct<name:string, bytes_recv:long, "
    "bytes_sent:long, packets_recv:long, packets_sent:long, errin:long, "
    "errout:long, dropin:long, dropout:long>>"
)


def _snap(host, idx, ts, user, idle, disks, itfs):
    return (host, idx, ts, float(user), 2.0, 0.0, 0.0, 0.0, 0.0, 0.0,
            float(idle), 0.0, 0.0, 4, 50.5, 10, 11, 12, 13, 14, 1.5,
            0.5, 0.25, 0.125, 1700000000, 1000, 500, 10, disks, itfs)


def test_system_metrics_deltas_and_first_round(spark):
    """metric_system_v2: delta utils need BOTH snapshots (first
    collection round emits gauges only, like the reference's
    lastCPUTime.IsZero() guard); per-device rates join on (host, name)
    so a device absent from the previous snapshot emits nothing."""
    import datetime

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    t1 = datetime.datetime(2026, 1, 1, 0, 0, 10)
    d0 = [("sda", 0, 0, 0, 0, 0, 0, 0)]
    d1 = [("sda", 4000, 8000, 40, 80, 400, 160, 500),
          ("sdb", 1, 1, 1, 1, 1, 1, 1)]  # new device: no previous -> skip
    i0 = [("eth0", 0, 0, 0, 0, 0, 0, 0, 0)]
    i1 = [("eth0", 5000, 6000, 50, 60, 0, 0, 0, 0)]
    rows = [
        _snap("a", 0, t0, 100, 900, d0, i0),
        _snap("a", 1, t1, 158, 1842, d1, i1),
        # host b: only the CURRENT snapshot (first round)
        _snap("b", 1, t1, 100, 900, d1, i1),
    ]
    df = spark.createDataFrame(rows, SYS_SCHEMA)
    out = build_operator({"Type": "metric_system_v2"})(df).collect()
    by = {}
    for r in out:
        by.setdefault(r["__name__"], []).append(r)

    # host a: user delta 58, idle delta 942 -> total delta 1000+... busy
    # delta = 58, total delta = 58 + 942 = 1000
    cpu = [r for r in by["cpu_util"]]
    assert len(cpu) == 1  # host b has no previous snapshot
    assert abs(cpu[0]["__value__"] - 100.0 * 58 / 1000) < 1e-9
    # gauges emit for BOTH hosts
    assert len(by["mem_util"]) == 2
    assert len(by["cpu_count"]) == 2
    # per-device: sda rates for host a only; sdb skipped (no previous).
    # The TOTAL is asymmetric like the reference's lastDiskStat
    # (input_system_v2.go:223-259): current total sums ALL current
    # non-partition devices — including the new sdb — against last
    # round's own sum, so total rbps = (4000 + 1) / 10.
    rbps = [r for r in by["disk_rbps"]]
    vals = {p.split("#$#")[1].split("|")[0]: r["__value__"]
            for r in rbps for p in r["__labels__"].split("|")
            if p.startswith("disk")}
    assert set(vals) == {"sda", "total"}
    assert vals["sda"] == 400.0
    assert vals["total"] == 400.1
    # tcp deltas are zero here (same counters): emitted as 0 for host a
    assert {r["__value__"] for r in by["protocol_tcp_outsegs"]} == {0.0}


def test_gpu_metric_fields(spark):
    """service_gpu_metric (input_gpu_metric.go:88-121): mW->W and
    bytes->MiB integer divisions, free = total - used."""
    df = spark.createDataFrame(
        [(0, 215999, 63, 87, 45, 16 * 1024**3, 5 * 1024**3 + 7, None)],
        "device int, power_usage_mw long, temperature long, "
        "gpu_util long, memory_util long, total_memory long, "
        "used_memory long, ts timestamp")
    r = build_operator({"Type": "service_gpu_metric"})(df).collect()[0]
    assert r["metric_type"] == "gpu" and r["device"] == "0"
    assert r["gpu_power_usage"] == "215"      # 215999 mW div 1000
    assert r["gpu_temperature"] == "63"
    assert r["gpu_util"] == "87" and r["gpu_memory_util"] == "45"
    assert r["gpu_total_memory"] == str(16 * 1024)
    assert r["gpu_used_memory"] == str(5 * 1024)   # floor of the +7
    assert r["gpu_free_memory"] == str(11 * 1024 - 1)  # (total-used) div MiB
