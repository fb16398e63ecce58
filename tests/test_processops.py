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
