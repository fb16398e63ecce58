"""metric_meta_host — HOST/PROCESS MetaNode log projection
(input_host_meta.go, host_meta_collect.go, meta_helper.go)."""

from __future__ import annotations

import json

from loongcollector_spark.operators import build_operator

SCHEMA = (
    "host_id string, hostname string, ip string, boot_time long, "
    "os string, platform string, platform_family string, "
    "platform_version string, kernel_version string, kernel_arch string, "
    "virtualization_system string, virtualization_role string, "
    "processor_count int, core_count int, vendor_id string, "
    "family string, model string, model_name string, mhz double, "
    "cache_size int, mem_total long, swap_total long, vsz_total long, "
    "disks array<struct<device:string, opts:string, fstype:string, "
    "mount_point:string>>, "
    "nets array<struct<index:int, name:string, mtu:int, "
    "hardware_address:string, flags:array<string>, addrs:array<string>>>, "
    "processes array<struct<pid:int, cmdline:string, exe:string, "
    "comm:string, ppid:int, start_time:long, rss:long>>, ts timestamp"
)


def _host(procs):
    return ("hid-1", "web01", "10.0.0.9", 1700000000, "linux", "ubuntu",
            "debian", "22.04", "5.15.0", "x86_64", "kvm", "guest",
            16, 8, "GenuineIntel", "6", "85", "Xeon Gold", 2500.0, 28160,
            64 << 30, 8 << 30, 1 << 40,
            [("/dev/sda1", "rw,relatime", "ext4", "/")],
            [(2, "eth0", 1500, "aa:bb:cc", ["up", "broadcast"],
              ["10.0.0.9/24"])],
            procs, None)


def test_host_node_shape(spark):
    """HOST node: id = hostID_ip, labels carry the host.InfoStat fields
    as strings, attributes keyed by category with sorted keys and
    unquoted numbers (integral mhz prints Go-style without a decimal
    point)."""
    df = spark.createDataFrame([_host([])], SCHEMA)
    rows = build_operator({
        "Type": "metric_meta_host", "Disk": True, "Net": True,
        "Labels": {"env": "prod"},
    })(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["id"] == "hid-1_10.0.0.9" and r["type"] == "HOST"
    assert r["parents"] == "[]"
    labels = json.loads(r["labels"])
    assert labels["boot_time"] == "1700000000"  # strconv string, not num
    assert labels["env"] == "prod" and labels["host_id"] == "hid-1"
    attrs = json.loads(r["attributes"])
    assert set(attrs) == {"CPU", "DISK", "MEM", "NET"}
    assert attrs["CPU"]["processor_count"] == 16
    assert attrs["CPU"]["mhz"] == 2500           # integral: no ".0"
    assert '"mhz":2500,' in r["attributes"]      # raw form, Go-style
    assert attrs["MEM"]["mem_total"] == 64 << 30
    assert attrs["DISK"] == [{"device": "/dev/sda1", "fstype": "ext4",
                              "mount_point": "/", "opts": "rw,relatime"}]
    assert attrs["NET"][0]["addrs"] == [{"addr": "10.0.0.9/24"}]
    assert attrs["NET"][0]["flags"] == ["up", "broadcast"]
    # sorted keys at the top level and inside CPU
    ks = list(attrs)
    assert ks == sorted(ks)


def test_process_nodes_filters_and_parent(spark):
    """PROCESS nodes: empty-cmdline and rss=0 rows are skipped, regex
    matches cmd OR exe, id = hostname_ip_PROCESS_pid_start, parents =
    HOST:hostID_ip:hostname, command squeezed past 8000 chars."""
    long_cmd = "x" * 9000
    procs = [
        (101, "/usr/bin/nginx -g daemon", "/usr/bin/nginx", "nginx",
         1, 111, 4096),
        (102, "", "/usr/bin/empty", "empty", 1, 222, 4096),   # no cmdline
        (103, "/usr/bin/zero", "/usr/bin/zero", "zero", 1, 333, 0),  # rss 0
        (104, long_cmd, "/usr/bin/nginx-worker", "nginxw", 101, 444, 1),
        (105, "/usr/bin/postgres", "/usr/bin/postgres", "pg", 1, 555, 8),
    ]
    df = spark.createDataFrame([_host(procs)], SCHEMA)
    rows = build_operator({
        "Type": "metric_meta_host", "CPU": False, "Memory": False,
        "Process": True, "ProcessNamesRegex": ["nginx"],
    })(df).collect()
    assert all(r["type"] == "PROCESS" for r in rows)
    ids = {r["id"] for r in rows}
    assert ids == {"web01_10.0.0.9_PROCESS_101_111",
                   "web01_10.0.0.9_PROCESS_104_444"}
    by_pid = {json.loads(r["attributes"])["pid"]: r for r in rows}
    assert json.loads(by_pid[101]["attributes"])["name"] == "nginx"
    assert by_pid[101]["parents"] == '["HOST:hid-1_10.0.0.9:web01"]'
    cmd = json.loads(by_pid[104]["attributes"])["command"]
    assert len(cmd) == 8005 and " ... " in cmd
    assert cmd.startswith("x" * 4000) and cmd.endswith("x" * 4000)


def test_all_switches_off_rejected(spark):
    import pytest

    df = spark.createDataFrame([_host([])], SCHEMA)
    op = build_operator({"Type": "metric_meta_host", "CPU": False,
                         "Memory": False})
    with pytest.raises(ValueError):
        op(df)
