"""service_kubernetesmeta pod/container entity conversion
(meta_collector_core.go:14-120 + meta_collector.go:271-453): common
entity part, genKey md5, Go-JSON label/annotation/container packing,
container fan-out."""

from __future__ import annotations

import hashlib
import json

from loongcollector_spark.operators import build_operator

SCHEMA = (
    "namespace string, name string, api_version string, phase string, "
    "pod_ip string, labels map<string,string>, "
    "annotations map<string,string>, containers array<struct<"
    "name:string, image:string, cpu_request:string, cpu_limit:string, "
    "memory_request:string, memory_limit:string, ports:array<int>, "
    "volume_mounts:array<struct<name:string,path:string>>>>, "
    "creation_ts timestamp, first_observed long, last_observed long, "
    "method string"
)

POD = (
    "ns2", "pod2", "v1", "Running", "10.0.0.9",
    {"app": "web", "tier": "fe"}, None,
    [("c1", "img:1", "500m", "1", "128Mi", "256Mi", [80, 443],
      [("data", "/var/data")]),
     ("c2", "img:2", None, None, None, None, None, None)],
    None, 1700000000, 1700000100, "Update",
)


def _run(spark, cfg=None):
    df = spark.createDataFrame([POD], SCHEMA)
    out = build_operator(
        {"Type": "service_kubernetesmeta", "Domain": "k8s",
         "ClusterID": "cid1", "Interval": 10, **(cfg or {})})(df)
    return [r["contents"] for r in out.collect()]


def test_pod_entity_fields(spark):
    rows = _run(spark)
    pod = [c for c in rows if c["__entity_type__"] == "k8s.pod"]
    assert len(pod) == 1
    p = pod[0]
    # genKey = md5(clusterID + kind + namespace + name)
    assert p["__entity_id__"] == hashlib.md5(
        b"cid1Podns2pod2").hexdigest()
    assert p["__method__"] == "Update"
    assert p["__first_observed_time__"] == "1700000000"
    assert p["__keep_alive_seconds__"] == "20"       # Interval*2
    assert p["__category__"] == "entity"
    assert p["cluster_id"] == "cid1" and p["kind"] == "Pod"
    assert p["status"] == "Running" and p["instance_ip"] == "10.0.0.9"
    assert json.loads(p["labels"]) == {"app": "web", "tier": "fe"}
    assert p["annotations"] == "{}"                  # nil -> {}
    # containers array: sorted keys inside each object, input order kept
    assert json.loads(p["containers"]) == [
        {"image": "img:1", "name": "c1"},
        {"image": "img:2", "name": "c2"}]
    assert p["containers"].index('"image"') < p["containers"].index(
        '"name"')


def test_container_fanout(spark):
    rows = _run(spark)
    conts = {c["name"]: c for c in rows
             if c["__entity_type__"] == "k8s.container"}
    assert set(conts) == {"c1", "c2"}
    c1 = conts["c1"]
    assert c1["__entity_id__"] == hashlib.md5(
        b"cid1containerns2pod2c1").hexdigest()
    assert c1["pod_name"] == "pod2" and c1["pod_namespace"] == "ns2"
    assert c1["cpu_request"] == "500m" and c1["memory_limit"] == "256Mi"
    assert c1["container_ports"] == "[80,443]"
    assert json.loads(c1["volumes"]) == [
        {"volumeMountName": "data", "volumeMountPath": "/var/data"}]
    c2 = conts["c2"]
    assert c2["cpu_request"] == "" and c2["container_ports"] == "[]"
    assert c2["volumes"] == "[]"


def test_switches(spark):
    rows = _run(spark, {"Container": False, "EnableLabels": False})
    assert len(rows) == 1
    assert "labels" not in rows[0]
    assert "annotations" in rows[0]


def test_pod_switch(spark):
    rows = _run(spark, {"Pod": False})
    assert all(c["__entity_type__"] == "k8s.container" for c in rows)
    import pytest
    with pytest.raises(ValueError, match="nothing to emit"):
        build_operator({"Type": "service_kubernetesmeta",
                        "Pod": False, "Container": False})
