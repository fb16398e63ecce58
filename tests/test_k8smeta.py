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


SVC_SCHEMA = (
    "namespace string, name string, api_version string, "
    "labels map<string,string>, annotations map<string,string>, "
    "selector map<string,string>, type string, cluster_ip string, "
    "ports array<struct<port:int, target_port:string, protocol:string>>, "
    "creation_ts timestamp, first_observed long, last_observed long, "
    "method string"
)


def test_service_entity(spark):
    """processServiceEntity (meta_collector_core.go:166-204): selector
    object, type/cluster_ip, ports as sorted-key Go map marshals with
    the IntOrString target port string."""
    row = ("ns1", "svc1", "v1", {"app": "web"}, None, {"app": "web"},
           "ClusterIP", "10.1.2.3",
           [(80, "8080", "TCP"), (443, "https", "TCP")],
           None, 1700000000, 1700000100, "Create")
    df = spark.createDataFrame([row], SVC_SCHEMA)
    out = build_operator(
        {"Type": "service_kubernetesmeta", "Kind": "Service",
         "Domain": "k8s", "ClusterID": "cid1", "Interval": 10})(df)
    c = out.collect()[0]["contents"]
    assert c["__entity_type__"] == "k8s.service"
    assert c["__entity_id__"] == hashlib.md5(
        b"cid1Servicens1svc1").hexdigest()
    assert c["selector"] == '{"app":"web"}'
    assert c["annotations"] == "{}"  # nil map marshals to braces
    assert c["type"] == "ClusterIP" and c["cluster_ip"] == "10.1.2.3"
    assert json.loads(c["ports"]) == [
        {"port": "80", "protocol": "TCP", "targetPort": "8080"},
        {"port": "443", "protocol": "TCP", "targetPort": "https"},
    ]
    # Go map marshal: keys sorted inside each object
    assert c["ports"].index('"port"') < c["ports"].index('"protocol"')
    assert c["ports"].index('"protocol"') < c["ports"].index('"targetPort"')


DEP_SCHEMA = (
    "namespace string, name string, api_version string, "
    "labels map<string,string>, annotations map<string,string>, "
    "match_labels map<string,string>, replicas int, ready_replicas int, "
    "containers array<struct<name:string, image:string>>, "
    "creation_ts timestamp, first_observed long, last_observed long, "
    "method string"
)


def test_deployment_entity(spark):
    """processDeploymentEntity (meta_collector_app.go:13-49):
    match_labels (nil selector -> '{}'), replicas safeGetInt32String
    ('' for a nil pointer), ready_replicas, containers name+image."""
    rows = [
        ("ns1", "dep1", "apps/v1", {"app": "web"}, None, {"app": "web"},
         3, 2, [("c0", "img:1")], None, 1, 2, "Update"),
        ("ns1", "dep2", "apps/v1", None, None, None,
         None, 0, None, None, 1, 2, "Create"),
    ]
    df = spark.createDataFrame(rows, DEP_SCHEMA)
    out = build_operator(
        {"Type": "service_kubernetesmeta", "Kind": "Deployment",
         "ClusterID": "cid1"})(df)
    by_name = {r["contents"]["name"]: r["contents"] for r in out.collect()}
    d1, d2 = by_name["dep1"], by_name["dep2"]
    assert d1["__entity_type__"] == "k8s.deployment"
    assert d1["__entity_id__"] == hashlib.md5(
        b"cid1Deploymentns1dep1").hexdigest()
    assert d1["match_labels"] == '{"app":"web"}'
    assert d1["replicas"] == "3" and d1["ready_replicas"] == "2"
    assert json.loads(d1["containers"]) == [{"image": "img:1", "name": "c0"}]
    assert d2["match_labels"] == "{}"  # nil selector
    assert d2["replicas"] == ""       # nil *int32
    assert d2["containers"] == "[]"


NODE_SCHEMA = (
    "name string, labels map<string,string>, "
    "annotations map<string,string>, "
    "conditions array<struct<type:string, status:string>>, "
    "internal_ip string, host_name string, "
    "capacity map<string,string>, allocatable map<string,string>, "
    "addresses array<struct<type:string, address:string>>, "
    "provider_id string, creation_ts timestamp, first_observed long, "
    "last_observed long, method string"
)


def test_node_entity(spark):
    """processNodeEntity (meta_collector_core.go:119-164):
    cluster-scoped key (namespace ''), conditions as sorted-key map
    marshals, addresses in v1.NodeAddress STRUCT field order
    (type before address), capacity/allocatable quantity maps."""
    row = ("node1", {"zone": "a"}, None, [("Ready", "True")],
           "10.2.0.1", "host1", {"cpu": "4", "memory": "16Gi"},
           {"cpu": "3"}, [("InternalIP", "10.2.0.1"),
                          ("Hostname", "host1")],
           "prov://i-1", None, 1, 2, "Update")
    df = spark.createDataFrame([row], NODE_SCHEMA)
    out = build_operator(
        {"Type": "service_kubernetesmeta", "Kind": "Node",
         "ClusterID": "cid1"})(df)
    c = out.collect()[0]["contents"]
    assert c["__entity_type__"] == "k8s.node"
    assert c["__entity_id__"] == hashlib.md5(b"cid1Nodenode1").hexdigest()
    assert "namespace" not in c and "api_version" not in c
    assert json.loads(c["status"]) == [{"status": "True", "type": "Ready"}]
    assert c["status"].index('"status"') < c["status"].index('"type"')
    assert c["internal_ip"] == "10.2.0.1" and c["host_name"] == "host1"
    assert c["capacity"] == '{"cpu":"4","memory":"16Gi"}'
    assert c["allocatable"] == '{"cpu":"3"}'
    # struct marshal: declaration order, NOT sorted
    assert c["addresses"] == (
        '[{"type":"InternalIP","address":"10.2.0.1"},'
        '{"type":"Hostname","address":"host1"}]')
    assert c["provider_id"] == "prov://i-1"


def test_unsupported_kind_rejected():
    import pytest

    with pytest.raises(ValueError):
        build_operator({"Type": "service_kubernetesmeta",
                        "Kind": "ConfigMap"})


def test_entity_links(spark):
    """processEntityLinkCommonPart (meta_collector.go:290-305): src/dest
    domain/type/id triples with the same genKey md5 the entity rows use,
    __relation_type__, __category__=entity_link."""
    df = spark.createDataFrame(
        [("ns1", "dep1", "ns1", "pod1", "Update", 100, 200)],
        "src_namespace string, src_name string, dest_namespace string, "
        "dest_name string, method string, first_observed long, "
        "last_observed long")
    from loongcollector_spark.operators.k8smetaops import k8s_entity_links

    c = k8s_entity_links(
        df, "Deployment", "Pod", "Deployment2Pod",
        cluster_id="cid1", interval=10).collect()[0]["contents"]
    assert c["__src_entity_type__"] == "k8s.deployment"
    assert c["__src_entity_id__"] == hashlib.md5(
        b"cid1Deploymentns1dep1").hexdigest()
    assert c["__dest_entity_type__"] == "k8s.pod"
    assert c["__dest_entity_id__"] == hashlib.md5(
        b"cid1Podns1pod1").hexdigest()
    assert c["__relation_type__"] == "Deployment2Pod"
    assert c["__category__"] == "entity_link"
    assert c["__keep_alive_seconds__"] == "20"
    assert c["__first_observed_time__"] == "100"
    assert c["__method__"] == "Update"


def test_batcher_greedy_reset_segmentation(spark):
    """FlushStrategy count/size gates (FlushStrategy.h:26-57): batches
    close the moment EITHER threshold is reached after an add, and the
    accumulators reset — the boundary placement a floor(cumsum/cap)
    would get wrong (a big event early shifts every later boundary)."""
    from loongcollector_spark.operators import build_operator

    rows = [("c", 0, "x" * 600),   # closes batch 0 alone (size)
            ("c", 1, "x" * 100), ("c", 2, "x" * 100),
            ("c", 3, "x" * 100), ("c", 4, "x" * 300),  # size 600 closes 1
            ("c", 5, "a"), ("c", 6, "b"), ("c", 7, "c"),
            ("c", 8, "d")]         # count 4 closes batch 2
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = build_operator({"Type": "batcher", "MinCnt": 4,
                          "MinSizeBytes": 512})(df)
    seqs = {r["turn_idx"]: r["batch_seq"] for r in out.collect()}
    assert seqs == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 2}
    # cumsum/cap would put turn 4 (cumulative 1200 // 512 = 2) in a
    # different batch than the greedy reset does — the semantics differ
