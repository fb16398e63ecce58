"""service_kubernetesmeta (v2) — pod/container entity event conversion
(plugins/input/kubernetesmetav2/).

The watch/list machinery (informer cache, timer flush) is
deployment-side; what the plugin computes per observed object is the
entity-event projection, modeled here for the core POD path
(meta_collector_core.go:14-120 ``processPodEntity``) — every other kind
(service/deployment/node/...) is the same projection pattern over its
own custom-field list (meta_collector_app.go etc.).

Faithful pieces:

* the common entity part (meta_collector.go:271-288): ``__domain__``,
  ``__entity_type__`` = ``domain + "." + lower(kind)``
  (meta_collector.go:450-453), ``__entity_id__`` =
  ``md5(clusterID + kind + namespace + name)`` hex
  (meta_collector.go:400-404), ``__method__``, observed-time pair as
  decimal strings, ``__keep_alive_seconds__`` = ``Interval*2``,
  ``__category__`` = ``entity``, plus cluster_id / kind / name /
  RFC3339 ``create_time``;
* pod custom fields: api_version, namespace, labels / annotations as
  Go ``json.Marshal`` objects (sorted keys; nil → ``{}``,
  meta_collector.go:307-317), status phase, instance_ip, and the
  ``containers`` name+image JSON array;
* the per-container entity fan-out (Container=true,
  meta_collector_core.go:44-112): container kind entities keyed by
  ``md5(clusterID + "container" + namespace + podName+containerName)``,
  with pod_name/pod_namespace/image, resource request/limit strings
  (empty when absent), ``container_ports`` JSON int array and
  ``volumes`` volumeMountName/volumeMountPath JSON array.

Input contract: one row per observed pod with ``namespace, name,
api_version, phase, pod_ip, labels map<string,string>,
annotations map<string,string>, containers array<struct<name:string,
image:string, cpu_request:string, cpu_limit:string,
memory_request:string, memory_limit:string, ports:array<int>,
volume_mounts:array<struct<name:string,path:string>>>>,
creation_ts timestamp, first_observed long, last_observed long,
method string`` (resource quantities ride as their
``resource.Quantity.String()`` forms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from loongcollector_spark.operators import register
from loongcollector_spark.operators.canalops import _go_json_obj
from loongcollector_spark.operators.common import go_jstr as _go_jstr

POD_KIND = "Pod"
CONTAINER_KIND = "container"


def _gen_key(cluster_id: str, kind, namespace, name) -> Column:
    parts = F.concat(
        F.lit(cluster_id),
        kind if isinstance(kind, Column) else F.lit(kind),
        F.coalesce(namespace, F.lit("")), F.coalesce(name, F.lit("")))
    return F.md5(parts)


def _entity_type(domain: str, kind: str) -> Column:
    return F.lit(f"{domain}.{kind.lower()}")


def _json_obj(m: Column) -> Column:
    """Go json.Marshal of a map; nil/empty → '{}' (processEntityJSONObject
    — unlike the canal marshal, the empty object prints braces)."""
    body = _go_json_obj(m)
    return F.when(body == "", F.lit("{}")).otherwise(
        F.coalesce(body, F.lit("{}")))


def _json_pairs_array(arr: Column, keys: list[str]) -> Column:
    """array of fixed-key string maps → Go json.Marshal array (sorted
    keys inside each object); nil/empty → '[]'."""
    objs = F.transform(
        arr,
        lambda s: F.concat(
            F.lit("{"),
            F.concat_ws(",", *[
                F.concat(F.lit(f'"{k}":'),
                         _go_jstr(F.coalesce(s[k], F.lit(""))))
                for k in sorted(keys)]),
            F.lit("}")))
    return F.when(
        arr.isNull() | (F.size(arr) == 0), F.lit("[]")
    ).otherwise(F.concat(F.lit("["), F.array_join(objs, ","), F.lit("]")))


def _json_structs_array(arr: Column, keys: list[str]) -> Column:
    """array of fixed-key string maps → Go json.Marshal array with the
    GIVEN key order (struct marshals emit fields in declaration order,
    e.g. v1.NodeAddress → {"type":…,"address":…}); nil/empty → '[]'."""
    objs = F.transform(
        arr,
        lambda s: F.concat(
            F.lit("{"),
            F.concat_ws(",", *[
                F.concat(F.lit(f'"{k}":'),
                         _go_jstr(F.coalesce(s[k], F.lit(""))))
                for k in keys]),
            F.lit("}")))
    return F.when(
        arr.isNull() | (F.size(arr) == 0), F.lit("[]")
    ).otherwise(F.concat(F.lit("["), F.array_join(objs, ","), F.lit("]")))


def _mk_map(pairs) -> Column:
    flat = []
    for k, v in pairs:
        flat += [k, F.coalesce(v, F.lit(""))]
    return F.map_from_arrays(F.array(*flat[0::2]), F.array(*flat[1::2]))


def _common_pairs(domain: str, kind: str, cluster_id: str, interval: int,
                  namespace_col: Column, name_col: Column) -> list:
    """processEntityCommonPart (meta_collector.go:271-288): the reserved
    entity fields + common custom fields, in the reference's Add order."""
    return [
        (F.lit("__domain__"), F.lit(domain)),
        (F.lit("__entity_type__"), _entity_type(domain, kind)),
        (F.lit("__entity_id__"),
         _gen_key(cluster_id, F.lit(kind), namespace_col, name_col)),
        (F.lit("__method__"), F.col("method")),
        (F.lit("__first_observed_time__"),
         F.col("first_observed").cast("string")),
        (F.lit("__last_observed_time__"),
         F.col("last_observed").cast("string")),
        (F.lit("__keep_alive_seconds__"), F.lit(str(int(interval) * 2))),
        (F.lit("__category__"), F.lit("entity")),
        (F.lit("cluster_id"), F.lit(cluster_id)),
        (F.lit("kind"), F.lit(kind)),
        (F.lit("name"), name_col),
        (F.lit("create_time"),
         F.date_format(F.col("creation_ts"), "yyyy-MM-dd'T'HH:mm:ssXXX")),
    ]


def k8s_service_entities(
    df: DataFrame, domain: str = "k8s", cluster_id: str = "",
    interval: int = 30, enable_labels: bool = True,
    enable_annotations: bool = True,
) -> DataFrame:
    """Service frame → entity contents (meta_collector_core.go:166-204
    processServiceEntity): common part + api_version/namespace,
    labels/annotations, selector object, type, cluster_ip, and the
    ports array ({port, protocol, targetPort} maps — Go map marshal,
    sorted keys; targetPort is the IntOrString string form). Input
    contract: ``namespace, name, api_version, labels, annotations,
    selector map<string,string>, type string, cluster_ip string,
    ports array<struct<port:int, target_port:string, protocol:string>>``
    plus the observed-frame tail (creation_ts, first_observed,
    last_observed, method)."""
    ports_json = _json_pairs_array(
        F.transform(
            F.col("ports"),
            lambda p: F.struct(
                p["port"].cast("string").alias("port"),
                p["protocol"].alias("protocol"),
                p["target_port"].alias("targetPort"))),
        ["port", "protocol", "targetPort"])
    pairs = _common_pairs(domain, "Service", cluster_id, interval,
                          F.col("namespace"), F.col("name")) + [
        (F.lit("api_version"), F.col("api_version")),
        (F.lit("namespace"), F.col("namespace")),
        *([(F.lit("labels"), _json_obj(F.col("labels")))]
          if enable_labels else []),
        *([(F.lit("annotations"), _json_obj(F.col("annotations")))]
          if enable_annotations else []),
        (F.lit("selector"), _json_obj(F.col("selector"))),
        (F.lit("type"), F.col("type")),
        (F.lit("cluster_ip"), F.col("cluster_ip")),
        (F.lit("ports"), ports_json),
    ]
    return df.select(_mk_map(pairs).alias("contents"))


def k8s_deployment_entities(
    df: DataFrame, domain: str = "k8s", cluster_id: str = "",
    interval: int = 30, enable_labels: bool = True,
    enable_annotations: bool = True,
) -> DataFrame:
    """Deployment frame → entity contents (meta_collector_app.go:13-49
    processDeploymentEntity): common part + api_version/namespace,
    labels/annotations, match_labels (nil selector → '{}'), replicas
    (safeGetInt32String — '' when the pointer is nil), ready_replicas,
    and the template containers name+image array. Input contract:
    ``namespace, name, api_version, labels, annotations, match_labels
    map<string,string>, replicas int (nullable), ready_replicas int,
    containers array<struct<name:string, image:string>>`` plus the
    observed-frame tail."""
    pairs = _common_pairs(domain, "Deployment", cluster_id, interval,
                          F.col("namespace"), F.col("name")) + [
        (F.lit("api_version"), F.col("api_version")),
        (F.lit("namespace"), F.col("namespace")),
        *([(F.lit("labels"), _json_obj(F.col("labels")))]
          if enable_labels else []),
        *([(F.lit("annotations"), _json_obj(F.col("annotations")))]
          if enable_annotations else []),
        (F.lit("match_labels"), _json_obj(F.col("match_labels"))),
        (F.lit("replicas"),
         F.when(F.col("replicas").isNull(), F.lit(""))
         .otherwise(F.col("replicas").cast("string"))),
        (F.lit("ready_replicas"),
         F.coalesce(F.col("ready_replicas"), F.lit(0)).cast("string")),
        (F.lit("containers"), _json_pairs_array(
            F.transform(
                F.col("containers"),
                lambda c: F.struct(c["name"].alias("name"),
                                   c["image"].alias("image"))),
            ["name", "image"])),
    ]
    return df.select(_mk_map(pairs).alias("contents"))


def k8s_node_entities(
    df: DataFrame, domain: str = "k8s", cluster_id: str = "",
    interval: int = 30, enable_labels: bool = True,
    enable_annotations: bool = True,
) -> DataFrame:
    """Node frame → entity contents (meta_collector_core.go:119-164
    processNodeEntity): cluster-scoped (namespace '' in the key, no
    namespace content field, no api_version), labels/annotations, the
    conditions {type, status} array, internal_ip / host_name picked
    from the address list, capacity/allocatable quantity maps, the raw
    addresses array in struct field order ({"type":…,"address":…} —
    v1.NodeAddress marshals in declaration order, not sorted), and
    provider_id. Input contract: ``name, labels, annotations,
    conditions array<struct<type:string, status:string>>, internal_ip,
    host_name, capacity map<string,string>, allocatable
    map<string,string>, addresses array<struct<type:string,
    address:string>>, provider_id`` plus the observed-frame tail."""
    pairs = _common_pairs(domain, "Node", cluster_id, interval,
                          F.lit(""), F.col("name")) + [
        *([(F.lit("labels"), _json_obj(F.col("labels")))]
          if enable_labels else []),
        *([(F.lit("annotations"), _json_obj(F.col("annotations")))]
          if enable_annotations else []),
        (F.lit("status"), _json_pairs_array(
            F.transform(
                F.col("conditions"),
                lambda c: F.struct(c["type"].alias("type"),
                                   c["status"].alias("status"))),
            ["type", "status"])),
        (F.lit("internal_ip"), F.col("internal_ip")),
        (F.lit("host_name"), F.col("host_name")),
        (F.lit("capacity"), _json_obj(F.col("capacity"))),
        (F.lit("allocatable"), _json_obj(F.col("allocatable"))),
        (F.lit("addresses"), _json_structs_array(
            F.col("addresses"), ["type", "address"])),
        (F.lit("provider_id"), F.col("provider_id")),
    ]
    return df.select(_mk_map(pairs).alias("contents"))


def k8s_pod_entities(
    df: DataFrame, domain: str = "k8s", cluster_id: str = "",
    interval: int = 30, enable_labels: bool = True,
    enable_annotations: bool = True, container: bool = True,
    pod: bool = True,
) -> DataFrame:
    """Pod frame → entity contents maps (pod rows when ``Pod`` is on,
    then container rows when ``Container`` is on).  Pure codegen
    projections + one explode; no shuffle."""
    if not pod and not container:
        raise ValueError(
            "service_kubernetesmeta: Pod and Container both disabled — "
            "nothing to emit")
    keep_alive = F.lit(str(int(interval) * 2))
    common_tail = [
        (F.lit("__first_observed_time__"),
         F.col("first_observed").cast("string")),
        (F.lit("__last_observed_time__"),
         F.col("last_observed").cast("string")),
        (F.lit("__keep_alive_seconds__"), keep_alive),
        (F.lit("__category__"), F.lit("entity")),
        (F.lit("cluster_id"), F.lit(cluster_id)),
    ]

    def mk_map(pairs):
        flat = []
        for k, v in pairs:
            flat += [k, F.coalesce(v, F.lit(""))]
        return F.map_from_arrays(F.array(*flat[0::2]), F.array(*flat[1::2]))

    containers_json = _json_pairs_array(
        F.transform(
            F.col("containers"),
            lambda c: F.struct(c["name"].alias("name"),
                               c["image"].alias("image"))),
        ["name", "image"])
    pod_pairs = [
        (F.lit("__domain__"), F.lit(domain)),
        (F.lit("__entity_type__"), _entity_type(domain, POD_KIND)),
        (F.lit("__entity_id__"),
         _gen_key(cluster_id, F.lit(POD_KIND), F.col("namespace"),
                  F.col("name"))),
        (F.lit("__method__"), F.col("method")),
        *common_tail,
        (F.lit("kind"), F.lit(POD_KIND)),
        (F.lit("name"), F.col("name")),
        (F.lit("create_time"),
         F.date_format(F.col("creation_ts"),
                       "yyyy-MM-dd'T'HH:mm:ssXXX")),
        (F.lit("api_version"), F.col("api_version")),
        (F.lit("namespace"), F.col("namespace")),
        *([(F.lit("labels"), _json_obj(F.col("labels")))]
          if enable_labels else []),
        *([(F.lit("annotations"), _json_obj(F.col("annotations")))]
          if enable_annotations else []),
        (F.lit("status"), F.col("phase")),
        (F.lit("instance_ip"), F.col("pod_ip")),
        (F.lit("containers"), containers_json),
    ]
    pods = df.select(mk_map(pod_pairs).alias("contents"))
    if not container:
        return pods

    c = F.col("_c")
    ports_json = F.when(
        c["ports"].isNull() | (F.size(c["ports"]) == 0), F.lit("[]")
    ).otherwise(F.concat(
        F.lit("["),
        F.array_join(F.transform(c["ports"],
                                 lambda p: p.cast("string")), ","),
        F.lit("]")))
    volumes_json = _json_pairs_array(
        F.transform(
            c["volume_mounts"],
            lambda v: F.struct(
                v["name"].alias("volumeMountName"),
                v["path"].alias("volumeMountPath"))),
        ["volumeMountName", "volumeMountPath"])
    cont_pairs = [
        (F.lit("__domain__"), F.lit(domain)),
        (F.lit("__entity_type__"), _entity_type(domain, CONTAINER_KIND)),
        (F.lit("__entity_id__"),
         _gen_key(cluster_id, F.lit(CONTAINER_KIND), F.col("namespace"),
                  F.concat(F.coalesce(F.col("name"), F.lit("")),
                           F.coalesce(c["name"], F.lit(""))))),
        (F.lit("__method__"), F.col("method")),
        *common_tail,
        (F.lit("name"), c["name"]),
        (F.lit("pod_name"), F.col("name")),
        (F.lit("pod_namespace"), F.col("namespace")),
        (F.lit("image"), c["image"]),
        (F.lit("cpu_request"), c["cpu_request"]),
        (F.lit("cpu_limit"), c["cpu_limit"]),
        (F.lit("memory_request"), c["memory_request"]),
        (F.lit("memory_limit"), c["memory_limit"]),
        (F.lit("container_ports"), ports_json),
        (F.lit("volumes"), volumes_json),
    ]
    conts = (
        df.select("*", F.explode(F.col("containers")).alias("_c"))
        .select(mk_map(cont_pairs).alias("contents"))
    )
    if not pod:
        return conts
    return pods.unionByName(conts)


def k8s_entity_links(
    df: DataFrame, src_kind: str, dest_kind: str, relation_type: str,
    domain: str = "k8s", cluster_id: str = "", interval: int = 30,
) -> DataFrame:
    """Entity LINK events (processEntityLinkCommonPart,
    meta_collector.go:290-305 + the per-pair link processors,
    meta_collector_app.go:158-254): one row per observed (src, dest)
    relation — __src/__dest domain/type/id triples with the same genKey
    md5 ids the entity rows carry, __relation_type__ from the config
    (e.g. Deployment2Pod), and the reserved method/times/keepalive
    tail with __category__ = entity_link. Input contract:
    ``src_namespace, src_name, dest_namespace, dest_name, method
    string, first_observed long, last_observed long``. Pure
    projection, no shuffle; link rows join entity rows on the id."""
    pairs = [
        (F.lit("__src_domain__"), F.lit(domain)),
        (F.lit("__src_entity_type__"), _entity_type(domain, src_kind)),
        (F.lit("__src_entity_id__"),
         _gen_key(cluster_id, F.lit(src_kind), F.col("src_namespace"),
                  F.col("src_name"))),
        (F.lit("__dest_domain__"), F.lit(domain)),
        (F.lit("__dest_entity_type__"), _entity_type(domain, dest_kind)),
        (F.lit("__dest_entity_id__"),
         _gen_key(cluster_id, F.lit(dest_kind), F.col("dest_namespace"),
                  F.col("dest_name"))),
        (F.lit("__method__"), F.col("method")),
        (F.lit("__first_observed_time__"),
         F.col("first_observed").cast("string")),
        (F.lit("__last_observed_time__"),
         F.col("last_observed").cast("string")),
        (F.lit("__keep_alive_seconds__"), F.lit(str(int(interval) * 2))),
        (F.lit("__category__"), F.lit("entity_link")),
        (F.lit("__relation_type__"), F.lit(relation_type)),
    ]
    return df.select(_mk_map(pairs).alias("contents"))


_KIND_PROJECTIONS = {
    "Service": k8s_service_entities,
    "Deployment": k8s_deployment_entities,
    "Node": k8s_node_entities,
}


@register("service_kubernetesmeta",
          keys={"Domain", "ClusterID", "Interval", "EnableLabels",
                "EnableAnnotations", "Container", "Pod", "Kind"})
def service_kubernetesmeta(cfg: dict):
    """Registry twin of ServiceK8sMeta (Pod/Container switches,
    EnableLabels/EnableAnnotations, Interval — wineventlog-style column
    contract for the observed-object frame). ``Kind`` selects which
    observed-object frame the input rows carry: ``Pod`` (default, with
    the Container fan-out) or one of ``Service`` / ``Deployment`` /
    ``Node`` (meta_collector_core.go:119-204, meta_collector_app.go:
    13-49) — the reference registers one processor per watched kind the
    same way."""
    kind = str(cfg.get("Kind", "Pod"))
    if kind != "Pod" and kind not in _KIND_PROJECTIONS:
        raise ValueError(
            f"service_kubernetesmeta: unsupported Kind '{kind}' "
            f"(supported: Pod, {', '.join(sorted(_KIND_PROJECTIONS))})")
    if kind == "Pod" and not bool(cfg.get("Pod", True)) \
            and not bool(cfg.get("Container", True)):
        raise ValueError(
            "service_kubernetesmeta: Pod and Container both disabled — "
            "nothing to emit")

    def run(df: DataFrame) -> DataFrame:
        kw = dict(
            domain=str(cfg.get("Domain", "k8s")),
            cluster_id=str(cfg.get("ClusterID", "")),
            interval=int(cfg.get("Interval", 30)),
            enable_labels=bool(cfg.get("EnableLabels", True)),
            enable_annotations=bool(cfg.get("EnableAnnotations", True)),
        )
        if kind == "Pod":
            return k8s_pod_entities(
                df, container=bool(cfg.get("Container", True)),
                pod=bool(cfg.get("Pod", True)), **kw)
        return _KIND_PROJECTIONS[kind](df, **kw)

    return run
