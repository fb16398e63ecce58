"""Per-operator golden tests — the pytest analog of the reference's
core/unittest/processor suites: tiny in-memory frames, hand-computed
expected outputs, parse-fail branches included."""

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators import build_operator, build_chain


def rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


# ---------------------------------------------------------------- parse ops

def test_parse_regex_success_and_fail(spark):
    df = spark.createDataFrame(
        [("a 1",), ("b 2",), ("nope",)], "text string"
    )
    op = build_operator({
        "Type": "processor_parse_regex",
        "SourceKey": "text",
        "Regex": r"(\w) (\d)",
        "Keys": ["k", "v"],
        "KeyTypes": [None, "int"],
    })
    out = op(df).orderBy("k").collect()
    assert [(r["k"], r["v"], r["_parse_ok"]) for r in out] == [
        (None, None, False), ("a", 1, True), ("b", 2, True)]
    # keep-source-on-fail default: failed row keeps raw, success rows drop it
    assert [r["text"] for r in out] == ["nope", None, None]


def test_parse_regex_discard_on_fail(spark):
    df = spark.createDataFrame([("a 1",), ("zz",)], "text string")
    op = build_operator({
        "Type": "processor_parse_regex", "SourceKey": "text",
        "Regex": r"(\w) (\d)", "Keys": ["k", "v"],
        "KeepingSourceWhenParseFail": False,
    })
    assert op(df).count() == 1


def test_parse_regex_renamed_source(spark):
    df = spark.createDataFrame([("bad",)], "text string")
    op = build_operator({
        "Type": "processor_parse_regex", "SourceKey": "text",
        "Regex": r"(\d+)", "Keys": ["n"], "RenamedSourceKey": "raw_log",
    })
    out = op(df).collect()[0]
    assert out["raw_log"] == "bad" and out["n"] is None


def test_parse_json_schema_flatten(spark):
    df = spark.createDataFrame(
        [('{"a":"x","meta":{"b":2}}',), ("notjson",)], "text string"
    )
    op = build_operator({
        "Type": "processor_parse_json", "SourceKey": "text",
        "Schema": "a string, meta struct<b:bigint>",
    })
    out = op(df).orderBy(F.col("a").asc_nulls_last()).collect()
    assert (out[0]["a"], out[0]["meta_b"], out[0]["_parse_ok"]) == ("x", 2, True)
    assert out[1]["_parse_ok"] is False and out[1]["text"] == "notjson"


def test_parse_json_dynamic_map(spark):
    df = spark.createDataFrame([('{"k1":"v1","k2":"2"}',)], "text string")
    op = build_operator({"Type": "processor_parse_json", "SourceKey": "text"})
    out = op(df).collect()[0]
    assert out["attrs"] == {"k1": "v1", "k2": "2"}


def test_parse_delimiter_modes(spark):
    df = spark.createDataFrame([("a,b,c,d,e",), ("a,b",)], "text string")
    # extend: extras become __column{N}__ (ProcessorParseDelimiterNative.cpp:368-400)
    op = build_operator({
        "Type": "processor_parse_delimiter", "SourceKey": "text",
        "Separator": ",", "Keys": ["x", "y", "z"],
        "OverflowedFieldsTreatment": "extend", "ExtendedColumns": 2,
    })
    out = op(df).orderBy(F.col("x").asc_nulls_last()).collect()
    assert (out[0]["x"], out[0]["__column0__"], out[0]["__column1__"]) == ("a", "d", "e")
    assert out[1]["_parse_ok"] is False  # shortened not allowed by default
    # keep: overflow folded into last key
    op2 = build_operator({
        "Type": "processor_parse_delimiter", "SourceKey": "text",
        "Separator": ",", "Keys": ["x", "y", "z"],
        "OverflowedFieldsTreatment": "keep",
    })
    out2 = op2(df).filter("x = 'a'").collect()[0]
    assert out2["z"] == "c,d,e"


def test_parse_delimiter_quoted(spark):
    df = spark.createDataFrame([('a,"b,c",d',)], "text string")
    op = build_operator({
        "Type": "processor_parse_delimiter", "SourceKey": "text",
        "Separator": ",", "Quote": '"', "Keys": ["x", "y", "z"],
    })
    out = op(df).collect()[0]
    assert (out["x"], out["y"], out["z"]) == ("a", "b,c", "d")


def test_parse_kv(spark):
    df = spark.createDataFrame([("a=1&b=two",), ("junk",)], "text string")
    op = build_operator({
        "Type": "processor_split_key_value", "SourceKey": "text",
        "Delimiter": "&", "Separator": "=", "Keys": ["a", "b"],
    })
    out = op(df).orderBy(F.col("a").asc_nulls_last()).collect()
    assert (out[0]["a"], out[0]["b"]) == ("1", "two")
    assert out[1]["_parse_ok"] is False


def test_parse_apsara(spark):
    line = "[2026-01-01 00:00:00.123456]\t[INFO]\t[123]\t[main.cpp:42]\tk1:v1\tk2:v2"
    df = spark.createDataFrame([(line,)], "text string")
    op = build_operator({"Type": "processor_parse_apsara", "SourceKey": "text"})
    out = op(df).collect()[0]
    assert out["__LEVEL__"] == "INFO" and out["__THREAD__"] == 123
    assert out["__FILE__"] == "main.cpp" and out["__LINE__"] == 42
    assert out["attrs"] == {"k1": "v1", "k2": "v2"}


def test_grok_first_match_wins(spark):
    df = spark.createDataFrame(
        [("10.0.0.1 GET /a 100 0.01",), ("hello world",)], "text string"
    )
    op = build_operator({
        "Type": "processor_grok", "SourceKey": "text",
        "Match": [
            "%{IP:client} %{WORD:method} %{URIPATHPARAM:request} %{NUMBER:bytes:int} %{NUMBER:duration:float}",
            "%{WORD:w1} %{WORD:w2}",
        ],
    })
    out = op(df).orderBy(F.col("client").asc_nulls_last()).collect()
    assert (out[0]["client"], out[0]["bytes"], out[0]["duration"]) == ("10.0.0.1", 100, 0.01)
    assert out[0]["w1"] is None  # first pattern won; second not applied
    assert (out[1]["w1"], out[1]["w2"]) == ("hello", "world")


def test_parse_timestamp(spark):
    df = spark.createDataFrame([("2026-02-03 04:05:06",), ("bad",)], "t string")
    op = build_operator({
        "Type": "processor_parse_timestamp", "SourceKey": "t",
        "SourceFormat": "yyyy-MM-dd HH:mm:ss", "DestKey": "ts", "DropIfFail": True,
    })
    out = op(df).collect()
    assert len(out) == 1 and str(out[0]["ts"]).startswith("2026-02-03 04:05:06")


# ---------------------------------------------------------------- field ops

def test_field_ops_chain(spark):
    df = spark.createDataFrame([("v", "x")], "a string, b string")
    chain = build_chain([
        {"Type": "processor_add_fields", "Fields": {"env": "prod"}},
        {"Type": "processor_rename", "SourceKeys": ["a"], "DestKeys": ["a2"]},
        {"Type": "processor_drop", "DropKeys": ["b"]},
    ])
    out = chain(df)
    assert out.columns == ["a2", "env"] and out.collect()[0]["env"] == "prod"


def test_pick_key(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    op = build_operator({"Type": "processor_pick_key", "Include": ["a", "c"]})
    assert op(df).columns == ["a", "c"]


def test_pack_json(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    op = build_operator({"Type": "processor_pack_json", "SourceKeys": ["a", "b"], "DestKey": "p"})
    assert op(df).collect()[0]["p"] == '{"a":1,"b":"x"}'


def test_appender_and_anchor(spark):
    df = spark.createDataFrame([("val", "pre[TARGET]post")], "k string, t string")
    out = build_operator({"Type": "processor_appender", "Key": "k", "Value": "-suffix"})(df)
    assert out.collect()[0]["k"] == "val-suffix"
    out2 = build_operator({
        "Type": "processor_anchor", "SourceKey": "t",
        "Anchors": [{"Start": "pre[", "Stop": "]post", "FieldName": "mid"}],
    })(df)
    assert out2.collect()[0]["mid"] == "TARGET"


def test_base64_md5(spark):
    df = spark.createDataFrame([("abc",)], "v string")
    enc = build_operator({"Type": "processor_base64_encoding", "SourceKey": "v", "NewKey": "e"})(df)
    assert enc.collect()[0]["e"] == "YWJj"
    dec = build_operator({"Type": "processor_base64_decoding", "SourceKey": "e", "NewKey": "d"})(enc)
    assert dec.collect()[0]["d"] == "abc"
    md5 = build_operator({"Type": "processor_md5", "SourceKey": "v", "MD5Key": "h"})(df)
    assert md5.collect()[0]["h"] == "900150983cd24fb0d6963f7d28e17f72"


def test_string_replace(spark):
    df = spark.createDataFrame([("ab12cd",)], "v string")
    out = build_operator({
        "Type": "processor_string_replace", "SourceKey": "v",
        "Method": "regex", "Match": r"\d+", "ReplaceString": "#",
    })(df)
    assert out.collect()[0]["v"] == "ab#cd"
    out2 = build_operator({
        "Type": "processor_string_replace", "SourceKey": "v",
        "Method": "const", "Match": "ab", "ReplaceString": "XY", "DestKey": "w",
    })(df)
    assert out2.collect()[0]["w"] == "XY12cd"


def test_desensitize_const_and_md5(spark):
    df = spark.createDataFrame([("user=bob,pwd=secret123,x=1",)], "v string")
    out = build_operator({
        "Type": "processor_desensitize", "SourceKey": "v", "Method": "const",
        "RegexBegin": "pwd=", "RegexContent": r"[^,]+", "ReplacingString": "***",
    })(df)
    assert out.collect()[0]["v"] == "user=bob,pwd=***,x=1"
    out2 = build_operator({
        "Type": "processor_desensitize", "SourceKey": "v", "Method": "md5",
        "RegexBegin": "pwd=", "RegexContent": r"secret\d+",
    })(df)
    import hashlib
    exp = "user=bob,pwd=" + hashlib.md5(b"secret123").hexdigest() + ",x=1"
    assert out2.collect()[0]["v"] == exp


# ---------------------------------------------------------------- filters

def test_filter_expression_ast(spark):
    df = spark.createDataFrame(
        [("ERROR", "a"), ("INFO", "b"), ("ERROR", "b")], "lvl string, svc string"
    )
    op = build_operator({
        "Type": "processor_filter",
        "ConditionExp": {
            "operator": "and",
            "operands": [
                {"key": "lvl", "exp": "ERROR"},
                {"operator": "not", "operands": [{"key": "svc", "exp": "a"}]},
            ],
        },
    })
    out = op(df).collect()
    assert len(out) == 1 and out[0]["svc"] == "b"


def test_filter_regex_include_exclude(spark):
    df = spark.createDataFrame([("abc",), ("abd",), ("xyz",)], "v string")
    op = build_operator({
        "Type": "processor_filter_regex",
        "Include": {"v": "ab."}, "Exclude": {"v": "abd"},
    })
    assert [r["v"] for r in op(df).collect()] == ["abc"]


def test_filter_full_match_semantics(spark):
    # reference full-match: 'ab' must NOT match 'abc'
    df = spark.createDataFrame([("abc",)], "v string")
    op = build_operator({"Type": "processor_filter", "Include": {"v": "ab"}})
    assert op(df).count() == 0


def test_timestamp_filter(spark):
    df = spark.createDataFrame(
        [("2026-01-01 00:00:00",), ("2026-06-01 00:00:00",)], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    op = build_operator({
        "Type": "processor_timestamp_filter", "SourceKey": "ts",
        "LowerBound": "2026-01-01 00:00:00", "UpperBound": "2026-02-01 00:00:00",
    })
    assert op(df).count() == 1


# ----------------------------------------------------------- enrich / cond

def test_dict_map_modes(spark):
    df = spark.createDataFrame([("search",), ("unknown_tool",)], "tool string")
    op = build_operator({
        "Type": "processor_dict_map", "SourceKey": "tool", "DestKey": "cat",
        "MapDict": {"search": "retrieval"}, "HandleMissing": True, "Missing": "Unknown",
    })
    out = {r["tool"]: r["cat"] for r in op(df).collect()}
    assert out == {"search": "retrieval", "unknown_tool": "Unknown"}


def test_dict_map_broadcast_path(spark):
    # >64 entries forces the broadcast-join path
    mapping = {f"k{i}": f"v{i}" for i in range(100)}
    df = spark.createDataFrame([("k5",), ("nope",)], "k string")
    op = build_operator({
        "Type": "processor_dict_map", "SourceKey": "k", "DestKey": "v",
        "MapDict": mapping, "Missing": "Unknown",
    })
    out = {r["k"]: r["v"] for r in op(df).collect()}
    assert out == {"k5": "v5", "nope": "Unknown"}


def test_fields_with_condition_first_match_wins(spark):
    df = spark.createDataFrame([("ERROR x",), ("WARN y",), ("ok",)], "msg string")
    op = build_operator({
        "Type": "processor_fields_with_condition",
        "Switch": [
            {"Condition": {"FieldConditions": [
                {"Key": "msg", "ComparisonOperator": "startwith", "Value": "ERROR"}]},
             "Actions": [{"type": "processor_add_fields", "Fields": {"sev": "high"}}]},
            {"Condition": {"FieldConditions": [
                {"Key": "msg", "ComparisonOperator": "contains", "Value": "R"}]},
             "Actions": [{"type": "processor_add_fields", "Fields": {"sev": "mid"}}]},
        ],
    })
    out = {r["msg"]: r["sev"] for r in op(df).collect()}
    # 'ERROR x' matches both cases but FIRST wins
    assert out == {"ERROR x": "high", "WARN y": "mid", "ok": None}


def test_fields_with_condition_drop_no_match(spark):
    df = spark.createDataFrame([("a",), ("b",)], "v string")
    op = build_operator({
        "Type": "processor_fields_with_condition", "DropIfNotMatchCondition": True,
        "Switch": [{"Condition": {"FieldConditions": [
            {"Key": "v", "ComparisonOperator": "equals", "Value": "a"}]},
            "Actions": []}],
    })
    assert op(df).count() == 1


# --------------------------------------------------------------- split ops

def test_split_log_string(spark):
    df = spark.createDataFrame([("c1", 0, "l1\nl2\nl3")], "conv_id string, turn_idx int, text string")
    op = build_operator({"Type": "processor_split_log_string", "SourceKey": "text"})
    out = op(df).orderBy("line_idx").collect()
    assert [r["text"] for r in out] == ["l1", "l2", "l3"]
    assert [r["line_idx"] for r in out] == [0, 1, 2]


def test_split_log_regex_multiline(spark):
    blob = "2026-01-01 start A\n  cont A1\n  cont A2\n2026-01-02 start B\n  cont B1"
    df = spark.createDataFrame([("c1", 0, blob)], "conv_id string, turn_idx int, text string")
    op = build_operator({
        "Type": "processor_split_log_regex", "SourceKey": "text",
        # full-LINE match like Go fullMatch (split_log_regex.go:52-55) —
        # a bare prefix pattern would never open a new record
        "SplitRegex": r"\d{4}-\d{2}-\d{2} .*",
    })
    out = op(df).orderBy("line_idx").collect()
    assert len(out) == 2
    assert out[0]["text"] == "2026-01-01 start A\n  cont A1\n  cont A2"
    assert out[1]["text"] == "2026-01-02 start B\n  cont B1"


def test_merge_conversation(spark, kv_df):
    op = build_operator({"Type": "processor_merge_conversation"})
    out = {r["conv_id"]: r for r in op(kv_df).collect()}
    assert out["c1"]["n_turns"] == 2
    assert out["c1"]["merged_text"].startswith("action=ask")
    assert "\n" in out["c1"]["merged_text"]


# ---------------------------------------------------------------- time ops

def test_gotime_epoch_and_format(spark):
    df = spark.createDataFrame([("1767225600",)], "t string")  # 2026-01-01
    op = build_operator({
        "Type": "processor_gotime", "SourceKey": "t", "SourceFormat": "seconds",
        "DestKey": "d", "DestFormat": "yyyy-MM-dd",
    })
    assert op(df).collect()[0]["d"] == "2026-01-01"


def test_strptime_precise(spark):
    df = spark.createDataFrame([("2026-01-01 00:00:01",)], "t string")
    op = build_operator({
        "Type": "processor_strptime", "SourceKey": "t",
        "Format": "yyyy-MM-dd HH:mm:ss", "EnablePreciseTimestamp": True,
    })
    out = op(df).collect()[0]
    assert out["precise_timestamp"] == 1767225601000


# ------------------------------------------------------------- rate limit

def test_rate_limit_deterministic(spark):
    rows = [("k", f"c{i}", i, f"2026-01-01 00:00:{i%2:02d}") for i in range(10)]
    df = spark.createDataFrame(rows, "f string, conv_id string, turn_idx int, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    op = build_operator({
        "Type": "processor_rate_limit", "Fields": ["f"], "Limit": "3/s",
    })
    out = op(df)
    assert out.count() == 6  # two 1-second windows × 3 admitted
    out2 = op(df.repartition(7))
    assert sorted(r["turn_idx"] for r in out.collect()) == \
           sorted(r["turn_idx"] for r in out2.collect())


# ------------------------------------------------------------- metric ops

def test_log_to_metric(spark):
    df = spark.createDataFrame(
        [("a", 1.5, "2026-01-01 00:00:00")], "svc string, lat double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    op = build_operator({
        "Type": "processor_log_to_metric", "MetricLabelKeys": ["svc"],
        "MetricValues": {"latency": "lat"},
    })
    out = op(df).collect()[0]
    assert out["__name__"] == "latency" and out["__value__"] == 1.5
    assert out["__labels__"] == "svc=a"
    assert out["__time_nano__"] == 1767225600000000000


def test_content_value_group(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v int")
    op = build_operator({"Type": "aggregator_content_value_group", "GroupKeys": ["k"]})
    out = op(df)
    # the aggregator groups (co-locates) — it never drops events
    # (aggregator_content_value_group.go:160-177)
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [
        ("a", 1), ("a", 2), ("b", 3)]
    # each group's rows land in one partition
    parts = out.withColumn("_p", F.spark_partition_id()) \
        .groupBy("k").agg(F.countDistinct("_p").alias("np")).collect()
    assert all(r["np"] == 1 for r in parts)


def test_split_key_value_anomaly_keys(spark):
    """key_value_splitter.go:26-45 anomaly handling: pairs without the
    separator land under NoSeparatorKeyPrefix<idx>, empty keys under
    EmptyKeyPrefix<idx>; normal pairs (incl. values containing the
    separator) are unaffected."""
    df = spark.createDataFrame(
        [("a=1&orphan&=hidden&k=v1=v2",)], "text string"
    )
    op = build_operator({
        "Type": "processor_split_key_value", "SourceKey": "text",
        "Delimiter": "&", "Separator": "=",
        "EmptyKeyPrefix": "empty_key_",
        "NoSeparatorKeyPrefix": "no_separator_key_",
        "KeepingSourceWhenParseSucceed": True,
    })
    r = op(df).first()
    attrs = r["attrs"]
    assert attrs["a"] == "1"
    assert attrs["no_separator_key_1"] == "orphan"
    assert attrs["empty_key_2"] == "hidden"
    assert attrs["k"] == "v1=v2"  # separator inside the value survives


def test_connected_components_chain_and_islands(spark):
    """min-label propagation must converge past diameter-1: a 5-node
    chain (diameter 4) all labels to the min id; a disjoint pair stays
    its own component; singletons (no edges) are absent by contract."""
    from loongcollector_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (11, 10)],
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_connected_components_leaves_session_conf_alone(spark):
    """The CC loop's AQE-off / partition tuning runs on a CLONED session:
    the caller's conf must be byte-identical before, DURING (observed by
    a udf-free concurrent read mid-loop is not possible here, so we
    assert after + that the clone's values never leaked), and after."""
    from loongcollector_spark.functions.dedup import connected_components

    keys = ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    before = {k: spark.conf.get(k) for k in keys}
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "doc_a long, doc_b long")
    out = connected_components(pairs)
    assert {k: spark.conf.get(k) for k in keys} == before
    # the returned frame executes under the CALLER's session (joinable
    # with caller-session frames, runs with caller conf)
    assert out.sparkSession is spark
    ids = spark.range(101).selectExpr("id AS node")
    assert out.join(ids, "node").count() == 101
    assert {k: spark.conf.get(k) for k in keys} == before


def test_dedup_clusters_keep_flag(spark):
    """dedup_clusters marks exactly one keep=True row (the min doc_id)
    per cluster and sizes match member counts."""
    from loongcollector_spark.functions.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(4)]
        + [(9, "an entirely different document about spark shuffles")],
        "doc_id long, text string",
    )
    rows = dedup_clusters(docs).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keeps = [r for r in members if r["keep"]]
        assert len(keeps) == 1 and keeps[0]["doc_id"] == cid == min(
            r["doc_id"] for r in members)
        assert all(r["cluster_size"] == len(members) for r in members)
    assert {r["doc_id"] for r in rows} == {0, 1, 2, 3}  # doc 9 unpaired


def test_ivf_topk_recall_vs_brute_force(spark, tmp_path):
    """IVF with nprobe=4/16 cells must surface most of the brute-force
    top-5 on the real fixture, and its scores must be exact (identical
    to brute force for every id it returns — pruning never rescores)."""
    from loongcollector_spark.functions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = {r["vec_id"]: r["cos_sim"]
             for r in cosine_topk(emb, query_vec_id=0, k=5).collect()}
    ivf = {r["vec_id"]: r["cos_sim"]
           for r in ivf_topk(emb, query_vec_id=0, k=5,
                             n_centroids=16, nprobe=4).collect()}
    overlap = set(brute) & set(ivf)
    assert len(overlap) >= 3  # >=60% recall on the fixture
    for vid in overlap:
        assert ivf[vid] == brute[vid]


def test_ivf_topk_plan_broadcast_only(spark):
    """the query path must not shuffle the corpus: centroid scoring and
    candidate joins are broadcasts; the only exchange is the (id, cell)
    argmax partial-agg."""
    from loongcollector_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = ivf_topk(emb)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_gopher_quality_signals(spark):
    """hand-checked Gopher signals: a normal sentence passes, a
    one-word-repeated doc fails on top-word ratio, a stopword-free doc
    fails on stop_hits, a 3-worder fails on n_words."""
    from loongcollector_spark.functions.text import gopher_quality

    docs = spark.createDataFrame(
        [(1, "the cat sat with the dog and that was that"),
         (2, "spam spam spam spam spam spam spam spam"),
         (3, "alpha bravo charlie delta echo foxtrot golf"),
         (4, "to be brief")],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in gopher_quality(docs).collect()}
    assert r[1]["gopher_ok"]
    assert r[1]["n_words"] == 10 and r[1]["stop_hits"] == 6
    assert r[1]["top_word_ratio_1e3"] == 200  # 'the' twice in 10 words
    assert not r[2]["gopher_ok"] and r[2]["top_word_ratio_1e3"] == 1000
    assert not r[3]["gopher_ok"] and r[3]["stop_hits"] == 0
    assert not r[4]["gopher_ok"] and r[4]["n_words"] == 3


def test_normalize_text_passes(spark):
    from loongcollector_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "“Q” ‘x’ — a\x01b\tc d   e – f  "),
         (2, None), (3, "plain")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["text_norm"]
           for r in normalize_text(df).collect()}
    assert got[1] == "\"Q\" 'x' - a b c d e - f"
    assert got[2] == ""
    assert got[3] == "plain"


def test_dup_ngram_stats_golden(spark):
    from loongcollector_spark.functions.text import dup_ngram_stats

    df = spark.createDataFrame(
        [(1, "a b a b a"),   # bigrams: ab,ba,ab,ba -> 4 total, 2 distinct
         (2, "x y z"),       # 2 total, 2 distinct
         (3, "one"),         # < n words
         (4, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in dup_ngram_stats(df, n=2).collect()}
    assert (got[1]["n_grams"], got[1]["n_distinct"]) == (4, 2)
    assert got[1]["dup_frac_1e3"] == 500
    assert got[1]["top_gram_frac_1e3"] == 500
    assert (got[2]["n_grams"], got[2]["dup_frac_1e3"]) == (2, 0)
    assert got[3]["n_grams"] == 0 and got[3]["dup_frac_1e3"] == 0
    assert got[4]["n_grams"] == 0


def test_connected_components_adversarial_graphs_vs_union_find(spark):
    """The iterative CC (fused min-neighbor init + pointer jumping +
    scan-only convergence check) must match a driver-side union-find on
    graph shapes the near-dup oracles never produce: a 64-node chain
    (needs O(log diameter) propagate rounds), a hub star, and a seeded
    sparse random graph with many overlapping components."""
    import random

    from loongcollector_spark.functions.dedup import connected_components

    def union_find(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical min-id component per node
        return {n: find(n) for n in parent}

    rng = random.Random(1234)
    graphs = {
        "chain64": [(i, i + 1) for i in range(64)],
        "star": [(50, i) for i in range(40)],
        "random": [(rng.randrange(200), rng.randrange(200))
                   for _ in range(120)],
    }
    for name, edges in graphs.items():
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r["node"]: r["comp"]
               for r in connected_components(pairs).collect()}
        want = union_find(edges)
        assert got == want, f"{name}: CC disagrees with union-find"


def test_pq_topk_exact_centroid_and_recall(spark):
    """PQ codes must pick an exactly-matching centroid (a corpus vector
    equal to centroid 3 encodes as all-3s, ADC 0 against an identical
    query), and on the real fixture the ADC top-10 must overlap the
    exact-L2 top-10."""
    from loongcollector_spark.functions.similarity import pq_topk

    # synthetic: 16 centroid seeds (ids 1..16), a copy of centroid 3 at
    # id 100, the query (id 0) equal to centroid 3 as well
    import random

    rng = random.Random(7)
    dim = 64

    def vec(seed):
        r = random.Random(seed)
        return [r.uniform(-1, 1) for _ in range(dim)]

    rows = [(i, vec(i)) for i in range(1, 17)]
    rows.append((100, vec(3)))
    rows.append((0, vec(3)))
    rows.append((101, vec(999)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_topk(emb, query_vec_id=0, k=3).collect()
    best = out[0]
    assert best["adc_dist_u"] == 0
    assert best["vec_id"] in (3, 100)   # both encode identically

    real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pq = [r["vec_id"] for r in pq_topk(real, query_vec_id=0, k=10,
                                       shortlist=50).collect()]
    # exact L2 top-10 via brute force on the driver (fixture is tiny)
    vecs = {r["vec_id"]: r["embedding"] for r in real.collect()}
    q = vecs[0]
    exact = sorted((vid for vid in vecs if vid != 0),
                   key=lambda v: (sum((a - b) ** 2
                                      for a, b in zip(vecs[v], q)), v))[:10]
    # two-stage (ADC shortlist 50 -> exact re-rank): measured 9/10 here
    assert len(set(pq) & set(exact)) >= 7


def test_pq_topk_plan_no_corpus_shuffle(spark):
    """encode + ADC are broadcasts of one collected-array row; the plan
    must contain no sort-merge join and no aggregate exchange over the
    corpus (only the final top-k)."""
    from loongcollector_spark.functions.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = pq_topk(emb)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_pq_topk_rejects_gapped_seed_ids(spark):
    from loongcollector_spark.functions.similarity import pq_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").filter("vec_id != 7")
    try:
        pq_topk(emb, query_vec_id=0, k=3)
    except ValueError as e:
        assert "sub-codebooks" in str(e)
    else:
        raise AssertionError("expected ValueError for missing seed id")


def test_script_ratios_known_values(spark):
    from loongcollector_spark.functions.text import script_ratios

    docs = spark.createDataFrame(
        [(1, "abc123"), (2, "白日依山尽 abc"), (3, ""), (4, None),
         (5, "Привет мир")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_ratios(docs).collect()}
    assert out[1]["latin_permille"] == 500      # 3/6
    assert out[1]["digit_permille"] == 500
    assert out[2]["cjk_permille"] == 555        # 5 CJK of 9 chars
    assert out[2]["latin_permille"] == 333
    assert out[3]["n_chars"] == 0 and out[3]["cjk_permille"] == 0
    assert out[4]["n_chars"] == 0               # null text -> empty
    assert out[5]["cyrillic_permille"] == 900   # 9 of 10
