"""Plan-shape regression tests — the scale contracts, asserted on the
physical plan so a refactor cannot silently reintroduce a shuffle, lose
predicate pushdown, or downgrade a broadcast join.

These encode the 100 TB posture the flagship claims:
* parse→enrich→route is shuffle-free (one fused codegen pass);
* the whole pipeline has exactly ONE exchange (the salted repartition);
* parquet scans receive pushed filters and pruned schemas;
* dict enrichment never shuffles the fact table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from loongcollector_spark import routing
from loongcollector_spark.datagen import gen_transcripts
from loongcollector_spark.plans.pipeline import parse_stage, transcript_pipeline


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def parquet_transcripts(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "t.parquet")
    gen_transcripts(spark, 2_000, 200).write.parquet(p)
    return spark.read.parquet(p)


def test_parse_enrich_route_is_shuffle_free(parquet_transcripts):
    plan = _plan(transcript_pipeline(parquet_transcripts))
    assert "Exchange" not in plan  # narrow end to end: scan → project
    assert "*(1)" in plan  # whole-stage-codegen span marker


def test_pipeline_has_exactly_one_exchange(parquet_transcripts):
    routed = routing.salted_repartition(
        transcript_pipeline(parquet_transcripts), num_partitions=8
    )
    plan = _plan(routed)
    # the ONE salted repartition; AQE may annotate but not add exchanges
    assert plan.count("Exchange") == 1


def test_parquet_pushdown_and_pruning(parquet_transcripts):
    df = (
        parquet_transcripts
        .filter(F.col("role") == "assistant")
        .select("conv_id", "turn_idx")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(role), EqualTo(role,assistant)" in plan
    # column pruning: the scan must read only the 3 referenced columns
    schema_line = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "text" not in schema_line and "tool" not in schema_line


def test_dict_enrichment_never_shuffles_fact_table(parquet_transcripts):
    from loongcollector_spark.plans.pipeline import enrich_stage

    plan = _plan(enrich_stage(parquet_transcripts))
    # small dicts inline as create_map literals: no join, no exchange
    assert "Exchange" not in plan and "Join" not in plan


def test_large_dict_uses_broadcast_join(spark, parquet_transcripts):
    from loongcollector_spark.operators import build_operator

    big = {f"tool_{i}": f"cat_{i % 7}" for i in range(500)}  # > inline cap
    op = build_operator({
        "Type": "processor_dict_map", "SourceKey": "tool",
        "DestKey": "cat", "MapDict": big,
    })
    plan = _plan(op(parquet_transcripts))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact side must never sort-shuffle


def test_minhash_lsh_join_carries_ids_and_bands_only(spark):
    from loongcollector_spark.functions.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"some text body number {i % 7} repeated tokens") for i in range(50)],
        "doc_id long, text string",
    )
    plan = _plan(minhash_lsh_pairs(docs))
    # any shuffle in the pair join partitions on the band digest (+ ids),
    # never on/with the document text
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    for ln in exchanges:
        assert "text" not in ln
        assert "band" in ln or "doc_" in ln


def test_multiline_codegen_paths_have_no_python(parquet_transcripts):
    """start-only / start+continue / BY_FLAG multiline merges must stay
    JVM-side (window algebra) — no pandas evaluation node — and shuffle
    once on the group key; only end-pattern combos may use the FSM."""
    from loongcollector_spark.operators import build_operator

    for cfg in (
        {"StartPattern": r"\d+\..*"},
        {"StartPattern": r"\d+\..*", "ContinuePattern": r"\{.*"},
        {"EndPattern": r"action=.*"},
    ):
        op = build_operator({"Type": "processor_merge_multiline_log", **cfg})
        plan = _plan(op(parquet_transcripts))
        assert "Python" not in plan and "Pandas" not in plan, cfg
        # window + final agg share the conv_id exchange; at most 2
        assert plan.count("Exchange") <= 2, cfg

    # start+end / continue+end have no fixed-pass window form: FSM path
    fsm = build_operator({
        "Type": "processor_merge_multiline_log",
        "StartPattern": r"\d+\..*", "EndPattern": r"action=.*",
    })
    assert "FlatMapGroupsInPandas" in _plan(fsm(parquet_transcripts))


def test_no_codegen_compile_fallback_across_all_queries(spark):
    """Janino rejects generated methods past 64 KB; Spark then silently
    falls back to interpreted eval (the prom_remote_write regression: a
    CASE subtree re-inlined per reference pushed processNext() past the
    limit — 10x slower with zero test failures). codegen.fallback=false
    turns that silent downgrade into a hard error; every driver query
    must execute under it."""
    from loongcollector_spark.driver_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        for name, (fn, _sql) in QUERIES.items():
            fn(spark, sf).count()  # raises on any codegen compile error
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_line_dedup_corpus_is_never_shuffled_for_membership(spark):
    """line_dedup's scale contract: the membership test against the
    boilerplate set is a BROADCAST join (the corpus side never exchanges
    for it); the only hashpartitioning exchanges are the boilerplate
    count agg and the per-doc reassembly."""
    from loongcollector_spark.functions.curation import line_dedup

    lines = spark.createDataFrame(
        [(1, 0, "x"), (1, 1, "y")], "doc_id long, line_idx int, text string"
    )
    plan = _plan(line_dedup(lines, threshold=2))
    assert "BroadcastExchange" in plan
    shuffles = [ln for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln]
    assert len(shuffles) <= 2, plan


def test_dup_ngram_stats_shuffles_hashes_not_text(spark):
    """Both exchanges carry (id, md5-hash) pairs — gram text never
    crosses the wire; both aggregations partial-aggregate map-side."""
    from loongcollector_spark.functions.text import dup_ngram_stats

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(dup_ngram_stats(df, n=2))
    shuffles = [ln for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln]
    assert shuffles and all("text" not in ln for ln in shuffles), plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_curation_pipeline_query_two_exchanges(spark, tmp_path):
    """The composite curation chain keeps its two-shuffle contract:
    conversation merge + fingerprint dedup window; normalization,
    scoring and the sampling draw all ride the scan/merge stages."""
    from loongcollector_spark.driver_queries import QUERIES

    df = QUERIES["curation_pipeline"][0](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    shuffles = [ln for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln]
    assert len(shuffles) <= 2, plan


def test_explode_over_parse_evaluates_from_json_once(spark):
    """InferFiltersFromGenerate is excluded in get_spark: without it,
    the inferred size(...)>0 filter is pushed below the projection and
    the OTLP from_json parse runs 3-4x per row (measured 4 from_json
    sites, 1.96s -> 0.42s warm on 100k rows when excluded). Assert the
    physical plan carries exactly ONE from_json site."""
    from loongcollector_spark.operators.otelops import (
        OTLP_TRACE_DDL, otel_trace_to_logs,
    )

    df = spark.createDataFrame(
        [(1, '{"resourceSpans":[]}')], "line_id long, content string")
    plan = _plan(otel_trace_to_logs(df, "content"))
    assert plan.count("from_json(StructField") == 1, plan


def test_cross_doc_gram_share_is_sort_free(spark):
    """cross_doc_gram_share's scale contract: doc frequency comes from a
    map-side-combined hash aggregate + shuffled-hash join back — NO
    WindowExec and NO Sort anywhere in the plan (the count-window
    variant sorted every (doc, gram-hash) pair; a hot stop-gram must
    stream, not sort)."""
    from loongcollector_spark.functions.curation import cross_doc_gram_share

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")],
        "doc_id long, text string",
    )
    plan = _plan(cross_doc_gram_share(df, n=5))
    assert "ShuffledHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "Sort " not in plan and "SortMergeJoin" not in plan, plan


def test_bm25_filters_tokens_before_shuffle(spark, tmp_path):
    """The query-term filter must run INSIDE the scan/explode stage —
    the (doc, term) exchange carries only matching tokens, never the
    full token stream."""
    from loongcollector_spark.functions.ranking import bm25_search

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"spark word{i} filler text") for i in range(50)],
        "doc_id long, text string").write.parquet(p)
    import re

    plan = _plan(bm25_search(spark.read.parquet(p), ["spark"]))
    # the term filter sits DIRECTLY above the explode — i.e. inside the
    # scan stage, below every exchange
    assert re.search(r"Filter \(term#\d+ = spark\)[^\n]*\n[\s:]*\+- Generate",
                     plan), plan


def test_rollup_is_single_partial_agg_shuffle(spark, tmp_path):
    from loongcollector_spark.functions.temporal import rollup_time_bucket

    p = str(tmp_path / "ev.parquet")
    gen_transcripts(spark, 500, 50).write.parquet(p)
    df = spark.read.parquet(p).withColumn("v", F.col("turn_idx").cast("long"))
    plan = _plan(rollup_time_bucket(df, "conv_id", "ts", "v", 3600))
    assert plan.count("Exchange") == 1
    # partial (map-side) aggregation before the exchange
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_asof_union_reuses_single_exchange(spark, tmp_path):
    """asof_join on parquet facts+snapshots: one exchange on the key for
    the union, zero join operators."""
    from loongcollector_spark.functions.temporal import asof_join

    p = str(tmp_path / "ev2.parquet")
    gen_transcripts(spark, 500, 50).write.parquet(p)
    ev = spark.read.parquet(p)
    facts = ev.select("conv_id", "ts", "turn_idx")
    snaps = ev.groupBy("conv_id", "ts").agg(F.count("*").alias("snap_n"))
    plan = _plan(asof_join(facts, snaps, on="conv_id"))
    assert "Join" not in plan


def test_gapfill_grid_never_shuffles_wide_rows(spark, tmp_path):
    """gapfill's exchanges carry (key, bucket) aggregates and grid rows
    only — the raw event stream shuffles nowhere."""
    from loongcollector_spark.functions.temporal import gapfill_locf

    p = str(tmp_path / "ev3.parquet")
    gen_transcripts(spark, 500, 50).write.parquet(p)
    df = spark.read.parquet(p).withColumn("v", F.col("turn_idx").cast("long"))
    plan = _plan(gapfill_locf(df, "conv_id", "ts", "v", 3600))
    # no exchange partition expression references the text column
    for seg in plan.split("Exchange")[1:]:
        first_line = seg.split("\n")[0]
        assert "text" not in first_line


def test_decode_operators_are_shuffle_free(spark, parquet_transcripts):
    """The session's decode family (snmp varbinds, wineventlog XML,
    skywalking LogData, k8s pod entities) must stay pure projections
    (+ explode for fan-outs): zero exchanges, zero Python evals."""
    from loongcollector_spark.operators import build_operator

    t = parquet_transcripts
    varbinds = t.select(
        F.col("turn_idx").alias("target_index"),
        F.col("conv_id").alias("target"), F.col("role").alias("field"),
        F.col("tool").alias("oid"), F.lit("").alias("conversion"),
        F.lit(4).alias("type_code"),
        F.col("text").cast("binary").alias("value_bytes"),
        F.col("turn_idx").cast("long").alias("value_num"))
    xmls = t.select(F.col("text").alias("xml"))
    logdata = t.select(
        F.col("turn_idx").cast("long").alias("timestamp"),
        F.col("role").alias("service"),
        F.col("conv_id").alias("service_instance"),
        F.col("text").alias("endpoint"), F.lit("TEXT").alias("body_type"),
        F.col("text").alias("body_text"),
        F.col("conv_id").alias("trace_id"),
        F.col("tool").alias("trace_segment_id"),
        F.col("turn_idx").cast("long").alias("span_id"),
        F.create_map(F.lit("k"), F.coalesce(F.col("text"), F.lit("")))
        .alias("tags"))
    for op_type, frame in (
        ("service_snmp", varbinds),
        ("service_wineventlog", xmls),
        ("service_skywalking", logdata),
    ):
        plan = _plan(build_operator({"Type": op_type})(frame))
        assert "Exchange" not in plan, op_type
        assert "BatchEvalPython" not in plan, op_type
        assert "ArrowEvalPython" not in plan, op_type


def test_pq_encode_is_broadcast_only(spark):
    """pq_topk's encode/ADC joins are broadcasts of one collected-array
    row; the corpus never sort-merge-joins or aggregates over text."""
    from loongcollector_spark.functions.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(pq_topk(emb, shortlist=20))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") >= 2  # encode + dtab


def test_exact_substr_trim_span_join_stays_copartitioned(spark):
    """The span-removal anti-join must plan as an equi-join on the doc id
    with the position range as residual — a BroadcastNestedLoopJoin here
    would be O(tokens x hits) across documents at scale."""
    from loongcollector_spark.functions.curation import exact_substr_trim

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id long, text string")
    plan = _plan(exact_substr_trim(docs, k=4))
    assert "BroadcastNestedLoop" not in plan
    assert "LeftAnti" in plan


def test_dsir_ratio_table_broadcasts(spark):
    """The bucket log-ratio table is the MODEL (<= n_buckets rows) and
    must broadcast to the raw feature stream, never shuffle it."""
    from loongcollector_spark.functions.classifier import dsir_scores

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "a b c")], "doc_id long, text string")
    plan = _plan(dsir_scores(docs, docs.filter("doc_id = 1"), n_buckets=64))
    assert "BroadcastExchange" in plan


def test_image_near_pairs_shuffles_bands_not_payloads(spark):
    """The media near-dup scale contract: after the Arrow decode stage,
    every exchange carries (media_id, four smallint bands) — the binary
    payload column never crosses the wire for the pair join."""
    from loongcollector_spark.functions.imagehash import (
        image_dhash, image_near_pairs,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8x"))], "media_id long, payload binary")
    plan = _plan(image_near_pairs(image_dhash(df)))
    shuffles = [ln for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln]
    assert shuffles, plan
    assert all("payload" not in ln for ln in shuffles), plan


def test_prompb_series_encode_stays_whole_stage_codegen(spark):
    """Round-5 regression pin for the bind_once/WSCG insight: a single
    CodegenFallback HOF (transform/bind_once) evicts its entire Project
    from whole-stage codegen. The staged prompb series encode must keep
    every scalar stage starred (`*(n)` prefix) with AT MOST ONE
    interpreted Project — the per-label array walk."""
    from loongcollector_spark.pbwire import prom_series_frame

    df = spark.createDataFrame(
        [("m", "a=1|b=2", 1.5, 1700000000000000000)],
        "__name__ string, __labels__ string, __value__ double, "
        "__time_nano__ long")
    plan = _plan(prom_series_frame(df))
    projects = [ln for ln in plan.splitlines() if "Project" in ln]
    interpreted = [ln for ln in projects
                   if not ln.lstrip(" +-:").startswith("*")]
    assert len(projects) >= 6, plan       # the stages survived collapse
    assert len(interpreted) <= 1, plan    # only the label HOF project


def test_otel_trace_attr_walk_not_duplicated(spark):
    """Round-5 regression pin: _attr_get must filter the resource
    attribute array ONCE per key (the old when(size(filter))>0 shape
    re-inlined the interpreted filter lambda ~13x per attribute), and
    the resource-level strings must be computed below the span Generate,
    not in the exploded-row projection."""
    from loongcollector_spark.operators.otelops import otel_trace_to_logs

    df = spark.createDataFrame(
        [(1, '{"resourceSpans":[]}')], "line_id long, content string")
    plan = _plan(otel_trace_to_logs(df, "content"))
    # 2 attr lookups (host.name, service.name) + the resource-json drop
    # filter = 3 filters over _rs.resource.attributes; allow headroom
    # but fail long before the old ~26
    assert plan.count("filter(") <= 6, plan.count("filter(")
    assert plan.count("from_json") == 1
