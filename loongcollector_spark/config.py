"""Reference-style pipeline YAML → executable Spark pipeline.

A user of the reference writes collection configs like
``test/benchmark/local/test_cases/performance_file_to_file_loongcollector/
loongcollector.yaml``::

    enable: true
    inputs:
      - Type: input_file
        FilePaths: [/path/*.log]
    processors:
      - Type: processor_parse_regex_native
        SourceKey: content
        Regex: ...
        Keys: [...]
    flushers:
      - Type: flusher_file
        FilePath: /path/test.out

This module runs THAT file shape on Spark: inputs map to the source
adapters (raw field named ``content``, reference convention),
``*_native`` type suffixes resolve to the registered factories,
processors/aggregators compile through ``build_operator`` (with its
config-key validation), and flushers through ``build_flusher``. One
YAML, one Catalyst plan per flusher.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from pyspark.sql import DataFrame, SparkSession, functions as F

from loongcollector_spark.flushers import build_flusher
from loongcollector_spark.operators import REGISTRY, build_operator


@dataclass
class PipelineConfig:
    enable: bool = True
    inputs: list = field(default_factory=list)
    processors: list = field(default_factory=list)
    aggregators: list = field(default_factory=list)
    flushers: list = field(default_factory=list)

    @classmethod
    def parse(cls, text: str) -> "PipelineConfig":
        raw = yaml.safe_load(text) or {}
        return cls(
            enable=raw.get("enable", True),
            inputs=raw.get("inputs", []),
            processors=raw.get("processors", []),
            aggregators=raw.get("aggregators", []),
            flushers=raw.get("flushers", []),
        )

    @classmethod
    def load(cls, path: str) -> "PipelineConfig":
        with open(path) as f:
            return cls.parse(f.read())


def _resolve_type(name: str) -> str:
    """Reference plugin name → registry name: the C++ natives carry a
    ``_native`` suffix the registry spells without."""
    if name in REGISTRY:
        return name
    if name.endswith("_native") and name[: -len("_native")] in REGISTRY:
        return name[: -len("_native")]
    return name  # let build_operator raise with the known-names list


def _read_input(spark: SparkSession, cfg: dict) -> DataFrame:
    from loongcollector_spark import sources

    typ = cfg["Type"]
    if typ in ("input_file", "input_static_file_onetime"):
        frames = [
            sources.input_file(
                spark, glob,
                file_encoding=cfg.get("FileEncoding", "UTF8") or "UTF8",
            )
            for glob in cfg["FilePaths"]
        ]
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        if cfg.get("Multiline"):
            # the input-level Multiline block (input-file.md: Multiline.
            # StartPattern/ContinuePattern/EndPattern/Mode) merges lines
            # per source file in offset order before processors run
            from loongcollector_spark.operators.multiline import merge_lines

            df = merge_lines(df, {
                "Multiline": cfg["Multiline"], "SourceKey": "text",
                "GroupKeys": ["_ingest_file"], "OrderKey": "_line_idx",
            })
        # reference convention: the raw field is named `content`
        return df.withColumnRenamed("text", "content")
    if typ == "input_command":
        return sources.service_command(
            spark,
            cfg["ScriptContent"],
            script_type=cfg.get("ScriptType", "bash"),
            content_encoding=cfg.get("ContentEncoding", "PlainText"),
            line_split_sep=cfg.get("LineSplitSep", "\n"),
            timeout_ms=cfg.get("TimeoutMilliSeconds", 3000),
            cmd_path=cfg.get("CmdPath"),
            environments=cfg.get("Environments"),
            ignore_error=cfg.get("IgnoreError", False),
        )
    if typ == "metric_http":
        return sources.metric_http(
            spark, cfg.get("Addresses") or ["http://localhost"],
            method=cfg.get("Method", "GET"),
            include_body=bool(cfg.get("IncludeBody")),
            timeout_s=cfg.get("ResponseTimeoutMs", 3000) / 1000,
        )
    if typ in ("service_mock", "metric_mock"):
        tags = cfg.get("Tags") or {}
        fields = cfg.get("Fields") or {}
        if cfg.get("OpenPrometheusPattern"):
            # input_mock.go:41-59 + helper.NewMetricLog (pkg/helper/
            # log_helper.go:258-290): each tick is ONE metric event
            # __name__/__time_nano__/__labels__/__value__, labels =
            # sorted tags+fields joined `k#$#v|...`, value = Index
            from pyspark.sql import functions as F

            labels = "|".join(
                f"{k}#$#{v}" for k, v in
                sorted({**tags, **{k: str(v) for k, v in fields.items()}}.items())
            )
            n = int(cfg.get("Turns", 16))
            base_nano = 1_700_000_000_000_000_000
            return spark.range(1, n + 1).select(
                F.lit("metrics_mock").alias("__name__"),
                (F.lit(base_nano) + F.col("id") * 1_000_000_000)
                .cast("string").alias("__time_nano__"),
                F.lit(labels).alias("__labels__"),
                F.col("id").cast("string").alias("__value__"),
            )
        if tags or fields:
            # the reference mock contract (input_mock.go:29-67): each
            # tick emits Tags + Fields + an incrementing Index, all as
            # string log fields; IntervalMs × run-length becomes an
            # explicit row count in batch
            from pyspark.sql import functions as F

            n = int(cfg.get("Turns", 16))
            # Go map semantics (input_mock.go:62-65): fields["Index"] is
            # set FIRST, then user Fields — a user field named Index
            # overwrites the counter
            merged = {"Index": F.col("id").cast("string")}
            merged.update({str(k): F.lit(str(v))
                           for k, v in {**tags, **fields}.items()})
            return spark.range(1, n + 1).select(
                *[e.alias(k) for k, e in merged.items()])
        return sources.service_mock(
            spark, n_turns=cfg.get("Turns", 10_000)
        ).withColumnRenamed("text", "content")
    raise KeyError(f"unsupported input type {typ!r} in this environment")


def run_config_streaming(
    spark: SparkSession,
    cfg: PipelineConfig,
    out_root: str,
    available_now: bool = True,
):
    """Continuous mode for the same YAML: the input_file glob becomes a
    file-source STREAM (new files are the tailed input), the processor
    chain applies per micro-batch (pure functions — one code path for
    batch and streaming), and each flusher writes into a ``batch=<id>``
    subdirectory with overwrite, so a replayed micro-batch is idempotent
    (the FlushOutStore redelivery posture). Returns the StreamingQuery.
    """
    if not cfg.enable:
        return None
    src = cfg.inputs[0]
    if src["Type"] not in ("input_file", "input_static_file_onetime"):
        raise KeyError(f"streaming input {src['Type']!r} unsupported here")

    multiline = src.get("Multiline")

    def read_glob(glob: str) -> DataFrame:
        enc = (src.get("FileEncoding", "UTF8") or "UTF8").upper()
        enc = enc.replace("-", "").replace("_", "")
        if enc not in ("", "UTF8"):
            # same decode-in-the-scan trick as the batch reader
            # (sources.input_file): csv with a control-char separator
            # degenerates to "text with charset"
            from loongcollector_spark.sources import _ENCODINGS

            charset = _ENCODINGS.get(enc)
            if charset is None:
                raise ValueError(f"unsupported FileEncoding {enc!r}")
            if charset == "GBK":
                spark.conf.set("spark.sql.legacy.javaCharsets", "true")
            out = (spark.readStream.format("csv")
                   .schema("content string")
                   .option("encoding", charset).option("lineSep", "\n")
                   .option("sep", "\x01").option("quote", "\x00")
                   .load(glob))
            text = F.regexp_replace(
                F.coalesce(F.col("content"), F.lit("")), "\r$", "")
        else:
            reader = spark.readStream.format("text")
            if multiline:
                # one row per WHOLE file: the file is the streaming unit,
                # so line order within it is exact (posexplode below) and
                # the BATCH merge_lines code path applies verbatim — no
                # cross-batch state, no order caveats. NOTE: must go
                # through format().load() — reader.text(path) RESETS
                # wholetext to its False default over a prior option()
                reader = reader.option("wholetext", "true")
            out = reader.load(glob)
            text = F.col("value")
        cols = [text.alias("content")]
        if multiline:
            # _metadata is a hidden scan column — it must be selected
            # HERE, before projections/unions make it unresolvable
            cols.append(F.col("_metadata.file_path").alias("_ingest_file"))
        return out.select(*cols)

    # ALL FilePaths globs — the batch twin unions them; dropping all but
    # the first would silently never ingest the other globs
    globs = src["FilePaths"]
    stream = read_glob(globs[0])
    for g in globs[1:]:
        stream = stream.unionByName(read_glob(g))
    def merge_multiline_batch(bdf: DataFrame) -> DataFrame:
        """Runs inside foreachBatch (batch context): whole-file blobs →
        lines via posexplode (exact per-file order) → the SAME merge_lines
        helper the batch reader uses. A trailing newline's empty last
        element is dropped; interior blank lines are kept (Hadoop line-
        reader parity)."""
        from loongcollector_spark.operators.multiline import merge_lines

        arr = F.split(F.col("content"), "\n")
        arr = F.when(
            (F.size(arr) > 0) & (F.element_at(arr, -1) == ""),
            F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        ).otherwise(arr)
        lines = bdf.select(
            "_ingest_file",
            F.posexplode(arr).alias("_line_idx", "text"),
        )
        merged = merge_lines(lines, {
            "Multiline": multiline, "SourceKey": "text",
            "GroupKeys": ["_ingest_file"], "OrderKey": "_line_idx",
        })
        return merged.select(F.col("text").alias("content"))

    ops = ([merge_multiline_batch] if multiline else []) + [
        build_operator({**proc, "Type": _resolve_type(proc["Type"])})
        for proc in cfg.processors + cfg.aggregators
    ]
    flusher_cfgs = list(cfg.flushers)

    def process_batch(bdf: DataFrame, batch_id: int) -> None:
        for op in ops:
            bdf = op(bdf)
        bdf = bdf.persist()
        try:
            for fcfg in flusher_cfgs:
                per_batch = dict(fcfg)
                for key in ("FilePath", "Path"):
                    if key in per_batch:
                        per_batch[key] = f"{per_batch[key]}/batch={batch_id}"
                build_flusher(per_batch)(bdf)
        finally:
            bdf.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{out_root}/_checkpoint")
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_config(spark: SparkSession, cfg: PipelineConfig,
               df: DataFrame | None = None) -> DataFrame | None:
    """Execute a pipeline config. ``df`` overrides the inputs section
    (test hook). Returns the final transformed frame (also handed to
    every flusher)."""
    if not cfg.enable:
        return None
    if df is None:
        frames = [_read_input(spark, i) for i in cfg.inputs]
        if not frames:
            raise ValueError("pipeline config has no inputs and no df")
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)

    for proc in cfg.processors + cfg.aggregators:
        op = build_operator({**proc, "Type": _resolve_type(proc["Type"])})
        df = op(df)

    if len(cfg.flushers) > 1:
        # fan-out: persist once so N flushers don't recompute the full
        # input scan + processor chain N times (the streaming twin already
        # persists per micro-batch); left cached for the returned frame —
        # Spark evicts LRU, and the common CLI path stops the session next
        df = df.persist()
    for flusher in cfg.flushers:
        build_flusher(flusher)(df)
    return df
