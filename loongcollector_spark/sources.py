"""Source adapters — the input-plugin layer.

Maps the reference's input configs onto Spark readers. The reference
guarantees per-file event order via sequential reads + file offsets
(core/file_server/reader/LogFileReader.h:158-231); the Spark contract is
the explicit (conv_id, turn_idx) sort instead, so every adapter just
needs to deliver rows + provenance columns.

| Reference input | Adapter | Citation |
|---|---|---|
| input_file (tail, glob, multiline) | ``input_file`` batch glob read + optional line split/multiline merge via the operator registry; streaming twin in streaming.py | core/plugin/input/InputFile.h:47-50 |
| input_static_file_onetime | ``input_static_file`` (one-shot bounded) | core/plugin/input/InputStaticFile.h |
| service_kafka | ``service_kafka`` → spark.read/readStream format("kafka") | plugins/input/kafka |
| service_mysql/pgsql/mssql | ``service_jdbc`` → JDBC with partitioned reads | plugins/input/mysql etc. |
| metric_mock / service_mock | ``service_mock`` → rate source / seeded generator | plugins/input/mock |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


# FileReaderOptions.h:30-34 Encoding {UTF8, UTF16, GBK}; the C++ side
# converts to UTF-8 via common/EncodingConverter before processing. Here
# the decode happens JVM-side in the scan: the csv reader is the one
# file source with a charset option, and with a control-char separator,
# quoting disabled and an explicit single-column schema it degenerates
# to "text with charset". UTF16 means little-endian (the Windows
# convention the reference's converter targets); a leading BOM is
# stripped. Caveats vs a byte-exact converter: a \x01 byte inside a
# GBK/UTF16 line truncates that line at the separator, and a UTF-16
# code unit pair that happens to spell 0x0A across two characters can
# false-split — both are absent from real text logs.
_ENCODINGS = {"UTF16": "UTF-16LE", "UTF16LE": "UTF-16LE",
              "UTF16BE": "UTF-16BE", "GBK": "GBK"}


def input_file(
    spark: SparkSession,
    path_glob: str,
    fmt: str = "text",
    multiline_start_rx: str | None = None,
    with_provenance: bool = True,
    file_encoding: str = "UTF8",
) -> DataFrame:
    """Glob file read with provenance columns. ``_ingest_file`` +
    ``_line_idx`` stand in for the reference's (file path, offset)
    metadata (EventGroupMetaKey LOG_FILE_PATH/LOG_FILE_OFFSET). With a
    multiline start regex, continuation lines merge onto their record
    (the LogFileReader multiline state machine as sessionization).
    ``file_encoding`` maps FileReaderOptions.h:30-34 (UTF8/UTF16/GBK).

    A ``**`` path segment means any-depth recursion (the reference's
    MaxDirSearchDepth wildcard, input-file.md): Hadoop globs have no
    recursive ``**``, so it becomes ``recursiveFileLookup`` from the
    glob's base directory with the basename as ``pathGlobFilter``."""
    # the multiline merge groups on _ingest_file and orders by _line_idx —
    # it REQUIRES provenance; honor with_provenance=False by attaching the
    # columns internally and dropping them after the merge instead of
    # failing at first action with an unresolved-column error
    drop_provenance_after_merge = (
        multiline_start_rx is not None and fmt == "text" and not with_provenance
    )
    if drop_provenance_after_merge:
        with_provenance = True
    read_opts: dict[str, str] = {}
    if "**" in path_glob:
        base, _, rest = path_glob.partition("**")
        basename = rest.rsplit("/", 1)[-1]
        if "/" in rest.strip("/"):
            raise ValueError(
                "input_file: '**' is only supported as the final directory "
                f"wildcard (got {path_glob!r})"
            )
        path_glob = base or "."
        read_opts = {"recursiveFileLookup": "true"}
        if basename:
            read_opts["pathGlobFilter"] = basename
    enc = file_encoding.upper().replace("-", "").replace("_", "")
    if fmt == "text" and enc not in ("", "UTF8"):
        charset = _ENCODINGS.get(enc)
        if charset is None:
            raise ValueError(
                f"input_file: unsupported FileEncoding {file_encoding!r} "
                f"(one of UTF8/UTF16/UTF16BE/GBK)"
            )
        if charset == "GBK":
            # Spark 4 whitelists csv charsets; GBK needs the documented
            # escape hatch (SPARK-46115). Session-level, set once.
            spark.conf.set("spark.sql.legacy.javaCharsets", "true")
        df = (
            spark.read.format("csv")
            .schema("text string")
            .option("encoding", charset)
            .option("lineSep", "\n")
            .option("sep", "\x01")
            .option("quote", "\x00")
            .option("header", False)
            .options(**read_opts)
            .load(path_glob)
        )
        # parity with the UTF-8 text source (Hadoop's line reader):
        # swallow a CRLF's trailing \r; strip a leading BOM (UTF-16
        # files conventionally carry one, and only the first decoded
        # line of a file can start with it)
        text = F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "\r$", "")
        if charset.startswith("UTF-16"):
            text = F.regexp_replace(text, "^﻿", "")
        keep = ["_metadata"] if with_provenance else []
        df = df.select(text.alias("text"), *keep)
    elif fmt == "text":
        df = (spark.read.options(**read_opts).text(path_glob)
              .withColumnRenamed("value", "text"))
    else:
        df = spark.read.options(**read_opts).format(fmt).load(path_glob)
    if with_provenance:
        if fmt == "text":
            # Per-file line index WITHOUT a per-file window (a window
            # partitioned on the file name collapses each file into one
            # task — a single 100 GB file becomes the straggler). Text
            # splits are parallel blocks; within a Spark partition each
            # block's rows are contiguous and in file order, so:
            #   line_idx = (rows in earlier blocks of the file)
            #            + (row position within this block)
            # The per-block row counts are a TINY aggregate (one row per
            # block) broadcast-joined back — two scans of the input
            # instead of shuffling every row into one task per file.
            from pyspark.sql import Window

            df = df.select(
                "text",
                F.col("_metadata.file_path").alias("_ingest_file"),
                F.col("_metadata.file_block_start").alias("_block"),
            ).withColumn("_mid", F.monotonically_increasing_id())
            blocks = df.groupBy("_ingest_file", "_block").agg(
                F.count("*").alias("_bn"), F.min("_mid").alias("_mid0")
            )
            wb = (
                Window.partitionBy("_ingest_file")
                .orderBy("_block")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            blocks = blocks.withColumn(
                "_prior", F.coalesce(F.sum("_bn").over(wb), F.lit(0))
            )
            df = (
                df.join(F.broadcast(blocks), ["_ingest_file", "_block"])
                .withColumn(
                    "_line_idx",
                    (F.col("_prior") + F.col("_mid") - F.col("_mid0")).cast("long"),
                )
                .select("text", "_ingest_file", "_line_idx")
            )
        else:
            df = df.withColumn("_ingest_file", F.input_file_name())
    if multiline_start_rx and fmt == "text":
        from loongcollector_spark.operators import build_operator

        merge = build_operator({
            "Type": "processor_merge_multiline_log",
            "StartPattern": multiline_start_rx,
            "SourceKey": "text",
            "GroupKeys": ["_ingest_file"],
            "OrderKey": "_line_idx",
        })
        df = merge(df.withColumn("ts", F.lit(None).cast("timestamp")))
        if drop_provenance_after_merge:
            df = df.drop("_ingest_file", "_line_idx")
    return df


def input_static_file(spark: SparkSession, path_glob: str, fmt: str = "parquet") -> DataFrame:
    """One-shot bounded scan (input_static_file_onetime)."""
    return spark.read.format(fmt).load(path_glob)


def input_debug_file(
    spark: SparkSession, path_glob: str,
    field_name: str = "content", line_limit: int = 1000,
) -> DataFrame:
    """input_debug_file (plugins/input/debugfile/input_debug_file.go:
    31-91): read each matched file once, keep the first ``LineLimit``
    lines (default 1000), and emit ONE log per file with the joined
    lines under ``FieldName`` (default the body key ``content``).
    Per-file line selection rides the provenance index from
    ``input_file``; the join-up is one per-file aggregation."""
    lines = input_file(spark, path_glob, with_provenance=True)
    kept = lines.filter(F.col("_line_idx") < int(line_limit))
    joined = (
        kept.groupBy("_ingest_file")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("_line_idx").alias("i"),
                    F.col("text").alias("t")))),
                lambda s: s["t"]),
            "\n").alias(field_name))
    )
    return joined.select(
        F.col("_ingest_file").alias("_source_file"), field_name)


def service_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str,
    streaming: bool = True,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka source (service_kafka / flusher_kafka round-trip peer).
    Requires the spark-sql-kafka package on the cluster — the adapter
    only owns the option mapping, value decode, and provenance columns."""
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    df = (
        reader.option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return kafka_records_projection(df)


def kafka_records_projection(df: DataFrame) -> DataFrame:
    """The kafka-source → log-row projection, factored out so the
    in-process broker model (``kafka_fake.records_frame``) behavior-tests
    it without a broker: value → text, (topic, partition, offset) →
    provenance columns with the per-partition offset as ``_line_idx``."""
    return df.select(
        F.col("value").cast("string").alias("text"),
        F.col("topic").alias("_ingest_topic"),
        F.col("partition").alias("_ingest_partition"),
        F.col("offset").alias("_line_idx"),
        F.col("timestamp").alias("ts"),
    )


# input_command (plugins/input/command/input_command.go:37-46,175-230;
# command_const.go:17-52): run a user script, split stdout, one log per
# line with the script-content md5 attached.
_SCRIPT_TYPES = {"bash": ("sh", "/bin/bash"), "shell": ("sh", "/bin/sh"),
                 "python3": ("py", "python3")}


def service_command(
    spark: SparkSession,
    script_content: str,
    script_type: str = "bash",
    content_encoding: str = "PlainText",
    line_split_sep: str = "\n",
    timeout_ms: int = 3000,
    cmd_path: str | None = None,
    environments: list[str] | None = None,
    ignore_error: bool = False,
) -> DataFrame:
    """input_command twin: acquisition is agent-side in the reference
    and driver-side here (one bounded exec per trigger — the DATA never
    routes through Python row-at-a-time; the captured stdout becomes a
    parallelized frame the pipeline processes like any other source).
    Emits (content, script_md5, ts); stdout splits on LineSplitSep, the
    reference's (content, script_md5) per-line contract."""
    import base64
    import hashlib
    import os
    import subprocess
    import tempfile

    if script_type not in _SCRIPT_TYPES:
        raise ValueError(
            f"service_command: ScriptType {script_type!r} not in "
            f"{sorted(_SCRIPT_TYPES)} (python2 is not present here)"
        )
    if content_encoding not in ("PlainText", "Base64"):
        raise ValueError(
            f"service_command: ContentEncoding {content_encoding!r} "
            "(PlainText|Base64)"
        )
    if content_encoding == "Base64":
        script_content = base64.b64decode(script_content).decode("utf-8")
    md5 = hashlib.md5(script_content.encode("utf-8")).hexdigest()
    suffix, default_cmd = _SCRIPT_TYPES[script_type]
    env = dict(os.environ)
    for pair in environments or []:
        k, _, v = pair.partition("=")
        env[k] = v
    with tempfile.NamedTemporaryFile("w", suffix=f".{suffix}", delete=False) as f:
        f.write(script_content)
        path = f.name
    try:
        proc = subprocess.run(
            [cmd_path or default_cmd, path],
            capture_output=True, text=True, env=env,
            timeout=timeout_ms / 1000.0,
        )
        failed = proc.returncode != 0
        stdout, stderr = proc.stdout, proc.stderr
    except subprocess.TimeoutExpired as e:
        failed, stdout = True, (e.stdout or b"").decode("utf-8", "replace")
        stderr = f"killed after {timeout_ms} ms"
    finally:
        os.unlink(path)
    if failed:
        if not ignore_error:
            raise RuntimeError(
                f"service_command: exec failed, stderr:{stderr!r} "
                f"stdout:{stdout!r}"
            )
        lines = []  # reference alarms and emits nothing on error
    else:
        lines = stdout.split(line_split_sep) if line_split_sep else [stdout]
    df = spark.createDataFrame(
        [(line, md5) for line in lines], "content string, script_md5 string"
    )
    return df.withColumn("ts", F.current_timestamp())


def service_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options,
) -> DataFrame:
    """JDBC source (service_mysql/pgsql/mssql/canal-snapshot). Partitioned
    reads when a numeric partition column is given — the scale path; an
    unpartitioned JDBC read is a single-task scan."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound if lower_bound is not None else 0)
            .option("upperBound", upper_bound if upper_bound is not None else 1 << 31)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def service_mock(
    spark: SparkSession,
    n_turns: int = 10_000,
    streaming: bool = False,
    rows_per_second: int = 1000,
) -> DataFrame:
    """Mock source (service_mock / metric_mock): seeded transcript
    generator in batch, rate source shaped to the transcript schema in
    streaming."""
    if not streaming:
        from loongcollector_spark.datagen import gen_transcripts

        return gen_transcripts(spark, n_turns=n_turns, n_convs=max(n_turns // 10, 1))
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(
        F.concat(F.lit("conv_"), F.lpad((F.col("value") % 1000).cast("string"), 8, "0")).alias("conv_id"),
        (F.col("value") / 1000).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("system")),
            (F.col("value") % 4 + 1).cast("int"),
        ).alias("role"),
        F.concat(F.lit("mock text "), F.col("value").cast("string")).alias("text"),
        F.lit("").alias("tool"),
        F.col("timestamp").alias("ts"),
    )


def metric_http(
    spark: SparkSession,
    addresses: list[str],
    method: str = "GET",
    include_body: bool = False,
    timeout_s: float = 3.0,
    prober=None,
) -> DataFrame:
    """metric_http availability-probe input (plugins/input/http/
    input_http.go): one log per probed address with the reference's
    field contract — ``_method_`` (tag), ``_address_``, ``_result_``
    (success / timeout / connection_failed), ``_http_response_code_``,
    ``_response_time_ms_`` (fixed 3-decimal format, :253), plus
    ``content`` when ``IncludeBody``.

    Probing is control-plane work (a handful of endpoints on a fixed
    interval), so it runs driver-side and the results parallelize —
    the same place the reference's poller lives. ``prober(address) ->
    (result, status_code, elapsed_ms, body)`` injects the transport;
    the default uses urllib and degrades to ``connection_failed`` rows
    when the sandbox has no egress.
    """
    import socket
    import time as _t
    import urllib.error
    import urllib.request

    def default_probe(addr):
        t0 = _t.monotonic()
        try:
            req = urllib.request.Request(addr, method=method)
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read().decode("utf-8", "replace")
                return ("success", resp.status,
                        (_t.monotonic() - t0) * 1000, body)
        except socket.timeout:
            return ("timeout", 0, (_t.monotonic() - t0) * 1000, "")
        except (urllib.error.URLError, OSError) as e:
            # connect-phase timeouts arrive wrapped: urllib raises
            # URLError(reason=TimeoutError) for a dropped SYN, which the
            # socket.timeout arm above never sees — classify by the
            # wrapped reason so both phases report 'timeout' like the
            # reference's client-timeout status (input_http.go)
            reason = getattr(e, "reason", e)
            if isinstance(reason, (socket.timeout, TimeoutError)):
                return ("timeout", 0, (_t.monotonic() - t0) * 1000, "")
            return ("connection_failed", 0, (_t.monotonic() - t0) * 1000, "")

    probe = prober or default_probe
    rows = []
    for addr in addresses:
        result, code, ms, body = probe(addr)
        row = {
            "_method_": method,
            "_address_": addr,
            "_result_": result,
            "_http_response_code_": str(int(code)),
            "_response_time_ms_": f"{ms:.3f}",
        }
        if include_body:
            row["content"] = body
        rows.append(row)
    cols = ["_method_", "_address_", "_result_", "_http_response_code_",
            "_response_time_ms_"] + (["content"] if include_body else [])
    return spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in rows],
        ", ".join(f"`{c}` string" for c in cols),
    )


def service_rdb(
    spark: SparkSession,
    url: str,
    statement: str,
    checkpoint_column: str | None = None,
    checkpoint_value: str | None = None,
    checkpoint_type: str = "int",
    max_sync_size: int = 0,
    num_partitions: int = 8,
    **options,
) -> DataFrame:
    """Checkpointed RDB sync (plugins/input/rdb/rdb.go:218-279, the
    service_mysql/pgsql/mssql statement mode): ``StateMent`` carries a
    ``?`` placeholder bound to the saved checkpoint; rows past the
    checkpoint are collected and the checkpoint advances to the max of
    ``CheckPointColumn``.

    Spark shape: the bound statement becomes a JDBC *subquery* dbtable —
    the WHERE reaches the database, not Spark — partitioned on the
    checkpoint column when numeric (each executor reads one key range;
    the reference's LIMIT-OFFSET paging loop is a single-connection
    cursor, which is exactly the non-scalable part this replaces).
    ``MaxSyncSize`` caps the batch like the reference's break. Use
    :func:`rdb_checkpoint` on the result to get the value to persist."""
    bound = statement
    import re as _re

    # mysql/mssql drivers use `?`, pgsql uses `$1` (rdb.go binds one
    # checkpoint param either way)
    has_ph = "?" in statement or _re.search(r"\$\d+", statement)
    if has_ph:
        if checkpoint_value is None:
            raise ValueError("statement has a ? placeholder but no "
                             "checkpoint value (CheckPointStart)")
        literal = (str(int(checkpoint_value))
                   if checkpoint_type in ("int", "long")
                   else "'" + str(checkpoint_value).replace("'", "''") + "'")
        if "?" in statement:
            bound = statement.replace("?", literal, 1)
        else:
            bound = _re.sub(r"\$\d+", literal, statement, count=1)
    reader = (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", f"({bound}) sync_q")
    )
    if checkpoint_column and checkpoint_type in ("int", "long"):
        lo = int(checkpoint_value or 0)
        reader = (
            reader.option("partitionColumn", checkpoint_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lo)
            .option("upperBound", max(lo + 1, 1 << 31))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    if max_sync_size and max_sync_size > 0:
        # keep the LOWEST checkpoint keys (TakeOrdered, not an arbitrary
        # limit) so max(checkpoint_column) over the batch never skips an
        # unread row — the ordered-paging invariant of the reference loop
        if checkpoint_column:
            df = df.orderBy(checkpoint_column)
        df = df.limit(int(max_sync_size))
    return df


def rdb_checkpoint(df: DataFrame, checkpoint_column: str) -> str | None:
    """The post-batch checkpoint (rdb.go:281-299 SaveCheckPoint): the max
    of the checkpoint column in the collected batch, as a string; None
    when the batch was empty (checkpoint unchanged)."""
    row = df.agg(F.max(checkpoint_column).alias("cp")).first()
    return None if row["cp"] is None else str(row["cp"])


_WARC_SCHEMA = (
    "path string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, record_id string, content_length long, "
    "headers map<string,string>, payload binary, _parse_ok boolean"
)


def read_warc(
    spark: SparkSession,
    paths: str | list[str],
    record_types: list[str] | None = None,
) -> DataFrame:
    """WARC/WET/WAT archive reader (ISO 28500, the CommonCrawl container
    — the landed form of a web-scale training-data crawl). Each archive
    file is one task (the CC layout: ~1 GB archives, thousands of files
    per snapshot — file-level parallelism is the production partitioning;
    a 100 TB snapshot is ~100k independent tasks, no shuffle anywhere).

    The walk is LENGTH-FRAMED, never delimiter-split: a record is
    ``WARC/1.x\\r\\n`` + header lines + ``\\r\\n\\r\\n`` + exactly
    ``Content-Length`` payload bytes + ``\\r\\n\\r\\n`` — so payloads
    containing blank lines or binary data parse correctly (the reason
    naive line-splitting breaks on real crawl data). Gzip archives
    (.warc.gz, one gzip member per record as CC ships them — or one
    member for the whole file) are inflated with a multi-member zlib
    loop. A malformed tail emits one ``_parse_ok=false`` marker row
    instead of failing the task.

    ``record_types`` filters on WARC-Type (e.g. ["response"],
    ["conversion"] for WET) — applied inside the walker so skipped
    payloads never materialize into Arrow.
    """
    from collections.abc import Iterator

    import pandas as pd

    want = {t.lower() for t in record_types} if record_types else None

    def _inflate(data: bytes) -> bytes:
        import zlib

        if not data.startswith(b"\x1f\x8b"):
            return data
        out, pos = [], 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=31)
            out.append(d.decompress(data[pos:]))
            tail = d.unused_data
            if not tail:
                break
            pos = len(data) - len(tail)
        return b"".join(out)

    def _walk(path: str, data: bytes):
        pos, idx, n = 0, 0, len(data)
        while pos < n:
            # tolerate inter-record padding
            while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
                pos += 1
            if pos >= n:
                return
            hdr_end = data.find(b"\r\n\r\n", pos)
            if not data.startswith(b"WARC/", pos) or hdr_end < 0:
                yield (path, idx, "", "", "", "", -1, {}, None, False)
                return
            headers: dict[str, str] = {}
            lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
            for line in lines[1:]:
                k, _, v = line.partition(":")
                if _:
                    headers[k.strip().lower()] = v.strip()
            try:
                cl = int(headers["content-length"])
            except (KeyError, ValueError):
                yield (path, idx, "", "", "", "", -1, {}, None, False)
                return
            body_start = hdr_end + 4
            if body_start + cl > n:
                yield (path, idx, "", "", "", "", -1, {}, None, False)
                return
            wtype = headers.get("warc-type", "")
            if want is None or wtype.lower() in want:
                yield (
                    path, idx, wtype,
                    headers.get("warc-target-uri", ""),
                    headers.get("warc-date", ""),
                    headers.get("warc-record-id", ""),
                    cl, headers, data[body_start:body_start + cl], True,
                )
            idx += 1
            pos = body_start + cl

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["path", "record_idx", "warc_type", "target_uri",
                "warc_date", "record_id", "content_length", "headers",
                "payload", "_parse_ok"]
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_walk(path, _inflate(bytes(content))))
            yield pd.DataFrame(rows, columns=cols)

    bf = spark.read.format("binaryFile").load(paths).select("path", "content")
    return bf.mapInPandas(batches, _WARC_SCHEMA)


_LUMBER_SCHEMA = (
    "record_idx int, seq long, version string, content string, "
    "fields map<string,string>, _parse_ok boolean"
)


def lumberjack_events(df: DataFrame, source_col: str = "content") -> DataFrame:
    """Lumberjack (beats) wire-protocol decoder — the batch form of
    ``service_lumberjack`` (plugins/input/lumberjack/input_lumberjack.go:
    139-160; framing per the public elastic/go-lumber protocol). Each
    input row's binary blob is one client batch:

    - ``'2' 'J'`` seq:uint32BE len:uint32BE payload — v2 JSON frame; the
      reference's rawJSONDecoder keeps the payload as ONE raw string and
      emits it under the ``content`` key (input_lumberjack.go:40-48,146),
      so ``content`` is the undecoded JSON text here too.
    - ``'1' 'D'`` seq:uint32BE n:uint32BE then n × (klen,key,vlen,value)
      — v1 data frame; the k/v map lands in ``fields`` (AddData parity).
    - ``'W'`` size:uint32BE — window announcement, consumed (no event).
    - ``'C'`` len:uint32BE payload — zlib-DEFLATE block of concatenated
      frames, inflated and walked recursively (both versions).
    - ``'A'`` is server→client and never appears in ingest.

    A malformed frame emits one ``_parse_ok=false`` marker row and stops
    that blob (framing is lost beyond it). Arrow-batched ``mapInPandas``;
    blobs never shuffle and decode one task per input partition.
    """
    import struct as _struct
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    def _walk(data: bytes, idx_start: int):
        pos, n, idx = 0, len(data), idx_start
        while pos < n:
            if pos + 2 > n:
                yield (idx, -1, "", None, None, False)
                return
            version = chr(data[pos])
            code = chr(data[pos + 1])
            pos += 2
            if version not in ("1", "2"):
                yield (idx, -1, "", None, None, False)
                return
            if code == "W":
                if pos + 4 > n:
                    yield (idx, -1, version, None, None, False)
                    return
                pos += 4
            elif code == "C":
                if pos + 4 > n:
                    yield (idx, -1, version, None, None, False)
                    return
                (clen,) = _struct.unpack_from(">I", data, pos)
                pos += 4
                if pos + clen > n:
                    yield (idx, -1, version, None, None, False)
                    return
                try:
                    inner = zlib.decompress(data[pos:pos + clen])
                except zlib.error:
                    yield (idx, -1, version, None, None, False)
                    return
                for row in _walk(inner, idx):
                    yield row
                    idx += 1
                pos += clen
            elif code == "J":
                if pos + 8 > n:
                    yield (idx, -1, version, None, None, False)
                    return
                seq, plen = _struct.unpack_from(">II", data, pos)
                pos += 8
                if pos + plen > n:
                    yield (idx, seq, version, None, None, False)
                    return
                yield (idx, seq, version,
                       data[pos:pos + plen].decode("utf-8", "replace"),
                       None, True)
                idx += 1
                pos += plen
            elif code == "D":
                if pos + 8 > n:
                    yield (idx, -1, version, None, None, False)
                    return
                seq, cnt = _struct.unpack_from(">II", data, pos)
                pos += 8
                fields = {}
                ok = True
                for _ in range(cnt):
                    if pos + 4 > n:
                        ok = False
                        break
                    (klen,) = _struct.unpack_from(">I", data, pos)
                    pos += 4
                    key = data[pos:pos + klen].decode("utf-8", "replace")
                    pos += klen
                    if pos + 4 > n:
                        ok = False
                        break
                    (vlen,) = _struct.unpack_from(">I", data, pos)
                    pos += 4
                    fields[key] = data[pos:pos + vlen].decode("utf-8", "replace")
                    pos += vlen
                if not ok:
                    yield (idx, seq, version, None, None, False)
                    return
                yield (idx, seq, version, None, fields, True)
                idx += 1
            else:
                yield (idx, -1, version, None, None, False)
                return

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["record_idx", "seq", "version", "content", "fields",
                "_parse_ok"]
        for pdf in it:
            rows = []
            for blob in pdf[source_col]:
                if blob is None:  # null blob = no batch, not a wire error
                    continue
                rows.extend(_walk(bytes(blob), 0))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(source_col).mapInPandas(batches, _LUMBER_SCHEMA)
