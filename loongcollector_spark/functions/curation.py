"""Training-corpus curation operators: benchmark decontamination,
deterministic stratified sampling, and token-budget sequence packing.

These are the steps between "parsed documents" and "training shards" in
an LLM data pipeline; like the dedup family they are pure codegen
expressions with engine-portable integer/hex arithmetic so a DuckDB
oracle reproduces every value byte-for-byte.

Scale posture (100 TB corpus):

* decontamination — real benchmark suites are tiny (10^5..10^6 n-grams),
  so the gram join BROADCASTS the benchmark side: the corpus is never
  shuffled, contamination is decided inside the scan stage;
* rate sampling — a pure filter on an md5 prefix, no shuffle at all, and
  deterministic under retries (no ``rand()``: a re-run of a failed task
  keeps the same rows);
* quota sampling — one shuffle keyed by stratum; per-stratum windows are
  the documented skew point, quota strata are user-chosen and few;
* packing — a per-group running sum (Spark's two-pass window: partial
  sums per partition + offset broadcast), shuffling (group, id, count)
  only, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _norm_words(text_col):
    """lowercase, whitespace-collapsed word array (shared with the
    DuckDB oracle: string_split(regexp_replace(lower(trim(..)),
    '\\s+', ' ', 'g'), ' '))."""
    return F.split(
        F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " "
    )


def ngram_hash_frame(df: DataFrame, n: int = 5, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, gram_hash) — distinct md5 hashes of the word n-grams of each
    document; documents shorter than ``n`` words contribute their whole
    normalized text as one gram (the MinHash shingle fallback contract).
    Null/empty documents contribute nothing.

    The word array is materialized in its own projection FIRST: a raw
    split() captured inside the transform lambda re-evaluates the whole
    normalize+split per gram (O(words²) per doc — the dup_ngram_stats
    lesson; measured 4.4 s → 0.6 s on 5k docs × ~50 grams at sf0.1)."""
    words = F.col("_words")
    nw = F.size(words)
    grams = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - n + 1),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(words, " ")))
    return (
        df.filter(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
        .select(F.col(id_col), _norm_words(F.col(text_col)).alias("_words"))
        .select(F.col(id_col), F.explode(grams).alias("_g"))
        .select(id_col, F.md5(F.col("_g").cast("binary")).alias("gram_hash"))
        .distinct()
    )


def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: int = 5,
                  text_col: str = "text", id_col: str = "doc_id",
                  broadcast_benchmark: bool = True) -> DataFrame:
    """Benchmark decontamination (the n-gram-overlap check every serious
    pretraining pipeline runs before training — e.g. GPT-3 appendix C /
    Gopher §A2: drop or flag training documents sharing n-grams with the
    evaluation set).

    Returns one row per corpus document: ``n_hit_grams`` = how many
    distinct n-gram hashes it shares with the benchmark set, and
    ``contaminated`` = (n_hit_grams > 0). Documents with null/empty text
    score 0 hits.

    The benchmark gram set is broadcast by default (eval suites are
    tiny); pass ``broadcast_benchmark=False`` only when decontaminating
    against something corpus-sized, which turns this into a hash-keyed
    shuffle join.
    """
    grams = ngram_hash_frame(corpus, n, text_col, id_col)
    bench = ngram_hash_frame(benchmark, n, text_col, id_col).select(
        "gram_hash"
    ).distinct()
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    hits = grams.join(bench, "gram_hash").groupBy(id_col).agg(
        F.count("*").alias("n_hit_grams")
    )
    ids = corpus.select(id_col)
    return ids.join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_hit_grams"), F.lit(0)).cast("int")
        .alias("n_hit_grams"),
        (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0).alias("contaminated"),
    )


def _hash4(id_col: str):
    """First 4 hex chars of md5(id) — a uniform draw over [0, 65536)
    both engines compute identically; string comparison against a 4-char
    hex cutoff is the portable 'u < rate' test."""
    return F.substring(
        F.md5(F.col(id_col).cast("string").cast("binary")), 1, 4
    )


def rate_cutoff_hex(rate: float) -> str:
    """rate in [0,1] → the hex cutoff ``hash4 < cutoff`` keeps; 'g'
    sorts after every hex digit, so rate ≥ 1 keeps everything."""
    if rate >= 1.0:
        return "g"
    # cap at 0xffff: rates rounding to 65536 would format as the 5-char
    # '10000', which compares BELOW most 4-char hashes and keeps ~6%
    return format(min(int(round(rate * 65536)), 0xFFFF), "04x")


def stratified_sample(df: DataFrame, strata_col: str = "source",
                      rates: dict | None = None,
                      default_rate: float = 0.1,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum rate sampling + in-stratum rank.

    Each row draws ``hash4`` = first 4 hex chars of md5(id) — uniform,
    reproducible, retry-stable (never ``rand()``, which resamples on
    task retry and breaks exactly-once sinks). A row is kept iff
    ``hash4 < cutoff(rate of its stratum)``; ``sample_rank`` is the
    row's 1-based position within its stratum ordered by (hash4, id),
    so a downstream quota cut is ``sample_rank <= K`` — the same frame
    serves both rate- and quota-sampling.

    The rate filter itself needs no shuffle (it runs inside the scan);
    only the rank column costs a per-stratum window. That window holds a
    stratum's SAMPLED rows in one partition — fine for quota cuts on
    bounded samples; when a single stratum's sample is itself huge,
    skip the rank and cut by tightening the hash cutoff instead
    (hash4 < cutoff(K/N_stratum)), which stays scan-local.
    """
    rates = rates or {}
    h = _hash4(id_col)
    cutoff = F.lit(rate_cutoff_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        cutoff = F.when(
            F.col(strata_col) == stratum, F.lit(rate_cutoff_hex(rate))
        ).otherwise(cutoff)
    return (
        df.withColumn("_h4", h)
        .filter(F.col("_h4") < cutoff)
        .withColumn("sample_rank", F.row_number().over(
            Window.partitionBy(strata_col)
            .orderBy(F.col("_h4").asc(), F.col(id_col).asc())))
        .drop("_h4")
    )


def pack_assignments(df: DataFrame, budget: int = 256,
                     group_col: str = "source", order_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Token-budget packing: assign documents, in deterministic
    ``order_col`` order within each ``group_col``, to fixed-size token
    bins of ``budget`` tokens — the shard/sequence assignment step that
    turns a curated corpus into training shards.

    ``bin_id`` = floor(exclusive-running-token-sum / budget) and
    ``bin_offset`` = that sum mod budget: a document starts writing at
    ``bin_offset`` of ``bin_id`` and long documents straddle bins
    (concat-and-chunk packing, the standard pretraining layout — not
    first-fit, which is order-unstable under parallel retry).

    Null/empty documents count 0 tokens. The running sum is Spark's
    two-pass window (per-partition partials + offsets); the shuffle
    carries (group, order, token count) only. A group's rows land in
    one window partition — the prefix sum is inherently sequential per
    packing stream — so at corpus scale the knob is the granularity of
    ``group_col`` itself: pre-split a giant source into parallel
    streams with a deterministic hash prefix (e.g. ``concat(source,
    '_', pmod(xxhash64(doc_id), 64))``) and each stream packs
    independently.
    """
    t = F.col(text_col)
    n_tokens = F.when(
        F.trim(F.coalesce(t, F.lit(""))) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim(t), r"\s+"))).cast("long")
    w = (
        Window.partitionBy(group_col).orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(n_tokens).over(w), F.lit(0))
    return df.select(
        order_col, group_col,
        n_tokens.cast("int").alias("n_tokens"),
        F.floor(cum / budget).cast("int").alias("bin_id"),
        (cum % budget).cast("int").alias("bin_offset"),
    )


# PII scrubbing — the C4/Dolma-style redaction pass between dedup and
# shard writing. Patterns are deliberately RE2-compatible (no lookaround,
# no backreferences) so the DuckDB oracle replays them verbatim and a
# fastText/Presidio-class NER scrubber could slot in later as a
# broadcast-model pandas UDF without changing the surface.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("phone", r"\+?\b\d{1,3}[- ]\d{3,4}[- ]\d{3,4}\b", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses and dashed/spaced phone numbers to
    typed placeholders, keeping per-category match counts for curation
    audit dashboards. Order matters and is fixed: emails first (their
    local part can contain digits a later pass would half-eat), then
    IPs (dotted quads would otherwise match the phone shape), then
    phones. Pure codegen ``regexp_replace``/``regexp_count`` — one
    projection, no shuffle, no Python."""
    scrubbed = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, rx, token in PII_PATTERNS:
        counts.append(F.regexp_count(scrubbed, F.lit(rx)).alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, rx, token)
    return df.select(
        *df.columns, *counts, scrubbed.alias(f"{text_col}_scrubbed")
    )


def boilerplate_lines(lines: DataFrame, threshold: int = 5,
                      line_col: str = "text") -> DataFrame:
    """The corpus-frequent line set: one row per distinct trimmed line
    occurring at least ``threshold`` times across the whole corpus
    (column ``_bp_line``). This is the CCNet/Dolma boilerplate signal —
    navigation bars, cookie banners, license footers repeat verbatim
    across millions of pages while real prose does not.

    Scale shape: ONE count aggregation keyed by the line text. Hot
    boilerplate lines are exactly the skewed keys, and exactly the ones
    map-side partial aggregation collapses to one row per input
    partition before the shuffle — the skew pays O(partitions), not
    O(occurrences). The result is corpus-boilerplate-sized (small by
    construction), which is what makes the removal join broadcastable.
    """
    key = F.trim(F.coalesce(F.col(line_col), F.lit("")))
    return (
        lines.select(key.alias("_bp_line"))
        .filter(F.col("_bp_line") != "")
        .groupBy("_bp_line")
        .agg(F.count("*").alias("_bp_n"))
        .filter(F.col("_bp_n") >= threshold)
        .select("_bp_line")
    )


def line_dedup(lines: DataFrame, threshold: int = 5,
               id_col: str = "doc_id", order_col: str = "line_idx",
               line_col: str = "text",
               broadcast_boilerplate: bool = True) -> DataFrame:
    """Corpus-level repeated-line removal (CCNet §3.1 / Dolma's exact
    paragraph dedup): drop every line whose trimmed form appears at
    least ``threshold`` times across the corpus, then reassemble each
    document from its surviving lines in stable order.

    Input is a LINES frame (id, order, line) — the shape a log pipeline
    already has after splitting; blob documents get there with one
    ``posexplode(split(text, '\\n'))``.

    Returns one row per document: ``text_clean`` (survivors joined by
    '\\n', '' when everything was boilerplate), ``n_kept``, ``n_removed``.

    Scale shape: the boilerplate set is counted with one map-side-
    combinable aggregation (see :func:`boilerplate_lines`), then
    BROADCAST — the corpus itself is never shuffled for the membership
    test; the only full shuffle is the per-document reassembly, keyed by
    doc id (no hot keys: a document has bounded lines). At 100 TB the
    broadcast holds only lines repeated ≥ threshold times, and the
    threshold is precisely the knob that keeps it small; when even the
    thresholded set won't fit an executor (low threshold × web-scale
    boilerplate), pass ``broadcast_boilerplate=False`` to fall back to
    a shuffle join on the line key instead.
    """
    bp = boilerplate_lines(lines, threshold, line_col)
    if broadcast_boilerplate:
        bp = F.broadcast(bp)
    key = F.trim(F.coalesce(F.col(line_col), F.lit("")))
    flagged = (
        lines.join(bp, key == F.col("_bp_line"), "left")
        .withColumn("_rm", F.col("_bp_line").isNotNull())
    )
    # collect_list skips null inputs, so the when() both drops removed
    # lines and keeps the aggregate null-free — no per-element filter
    kept_structs = F.array_sort(
        F.collect_list(F.when(~F.col("_rm"), F.struct(order_col, line_col)))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n", F.transform(kept_structs, lambda s: s[line_col])
            ).alias("text_clean"),
            F.sum((~F.col("_rm")).cast("long")).alias("n_kept"),
            F.sum(F.col("_rm").cast("long")).alias("n_removed"),
        )
        .select(
            id_col, "text_clean",
            F.col("n_kept").cast("int").alias("n_kept"),
            F.col("n_removed").cast("int").alias("n_removed"),
        )
    )


# URL hygiene — the web-pipeline step between fetch and text extraction:
# count crawl volume per registrable domain and drop blocklisted ones.
_URL_HOST_RX = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def url_host(col):
    """Host part of a URL (lowercased, port stripped); '' for non-URLs."""
    return F.lower(
        F.regexp_replace(
            F.regexp_extract(F.coalesce(col, F.lit("")), _URL_HOST_RX, 1),
            r":\d+$", "",
        )
    )


def registrable_domain(col):
    """Last two host labels ('cdn.assets.example.com' → 'example.com') —
    the public-suffix-list-free approximation every quick crawl audit
    uses; a real PSL lookup is a broadcast dict_map drop-in."""
    host = url_host(col)
    return F.when(
        host == "", F.lit("")
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def domain_stats(df: DataFrame, url_col: str = "url",
                 blocked: list[str] | None = None) -> DataFrame:
    """Per-registrable-domain crawl stats with blocklist marking: one row
    per domain with ``n_urls``, ``n_hosts`` (distinct), and ``blocked``.
    The blocklist is a plan-time literal set (real blocklists are a
    broadcast join on a side table — same plan shape as processor_dict_map,
    which this reuses at scale). Pure codegen: regex host extraction runs
    in the scan stage; one count aggregation shuffles (domain, host) pairs
    only, never URLs or text."""
    blocked_set = [b.lower() for b in (blocked or [])]
    dom = registrable_domain(F.col(url_col))
    per_host = (
        df.select(dom.alias("domain"), url_host(F.col(url_col)).alias("_h"))
        .filter(F.col("domain") != "")
        .groupBy("domain", "_h")
        .agg(F.count("*").alias("_n"))
    )
    return (
        per_host.groupBy("domain")
        .agg(
            F.sum("_n").cast("int").alias("n_urls"),
            F.count("*").cast("int").alias("n_hosts"),
        )
        .withColumn(
            "blocked",
            F.col("domain").isin(*blocked_set) if blocked_set else F.lit(False),
        )
    )


def blocklist_filter(df: DataFrame, url_col: str = "url",
                     blocked: list[str] | None = None) -> DataFrame:
    """Drop rows whose URL's registrable domain is blocklisted — the
    row-level twin of :func:`domain_stats`; a pure filter in the scan
    stage (no shuffle, no join) for the literal-list form."""
    blocked_set = [b.lower() for b in (blocked or [])]
    if not blocked_set:
        return df
    return df.filter(~registrable_domain(F.col(url_col)).isin(*blocked_set))


def cross_doc_gram_share(df: DataFrame, n: int = 5,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Cross-document repeated-substring signal — the gram-counting
    approximation of ExactSubstr dedup (Lee et al. 2022,
    arXiv:2107.06499): for each document, what fraction of its word
    n-grams also appears in at least one OTHER document. High ratios
    mark boilerplate/templated docs the intra-doc ``dup_ngram_stats``
    and whole-doc MinHash both miss.

    Plan: derives the ``ngram_hash_frame`` gram index (per-doc DISTINCT
    16-byte gram hashes) ONCE — ``localCheckpoint`` materializes it so
    the two consumers below don't each re-run the explode+md5+distinct
    subtree (exchange reuse can't kick in: the build side's map-side
    partial count changes its exchange child). Document frequency is
    then a map-side-combined hash aggregate joined back with a
    SHUFFLE_HASH hint — the whole path is sort-free (the previous
    count-window plan paid a full sort of every (doc, hash) pair inside
    WindowExec), and a hot stop-gram only *streams* through its
    partition on the probe side — no per-gram row buffering — so the
    plan survives skewed grams at corpus scale. At 100 TB you'd
    materialize the doc-frequency table once as the corpus gram index
    and reuse it across runs (the checkpoint is that materialization).
    """
    g = ngram_hash_frame(df, n=n, text_col=text_col,
                         id_col=id_col).localCheckpoint()
    # g is distinct per (doc, hash), so count(*) = document frequency
    dfreq = g.groupBy("gram_hash").agg(F.count("*").alias("ndocs"))
    return (
        g.join(dfreq.hint("SHUFFLE_HASH"), "gram_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("ndocs") > 1).cast("long")).alias("n_shared"),
        )
        .withColumn(
            "shared_ratio_1e3",
            F.floor(F.lit(1000.0) * F.col("n_shared") / F.col("n_grams"))
            .cast("long"),
        )
    )


def exact_substr_trim(df: DataFrame, k: int = 8, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Cross-document repeated-substring REMOVAL — the span-trim step of
    ExactSubstr dedup (Lee et al. 2022, arXiv:2107.06499 §4.1: delete
    duplicated substrings, keep one copy), word-granular with ``k``-token
    windows standing in for the paper's 50-token threshold.

    Rule: a ``k``-gram occurring in more than one document is duplicated;
    the single kept copy lives in the gram's MINIMUM doc id (the same
    deterministic survivor rule as ``exact_dedup``), every other
    document deletes the tokens its duplicated grams cover. Within-doc
    repeats are left alone (they are ``dup_ngram_stats``' domain).
    Output: ``(doc_id, n_total, n_removed, trimmed_md5)`` — the md5 of
    the space-joined surviving tokens, hash-comparable across engines.

    Scale shape (all codegen, no Python):
    * gram hashes ride the scan (positions via one posexplode);
    * duplication = ``min(doc) != max(doc)`` per gram — a map-side-
      combined aggregate of 16-byte hashes, NOT a countDistinct (which
      would shuffle (gram, doc) pairs twice);
    * probe joins back on the gram hash (exchange reused — both sides
      shuffle the identical gram subtree on the same key);
    * span removal is a per-document range ANTI join (token pos ∈
      [p, p+k)) — both sides co-partition on the doc id, so the merge
      work is per-doc tokens × per-doc hits, never cross-doc;
    * reassembly is one sort-free collect_list + array_sort per doc.
    At 100 TB the gram-stats table is the corpus substring index you
    materialize once and reuse across increments."""
    base = df.filter(
        F.trim(F.coalesce(F.col(text_col), F.lit(""))) != ""
    ).select(id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("_words"))
    toks = base.select(
        id_col, F.posexplode("_words").alias("pos", "word"))
    words = F.col("_words")
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.size(words) - k + 1),
        lambda i: F.md5(F.array_join(F.slice(words, i, k), " ")
                        .cast("binary")),
    )
    grams = base.filter(F.size(words) >= k).select(
        id_col, F.posexplode(gram_hashes).alias("p", "gh"))
    stats = grams.groupBy("gh").agg(
        F.min(id_col).alias("_mdoc"), F.max(id_col).alias("_xdoc"))
    hits = (
        grams.join(stats.filter(F.col("_mdoc") != F.col("_xdoc")), "gh")
        .filter(F.col(id_col) != F.col("_mdoc"))
        .select(id_col, "p")
    )
    h = hits.select(F.col(id_col).alias("_hid"), "p")
    kept = toks.join(
        h,
        (toks[id_col] == h["_hid"])
        & (toks["pos"] >= h["p"]) & (toks["pos"] < h["p"] + k),
        "left_anti",
    )
    kept_agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).cast("binary")
        ).alias("trimmed_md5"),
    )
    totals = base.select(id_col, F.size(words).alias("n_total"))
    out = totals.join(kept_agg, id_col, "left")
    n_kept = F.coalesce(F.col("n_kept"), F.lit(0))
    return out.select(
        id_col, "n_total",
        (F.col("n_total") - n_kept).cast("long").alias("n_removed"),
        F.coalesce(F.col("trimmed_md5"),
                   F.md5(F.lit("").cast("binary"))).alias("trimmed_md5"),
    )


def incremental_dedup(new_docs: DataFrame, seen: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Incremental (cross-snapshot) exact dedup — the daily-increment
    path of a crawl/ingest pipeline: a new batch is admitted against the
    accumulated corpus, keeping a doc only if its content fingerprint is
    (a) unseen in the snapshot and (b) first within the batch (min id,
    retry-stable). Returns one row per NEW batch doc:
    ``(id, fingerprint, status)`` with status ∈ {new, dup_snapshot,
    dup_batch} — the admitted set is ``status = 'new'`` and the
    fingerprints to append to the snapshot are exactly those rows.

    ``seen`` is either the snapshot docs frame (same text column) or a
    precomputed frame with a ``fingerprint`` column — at 100 TB the
    snapshot IS the stored fingerprint table, appended each increment,
    so the text of the historical corpus is never re-read.

    Scale shape: one LEFT join on the 16-byte fingerprint (both sides
    shuffle (fingerprint[, id]) pairs only — never text) plus one
    min-id window per batch fingerprint; hot fingerprints (viral copies)
    collapse in the map-side partial min."""
    from loongcollector_spark.functions.text import with_fingerprint

    if "fingerprint" not in seen.columns:
        seen = with_fingerprint(seen, text_col)
    seen_fps = seen.select("fingerprint").distinct()
    batch = with_fingerprint(new_docs, text_col).select(
        id_col, "fingerprint")
    first = Window.partitionBy("fingerprint")
    flagged = (
        batch.join(seen_fps.withColumn("_seen", F.lit(True)),
                   "fingerprint", "left")
        .withColumn("_first", F.min(id_col).over(first))
    )
    status = (
        F.when(F.col("_seen"), F.lit("dup_snapshot"))
        .when(F.col(id_col) != F.col("_first"), F.lit("dup_batch"))
        .otherwise(F.lit("new"))
    )
    return flagged.select(id_col, "fingerprint", status.alias("status"))


def badwords_filter(df: DataFrame, blocklist: list[str],
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """C4-style blocklist gate (Raffel et al. 2020 §2.2 drop documents
    containing any listed word): per document the number of flagged
    token OCCURRENCES (lowercased, punctuation-stripped word match, not
    substring) and ``kept``.

    Scale shape: tokens flagged BEFORE the shuffle — the explode is
    filtered by ``isin(blocklist)`` in the scan stage, so the count
    aggregation only ever shuffles (doc_id, hits) for actual hits, a
    vanishing fraction of the corpus; clean documents never leave their
    scan partition (the count joins back LEFT). The blocklist lives in
    the plan as a literal IN-set (it is a config, like the reference's
    processor_filter patterns), not a table.
    """
    lowered = [w.lower() for w in blocklist]
    words = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("_w")
    hits = (
        df.select(id_col, words)
        .withColumn("_w", F.regexp_replace("_w", r"^\W+|\W+$", ""))
        .filter(F.col("_w").isin(lowered))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("flagged_tokens"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("flagged_tokens", F.lit(0)).cast("bigint")
             .alias("flagged_tokens"),
            (F.coalesce("flagged_tokens", F.lit(0)) == 0).alias("kept"),
        )
    )


def source_mix_weights(df: DataFrame, target_shares: dict[str, float],
                       text_col: str = "text",
                       source_col: str = "source") -> DataFrame:
    """DoReMi-flavored source reweighting (Xie et al. 2023 reduced to
    its deployment step): per-source token mass vs a target mixture →
    the sampling weight a shard-sampler applies per source. All-integer
    outputs (ppm shares, milli weights — floor semantics) so the result
    hashes identically across engines.

    Scale shape: ONE map-side-combinable (source, tokens) aggregation —
    the shuffle carries one row per source; the corpus-total join is a
    literal cross join against a 1-row frame. Sources missing from
    ``target_shares`` weight 0 (they are excluded from the mixture);
    a target source absent from the corpus simply yields no row (its
    mass cannot be sampled from nothing).
    """
    from loongcollector_spark.functions.text import with_token_count

    toks = with_token_count(df, text_col).groupBy(source_col).agg(
        F.sum("n_tokens").alias("tokens"))
    total = toks.agg(F.sum("tokens").alias("_total"))
    target = F.create_map(*[
        x for k, v in sorted(target_shares.items())
        for x in (F.lit(k), F.lit(int(round(v * 1_000_000))))
    ])
    share_ppm = F.floor(F.col("tokens") * 1_000_000 / F.col("_total"))
    target_ppm = F.coalesce(
        F.element_at(target, F.col(source_col)), F.lit(0))
    return (
        toks.crossJoin(F.broadcast(total))
        .select(
            source_col,
            F.col("tokens").cast("bigint").alias("tokens"),
            share_ppm.cast("bigint").alias("share_ppm"),
            target_ppm.cast("bigint").alias("target_ppm"),
            F.when(share_ppm > 0,
                   F.floor(target_ppm * 1000 / share_ppm))
             .otherwise(F.lit(0)).cast("bigint").alias("weight_milli"),
        )
    )


def quality_bins(df: DataFrame, n_bins: int = 10,
                 score_col: str = "pct_alpha",
                 id_col: str = "doc_id") -> DataFrame:
    """Exact quantile (curriculum) binning WITHOUT a global sort: the
    histogram-CDF trick. Scores quantize to bounded-cardinality integers
    already (quality signals here are integer percents/permille), so the
    exact CDF lives on the tiny (score, count) frame; docs pick their
    bin by broadcast-joining it. ``bin`` = ⌊docs-strictly-below · n /
    total⌋ clamped to n-1 — ties share a bin deterministically.

    A Window ``ntile`` computes the same thing with a single-partition
    global sort — the one-straggler plan this function exists to avoid;
    the only all-rows shuffle here is none at all (the doc side joins
    map-side against the broadcast CDF)."""
    scored = df.select(id_col, F.col(score_col).alias("_s"))
    hist = scored.groupBy("_s").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    # the window runs on the HISTOGRAM (distinct scores — bounded), not
    # on the corpus; single-partition is fine at ~100 distinct values
    cdf = hist.select(
        "_s", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_below"))
    total = hist.agg(F.sum("_n").alias("_total"))
    bins = (
        cdf.crossJoin(F.broadcast(total))
        .select(
            "_s",
            F.least(
                F.floor(F.col("_below") * n_bins / F.col("_total")),
                F.lit(n_bins - 1),
            ).cast("int").alias("bin"),
        )
    )
    return scored.join(F.broadcast(bins), "_s").select(
        id_col, F.col("_s").alias(score_col), "bin")


def chunk_windows(df: DataFrame, window: int = 64, stride: int = 48,
                  min_tokens: int = 8, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Sliding-window document chunking — the context-window prep step
    that turns variable-length curated documents into fixed-size
    training windows (the HF ``return_overflowing_tokens`` layout:
    window W, stride S, chunks start at 0, S, 2S, … while the start is
    inside the document; the final partial chunk is kept when it has at
    least ``min_tokens`` tokens).

    Emits (doc_id, chunk_idx, start_tok, n_tokens, chunk_text) with
    ``chunk_text`` rebuilt from the whitespace-normalized word stream.

    Scale shape: the word array is materialized in its own projection
    (transform-capture rule), chunk starts come from one codegen
    ``sequence`` + ``posexplode`` — everything rides the scan, no
    shuffle, and output size is bounded by W/S times the input (with
    the default 64/48 overlap, 1.33x)."""
    nw = F.size(F.col("_words"))
    starts = F.when(
        F.col(text_col).isNotNull() & (nw > 0),
        F.sequence(F.lit(0),
                   F.greatest(nw - 1, F.lit(0)),
                   F.lit(int(stride))),
    ).otherwise(F.array().cast("array<int>"))
    base = df.select(
        F.col(id_col), F.col(text_col),
        _norm_words(F.coalesce(F.col(text_col), F.lit(""))).alias("_words"),
    ).select(
        id_col, "_words",
        F.posexplode_outer(starts).alias("chunk_idx", "start_tok"),
    )
    n_tok = F.least(F.lit(int(window)),
                    F.size(F.col("_words")) - F.col("start_tok"))
    return base.where(
        F.col("start_tok").isNotNull() & (n_tok >= int(min_tokens))
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("int").alias("start_tok"),
        n_tok.cast("int").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_words"), F.col("start_tok") + 1,
                    F.lit(int(window))), " ").alias("chunk_text"),
    )


def training_shuffle(df: DataFrame, n_shards: int = 64,
                     seed: str = "epoch0", id_col: str = "doc_id"
                     ) -> DataFrame:
    """Deterministic global example shuffle + shard assignment — the
    write-order step between curation and training (an epoch's order
    must be reproducible across retries and independent of input
    partitioning, so ``rand()`` is out; re-keying by a seeded hash is
    the standard trick).

    ``sort_key`` = md5(seed || id); ``shard`` = first byte-pair of the
    key mod ``n_shards`` (so shard membership AND intra-shard order both
    reshuffle with the seed); ``pos`` = rank within the shard.

    Scale shape: one hash-partitioned window per shard computes ranks —
    the shuffle carries (16-byte key, id) only; each shard's rows land
    in one partition, which is exactly the training-shard file layout
    the writer needs (``partitionBy(shard)`` + sortWithinPartitions)."""
    keyed = df.select(
        F.col(id_col),
        F.md5(F.concat(F.lit(str(seed)),
                       F.col(id_col).cast("string"))).alias("sort_key"),
    ).select(
        id_col, "sort_key",
        F.pmod(F.conv(F.substring("sort_key", 1, 4), 16, 10)
               .cast("bigint"), F.lit(int(n_shards))).cast("int")
        .alias("shard"),
    )
    from pyspark.sql import Window

    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("sort_key", id_col)) - 1
    return keyed.select(
        id_col, "shard", pos.cast("bigint").alias("pos"), "sort_key")
