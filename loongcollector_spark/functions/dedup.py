"""Deduplication primitives for training-data pipelines.

* exact: hash-groupBy on a normalized fingerprint — one shuffle on the
  16-byte hash, the canonical 100 TB exact-dedup plan;
* MinHash + LSH: shingle → k portable hashes (md5, engine-reproducible)
  → band buckets → equality self-join on (band, band_idx). At scale the
  join shuffles only (doc_id, band) pairs, never text;
* SimHash: 64-bit near-dup signature as four 16-bit chunk columns, pure
  JVM expressions (one md5 per word + array folds — no Python anywhere);
* n-gram Jaccard: set-similarity over distinct word arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from loongcollector_spark.functions.text import with_fingerprint
from loongcollector_spark.operators.common import expr_template


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: (fp, canonical_doc_id, n_dups).
    Keep-min-id is the deterministic survivor rule."""
    return (
        with_fingerprint(df, text_col)
        .groupBy(F.col("fingerprint").alias("fp"))
        .agg(
            F.min(id_col).alias(f"canonical_{id_col}"),
            F.count("*").alias("n_dups"),
        )
    )


def _shingles(shingle: int):
    """Word-shingle array over the materialized ``_words`` column.
    IMPORTANT: evaluate on a frame where the word array is already a
    materialized column (see _with_shingles) — a raw split() expression
    captured inside the transform lambda is re-evaluated per shingle
    (O(words²) per document, measured 10x slower)."""
    words = F.col("_words")
    n = F.size(words)
    return F.when(
        n >= shingle,
        F.transform(
            F.sequence(F.lit(1), n - shingle + 1),
            lambda i: F.array_join(F.slice(words, i, shingle), " "),
        ),
    ).otherwise(F.array(F.array_join(words, " ")))


def _with_shingles(df: DataFrame, text_col: str, shingle: int,
                   id_col: str) -> DataFrame:
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.select(id_col, words.alias("_words"))
        .select(id_col, _shingles(shingle).alias("_shingles"))
    )


def minhash_signatures(
    df: DataFrame, n_hashes: int = 4, shingle: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """One-permutation-style MinHash: each shingle is md5-hashed once per
    GROUP of four signature rows and the rows take the min over the four
    disjoint 8-hex-char windows of that group's digest. Group 0 hashes
    the bare shingle (byte-compatible with the original ≤4-hash form);
    group g > 0 salts with a ``g<g>|`` prefix, so any ``n_hashes`` is
    ⌈k/4⌉ md5 calls per shingle — the production 16-128-permutation
    configs (Gopher / RefinedWeb band geometry) cost 4-32 hashes per
    shingle, not k. Portable: DuckDB reproduces ``md5('g1|' || s)``
    byte-equal. Higher-order-function lambdas are interpreted, not
    codegen, so the md5 count is the cost."""
    shingled = _with_shingles(df, text_col, shingle, id_col)
    out = shingled
    n_groups = (n_hashes + 3) // 4

    def digest_fn(g):
        # the transform lambda must take exactly ONE parameter — a second
        # (even defaulted) one makes Spark pass the array index into it
        if g == 0:
            return lambda s: F.md5(s.cast("binary"))
        return lambda s: F.md5(F.concat(F.lit(f"g{g}|"), s).cast("binary"))

    for g in range(n_groups):
        out = out.withColumn(
            f"_dg{g}", F.transform(F.col("_shingles"), digest_fn(g)))

    def window(i):
        # NOTE: the transform lambda must take exactly ONE parameter — a
        # second parameter (even a defaulted one) makes Spark pass the
        # array index into it
        return lambda d: F.substring(d, 8 * (i % 4) + 1, 8)

    for i in range(n_hashes):
        out = out.withColumn(
            f"mh{i}",
            F.array_min(F.transform(F.col(f"_dg{i // 4}"), window(i))),
        )
    return out.drop("_shingles",
                    *[f"_dg{g}" for g in range(n_groups)])


def minhash_band_frame(
    df: DataFrame, n_hashes: int = 4, shingle: int = 3, bands: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """The persisted LSH index shape: one (id, band_idx, band) row per
    signature band — what a production pipeline stores between
    increments (16-byte hashes, never text)."""
    sig = minhash_signatures(df, n_hashes, shingle, text_col, id_col)
    band_cols = _band_hash_cols(n_hashes, bands)
    structs = [
        F.struct(F.lit(b).alias("band_idx"), band_cols[b].alias("band"))
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*structs)).alias("b")
    ).select(id_col, "b.band_idx", "b.band")


def _band_hash_cols(n_hashes: int, bands: int) -> list:
    """The ONE definition of the band digest — md5 over the band's
    signature rows — shared by the pair query, the persisted index, and
    the incremental/streaming admission paths so candidate generation
    can never desynchronize from a stored index."""
    assert n_hashes % bands == 0, (
        "bands must divide n_hashes — a remainder would silently drop "
        "trailing signature rows and change recall")
    rows_per_band = n_hashes // bands
    return [
        F.md5(F.concat(*[
            F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)
        ]).cast("binary"))
        for b in range(bands)
    ]


def incremental_minhash_dedup(
    new_docs: DataFrame, seen_bands: DataFrame,
    n_hashes: int = 4, shingle: int = 3, bands: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Incremental (cross-snapshot) NEAR-dup admission — the banded
    companion to ``curation.incremental_dedup``'s exact path: a new
    batch is admitted against the accumulated ``minhash_band_frame``
    index, so yesterday's corpus is never re-read or re-hashed.

    One row per new doc: ``(id, status, hit_bands)`` with status ∈
    {new, dup_snapshot, dup_batch} under the same precedence as the
    exact variant — a snapshot band hit wins over a within-batch hit;
    within the batch the band-least id is the survivor (greedy banded
    admission: a doc whose only matches are themselves dups still
    defers to the earliest id it shares a band with, which keeps
    admission retry-stable without a transitive closure).  The rows to
    append to the index are ``minhash_band_frame(admitted docs)``.

    Scale shape: band computation rides the batch scan; the snapshot
    probe is one equi-join on (band_idx, 16-byte band) against the
    stored index — at 100 TB that index is bucketed on the band hash,
    making the daily probe a bucket-local join; the within-batch pass
    is one min-id window over the batch's own band rows.  Text never
    shuffles anywhere."""
    nb = minhash_band_frame(
        new_docs, n_hashes, shingle, bands, text_col, id_col)
    idx = seen_bands.select("band_idx", "band").distinct()
    probed = nb.join(
        idx.withColumn("_seen", F.lit(True)),
        ["band_idx", "band"], "left")
    w = Window.partitionBy("band_idx", "band")
    per_doc = probed.select(
        id_col,
        F.coalesce(F.col("_seen"), F.lit(False)).alias("_hit"),
        F.min(F.col(id_col)).over(w).alias("_first"),
    ).groupBy(id_col).agg(
        F.sum(F.when(F.col("_hit"), 1).otherwise(0)).cast("int")
        .alias("hit_bands"),
        F.min("_first").alias("_mate"),
    )
    status = (
        F.when(F.col("hit_bands") > 0, F.lit("dup_snapshot"))
        .when(F.col("_mate") < F.col(id_col), F.lit("dup_batch"))
        .otherwise(F.lit("new"))
    )
    return per_doc.select(id_col, status.alias("status"), "hit_bands")


def minhash_lsh_pairs(
    df: DataFrame, n_hashes: int = 4, shingle: int = 3, bands: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: hash rows of the signature into ``bands``
    buckets; docs sharing any band bucket are candidates.

    Scale shape: explode to (doc_id, band_idx, band_hash), self-join on
    the 16-byte hash — the shuffle carries ids + hashes only. A pair
    sharing several bands is emitted exactly ONCE without any pair-level
    distinct: the join residual keeps only the FIRST matching band_idx
    (all earlier bands must differ), so the plan has no post-join
    exchange — at scale that deletes a full shuffle of the candidate
    set, which is the widest intermediate of the whole LSH pipeline.
    Each side carries all ``bands`` hashes (16 bytes each) to make the
    earlier-band comparison a local residual; for the small band counts
    LSH uses (2-32) that widening is far cheaper than re-shuffling the
    quadratic candidate output.
    """
    sig = minhash_signatures(df, n_hashes, shingle, text_col, id_col)
    band_cols = [c.alias(f"band{b}")
                 for b, c in enumerate(_band_hash_cols(n_hashes, bands))]
    wide = sig.select(F.col(id_col), *band_cols)
    exploded = wide.select(
        id_col, *[f"band{b}" for b in range(bands)],
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band"))
            for b in range(bands)
        ])).alias("bx"),
    ).select(id_col, *[f"band{b}" for b in range(bands)],
             "bx.band_idx", "bx.band")
    a = exploded.alias("a")
    b = exploded.hint("shuffle_merge").alias("b")
    first_match = F.lit(True)
    for i in range(bands - 1):
        first_match = first_match & (
            (F.col("a.band_idx") <= i)
            | (F.col(f"a.band{i}") != F.col(f"b.band{i}"))
        )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & first_match,
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
    )


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens, emitted as FOUR 16-bit chunk
    columns ``sh0..sh3`` — entirely JVM-side expressions (one md5 per word,
    then interpreted array folds), no Python in the path at all.

    Definition (shared byte-for-byte with the DuckDB oracle and the
    pytest Python model): word hash = the first 16 hex digits of
    md5(word); bit k (k = 0..63) of the hash = bit (k mod 4) of hex digit
    floor(k/4); vote_k = Σ_words (2·bit_k − 1); signature bit k is set iff
    vote_k > 0; chunk c = Σ_{j<16} sigbit(16c+j) << j.
    """
    # Shape: explode to one row per (doc, word), md5 once per word, 16
    # hex-digit columns, then SIMD-in-a-register bit counting: the 64
    # per-bit set-counts pack into 32 LONG sums of two 32-bit lanes
    # each (lane q of packed[j] counts bit k = 32q+j). 32-bit lanes
    # hold counts to 2^31 words/doc — an earlier 16-bit-lane packing
    # (16 longs) overflowed LONG at ~32k same-bit words, which under
    # ANSI (Spark 4 default) KILLS the job with ARITHMETIC_OVERFLOW on
    # any ≥32k-token doc, and silently lane-wraps without ANSI. 33 agg
    # buffers instead of the 64 ±1-vote sums of the original
    # formulation, same signature bit-for-bit:
    # vote_k = 2*cnt_k - n_words > 0  ⇔  2*cnt_k > n_words.
    # Measured wall-clock parity at sf0.1 local[32] (the md5-per-word
    # dominates either way); the win is the partial-agg shuffle row
    # narrowing 64 ints → 16 longs + 1 count (~2x), which is what
    # matters once signatures shuffle across executors.
    # Everything stays inside WholeStageCodegen (no interpreted
    # higher-order lambdas — an earlier array-fold formulation ran ~50x
    # slower because transform/aggregate lambdas are interpreted per
    # element); the groupBy partial-aggregates map-side, so the shuffle
    # carries one (doc_id, 16 longs, 1 count) row per doc per input
    # partition.
    # Null/empty/whitespace-only docs are excluded up front on BOTH
    # engines (explode would silently drop NULL rows while an oracle CTE
    # would keep them — an engine/oracle divergence unless filtered
    # identically; a doc with no tokens has no meaningful signature).
    df = df.filter(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    words = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_w")
    w = df.select(id_col, words)
    digit_cols, packed, chunk_cols = _simhash_exprs()
    w = w.select(id_col, *digit_cols)
    agg = w.groupBy(id_col).agg(*packed, F.count("*").alias("_n"))
    return agg.select(id_col, *chunk_cols)


@expr_template
def _simhash_exprs():
    """The SimHash bit-pack Column trees over the fixed aliases
    ``_w``/``_d*``/``_p*``/``_n`` — ~1 s of py4j construction, built
    once per process (operators.common.expr_template)."""
    h = F.md5(F.col("_w").cast("binary"))
    digit_cols = [
        F.conv(F.substring(h, d + 1, 1), 16, 10).cast("long").alias(f"_d{d}")
        for d in range(16)
    ]
    # packed[j] lanes: bit(32q + j) = (digit[8q + j//4] >> (j%4)) & 1
    packed = [
        F.sum(sum(
            F.shiftleft(
                F.shiftright(F.col(f"_d{8 * q + j // 4}"), j % 4)
                .bitwiseAND(F.lit(1)),
                32 * q,
            )
            for q in range(2)
        )).alias(f"_p{j}")
        for j in range(32)
    ]
    n = F.col("_n")
    chunk_cols = []
    for c in range(4):
        chunk = None
        for j in range(16):
            k = 16 * c + j  # global bit k lives in packed[k % 32], lane k // 32
            cnt = (F.shiftright(F.col(f"_p{k % 32}"), 32 * (k // 32))
                   .bitwiseAND(F.lit(0xFFFFFFFF)))
            bit = F.when(cnt * 2 > n, 1 << j).otherwise(0)
            chunk = bit if chunk is None else chunk + bit
        chunk_cols.append(chunk.cast("int").alias(f"sh{c}"))
    return digit_cols, packed, chunk_cols


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``: block
    on the four 16-bit chunks (pigeonhole — Manku et al., WWW'07: a pair
    within hamming k of c chunks shares ≥1 exact chunk iff k < c, hence
    the k=3 default for 4 chunks), then verify with per-chunk bit_count.
    The join shuffles ids + four small ints, never text."""
    assert max_hamming < 4, (
        "4-chunk pigeonhole blocking only guarantees recall for hamming <= 3; "
        "raise the chunk count before raising max_hamming"
    )
    sig = simhash_signatures(df, text_col, id_col)
    chunks = sig.select(
        id_col, "sh0", "sh1", "sh2", "sh3",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("chunk_idx"), F.col(f"sh{i}").alias("chunk"))
                for i in range(4)
            ])
        ).alias("c"),
    ).select(id_col, "sh0", "sh1", "sh2", "sh3", "c.chunk_idx", "c.chunk")
    # shuffle_merge hint: both sides then hash-partition on the SAME
    # (chunk_idx, chunk) key with IDENTICAL subplans, so Catalyst reuses
    # one exchange — the signature aggregation runs ONCE, not per side
    # (a broadcast join would recompute it for the broadcast copy)
    a, b = chunks.alias("a"), chunks.hint("shuffle_merge").alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.sh{i}").bitwiseXOR(F.col(f"b.sh{i}")))
        for i in range(4)
    )
    # first-match residual: a pair sharing several chunks would be
    # emitted once per shared chunk; keeping only the FIRST matching
    # chunk_idx (all earlier chunks must differ) makes the join output
    # exactly the pair set — no pair-level dropDuplicates exchange at
    # all. Both sides already carry sh0..sh3 for the hamming residual,
    # so the earlier-chunk comparison is free.
    first_match = F.lit(True)
    for i in range(3):
        first_match = first_match & (
            (F.col("a.chunk_idx") <= i)
            | (F.col(f"a.sh{i}") != F.col(f"b.sh{i}"))
        )
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # hamming as a join residual: pairs beyond the radius are
            # dropped inside the join — nothing pair-shaped ever shuffles
            & (hamming <= max_hamming)
            & first_match,
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
    )


def ngram_jaccard_adjacent(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Word-set Jaccard between (doc_id, doc_id+1) pairs — the oracle-
    checkable slice of pairwise n-gram similarity (integer ‰)."""
    w = df.select(
        id_col, F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+")).alias("words")
    )
    a, b = w.alias("a"), w.alias("b")
    inter = F.size(F.array_intersect(F.col("a.words"), F.col("b.words")))
    union = F.size(F.array_union(F.col("a.words"), F.col("b.words")))
    return (
        a.join(b, F.col(f"b.{id_col}") == F.col(f"a.{id_col}") + 1)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.floor(1000.0 * inter / union).cast("int").alias("jaccard_1e3"),
        )
    )


def connected_components(pairs: DataFrame, left: str = "doc_a",
                         right: str = "doc_b",
                         max_iter: int = 64) -> DataFrame:
    """Connected components over an undirected pair list →
    ``(node, component)`` with component = min node id in the component
    — the clustering step between near-dup pair generation and
    keep-one-per-cluster in a dedup pipeline.

    Algorithm: min-label propagation with pointer jumping — each round
    every node takes the minimum of its own label, its neighbors'
    labels, and *its label's label* (``l(v) ← min(l(v), l(l(v)))``, the
    path-compression step of union-find), until a round changes nothing
    (checked with one count per round) or ``max_iter``. The jump step
    makes convergence O(log diameter) rounds, not O(diameter) — a
    chain-shaped component of 10^6 docs resolves in ~20 rounds instead
    of 10^6 (plain hop propagation measurably failed to converge within
    15 rounds on a 363-node embedding graph at sf0.01).

    Scale shape: each round is two shuffle joins of the label table
    (against the edge list, then against itself) plus map-side-combined
    min aggregates; the edge list is computed once and persisted;
    ``localCheckpoint`` truncates the iterative lineage so round N's
    plan does not replay rounds 1..N-1 (the classic iterative-join
    blowup). AQE handles the skewed hub labels a giant cluster produces.
    """
    fwd = pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
    rev = pairs.select(F.col(right).alias("src"), F.col(left).alias("dst"))
    edges = fwd.union(rev).distinct().persist()
    # the iterate is latency-bound, not data-bound, until the edge list
    # is large: AQE's per-exchange adaptive materialization adds a fixed
    # scheduling cost to every one of the loop's 3 joins x ~6 rounds
    # (measured 5.5 s -> 3.9 s on a 10k-edge graph at local[32] with AQE
    # off + partitions sized to the edges), while its skew handling only
    # pays off on big shuffles. Below ~16M edges run the loop with AQE
    # off and ~1 partition per 2M edges; above that keep session
    # settings (a 100 TB near-dup graph wants AQE's skew splits for the
    # giant-component hub labels).
    n_edges = edges.count()
    spark = pairs.sparkSession
    small_graph = n_edges < 16_000_000
    if not small_graph:
        try:
            return _cc_loop(edges, max_iter)
        finally:
            edges.unpersist()
    # Small graph: run the loop inside a CLONED session (newSession —
    # isolated SQLConf over the same SparkContext) with AQE off and
    # partitions sized to the edge list, so a CONCURRENT query on the
    # caller's session never observes the tuned conf (the previous
    # set/restore-in-finally mutated session-global state mid-query).
    # The edge list crosses sessions JVM-side (javaRDD → createDataFrame
    # on the clone); it is < 16M rows here by definition, and the label
    # table comes back the same way so callers join it under their own
    # session.
    parts = max(8, min(int(spark.conf.get("spark.sql.shuffle.partitions")),
                       n_edges // 2_000_000 + 8))
    cc_spark = _cc_session(spark)
    cc_spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    def bridge(df, to_session):
        # JVM-side RDD hand-off between sessions of one context: the
        # source frame is cache/checkpoint-backed, so the target session
        # scans those blocks — no python round trip, no extra copy
        jdf = to_session._jsparkSession.createDataFrame(
            df._jdf.javaRDD().rdd(), df._jdf.schema())
        return DataFrame(jdf, to_session)

    try:
        # one localCheckpoint materializes the bridged rows in the clone
        # so the loop's rounds scan checkpoint blocks instead of paying
        # the Row conversion per round
        loop_edges = bridge(edges, cc_spark).coalesce(parts) \
            .localCheckpoint()
        labels = _cc_loop(loop_edges, max_iter)
        # labels are localCheckpoint-backed from the loop's last round —
        # bridging reads the checkpoint blocks directly
        return bridge(labels, spark)
    finally:
        edges.unpersist()


_CC_SESSIONS: dict = {}


def _cc_session(spark):
    """One cloned, AQE-off session per SparkContext, reused across CC
    calls (newSession setup + first-use warmkup otherwise lands on every
    dedup_clusters query)."""
    key = spark.sparkContext.applicationId
    s = _CC_SESSIONS.get(key)
    if s is None:
        s = spark.newSession()
        s.conf.set("spark.sql.adaptive.enabled", "false")
        _CC_SESSIONS[key] = s
    return s


def _cc_loop(edges: DataFrame, max_iter: int) -> DataFrame:
    # init fused with round 1: every node starts at min(self, neighbors)
    # straight off the edge list (the symmetrized list contains every
    # node as src), skipping one full propagate round — one map-side-
    # combined aggregate instead of three joins.
    labels = (edges.groupBy("src")
              .agg(F.least(F.col("src"), F.min("dst")).alias("comp"))
              .withColumnRenamed("src", "node")
              .localCheckpoint())
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src").agg(F.min("comp").alias("nbr_comp"))
        )
        hop = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                labels["node"],
                F.least(
                    labels["comp"],
                    F.coalesce(nbr["nbr_comp"], labels["comp"]),
                ).alias("comp"),
                labels["comp"].alias("_prev"),
            )
        )
        # pointer jump: l(v) ← min(l(v), l(l(v))). Labels are always
        # node ids present in the label table, so the inner join is
        # total; this is what turns O(diameter) into O(log diameter).
        # The round's previous label rides along as _prev so the
        # convergence check below is a scan-only filter over the
        # checkpointed partitions — not another shuffle join of the
        # label table against itself (one fewer exchange per round).
        new = (
            hop.alias("a")
            .join(hop.alias("b"), F.col("a.comp") == F.col("b.node"))
            .select(
                F.col("a.node").alias("node"),
                F.least(F.col("a.comp"), F.col("b.comp")).alias("comp"),
                F.col("a._prev").alias("_prev"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("comp") != F.col("_prev")).count()
        labels.unpersist()
        labels = new.drop("_prev")
        if changed == 0:
            break
    else:
        # returning un-converged labels silently splits true components
        # (bit us at max_iter=15 on a 363-node sf0.01 embedding graph) —
        # fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels


def dedup_clusters(df: DataFrame, n_hashes: int = 4, shingle: int = 3,
                   bands: int = 2, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """MinHash-LSH pairs → connected components → one row per clustered
    doc with its canonical (min-id) survivor and cluster size."""
    pairs = minhash_lsh_pairs(df, n_hashes, shingle, bands, text_col, id_col)
    comp = connected_components(pairs)
    from pyspark.sql import Window

    size = F.count("*").over(Window.partitionBy("comp"))
    return comp.select(
        F.col("node").alias(id_col),
        F.col("comp").alias("cluster_id"),
        size.alias("cluster_size"),
        (F.col("node") == F.col("comp")).alias("keep"),
    )


def minhash_verified_pairs(
    df: DataFrame, n_hashes: int = 4, shingle: int = 3, bands: int = 2,
    min_jaccard_1e3: int = 500, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The standard two-stage near-dup pipeline: LSH candidate pairs →
    EXACT Jaccard verification on the shingle sets, keeping pairs with
    similarity ≥ ``min_jaccard_1e3``/1000 (integer-quantized so the
    oracle reproduces it bit-for-bit). This is what production dedup
    actually ships — LSH alone over-collects (banding is probabilistic),
    so a verify pass prunes false positives before clustering.

    Scale shape: candidates come from the banded bucket join (ids +
    hashes only, never text); verification joins each pair against the
    per-doc DISTINCT shingle-hash sets — the shuffle carries
    (pair, 16-byte hash) rows, so verify cost is proportional to
    candidate volume, not corpus size, and no all-pairs stage exists
    anywhere. Set sizes ride a tiny (id, count) frame."""
    assert min_jaccard_1e3 > 0, (
        "a zero threshold would need zero-intersection candidates, which "
        "the intersection join (correctly) never materializes"
    )
    cand = minhash_lsh_pairs(df, n_hashes, shingle, bands, text_col, id_col)
    shingled = _with_shingles(df, text_col, shingle, id_col)
    # materialize the per-doc shingle-hash sets ONCE (the
    # cross_doc_gram_share pattern): sa, sb and sizes all read this
    # frame, and its md5-per-shingle corpus scan is the dominant cost —
    # without the checkpoint the differently-keyed joins defeat exchange
    # reuse and the scan runs 3x
    sets = (
        shingled.select(
            F.col(id_col).alias("_sid"), F.explode("_shingles").alias("_s")
        )
        .select("_sid", F.md5(F.col("_s").cast("binary")).alias("_h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sets.groupBy("_sid").agg(F.count("*").alias("_n"))
    inter = (
        cand.join(sets.alias("sa"), F.col("doc_a") == F.col("sa._sid"))
        .join(
            sets.alias("sb"),
            (F.col("doc_b") == F.col("sb._sid"))
            & (F.col("sa._h") == F.col("sb._h")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_inter"))
    )
    union_n = F.col("na._n") + F.col("nb._n") - F.col("_inter")
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na._sid"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb._sid"))
        .select(
            "doc_a", "doc_b",
            F.floor(F.try_divide(1000 * F.col("_inter"), union_n))
            .cast("int").alias("jaccard_1e3"),
        )
        .filter(F.col("jaccard_1e3") >= min_jaccard_1e3)
    )


def containment_pairs(
    df: DataFrame, shingle: int = 3, max_df: int = 5,
    min_containment_1e3: int = 700, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ASYMMETRIC near-superset detection (Broder's containment,
    c(A, B) = |A∩B| / |A|): the signal Jaccard misses — a short
    document quoted whole inside a long one has low Jaccard but
    containment ≈ 1, which is how sub-document dedup (boilerplate
    wrappers, quote chains, README-embedded licenses) is actually
    caught. Emits BOTH directions per candidate pair:
    (contained, container, containment_1e3, inter, n_contained) for
    every direction clearing the threshold.

    Candidate generation is NOT minhash banding — banding is tuned for
    Jaccard and structurally misses tiny-inside-huge pairs (the big
    doc's minima displace the small doc's). Candidates instead come
    from RARE-SHINGLE co-occurrence: a contained document shares every
    one of its shingles with its container, including the rare ones,
    so pairs co-occurring on any shingle with document frequency ≤
    ``max_df`` capture every containment whose contained side has at
    least one non-boilerplate shingle. The df cap bounds the inverted
    index's pair fan-out (a df-f shingle emits ≤ f(f-1)/2 pairs), which
    is what makes the candidate join safe at corpus scale; the exact
    shingle-set intersection then verifies, cost ∝ candidates. Ids and
    16-byte hashes shuffle, never text."""
    shingled = _with_shingles(df, text_col, shingle, id_col)
    sets = (
        shingled.select(
            F.col(id_col).alias("_sid"), F.explode("_shingles").alias("_s")
        )
        .select("_sid", F.md5(F.col("_s").cast("binary")).alias("_h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sets.groupBy("_sid").agg(F.count("*").alias("_n"))
    # rare-shingle inverted index: keep hashes with doc frequency in
    # [2, max_df]; each bucket's self-join emits the candidate pairs
    rare = (
        sets.groupBy("_h").agg(F.count("*").alias("_df"))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select("_h")
    )
    posting = sets.join(rare, "_h")
    cand = (
        posting.alias("pa")
        .join(posting.alias("pb"),
              (F.col("pa._h") == F.col("pb._h"))
              & (F.col("pa._sid") < F.col("pb._sid")))
        .select(F.col("pa._sid").alias("doc_a"),
                F.col("pb._sid").alias("doc_b"))
        .distinct()
    )
    # verify only candidate docs' sets: the semi-join prunes the two
    # intersection joins to the (usually sparse) candidate population
    cand = cand.localCheckpoint(eager=False)
    cand_docs = (
        cand.select(F.col("doc_a").alias("_sid"))
        .unionByName(cand.select(F.col("doc_b").alias("_sid")))
        .distinct()
    )
    csets = sets.join(cand_docs, "_sid").localCheckpoint(eager=False)
    inter = (
        cand.join(csets.alias("sa"), F.col("doc_a") == F.col("sa._sid"))
        .join(
            csets.alias("sb"),
            (F.col("doc_b") == F.col("sb._sid"))
            & (F.col("sa._h") == F.col("sb._h")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_inter"))
    )
    both = (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na._sid"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb._sid"))
    )
    directed = both.select(
        F.col("doc_a").alias("contained"), F.col("doc_b").alias("container"),
        F.col("_inter").alias("inter"), F.col("na._n").alias("n_contained"),
    ).unionByName(both.select(
        F.col("doc_b").alias("contained"), F.col("doc_a").alias("container"),
        F.col("_inter").alias("inter"), F.col("nb._n").alias("n_contained"),
    ))
    return (
        directed.select(
            "contained", "container",
            F.floor(F.try_divide(1000 * F.col("inter"),
                                 F.col("n_contained")))
            .cast("int").alias("containment_1e3"),
            F.col("inter").cast("long").alias("inter"),
            F.col("n_contained").cast("long").alias("n_contained"),
        )
        .filter(F.col("containment_1e3") >= min_containment_1e3)
    )
