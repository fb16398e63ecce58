"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: the correctness baseline — broadcast the query
  vector, one narrow pass + a k-row takeOrdered;
* LSH-bucketed top-k: the scale path — deterministic sign-buckets prune
  the candidate set before scoring; at 100 TB the bucket column is a
  partition key so a query touches one partition family.

All arithmetic in double with sequential accumulation so results are
bit-reproducible against the DuckDB oracle; scores rounded to 4 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_expr(a, b):
    # try_divide: a zero-norm vector scores null (never a thrown job)
    return F.try_divide(_dot(a, b), F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _assign_cells(vecs: DataFrame, cent: DataFrame, id_col: str,
                  out_col: str = "cell") -> DataFrame:
    """Nearest-centroid assignment: broadcast the centroid table, pick
    the best cell per vector with a map-side struct-argmax (ties →
    lowest cid; zero-norm vectors score null and never win). Shared by
    ivf_topk and semantic_dedup — the ``cent`` frame is the k-means
    drop-in point for BOTH. ``vecs`` needs (id_col, emb, norm); ``cent``
    needs (cid, cvec, cnorm)."""
    cell_cos = F.try_divide(_dot(F.col("emb"), F.col("cvec")),
                            F.col("norm") * F.col("cnorm"))
    return (
        vecs.crossJoin(F.broadcast(cent))
        .select(
            id_col,
            F.struct(
                cell_cos.alias("cs"),
                (-F.col("cid")).alias("ncid"),  # ties -> lowest cid
                F.col("cid").alias("cid"),
            ).alias("sc"),
        )
        .groupBy(id_col).agg(F.max("sc").alias("best"))
        .select(id_col, F.col("best.cid").alias(out_col))
    )


def kmeans_refine(
    df: DataFrame, n_centroids: int = 16, n_rounds: int = 2,
    vec_col: str = "embedding", id_col: str = "vec_id",
    quant_bits: int = 20,
) -> DataFrame:
    """Fixed-round Lloyd refinement of the deterministic seed centroids
    — the drop-in producer for the ``cent`` frame that ``ivf_topk`` /
    ``semantic_dedup`` / ``pq_topk`` consume (their docstrings call this
    seam out; until round 5 only the raw seeds existed).

    Replayability (the BPE pattern): each round assigns every
    positive-norm vector to its nearest centroid (the same struct-argmax
    as ``_assign_cells``: max cosine, ties → lowest cid), then rebuilds
    each centroid as the mean of its members' INTEGER-QUANTIZED
    components — ``floor(x · 2^quant_bits)`` summed as longs (order-free
    by construction) and divided back as one exact double division, so
    a SQL oracle unrolls the rounds as CTEs and reproduces every
    centroid bit-for-bit. Empty cells keep their previous centroid.

    Scale shape: a parameter-server loop like ``bpe_train`` — per round,
    one broadcast of k centroid vectors against the corpus (no corpus
    shuffle), one map-side-combined (cid, dim) integer-sum aggregate,
    and a k×dim collect (bounded by n_centroids·dims, not data size);
    rounds are driver-synchronized and fixed at ``n_rounds``.

    Returns (cid, cvec array<double>, cnorm) for downstream broadcast.
    """
    q_scale = float(1 << quant_bits)
    e = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("emb"),
    ).withColumn("norm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    e = e.filter(F.col("norm") > 0).persist()
    spark = df.sparkSession
    seed_rows = (
        e.filter((F.col(id_col) >= 1) & (F.col(id_col) <= n_centroids))
        .select(F.col(id_col).alias("cid"), F.col("emb").alias("cvec"))
        .collect()
    )
    cents = {int(r["cid"]): list(r["cvec"]) for r in seed_rows}
    try:
        for _ in range(n_rounds):
            cent = spark.createDataFrame(
                [(cid, vec) for cid, vec in sorted(cents.items())],
                "cid long, cvec array<double>",
            ).withColumn("cnorm", F.sqrt(_dot(F.col("cvec"), F.col("cvec"))))
            assign = _assign_cells(e, F.broadcast(cent), id_col,
                                   out_col="cid")
            sums = (
                e.join(assign, id_col)
                .select(
                    "cid",
                    F.posexplode(F.transform(
                        "emb",
                        lambda x: F.floor(x * F.lit(q_scale)).cast("long"),
                    )).alias("dim", "qv"),
                )
                .groupBy("cid", "dim")
                .agg(F.sum("qv").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            new_cents = {}
            for r in sums:
                new_cents.setdefault(int(r["cid"]), {})[int(r["dim"])] = (
                    float(r["s"]) / float(r["n"] * q_scale))
            for cid, dims in new_cents.items():
                cents[cid] = [dims[d] for d in range(len(dims))]
            # cells with no members keep their previous centroid
    finally:
        e.unpersist()
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in sorted(cents.items())],
        "cid long, cvec array<double>",
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cvec"), F.col("cvec"))))


def cosine_topk(
    df: DataFrame, query_vec_id: int = 0, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k vs one stored vector. The query side is a
    1-row broadcast — zero shuffle of the corpus."""
    q = df.filter(F.col(id_col) == query_vec_id).select(
        _as_double(F.col(vec_col)).alias("qe")
    )
    corpus = df.filter(F.col(id_col) != query_vec_id).select(
        id_col, _as_double(F.col(vec_col)).alias("emb")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        id_col, F.round(cosine_expr(F.col("emb"), F.col("qe")), 4).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def band_values(vec_col, n_bits: int = 16, bands: int = 4) -> list:
    """Banded hyperplane LSH: ``n_bits`` sign bits (dim i > 0 — an
    IVF-coarse-quantizer stand-in both engines reproduce exactly) packed
    into ``bands`` integer band values, LSB-first within a band — the
    MinHash banding shape applied to hyperplane bits. Two vectors are
    near-dup candidates iff they agree on EVERY bit of at least one band:
    more total bits = finer buckets (superlinear candidate pruning as the
    corpus grows), banding restores the recall that a single wide bucket
    key would destroy."""
    assert n_bits % bands == 0, (
        f"n_bits={n_bits} must divide evenly into bands={bands} — a "
        "remainder would silently drop the trailing sign bits and give "
        "coarser buckets than requested"
    )
    per = n_bits // bands
    vals = []
    for b in range(bands):
        v = F.lit(0)
        for j in range(per):
            dim = b * per + j  # F.get is 0-based and null-safe out of bounds
            v = v + F.when(F.get(vec_col, dim) > 0, 1 << j).otherwise(0)
        vals.append(v.cast("int"))
    return vals


def _banded(df: DataFrame, vec_col: str, id_col: str, n_bits: int, bands: int):
    """(id, emb, norm, band0..bandN-1) — norms hoisted out of the pair
    loop (one fold per row, not three per candidate pair)."""
    emb = _as_double(F.col(vec_col))
    return df.select(
        id_col,
        emb.alias("emb"),
        F.sqrt(_dot(emb, emb)).alias("norm"),
        *[v.alias(f"band{b}")
          for b, v in enumerate(band_values(F.col(vec_col), n_bits, bands))],
    )


def embedding_near_dup_pairs(
    df: DataFrame, min_cos_1e4: int = 9000,
    vec_col: str = "embedding", id_col: str = "vec_id",
    n_bits: int = 16, bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded hyperplane LSH:
    candidates share ≥1 exact band of sign bits, then verify by cosine.

    Scale shape: the candidate self-join shuffles (id, band_idx, band_val)
    ONLY — 12 bytes a row, never the vectors; embeddings are fetched back
    by two id-equi-joins for the verify stage. With b bands of n/b bits
    the expected candidate fraction is b/2^(n/b) per pair — raising
    ``n_bits`` with corpus size drops candidates-per-bucket superlinearly
    (evidence: BASELINE.md §embedding-lsh), where a fixed 2^3-bucket
    scheme stayed O(n²/8).
    """
    e = _banded(df, vec_col, id_col, n_bits, bands)
    bands_arr = F.array(*[
        F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_val"))
        for b in range(bands)
    ])
    exploded = e.select(
        F.col(id_col), F.explode(bands_arr).alias("b")
    ).select(id_col, "b.band_idx", "b.band_val")
    a, bb = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
    ea = e.select(F.col(id_col).alias("vec_a"), F.col("emb").alias("emb_a"),
                  F.col("norm").alias("norm_a"))
    eb = e.select(F.col(id_col).alias("vec_b"), F.col("emb").alias("emb_b"),
                  F.col("norm").alias("norm_b"))
    cos = F.try_divide(_dot(F.col("emb_a"), F.col("emb_b")),
                       F.col("norm_a") * F.col("norm_b"))
    return (
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .select(
            "vec_a", "vec_b",
            F.floor(cos * 10000).cast("int").alias("cos_1e4"),
        )
        .filter(F.col("cos_1e4") >= min_cos_1e4)
    )


def lsh_bucketed_topk(
    df: DataFrame, query_vec_id: int = 0, k: int = 5,
    vec_col: str = "embedding", id_col: str = "vec_id",
    n_bits: int = 16, bands: int = 4,
) -> DataFrame:
    """ANN: score only vectors sharing ≥1 sign-bit band with the query
    (deterministic multi-probe). At corpus scale the band values are
    partition keys, so a query touches ~bands/2^(n_bits/bands) of the
    data instead of a fixed 1/8."""
    e = _banded(df, vec_col, id_col, n_bits, bands)
    q = e.filter(F.col(id_col) == query_vec_id).select(
        F.col("emb").alias("qe"), F.col("norm").alias("qnorm"),
        *[F.col(f"band{b}").alias(f"qband{b}") for b in range(bands)],
    )
    shares_band = None
    for b in range(bands):
        m = F.col(f"band{b}") == F.col(f"qband{b}")
        shares_band = m if shares_band is None else (shares_band | m)
    cand = (
        e.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .filter(shares_band)
    )
    return (
        cand.select(
            id_col,
            F.round(
                F.try_divide(_dot(F.col("emb"), F.col("qe")),
                             F.col("norm") * F.col("qnorm")), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_topk(
    df: DataFrame, query_vec_id: int = 0, k: int = 5,
    n_centroids: int = 16, nprobe: int = 4,
    vec_col: str = "embedding", id_col: str = "vec_id",
    cent: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``n_centroids``
    cells (nearest centroid by cosine), probe only the ``nprobe`` cells
    closest to the query, then exact-score the survivors.

    Centroids default to the vectors with ids 1..n_centroids — a
    deterministic seed set both engines reproduce exactly; pass
    ``cent=kmeans_refine(df, ...)`` for Lloyd-refined centroids (still
    bit-replayable: the refinement is integer-quantized, so the
    assignment argmax stays hash-checkable against the SQL oracle).

    Scale shape: the build pass is one broadcast of k centroid vectors
    against the corpus (no corpus shuffle) folded map-side into an
    (id, cell) table by a partial-aggregated ``max(struct)`` argmax —
    at 100 TB that table is written once, partitioned by cell, and a
    query reads ~nprobe/n_centroids of the corpus by partition pruning
    instead of scanning it. Query-side joins are all broadcasts (nprobe
    cell ids, one query vector); the only wide shuffle is the argmax
    partial-agg carrying (id, 16 bytes). Zero-norm vectors score null
    and never win the argmax (both engines order them last).
    """
    e = df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("emb"),
    ).withColumn("norm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    if cent is None:
        cent = e.filter(
            (F.col(id_col) >= 1) & (F.col(id_col) <= n_centroids)
        ).select(F.col(id_col).alias("cid"), F.col("emb").alias("cvec"),
                 F.col("norm").alias("cnorm"))
    corpus = e.filter(F.col(id_col) != query_vec_id)
    assign = _assign_cells(corpus, cent, id_col, out_col="cid")
    q = e.filter(F.col(id_col) == query_vec_id).select(
        F.col("emb").alias("qe"), F.col("norm").alias("qnorm"))
    qcos = F.try_divide(_dot(F.col("cvec"), F.col("qe")),
                        F.col("cnorm") * F.col("qnorm"))
    qcells = (
        cent.crossJoin(F.broadcast(q))
        .select("cid", qcos.alias("qcs"))
        .orderBy(F.col("qcs").desc(), F.col("cid").asc())
        .limit(nprobe).select("cid")
    )
    cand_ids = assign.join(F.broadcast(qcells), "cid").select(id_col)
    return (
        corpus.join(cand_ids, id_col)  # vectors fetched by id-equi-join
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(F.try_divide(_dot(F.col("emb"), F.col("qe")),
                                 F.col("norm") * F.col("qnorm")), 4
                    ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_topk_batch(
    df: DataFrame, query_ids: list[int], k: int = 5,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Batched brute-force cosine top-k: one row per (query, neighbor)
    with per-query rank — the shape production ANN actually runs (a
    batch of queries against the corpus, never one vector at a time).

    Scale shape: the query set is tiny by definition, so it BROADCASTS
    and the corpus is scanned ONCE for all queries (per-query scans
    would multiply the dominant cost by |batch|); the per-query top-k is
    a window rank partitioned by query id — the only shuffle, carrying
    (query_id, neighbor_id, score) triples, and bounded-size because
    scores below any chance of ranking could be pre-filtered upstream.
    """
    from pyspark.sql import Window

    q = df.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qe")
    )
    corpus = df.select(id_col, _as_double(F.col(vec_col)).alias("emb"))
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", id_col,
            F.round(cosine_expr(F.col("emb"), F.col("qe")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def semantic_dedup(
    df: DataFrame, n_centroids: int = 16, min_cos_1e4: int = 3000,
    vec_col: str = "embedding", id_col: str = "vec_id",
    cent: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding space, then drop any
    document whose cosine similarity to a LOWER-id member of the SAME
    cell reaches ``min_cos_1e4/1e4`` — the canonical-survivor rule every
    other dedup in this repo uses (min id wins), applied in embedding
    space. Thresholding on floor(1e4*cos) matches the convention of
    ``embedding_near_dup_pairs`` so the oracle compares integers, not
    rounding modes.

    Centroids default to the deterministic seed set (ids
    1..n_centroids), same as ``ivf_topk``; pass
    ``cent=kmeans_refine(df, ...)`` for Lloyd-refined cells (still
    bit-replayable — see ``ann_ivf_refined``'s unrolled oracle).

    Scale shape: this is exactly why SemDeDup clusters first — the
    pairwise stage is confined WITHIN cells, so its cost is
    sum(|cell|^2) instead of N^2, and n_centroids is the knob that keeps
    |cell| bounded as the corpus grows (at 10^9 docs you run ~100k
    cells so cells stay ~10^4). The plan: one broadcast of k centroid
    vectors (no corpus shuffle) -> map-side argmax partial-agg carrying
    (id, cell) -> ONE hash shuffle on cell for the self-join -> the
    dup-id set is tiny and broadcast-anti-joins back. Vectors travel the
    cell shuffle once; ids travel everywhere else.

    Returns one row per corpus vector: (vec_id, cell, kept).
    """
    e = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("emb"),
    ).withColumn("norm", F.sqrt(_dot(F.col("emb"), F.col("emb"))))
    if cent is None:
        cent = e.filter(
            (F.col(id_col) >= 1) & (F.col(id_col) <= n_centroids)
        ).select(F.col(id_col).alias("cid"), F.col("emb").alias("cvec"),
                 F.col("norm").alias("cnorm"))
    assign = _assign_cells(e, cent, id_col, out_col="cell")
    members = assign.join(e, id_col).select(id_col, "cell", "emb", "norm")
    a = members.select(
        F.col("cell"), F.col(id_col).alias("id_a"),
        F.col("emb").alias("emb_a"), F.col("norm").alias("norm_a"))
    b = members.select(
        F.col("cell"), F.col(id_col).alias("id_b"),
        F.col("emb").alias("emb_b"), F.col("norm").alias("norm_b"))
    pair_cos = F.floor(
        F.lit(10000) * F.try_divide(_dot(F.col("emb_a"), F.col("emb_b")),
                                    F.col("norm_a") * F.col("norm_b")))
    dup_ids = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(pair_cos >= min_cos_1e4)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    # dup_ids is a corpus-sized fraction (semantic dedup routinely prunes
    # a third of the docs), so NO broadcast hint — the membership join
    # shuffles narrow (id) rows; AQE still broadcasts when it's small
    return (
        members.join(dup_ids.withColumn("_dup", F.lit(True)),
                     id_col, "left")
        .select(
            id_col, "cell",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"),
        )
    )


def _pq_dist_u(a, b, j, sub_dim: int):
    """Integer micro-quantized squared L2 between subvectors ``j`` of
    two (double-cast) arrays: each squared-diff TERM is floored to
    1e-6 units before the integer sum, so the result is identical
    under any summation order in any engine (the lm.py trick applied
    per term — argmin and ADC ties then agree bit-for-bit with the SQL
    oracle instead of hinging on FP addition order)."""
    return F.aggregate(
        F.zip_with(
            F.slice(a, j * sub_dim + 1, sub_dim),
            F.slice(b, j * sub_dim + 1, sub_dim),
            lambda x, y: F.floor((x - y) * (x - y) * 1e6 + 0.5)
            .cast("bigint"),
        ),
        F.lit(0).cast("bigint"), lambda acc, t: acc + t)


def pq_topk(
    df: DataFrame, query_vec_id: int = 0, k: int = 10,
    m: int = 8, n_codes: int = 16, shortlist: int | None = None,
    vec_col: str = "embedding", id_col: str = "vec_id",
    cent: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): each vector is
    compressed to ``m`` one-byte codes (nearest sub-codebook centroid
    per subspace), and a query scores the corpus by asymmetric distance
    computation — summing ``m`` lookups in a per-query distance table —
    without ever touching the float vectors.  With ``shortlist`` set,
    the ADC ranking only prunes: the top ``shortlist`` candidates are
    re-ranked by exact (integer-quantized) L2 against the true vectors
    fetched by id — the standard two-stage deployment (measured on the
    sf0.001 fixture: recall@10 = 9/10 at shortlist 50, 10/10 at 100).

    Codebooks default to the subvectors of the vectors with ids
    1..``n_codes`` — the same deterministic seed-set convention as
    ``ivf_topk``; pass ``cent=kmeans_refine(df, n_centroids=n_codes)``
    for refined codebooks (cid-dense 1..n_codes, sliced into subspaces
    the same way). Seeds keep every assignment bit-checkable against
    the DuckDB oracle.

    Scale shape: both the encode pass and the query pass are a
    broadcast of ONE collected-array row (16 centroid vectors / the
    m×16 integer distance table) against the corpus — no corpus
    shuffle anywhere; the only wide operation is the final top-k.  At
    100 TB the codes table is 8 bytes/vector (32x smaller than the
    float vectors), written once and scanned instead of the embeddings
    for every query; re-ranking survivors against the true vectors is
    an id-equi-join exactly like ``ivf_topk``'s candidate fetch.  The
    per-row argmin/ADC run as array HOFs over 16-element arrays; an
    Arrow-vectorized encode kernel is a drop-in for the encode pass if
    profile ever shows the interpreted lambdas dominating."""
    e = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("emb"))
    if cent is not None:
        # refined drop-in (kmeans_refine output): cid-dense 1..n_codes
        # full vectors — the subspace slicing below applies unchanged
        cent_src = cent.select(
            F.col("cid").cast("long").alias("cid"), F.col("cvec"))
    else:
        cent_src = e.filter(
            (F.col(id_col) >= 1) & (F.col(id_col) <= n_codes)
        ).select(F.col(id_col).alias("cid"), F.col("emb").alias("cvec"))
    cents_arr = (
        cent_src
        .select(F.struct(F.col("cid").cast("int").alias("cid"),
                         F.col("cvec").alias("cvec")).alias("c"))
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )
    # one tiny probe action: the ADC lookup indexes the cid-sorted
    # centroid array BY code, which is only valid when the seed ids
    # 1..n_codes are ALL present — a gap would silently misalign codes
    probe = e.agg(F.max(F.size("emb")).alias("d")).collect()[0]
    nc = cent_src.filter(F.col("cid").between(1, n_codes)).count()
    if probe["d"] is None:
        raise ValueError("pq_topk: empty input frame")
    if nc != n_codes:
        raise ValueError(
            f"pq_topk: need vectors with ids 1..{n_codes} as "
            f"sub-codebooks; found {nc} of {n_codes}")
    dim = probe["d"]
    cent = cents_arr
    sub_dim = dim // m

    corpus = e.filter(F.col(id_col) != query_vec_id)
    # encode: codes[j] = argmin_c dist_u(sub_j(v), sub_j(cent_c)),
    # ties to the lowest cid (lexicographic struct min)
    codes = corpus.crossJoin(F.broadcast(cent)).select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.array_min(F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    _pq_dist_u(F.col("emb"), c["cvec"], j, sub_dim)
                    .alias("du"),
                    c["cid"].alias("cid")),
            ))["cid"],
        ).alias("codes"),
    )
    # per-query distance table: dtab[j][c] over the same integer units
    q = e.filter(F.col(id_col) == query_vec_id).select(
        F.col("emb").alias("qe"))
    dtab = q.crossJoin(F.broadcast(cent)).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.transform(
                F.col("cents"),
                lambda c: _pq_dist_u(F.col("qe"), c["cvec"], j, sub_dim)),
        ).alias("dtab"))
    # ADC: sum of m table lookups per row (codes are 1-based into the
    # cid-sorted centroid array because cids are 1..n_codes)
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("dtab"),
            lambda code, row: F.element_at(row, code)),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    scored = (
        codes.crossJoin(F.broadcast(dtab))
        .select(id_col, adc.alias("adc_dist_u"))
    )
    if shortlist is None:
        return scored.orderBy(
            F.col("adc_dist_u").asc(), F.col(id_col).asc()).limit(k)
    # production two-stage: ADC shortlist, then exact re-rank against
    # the true vectors fetched by id-equi-join (same pattern as
    # ivf_topk's candidate fetch) — 8-byte codes prune the corpus,
    # floats are read only for `shortlist` survivors
    cand = scored.orderBy(
        F.col("adc_dist_u").asc(), F.col(id_col).asc()).limit(shortlist)
    exact = F.aggregate(
        F.zip_with(F.col("emb"), F.col("qe"),
                   lambda x, y: F.floor((x - y) * (x - y) * 1e6 + 0.5)
                   .cast("bigint")),
        F.lit(0).cast("bigint"), lambda acc, t: acc + t)
    return (
        corpus.join(F.broadcast(cand), id_col)
        .crossJoin(F.broadcast(q))
        .select(id_col, "adc_dist_u", exact.alias("l2_dist_u"))
        .orderBy(F.col("l2_dist_u").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pool_embeddings(df: DataFrame, group_size: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    scale: int = 1_000_000) -> DataFrame:
    """Mean-pool consecutive groups of embeddings — the chunk→document
    (or turn→conversation) pooling step of an embedding pipeline.
    Returns one row per (group, dimension): ``(group_id, dim, n_vecs,
    mean_q)`` with mean_q = floor(Σ floor(v·scale) / n).

    Order-free by construction: each float quantizes to an integer
    BEFORE the sum (float addition order would otherwise differ between
    engines/partitionings — the lm.py trick applied to vectors), so the
    pooled values hash-match a DuckDB replay exactly. Per-dim rows make
    every dimension verifiable rather than summarizing the vector.

    Scale shape: posexplode rides the scan; the only shuffle is the
    (group, dim) partial-aggregated sum — integer rows, map-side
    combinable; reassembling `array` vectors is one optional
    collect_list away when a consumer needs them packed."""
    gid = F.expr(f"{id_col} DIV {group_size}").alias("group_id")
    ex = df.select(
        gid, F.posexplode(F.col(vec_col)).alias("dim", "_v"),
    ).select(
        "group_id", "dim",
        F.floor(F.col("_v").cast("double") * scale).cast("long").alias("_q"),
    )
    return (
        ex.groupBy("group_id", "dim")
        .agg(F.count("*").alias("n_vecs"), F.sum("_q").alias("_s"))
        .select(
            "group_id", "dim", "n_vecs",
            F.floor(F.col("_s") / F.col("n_vecs")).cast("long")
            .alias("mean_q"),
        )
    )
