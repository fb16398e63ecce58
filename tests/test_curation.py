"""Curation operators: benchmark decontamination, deterministic
stratified sampling, token-budget packing — hand-derived goldens plus
hostile inputs (null/empty text, unseen strata)."""

from __future__ import annotations

from pyspark.sql import functions as F

from loongcollector_spark.functions.curation import (
    decontaminate, ngram_hash_frame, pack_assignments, rate_cutoff_hex,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_ngram_hashes_short_doc_fallback_and_empty(spark):
    df = _docs(spark, [
        (1, "a b c d e f", "s"),       # 2 distinct 5-grams
        (2, "tiny doc", "s"),          # whole text as one gram
        (3, None, "s"), (4, "   ", "s"),  # contribute nothing
        (5, "A  B\tc  d  E  f", "s"),  # normalizes to doc 1's text
    ])
    got = ngram_hash_frame(df, n=5).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["doc_id"], set()).add(r["gram_hash"])
    assert set(by_id) == {1, 2, 5}
    assert len(by_id[1]) == 2 and len(by_id[2]) == 1
    assert by_id[5] == by_id[1]  # case/whitespace-normalized


def test_decontaminate_counts_shared_grams(spark):
    corpus = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog", "s"),
        (2, "completely unrelated words here now", "s"),
        (3, None, "s"),
    ])
    bench = _docs(spark, [
        (100, "quick brown fox jumps over", "s"),  # 1 shared 5-gram
    ])
    got = {r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
           for r in decontaminate(corpus, bench, n=5).collect()}
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)  # null text still present, 0 hits


def test_decontaminate_plan_broadcasts_benchmark(spark):
    corpus = _docs(spark, [(1, "a b c d e f", "s")])
    bench = _docs(spark, [(2, "a b c d e", "s")])
    plan = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_rate_cutoff_hex_bounds():
    assert rate_cutoff_hex(0.0) == "0000"
    assert rate_cutoff_hex(0.25) == "4000"
    assert rate_cutoff_hex(1.0) == "g"
    assert rate_cutoff_hex(1.5) == "g"
    # rates that ROUND to 65536 must not emit the 5-char '10000', which
    # compares below most 4-char hashes and would keep only ~6%
    assert rate_cutoff_hex(0.999995) == "ffff"
    assert len(rate_cutoff_hex(0.9999999)) == 4


def test_stratified_sample_rates_and_rank(spark):
    rows = [(i, f"doc {i}", "keep_all" if i < 50 else "drop_all")
            for i in range(100)]
    out = stratified_sample(
        _docs(spark, rows), strata_col="source",
        rates={"keep_all": 1.0, "drop_all": 0.0},
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == list(range(50))  # rate 1.0 keeps all, 0.0 none
    ranks = sorted(r["sample_rank"] for r in out)
    assert ranks == list(range(1, 51))  # dense in-stratum rank
    # deterministic: same rows on re-run
    again = stratified_sample(
        _docs(spark, rows), strata_col="source",
        rates={"keep_all": 1.0, "drop_all": 0.0},
    ).collect()
    assert {(r["doc_id"], r["sample_rank"]) for r in again} == \
        {(r["doc_id"], r["sample_rank"]) for r in out}


def test_stratified_sample_default_rate_applies_to_unseen_strata(spark):
    rows = [(i, "x", "unlisted") for i in range(2000)]
    n = len(stratified_sample(
        _docs(spark, rows), rates={"other": 1.0}, default_rate=0.1
    ).collect())
    assert 120 <= n <= 280  # ~10% of 2000, md5-uniform


def test_pack_assignments_golden(spark):
    rows = [
        (1, "w " * 100, "s"),   # 100 tokens → bin 0 offset 0
        (2, "w " * 200, "s"),   # bin 0 offset 100 (straddles into bin 1)
        (3, "w " * 10, "s"),    # cum 300 → bin 1 offset 44
        (4, None, "s"),         # 0 tokens, cum 310 → bin 1 offset 54
        (5, "w " * 5, "s"),     # same bin, offset 54
        (6, "w " * 7, "t"),     # independent group
    ]
    got = {r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"])
           for r in pack_assignments(_docs(spark, rows), budget=256).collect()}
    assert got[1] == (100, 0, 0)
    assert got[2] == (200, 0, 100)
    assert got[3] == (10, 1, 44)
    assert got[4] == (0, 1, 54)
    assert got[5] == (5, 1, 54)
    assert got[6] == (7, 0, 0)


def test_pack_assignments_bins_respect_budget_continuity(spark):
    # token conservation: last doc's (bin_id*budget + offset + n_tokens)
    # equals the group's total token count
    rows = [(i, "tok " * (i % 37 + 1), f"g{i % 3}") for i in range(60)]
    out = pack_assignments(_docs(spark, rows), budget=64)
    tot = {r["source"]: r["t"] for r in
           out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()}
    last = out.withColumn(
        "end", F.col("bin_id") * 64 + F.col("bin_offset") + F.col("n_tokens")
    ).groupBy("source").agg(F.max("end").alias("end")).collect()
    for r in last:
        assert r["end"] == tot[r["source"]]


def test_pii_scrub_categories_and_order(spark):
    from loongcollector_spark.functions.curation import pii_scrub

    rows = [
        (1, "write to Bob.Smith+x@sub.example.co.uk today", "s"),
        (2, "server 192.168.001.5 and 10.0.0.1 up", "s"),
        (3, "call +1-555-0100 or 555 123 4567 now", "s"),
        (4, "mixed a@b.io from 8.8.8.8 tel 86-1234-5678", "s"),
        (5, "clean text, version 1.2 build 34", "s"),
        (6, None, "s"),
    ]
    got = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert got[1]["text_scrubbed"] == "write to <EMAIL> today"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 0, 0)
    assert got[2]["text_scrubbed"] == "server <IP> and <IP> up"
    assert got[2]["n_ipv4"] == 2
    assert got[3]["text_scrubbed"] == "call <PHONE> or <PHONE> now"
    assert got[3]["n_phone"] == 2
    # order: email eaten before its digits could feed phone; dotted quad
    # never half-matches the phone shape
    assert got[4]["text_scrubbed"] == "mixed <EMAIL> from <IP> tel <PHONE>"
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (1, 1, 1)
    # version/build numbers survive (precision guard)
    assert got[5]["text_scrubbed"] == rows[4][1]
    assert got[6]["text_scrubbed"] == ""


def _lines(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, line_idx int, text string")


def test_line_dedup_removes_corpus_frequent_lines(spark):
    from loongcollector_spark.functions.curation import line_dedup

    rows = []
    for d in range(4):
        rows.append((d, 0, "COOKIE BANNER"))       # 4 occurrences
        rows.append((d, 1, f"unique prose {d}"))
        rows.append((d, 2, "  COOKIE BANNER  "))   # trims to the same key
    rows.append((9, 0, ""))                        # empty never boilerplate
    rows.append((9, 1, "COOKIE BANNER"))           # 9th occurrence
    got = {r["doc_id"]: r for r in line_dedup(
        _lines(spark, rows), threshold=5, id_col="doc_id",
        order_col="line_idx", line_col="text").collect()}
    for d in range(4):
        assert got[d]["n_removed"] == 2 and got[d]["n_kept"] == 1
        assert got[d]["text_clean"] == f"unique prose {d}"
    assert got[9]["n_removed"] == 1  # the banner
    assert got[9]["text_clean"] == ""  # empty line kept, joins to ''
    assert got[9]["n_kept"] == 1


def test_line_dedup_below_threshold_keeps_everything(spark):
    from loongcollector_spark.functions.curation import line_dedup

    rows = [(1, 0, "a"), (1, 1, "b"), (2, 0, "a")]
    got = {r["doc_id"]: r for r in line_dedup(
        _lines(spark, rows), threshold=3).collect()}
    assert got[1]["text_clean"] == "a\nb" and got[1]["n_removed"] == 0
    assert got[2]["text_clean"] == "a"


def test_line_dedup_plan_broadcasts_boilerplate(spark):
    from loongcollector_spark.functions.curation import line_dedup

    plan = line_dedup(
        _lines(spark, [(1, 0, "x")]), threshold=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_domain_stats_normalizes_and_blocks(spark):
    from loongcollector_spark.functions.curation import (
        blocklist_filter, domain_stats)

    df = spark.createDataFrame(
        [("https://WWW.Evil.COM:8080/x",), ("http://cdn.evil.com/y",),
         ("https://good.org/z",), ("not a url",), (None,)],
        "url string")
    got = {r["domain"]: r for r in domain_stats(
        df, "url", blocked=["evil.com"]).collect()}
    assert set(got) == {"evil.com", "good.org"}
    assert got["evil.com"]["n_urls"] == 2
    assert got["evil.com"]["n_hosts"] == 2  # www.evil.com + cdn.evil.com
    assert got["evil.com"]["blocked"] is True
    assert got["good.org"]["blocked"] is False

    kept = blocklist_filter(df, "url", ["evil.com"]).collect()
    assert sorted(r["url"] for r in kept if r["url"]) == [
        "https://good.org/z", "not a url"]  # non-URLs pass through


def test_minhash_verified_pairs_prunes_false_positives(spark):
    """Near-identical docs pass the Jaccard gate; docs that merely share
    a band bucket by chance (or share SOME shingles but < threshold) are
    pruned by the verify stage."""
    from loongcollector_spark.functions.dedup import (
        minhash_lsh_pairs, minhash_verified_pairs)

    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "s"),
        (2, "alpha beta gamma delta epsilon zeta", "s"),     # exact dup of 1
        (3, "alpha beta gamma delta epsilon ETA", "s"),      # near dup of 1
        (4, "one two three four five six seven", "s"),       # unrelated
    ]
    df = _docs(spark, rows)
    cand = {(r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(df, 4, 3, 2).collect()}
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_1e3"]
           for r in minhash_verified_pairs(
               df, 4, 3, 2, min_jaccard_1e3=500).collect()}
    assert (1, 2) in got and got[(1, 2)] == 1000
    assert set(got) <= cand          # verify only ever prunes
    assert all(j >= 500 for j in got.values())
    assert not any(4 in p for p in got)  # unrelated doc never survives


def test_char_entropy_known_values(spark):
    """aaaa = 0 bits, abab = 1, abcd = 2, and empty/null docs drop."""
    from loongcollector_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "hello world")],
        "doc_id int, text string")
    got = {r["doc_id"]: (r["n_chars"], r["entropy_1e3"])
           for r in char_entropy(df).collect()}
    assert got == {1: (4, 0), 2: (4, 1000), 3: (4, 2000), 4: (11, 2845)}


def test_incremental_dedup_statuses(spark):
    """Admitted = unseen in snapshot AND first in batch (min id);
    whitespace/case normalization matches exact_dedup's fingerprint."""
    from loongcollector_spark.functions.curation import incremental_dedup

    snap = spark.createDataFrame(
        [(1, "old doc"), (2, "shared  TEXT")], "doc_id int, text string")
    batch = spark.createDataFrame(
        [(10, "brand new"), (11, "shared text"), (12, "brand NEW"),
         (13, "another")],
        "doc_id int, text string")
    got = {r["doc_id"]: r["status"]
           for r in incremental_dedup(batch, snap).collect()}
    assert got == {10: "new", 11: "dup_snapshot", 12: "dup_batch",
                   13: "new"}
    # precomputed-fingerprint snapshot (the 100 TB path: stored fp table)
    from loongcollector_spark.functions.text import with_fingerprint

    fps = with_fingerprint(snap).select("fingerprint")
    got2 = {r["doc_id"]: r["status"]
            for r in incremental_dedup(batch, fps).collect()}
    assert got2 == got


def test_hashed_classifier_known_values(spark):
    """Hand-computed dot product on a 2-doc corpus: the md5 bucket/weight
    derivation is replayed in pure Python and must match the Spark frame."""
    import hashlib
    import math

    from loongcollector_spark.functions.classifier import hashed_ngram_scores

    def bucket(g, n=64):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n

    def weight(b):
        return int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000

    docs = [("a", "Red fox  runs"), ("b", "fox")]
    expected = {}
    for doc_id, text in docs:
        ws = text.strip().lower().split()
        grams = ws + [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]
        score = sum(weight(bucket(g)) for g in grams)
        prob = 1.0 / (1.0 + math.exp(-(score / (len(grams) * 1000.0))))
        expected[doc_id] = (len(grams), score, round(prob, 10))

    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r.doc_id: (r.n_grams, r.score_milli, round(r.prob, 10))
        for r in hashed_ngram_scores(df, n_buckets=64).collect()
    }
    assert got == expected


def test_hashed_classifier_plan_broadcast_no_text_shuffle(spark):
    """Scale posture: the weight join is BROADCAST and no exchange
    carries the text column — shuffles move (doc, bucket, count) ints."""
    from loongcollector_spark.functions.classifier import hashed_ngram_scores

    df = spark.createDataFrame(
        [(f"d{i}", "some words here") for i in range(10)],
        "doc_id string, text string")
    plan = hashed_ngram_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)


def test_chunk_windows_layout(spark):
    from loongcollector_spark.functions.curation import chunk_windows

    words120 = " ".join(f"w{i}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, words120), (2, "a b c"), (3, None), (4, "")],
        "doc_id long, text string")
    rows = {(r["doc_id"], r["chunk_idx"]): r
            for r in chunk_windows(docs, window=64, stride=48,
                                   min_tokens=8).collect()}
    # doc 1: 120 words -> starts 0, 48, 96; tail 120-96=24 >= 8 kept
    assert {(1, 0), (1, 1), (1, 2)} <= set(rows)
    assert rows[(1, 0)]["n_tokens"] == 64
    assert rows[(1, 0)]["chunk_text"].split(" ")[0] == "w0"
    assert rows[(1, 1)]["start_tok"] == 48
    assert rows[(1, 1)]["chunk_text"].split(" ")[0] == "w48"
    assert rows[(1, 2)]["n_tokens"] == 24
    assert rows[(1, 2)]["chunk_text"].split(" ")[-1] == "w119"
    # short / null / empty docs: below min_tokens, no chunks
    assert not any(d in (2, 3, 4) for d, _ in rows)


def test_training_shuffle_deterministic_and_seed_sensitive(spark):
    from loongcollector_spark.functions.curation import training_shuffle

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(50)], "doc_id long, text string")
    a1 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in training_shuffle(docs, n_shards=4, seed="e0").collect()}
    a2 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in training_shuffle(
              docs.repartition(7), n_shards=4, seed="e0").collect()}
    assert a1 == a2                      # partitioning-independent
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in training_shuffle(docs, n_shards=4, seed="e1").collect()}
    assert a1 != b                       # a new seed reshuffles
    # positions are a dense 0..n-1 sequence within each shard
    from collections import defaultdict
    per = defaultdict(list)
    for shard, pos in a1.values():
        per[shard].append(pos)
    for shard, poss in per.items():
        assert sorted(poss) == list(range(len(poss)))


def test_incremental_minhash_statuses(spark):
    """Near-dup admission: a batch doc whose text near-matches a
    snapshot doc is dup_snapshot; near-dups only within the batch keep
    the min id as new; unrelated docs admit."""
    from loongcollector_spark.functions.dedup import (
        incremental_minhash_dedup, minhash_band_frame,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    snap = spark.createDataFrame(
        [(1, base)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, base),                          # identical -> snapshot hit
         (11, "completely different words with no overlap at all ok"),
         (12, "completely different words with no overlap at all ok"),
         (13, "yet another unrelated document body entirely here now")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in incremental_minhash_dedup(
        batch, minhash_band_frame(snap)).collect()}
    assert out[10]["status"] == "dup_snapshot"
    assert out[10]["hit_bands"] > 0
    assert out[11]["status"] == "new"
    assert out[12]["status"] == "dup_batch"   # min-id 11 survives
    assert out[13]["status"] == "new"


def test_minhash_wide_signature_model(spark):
    """n_hashes > 4 via salted digest groups: group g hashes md5('g<g>|'+s)
    and windows cycle the 4 disjoint 8-hex slices — cross-checked against
    a direct hashlib model, and group 0 stays byte-compatible with the
    original one-digest form."""
    import hashlib

    from loongcollector_spark.functions.dedup import minhash_signatures

    docs = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs now")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n_hashes, shingle = 12, 3
    rows = {r["doc_id"]: r for r in
            minhash_signatures(df, n_hashes=n_hashes, shingle=shingle).collect()}

    def model(text):
        words = text.split()
        shingles = [" ".join(words[i:i + shingle])
                    for i in range(len(words) - shingle + 1)] or [" ".join(words)]
        sig = []
        for i in range(n_hashes):
            g, w = i // 4, i % 4
            salt = f"g{g}|" if g else ""
            sig.append(min(
                hashlib.md5((salt + s).encode()).hexdigest()[8 * w:8 * w + 8]
                for s in shingles))
        return sig

    for doc_id, text in docs:
        got = [rows[doc_id][f"mh{i}"] for i in range(n_hashes)]
        assert got == model(text), doc_id


def test_exact_substr_trim_removes_cross_doc_spans(spark):
    """Lee et al. span-trim: the min-doc keeps its copy, every other doc
    deletes the covered tokens; unique docs pass through untouched."""
    import hashlib

    from loongcollector_spark.functions.curation import exact_substr_trim

    docs = [
        (1, "a b c d e f g h i j"),
        (2, "x y a b c d e f g h i j z"),
        (3, "p q r s t u v w"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in exact_substr_trim(df, k=4).collect()}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert rows[1]["n_removed"] == 0 and rows[1]["trimmed_md5"] == md5(docs[0][1])
    assert rows[2]["n_total"] == 13 and rows[2]["n_removed"] == 10
    assert rows[2]["trimmed_md5"] == md5("x y z")
    assert rows[3]["n_removed"] == 0 and rows[3]["trimmed_md5"] == md5(docs[2][1])


def test_exact_substr_trim_full_removal_and_short_docs(spark):
    import hashlib

    from loongcollector_spark.functions.curation import exact_substr_trim

    docs = [
        (1, "a b c d"),   # min doc keeps
        (2, "a b c d"),   # fully removed
        (3, "xy"),        # shorter than k: no grams, untouched
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in exact_substr_trim(df, k=4).collect()}
    assert rows[1]["n_removed"] == 0
    assert rows[2]["n_removed"] == 4 and rows[2]["trimmed_md5"] == \
        hashlib.md5(b"").hexdigest()
    assert rows[3]["n_removed"] == 0 and rows[3]["n_total"] == 1


def test_train_perceptron_matches_python_model(spark):
    """Batch perceptron over hashed uni+bigram counts — integer-exact
    against a direct hashlib/dict reimplementation."""
    import hashlib

    from loongcollector_spark.functions.classifier import train_perceptron

    docs = [
        (1, "good great excellent work", 1),
        (2, "bad awful terrible mess", 0),
        (3, "good fine solid work", 1),
        (4, "bad poor broken mess", 0),
        (5, "great solid excellent fine", 1),
    ]
    n_buckets, iters, lr = 64, 3, 1
    df = spark.createDataFrame(docs, "doc_id long, text string, label int")
    got = {r["bucket"]: r["weight"]
           for r in train_perceptron(df, n_buckets=n_buckets,
                                     iters=iters, lr=lr).collect()}

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    feats = {}
    ys = {}
    for doc_id, text, label in docs:
        ws = text.lower().split()
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        c = {}
        for g in grams:
            c[bucket(g)] = c.get(bucket(g), 0) + 1
        feats[doc_id] = c
        ys[doc_id] = 2 * label - 1
    w = {}
    for _ in range(iters):
        grad = {}
        for d, c in feats.items():
            margin = sum(n * w.get(b, 0) for b, n in c.items())
            if ys[d] * margin <= 0:
                for b, n in c.items():
                    grad[b] = grad.get(b, 0) + ys[d] * n
        if not grad:
            break
        for b, g in grad.items():
            w[b] = w.get(b, 0) + lr * g
    want = {b: v for b, v in w.items() if v != 0}
    assert got == want
    # and the learned weights separate the training set
    for d, c in feats.items():
        margin = sum(n * want.get(b, 0) for b, n in c.items())
        assert ys[d] * margin > 0, d


def test_dsir_scores_rank_target_like_docs_higher(spark):
    """A raw doc sharing the target's vocabulary must out-score one that
    doesn't; per-bucket quantized log ratios match a direct model."""
    import hashlib
    import math

    from loongcollector_spark.functions.classifier import dsir_scores

    n_buckets = 128
    raw = [
        (1, "alpha beta gamma delta"),
        (2, "zeta eta theta iota"),
    ]
    target = [(10, "alpha beta gamma delta alpha beta")]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dsir_scores(rdf, tdf, n_buckets=n_buckets).collect()}
    assert got[1]["dsir_score_1e3"] > got[2]["dsir_score_1e3"]

    def feats(text):
        ws = text.lower().split()
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        c = {}
        for g in grams:
            b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
            c[b] = c.get(b, 0) + 1
        return c
    rb, tb = {}, {}
    for _i, t in raw:
        for b, n in feats(t).items():
            rb[b] = rb.get(b, 0) + n
    for _i, t in target:
        for b, n in feats(t).items():
            tb[b] = tb.get(b, 0) + n
    R, T = sum(rb.values()), sum(tb.values())
    for doc_id, text in raw:
        score = 0
        for b, n in feats(text).items():
            lr = math.floor(1000.0 * math.log10(
                ((tb.get(b, 0) + 1) * float(R + n_buckets))
                / ((rb.get(b, 0) + 1) * float(T + n_buckets))))
            score += n * lr
        assert got[doc_id]["dsir_score_1e3"] == score, doc_id


def test_kmv_distinct_exact_and_estimate(spark):
    """Small groups (< k) are exact; a larger group's KMV estimate lands
    within the standard ~1/sqrt(k) band of the truth."""
    from loongcollector_spark.functions.sketches import kmv_distinct

    rows = [("small", f"v{i % 7}") for i in range(50)]
    rows += [("big", f"u{i}") for i in range(2000)]
    rows += [("big", f"u{i}") for i in range(500)]  # repeats
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: r for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got["small"]["kmv_estimate"] == 7
    assert got["small"]["n_hashes"] == 7
    assert got["small"]["n_rows"] == 50
    est, truth = got["big"]["kmv_estimate"], 2000
    assert abs(est - truth) / truth < 0.5  # 3.9 sigma at k=64
    assert got["big"]["n_hashes"] == 64


def test_pagerank_int_matches_python_model(spark):
    """3 quantized rounds on a small weighted digraph — exact against a
    dict-based reimplementation of the same integer arithmetic."""
    from loongcollector_spark.functions.graph import pagerank_int

    edges = [("a", "b", 2), ("a", "c", 1), ("b", "c", 3), ("c", "a", 1),
             ("d", "a", 5)]  # d has no in-edges -> stays at base
    df = spark.createDataFrame(edges, "src string, dst string, c long")
    got = {r["node"]: r["rank_micro"]
           for r in pagerank_int(df, iters=3).collect()}

    nodes = {n for e in edges for n in e[:2]}
    out = {}
    for s, _d, c in edges:
        out[s] = out.get(s, 0) + c
    p = {n: 1_000_000 for n in nodes}
    base = 150 * 1_000_000 // 1000
    for _ in range(3):
        s = {}
        for a, b, c in edges:
            s[b] = s.get(b, 0) + (p[a] * c) // out[a]
        p = {n: base + (850 * s.get(n, 0)) // 1000 for n in nodes}
    assert got == p
    assert got["d"] == base
    # ranks order: c receives from everyone upstream of it
    assert got["c"] > got["b"]


def test_containment_asymmetry(spark):
    """A short doc quoted whole inside a long one: containment ~1000 in
    the contained->container direction, low Jaccard — the signal the
    symmetric metric misses; the reverse direction stays below
    threshold."""
    short = "alpha beta gamma delta epsilon zeta"
    long_doc = short + " " + " ".join(f"filler{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long_doc), (3, "totally different words here")],
        "doc_id long, text string")
    from loongcollector_spark.functions.dedup import (
        containment_pairs, minhash_verified_pairs,
    )

    rows = {(r["contained"], r["container"]): r["containment_1e3"]
            for r in containment_pairs(df, min_containment_1e3=900).collect()}
    assert rows.get((1, 2), 0) >= 900     # short fully inside long
    assert (2, 1) not in rows             # reverse direction below
    # Jaccard on the same pair is far below a near-dup threshold
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard_1e3"] for r in
           minhash_verified_pairs(df, min_jaccard_1e3=1).collect()}
    assert jac.get((1, 2), 0) < 300
