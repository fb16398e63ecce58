"""In-engine BPE tokenizer — training AND application (Sennrich et al.
2016, arXiv:1508.07909; the byte-pair-encoding algorithm behind
GPT-2/LLaMA-style tokenizers).

Why this is exactly reproducible cross-engine (the property every
other quantized op in this repo leans on): the merge step is DEFINED
as plain string ``replace`` over a separator-joined symbol string —
``␟a␟b␟`` → ``␟ab␟``, leftmost first, non-overlapping — which Spark
and DuckDB implement identically, so training rounds and tokenizer
application replay bit-for-bit in the oracle (the train_perceptron
unrolled-rounds pattern).

Variant note (the one deliberate deviation from canonical BPE): when a
merge pair's occurrences share a symbol boundary within a SAME-SYMBOL
run of length >= 4 (e.g. merging (a, a) inside "aaaa"), the replace
consumes the separator between matches, so the run merges as
[aa, a, a] where canonical BPE gives [aa, aa]. Runs of length <= 3 and
every non-run case are canonical. The trade is intentional: canonical
run-rescanning is inherently per-position sequential, while this
variant stays a pure codegen expression on BOTH engines — and the
training statistics are computed on the variant's own states, so the
learned tokenizer is self-consistent.

Scale shape (the parameter-server story): training runs on the WORD
FREQUENCY table, not the corpus — one whitespace-word count aggregate
reduces 10^12 turns to a vocabulary-bounded frame, and each merge
round is one map-side-combinable pair-count aggregate over it plus a
1-row argmax collect (the merge IS the model). Application is a chain
of codegen ``replace`` expressions — no shuffle at all beyond the word
count when re-tokenizing a corpus.

Determinism: ties on pair count break on (pair_a, pair_b) ascending —
the reference algorithm leaves tie order unspecified; this is the
deterministic refinement. Words are restricted to printable ASCII
(both engines, identically) so character splitting never hits
UTF-16-vs-codepoint divergence, and the ␟ (U+241F-free 0x1F unit
separator) cannot occur in a kept word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEP = "\x1f"
_ASCII_WORD = "^[\\x21-\\x7e]+$"  # printable ASCII, no space, no 0x1f


def word_frequencies(df: DataFrame, text_col: str = "text",
                     max_word_len: int = 64) -> DataFrame:
    """(word, n) over whitespace tokens — printable-ASCII words of at
    most ``max_word_len`` chars (both bounds replayed identically by
    the oracle; the cap bounds the pair-enumeration range) — the
    vocabulary-bounded frame BPE trains on."""
    words = F.explode(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"))
    return (
        df.select(words.alias("word"))
        .filter(F.col("word").rlike(_ASCII_WORD)
                & (F.length("word") <= max_word_len))
        .groupBy("word").agg(F.count("*").alias("n"))
    )


def _char_state(word_col) -> F.Column:
    """␟-joined character symbols with padding separators:
    "abc" → "␟a␟b␟c␟"."""
    return F.concat(
        F.lit(SEP),
        F.regexp_replace(word_col, "(.)", "$1" + SEP),
    )


def _pair_counts(states: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts over (state, n) rows."""
    syms = F.split(F.col("state"), SEP)
    k = F.size(syms) - 2  # padded: ["", s1..sk, ""]
    left = F.slice(syms, 2, k - 1)
    right = F.slice(syms, 3, k - 1)
    pair = F.explode(F.arrays_zip(left.alias("a"), right.alias("b")))
    return (
        states.filter(k >= 2)
        .select(pair.alias("p"), F.col("n"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def bpe_train(df: DataFrame, n_merges: int = 6,
              text_col: str = "text") -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    [(a, b, count), ...] in rank order. Driver-synchronized rounds:
    each collects exactly ONE row (the argmax pair — the model), the
    word table never leaves the executors."""
    states = word_frequencies(df, text_col).select(
        _char_state(F.col("word")).alias("state"), F.col("n"))
    states = states.persist()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            best = (
                _pair_counts(states)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1).collect()
            )
            if not best:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            merges.append((a, b, cnt))
            nxt = states.select(
                F.replace(
                    F.col("state"),
                    F.lit(SEP + a + SEP + b + SEP),
                    F.lit(SEP + a + b + SEP),
                ).alias("state"),
                F.col("n"),
            ).persist()
            nxt.count()  # materialize before dropping the parent
            states.unpersist()
            states = nxt
    finally:
        states.unpersist()
    return merges


def bpe_apply_expr(word_col, merges) -> F.Column:
    """The tokenizer as ONE codegen expression: padded char state with
    every learned merge applied in rank order — chained ``replace``
    calls, leftmost non-overlapping, exactly the BPE apply rule."""
    state = _char_state(word_col)
    for a, b, _cnt in merges:
        state = F.replace(state, F.lit(SEP + a + SEP + b + SEP),
                          F.lit(SEP + a + b + SEP))
    return state


def bpe_decode_expr(tokens_col) -> F.Column:
    """Inverse of the tokenizer for ONE word's space-joined token
    string: BPE symbols partition the word's characters, and kept words
    are printable-ASCII-no-space, so deleting the joiner spaces IS the
    exact decode — a single codegen ``replace``."""
    return F.replace(tokens_col, F.lit(" "), F.lit(""))


def bpe_roundtrip(df: DataFrame, merges, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """decode(encode(x)) == x, hash-checked per document: tokenize every
    kept word, decode the token stream back, and fingerprint the
    decoded text in word order — (id, n_words, decoded_md5). An oracle
    computes the SAME fingerprint directly from the source words
    without ever running the tokenizer, so any lossy merge/split bug
    breaks the hash. Pure codegen, same shuffle shape as
    ``bpe_encode`` (one per-doc aggregate)."""
    pos_word = F.posexplode(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"))
    w = (
        df.select(id_col, pos_word.alias("pos", "word"))
        .filter(F.col("word").rlike(_ASCII_WORD)
                & (F.length("word") <= 64))
    )
    state = bpe_apply_expr(F.col("word"), merges)
    toks = F.array_join(
        F.slice(F.split(state, SEP), 2,
                F.size(F.split(state, SEP)) - 2), " ")
    per_word = w.select(
        id_col, "pos", bpe_decode_expr(toks).alias("decoded"))
    return (
        per_word.groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.md5(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("pos").alias("o"),
                                 F.col("decoded").alias("d")))),
                    lambda s: s["d"],
                ), " ").cast("binary")).alias("decoded_md5"),
        )
    )


def bpe_vocab(df: DataFrame, merges, text_col: str = "text") -> DataFrame:
    """The trained tokenizer's vocabulary: every base character of the
    kept words plus every merged symbol, with deterministic ids —
    merged symbols first in RANK order (ids 0..n_merges-1, mirroring
    how BPE vocabularies append merges), then base characters sorted
    (ids n_merges..). Vocabulary-bounded; broadcast to encoders."""
    chars = (
        word_frequencies(df, text_col)
        .select(F.explode(F.split(
            F.regexp_replace(F.col("word"), "(.)", "$1" + SEP), SEP))
            .alias("sym"))
        .filter(F.col("sym") != "")
        .distinct()
    )
    spark = df.sparkSession
    # the run-variant can re-learn a pair whose leftover adjacencies
    # survived an earlier merge round: keep the FIRST rank per symbol
    seen: dict = {}
    for i, (a, b, _c) in enumerate(merges):
        seen.setdefault(a + b, i)
    merged = spark.createDataFrame(
        list(seen.items()), "sym string, token_id int"
    ) if seen else spark.createDataFrame([], "sym string, token_id int")
    from pyspark.sql import Window

    base = chars.join(merged.select("sym"), "sym", "left_anti").select(
        "sym",
        (F.row_number().over(Window.orderBy("sym")) - 1
         + F.lit(len(merges))).cast("int").alias("token_id"),
    )
    return merged.unionByName(base)


def bpe_encode(df: DataFrame, merges, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Tokenize each document with a trained merge list: (id, n_words,
    n_tokens, tokens_md5) where tokens_md5 fingerprints the full
    space-joined token stream in word order. Pure codegen — posexplode
    + the replace chain + one per-doc aggregate."""
    pos_word = F.posexplode(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"))
    w = (
        df.select(id_col, pos_word.alias("pos", "word"))
        .filter(F.col("word").rlike(_ASCII_WORD)
                & (F.length("word") <= 64))
    )
    state = bpe_apply_expr(F.col("word"), merges)
    # interior of the padded state ("", s1..sk, "") — k = size-2 symbols
    toks = F.array_join(
        F.slice(F.split(state, SEP), 2,
                F.size(F.split(state, SEP)) - 2), " ")
    per_word = w.select(
        id_col, "pos", toks.alias("toks"),
        (F.size(F.split(state, SEP)) - 2).alias("k"))
    return (
        per_word.groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("k").cast("long").alias("n_tokens"),
            F.md5(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("pos").alias("o"),
                                 F.col("toks").alias("t")))),
                    lambda s: s["t"],
                ), " ").cast("binary")).alias("tokens_md5"),
        )
    )
