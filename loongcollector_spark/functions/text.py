"""Text analysis over document tables: token counting, quality scoring,
language-ID heuristic, fingerprinting.

All pure Spark expressions (codegen, no UDF) — at 100 TB these run inside
the scan stage with full column pruning. Integer-quantized scores (floor
×100 / ×1000) keep results engine-portable for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokenization count (the BPE-ish variant is
    with_bpe_token_estimate below). Null/empty/whitespace-only documents
    count 0 — split('') returning [''] would report 1, disagreeing with
    pack_assignments' and bm25's token accounting on identical input."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    return df.withColumn(
        "n_tokens",
        F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+"))).cast("int"),
    )


def with_bpe_token_estimate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token estimate: count sub-word chunks (runs of letters ≤4
    chars after greedy split, digits, punctuation) via one regex —
    the cheap proxy for tokenizer budgeting at corpus scale."""
    return df.withColumn(
        "n_bpe_tokens",
        F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
            )
        ).cast("int"),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    n = F.length(t)
    # try_divide: an empty document (n = 0) scores null instead of failing
    # the job under ANSI mode
    pct_alpha = F.floor(
        F.try_divide(100.0 * F.length(F.regexp_replace(t, "[^A-Za-z]", "")), n)
    ).cast("int")
    pct_space = F.floor(
        F.try_divide(100.0 * (n - F.length(F.replace(t, F.lit(" "), F.lit("")))), n)
    ).cast("int")
    bucket = (
        F.when((n >= 200) & (pct_alpha >= 70), "high")
        .when(n >= 100, "mid")
        .otherwise("low")
    )
    return (
        df.withColumn("q_len", n.cast("int"))
        .withColumn("pct_alpha", pct_alpha)
        .withColumn("pct_space", pct_space)
        .withColumn("quality_bucket", bucket)
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language heuristic: non-[A-Za-z ] chars ⇒ 'other';
    ≥2 English function-word hits ⇒ 'en'; else 'unknown'."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    non_alpha = F.size(F.regexp_extract_all(padded, F.lit("[^A-Za-z ]"), F.lit(0)))
    en_hits = F.size(
        F.regexp_extract_all(padded, F.lit(" (the|a|of|and|to) "), F.lit(0))
    )
    guess = (
        F.when(non_alpha > 0, "other").when(en_hits >= 2, "en").otherwise("unknown")
    )
    return df.withColumn("lang_guess", guess)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized lowercase md5 — the document fingerprint used
    by exact dedup."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm.cast("binary")))


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality signals (Rae et al. 2021 §A1.1, the
    standard LLM training-data repetition/shape filter), computed as a
    two-level codegen aggregation:

    * ``n_words`` — whitespace token count;
    * ``mean_word_len_x100`` — floor(100 · chars/words);
    * ``stop_hits`` — occurrences of 8 canonical English stopwords;
    * ``top_word_ratio_1e3`` — floor(1000 · count(most frequent word)/words),
      the word-level repetition signal;
    * ``gopher_ok`` — the conjunction (3 ≤ mean len ≤ 15, ≥2 stopword
      hits, top-word ratio ≤ 20%, ≥ 5 words).

    Scale shape: explode → partial-agg (doc, word) → partial-agg (doc);
    both shuffles carry counts only, never text beyond single words; at
    100 TB the first aggregation is where dictionary skew lives, and it
    is keyed by (doc_id, word) so hot WORDS do not make hot partitions.
    Null/empty docs are excluded (same contract as simhash_signatures).
    """
    d = df.filter(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    w = d.select(
        id_col,
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_w"),
    )
    per_word = w.groupBy(id_col, "_w").agg(F.count("*").alias("_cnt"))
    is_stop = F.lower(F.col("_w")).isin(*GOPHER_STOPWORDS)
    agg = per_word.groupBy(id_col).agg(
        F.sum("_cnt").alias("_n"),
        F.sum(F.length("_w") * F.col("_cnt")).alias("_chars"),
        F.sum(F.when(is_stop, F.col("_cnt")).otherwise(0)).alias("stop_hits"),
        F.max("_cnt").alias("_top"),
    )
    mean_len = F.floor(F.try_divide(100 * F.col("_chars"), F.col("_n")))
    top_ratio = F.floor(F.try_divide(1000 * F.col("_top"), F.col("_n")))
    return agg.select(
        id_col,
        F.col("_n").cast("int").alias("n_words"),
        mean_len.cast("int").alias("mean_word_len_x100"),
        F.col("stop_hits").cast("int").alias("stop_hits"),
        top_ratio.cast("int").alias("top_word_ratio_1e3"),
        (
            (F.col("_n") >= 5)
            & mean_len.between(300, 1500)
            & (F.col("stop_hits") >= 2)
            & (top_ratio <= 200)
        ).alias("gopher_ok"),
    )


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str | None = None) -> DataFrame:
    """Deterministic text normalization (the cleanup pass between HTML
    extraction and dedup in a web corpus): ASCII control chars → space,
    curly quotes/long dashes → ASCII, whitespace runs collapsed to one
    space, trimmed. Fixed pass order; every pass is an RE2-portable
    regexp_replace / translate so the DuckDB oracle replays it verbatim.
    One codegen projection — runs inside the scan stage, no shuffle."""
    out_col = out_col or f"{text_col}_norm"
    t = F.coalesce(F.col(text_col), F.lit(""))
    # ONE class for everything that becomes a plain space: C0 controls,
    # DEL + the C1 block (NEL U+0085 lives there -- Java \s does NOT
    # match it), NBSP, and the unicode space family (ogham, en/em
    # spaces, line/para separators, narrow/medium NBSP, ideographic).
    # \u escapes keep the class visible and byte-stable in the source.
    t = F.regexp_replace(
        t,
        "[\x00-\x08\x0b-\x1f\x7f-\x9f\u00a0\u1680\u2000-\u200a"
        "\u2028\u2029\u202f\u205f\u3000]",
        " ",
    )
    # curly quotes, em/en dash -> ASCII
    t = F.translate(t, "\u201c\u201d\u2018\u2019\u2014\u2013",
                    "\"\"''--")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return df.withColumn(out_col, t)


def dup_ngram_stats(df: DataFrame, n: int = 2, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Duplicate-n-gram repetition signals (Gopher §A1.1's dup-n-gram
    family, the strongest boilerplate/spam predictor after exact dedup):
    per document, ``n_grams`` (total word n-grams), ``n_distinct``,
    ``dup_frac_1e3`` = floor(1000·(1 − distinct/total)), and
    ``top_gram_frac_1e3`` = floor(1000·count(most frequent n-gram)/total).
    Documents with fewer than ``n`` words score 0 grams and 0 fractions.

    Scale shape: the same two-level aggregation as gopher_quality —
    explode grams → partial-agg (doc, gram) → partial-agg (doc). Both
    shuffles carry (hash, count) pairs, never text: grams are md5'd
    before the first exchange, so shuffle width is constant no matter
    how long the words are. Keyed by (doc, gram): hot GRAMS do not make
    hot partitions."""
    words_expr = F.split(
        F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                         r"\s+", " "), " ")
    # materialize the word array in its own projection FIRST: a raw
    # split() captured inside the transform lambda re-evaluates per gram
    # (O(words²) per doc — the _with_shingles lesson, measured 10x); and
    # md5 moves OUT of the (interpreted) lambda into the groupBy key,
    # where it runs as codegen on the exploded rows before the partial agg
    words = F.col("_words")
    nw = F.size(words)
    grams = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - n + 1),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        df.select(F.col(id_col), words_expr.alias("_words"))
        .select(F.col(id_col), F.explode_outer(grams).alias("_gt"))
        .groupBy(id_col, F.md5(F.col("_gt").cast("binary")).alias("_g"))
        .agg(F.count(F.col("_gt")).alias("_cnt"))
    )
    agg = per_gram.groupBy(id_col).agg(
        F.sum("_cnt").alias("_total"),
        F.count(F.col("_g")).alias("_distinct"),
        F.max("_cnt").alias("_top"),
    )
    # integer numerator (1000*(t-d)) then one divide: both engines see
    # the identical IEEE double, so floor can't straddle a boundary
    dup_frac = F.floor(
        F.try_divide(1000 * (F.col("_total") - F.col("_distinct")), F.col("_total"))
    )
    top_frac = F.floor(F.try_divide(1000 * F.col("_top"), F.col("_total")))
    return agg.select(
        id_col,
        F.coalesce(F.col("_total"), F.lit(0)).cast("int").alias("n_grams"),
        F.col("_distinct").cast("int").alias("n_distinct"),
        F.coalesce(dup_frac, F.lit(0)).cast("int").alias("dup_frac_1e3"),
        F.coalesce(top_frac, F.lit(0)).cast("int").alias("top_gram_frac_1e3"),
    )


def char_entropy(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document character-distribution Shannon entropy — the classic
    gibberish/binary-spill detector (low entropy = repeated filler, very
    high = random bytes; used alongside the Gopher rules in web-corpus
    cleaning): ``(id, n_chars, entropy_1e3)`` with
    entropy = log2(N) − Σ c·log2(c) / N over per-character counts.

    Cross-engine determinism: floating sums are order-dependent, so each
    character's c·log2(c) term is quantized to an INTEGER
    (floor(1e6·c·log2 c)) BEFORE the sum — integer sums are order-free
    and log2 over small integer counts evaluates identically on Spark
    and DuckDB (the functions/lm.py trick). The final entropy is floored
    to milli-bits.

    Scale shape: explode characters → two map-side-combinable
    aggregations ((doc, char) → doc); shuffles carry single characters
    and counts, never documents. Null/empty documents are dropped
    (filter on trimmed text on both engines)."""
    # the documented filter, applied HERE so direct callers match the
    # oracle too: Spark's split('', '') returns [''] (a phantom
    # n_chars=1 row) while DuckDB's string_split unnests to zero rows
    df = df.filter(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("_c"),
    )
    per_char = chars.groupBy(id_col, "_c").agg(F.count("*").alias("_n"))
    q = F.floor(F.col("_n") * F.log2("_n") * F.lit(1e6)).cast("long")
    per_doc = per_char.groupBy(id_col).agg(
        F.sum("_n").cast("long").alias("n_chars"),
        F.sum(q).alias("_s"),
    )
    ent = F.floor(
        (F.log2("n_chars") - F.col("_s") / (F.col("n_chars") * F.lit(1e6)))
        * F.lit(1000)
    ).cast("long")
    return per_doc.select(id_col, "n_chars", ent.alias("entropy_1e3"))


def dup_line_stats(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Duplicate-line repetition signals (Gopher §A1.1, Rae et al. 2021:
    "duplicate line fraction" and "duplicate line character fraction" —
    the paragraph/line-level siblings of dup_ngram_stats): per document,
    ``n_lines`` (non-empty trimmed lines), ``dup_line_frac_1e3`` =
    floor(1000·(1 − distinct/total)) and ``dup_char_frac_1e3`` =
    floor(1000·chars-in-repeat-occurrences/total-chars).

    Scale shape: the dup_ngram_stats two-level aggregation — explode
    lines → partial-agg (doc, line-hash) carrying count + length →
    partial-agg (doc). Shuffles carry (16-byte hash, two ints); text
    never leaves the scan stage. Docs with no non-empty line drop (both
    engines)."""
    lines_expr = F.filter(
        F.transform(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n"),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    per_line = (
        df.select(F.col(id_col), F.explode(lines_expr).alias("_l"))
        .groupBy(id_col, F.md5(F.col("_l").cast("binary")).alias("_h"))
        .agg(F.count(F.lit(1)).alias("_cnt"),
             F.first(F.length("_l")).alias("_len"))
    )
    agg = per_line.groupBy(id_col).agg(
        F.sum("_cnt").alias("n_lines"),
        F.count(F.lit(1)).alias("_distinct"),
        F.sum(F.col("_cnt") * F.col("_len")).alias("_chars"),
        F.sum((F.col("_cnt") - 1) * F.col("_len")).alias("_dup_chars"),
    )
    # integer numerators, one divide per fraction — identical IEEE
    # doubles on both engines, so floor can't straddle a boundary
    return agg.select(
        id_col, F.col("n_lines").cast("long").alias("n_lines"),
        F.floor(((F.col("n_lines") - F.col("_distinct")) * 1000)
                / F.col("n_lines")).cast("long").alias("dup_line_frac_1e3"),
        F.when(F.col("_chars") > 0,
               F.floor((F.col("_dup_chars") * 1000) / F.col("_chars")))
        .otherwise(F.lit(0)).cast("long").alias("dup_char_frac_1e3"),
    )


# UTF-8 read as Latin-1/Windows-1252 and re-saved -- the classic mojibake
# digraphs (ftfy's most common fixes; Speer, ftfy docs "mojibake").
# ORDER MATTERS: longer sequences first, so 3-char punctuation forms
# repair before their 2-char prefixes could mis-match. Sequences are
# spelled as escapes because several contain C1 control characters.
MOJIBAKE_FIXES: tuple[tuple[str, str], ...] = (
    ("\u00e2\u20ac\u0153", "\u201c"),  # left double quote
    ("\u00e2\u20ac\u009d", "\u201d"),  # right double quote
    ("\u00e2\u20ac\u2122", "\u2019"),  # right single quote
    ("\u00e2\u20ac\u02dc", "\u2018"),  # left single quote
    ("\u00e2\u20ac\u201d", "\u2014"),  # em dash
    ("\u00e2\u20ac\u201c", "\u2013"),  # en dash
    ("\u00e2\u20ac\u00a6", "\u2026"),  # ellipsis
    ("\u00c3\u00a9", "\u00e9"),  # e acute
    ("\u00c3\u00a8", "\u00e8"),  # e grave
    ("\u00c3\u00a4", "\u00e4"),  # a umlaut
    ("\u00c3\u00b6", "\u00f6"),  # o umlaut
    ("\u00c3\u00bc", "\u00fc"),  # u umlaut
    ("\u00c3\u00b1", "\u00f1"),  # n tilde
    ("\u00c3\u00a7", "\u00e7"),  # c cedilla
    ("\u00c2\u00a0", " "),        # doubled NBSP -> space
)


def fix_mojibake(df: DataFrame, text_col: str = "text",
                 out_col: str = "fixed_text") -> DataFrame:
    """Repair the most common double-encoded UTF-8 sequences (an
    ftfy-lite pass -- the full ftfy heuristic engine is a library; this
    table covers the digraphs that dominate real crawl corpora). A
    fixed-order chain of LITERAL replaces (one codegen projection, no
    regex, no shuffle); ``mojibake_chars`` counts how many characters
    the repair removed -- a corpus-health signal worth aggregating per
    source."""
    col = F.coalesce(F.col(text_col), F.lit(""))
    fixed = col
    for bad, good in MOJIBAKE_FIXES:
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    return df.withColumns({
        out_col: fixed,
        "mojibake_chars": (F.length(col) - F.length(fixed)).cast("bigint"),
    })


SCRIPT_RANGES = {
    # explicit codepoint ranges (identical literals in Java regex and
    # DuckDB's RE2, unlike \p{script} names which differ per engine)
    "latin": "A-Za-z",
    "digit": "0-9",
    "cjk": "\\u4e00-\\u9fff\\u3040-\\u30ff\\uac00-\\ud7af",
    "cyrillic": "\\u0400-\\u04ff",
    "arabic": "\\u0600-\\u06ff",
    "greek": "\\u0370-\\u03ff",
}


def script_ratios(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document writing-script distribution — the language-ID
    companion signal (a 'lang=en' doc that is 40% CJK is mislabeled or
    polluted; mixed-script spam and mojibake stand out immediately).

    Emits total character count and one ``<script>_permille`` integer
    column per range in ``SCRIPT_RANGES`` (0 for empty docs).  Counting
    is ``length(text) - length(regexp_replace(text, '[class]', ''))`` —
    one codegen projection per class, no explode, no shuffle; integer
    permille keeps the hash oracle exact."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(txt)

    def permille(ranges: str):
        cnt = n - F.length(F.regexp_replace(txt, f"[{ranges}]", ""))
        return F.when(n > 0, F.floor(cnt * 1000 / n)).otherwise(
            F.lit(0)).cast("int")

    return df.select(
        F.col(id_col), n.cast("bigint").alias("n_chars"),
        *[permille(r).alias(f"{name}_permille")
          for name, r in SCRIPT_RANGES.items()],
    )
