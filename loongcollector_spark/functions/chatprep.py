"""Transcript → training-sample preparation: chat-template rendering and
SFT (prompt, completion) pair extraction.

These are the ops that turn the pipeline's cleaned agent transcripts
(conv_id, turn_idx, role, text, tool, ts — the input_hint shape) into
model-ready artifacts:

* ``render_chat_samples`` — one training sample per conversation: turns
  rendered with role markers in stable turn order, concatenated, with
  the assistant-span statistics a loss mask needs (which fraction of the
  sample's characters the loss applies to).
* ``sft_pairs`` — one (prompt, completion) example per assistant turn:
  the prompt is every turn strictly before it, the completion is the
  assistant text. Prompts are emitted as fingerprints + length stats,
  not materialized strings: per-example prompt text is O(turns²)
  characters per conversation, and at 10^12 turns you shard-render
  prompts at tokenization time from the packed sample — the fingerprint
  is what dedup/decontamination joins on.

Scale shape: per-turn rendering is a codegen projection in the scan
stage; the ONLY shuffle is the per-conversation hash partition (groupBy
conv_id / window over conv_id), which carries rendered turn strings —
the same rows a shard-writer must co-locate anyway. Window frames are
bounded by conversation length (tens of turns), never by corpus size.

The role-marker template is a neutral ``<|role|>`` ChatML-like scheme;
``turn_sep`` and the marker shape are parameters, not policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rendered_turn(role_col: str = "role", text_col: str = "text") -> "F.Column":
    """``<|role|>text`` — the per-turn rendered string (codegen concat)."""
    return F.concat(F.lit("<|"), F.col(role_col), F.lit("|>"), F.col(text_col))


def render_chat_samples(df: DataFrame, conv_col: str = "conv_id",
                        idx_col: str = "turn_idx", role_col: str = "role",
                        text_col: str = "text",
                        turn_sep: str = "\n") -> DataFrame:
    """One sample per conversation: ``sample_text`` (turns joined in
    turn order), ``n_turns``, ``sample_chars``, ``assistant_chars`` and
    ``loss_frac_milli`` = ⌊assistant_chars·1000 / sample_chars⌋ — the
    character share a completion-only loss mask trains on (separators
    count as context, like a real mask)."""
    turn = df.select(
        conv_col,
        F.col(idx_col).alias("_idx"),
        rendered_turn(role_col, text_col).alias("_r"),
        F.when(F.col(role_col) == "assistant",
               F.length(rendered_turn(role_col, text_col)))
         .otherwise(F.lit(0)).alias("_alen"),
    )
    agg = turn.groupBy(conv_col).agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("_idx").alias("i"), F.col("_r").alias("r")))).alias("_turns"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_alen").alias("assistant_chars"),
    )
    sample = F.array_join(F.transform("_turns", lambda s: s["r"]), turn_sep)
    return agg.select(
        conv_col,
        sample.alias("sample_text"),
        F.col("n_turns").cast("bigint").alias("n_turns"),
        F.length(sample).cast("bigint").alias("sample_chars"),
        F.col("assistant_chars").cast("bigint").alias("assistant_chars"),
        F.floor(F.col("assistant_chars") * 1000 / F.length(sample))
         .cast("bigint").alias("loss_frac_milli"),
    )


def sft_pairs(df: DataFrame, conv_col: str = "conv_id",
              idx_col: str = "turn_idx", role_col: str = "role",
              text_col: str = "text",
              turn_sep: str = "\n") -> DataFrame:
    """One SFT example per assistant turn with at least one prior turn:
    ``prompt_md5`` fingerprints the rendered prior-turns string (the
    key decontamination and example-dedup join on), ``prompt_turns`` /
    ``prompt_chars`` size it, ``completion`` carries the assistant text
    with its whitespace token count. The running-prefix window is
    per-conversation and frame-bounded; nothing global."""
    turn = df.select(
        conv_col, F.col(idx_col).alias("turn_idx"), role_col, text_col,
        rendered_turn(role_col, text_col).alias("_r"),
    )
    w = (Window.partitionBy(conv_col).orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    prompt = F.array_join(F.collect_list("_r").over(w), turn_sep)
    with_prompt = turn.select(
        conv_col, "turn_idx", role_col, text_col,
        prompt.alias("_prompt"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("prompt_turns"),
    )
    return (
        with_prompt
        .filter((F.col(role_col) == "assistant") & (F.col("prompt_turns") > 0))
        .select(
            conv_col, "turn_idx",
            F.md5(F.col("_prompt")).alias("prompt_md5"),
            "prompt_turns",
            F.length("_prompt").cast("bigint").alias("prompt_chars"),
            F.col(text_col).alias("completion"),
            # empty/whitespace completions count 0 (with_token_count parity)
            F.when(F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "",
                   F.lit(0))
             .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
             .cast("bigint").alias("completion_tokens"),
        )
    )


def agent_loop_stats(df: DataFrame, conv_col: str = "conv_id",
                     idx_col: str = "turn_idx", role_col: str = "role",
                     tool_col: str = "tool",
                     text_col: str = "text") -> DataFrame:
    """Stuck-agent detection: the longest run of CONSECUTIVE turns that
    repeat the same (role, tool, text) action inside each conversation —
    the signature of an agent loop (retrying the identical tool call,
    re-emitting the same reply). Classic gaps-and-islands: lag-compare →
    change flag → running island id → island sizes → per-conversation
    max. Every window is conversation-partitioned; the shuffle carries
    (conv, idx, action fingerprint), never full histories.

    Emits ``max_run`` (1 = no repetition), ``n_turns`` and ``looping``
    (max_run ≥ 3 — two repeats of the same action after the first)."""
    # coalesce before concat_ws: a NULL field would be SKIPPED by
    # concat_ws, colliding ('a', NULL, 'b') with ('a', 'b', '')
    action = F.md5(F.concat_ws(
        "\x01", *[F.coalesce(F.col(c), F.lit(""))
                  for c in (role_col, tool_col, text_col)]))
    turns = df.select(
        conv_col, F.col(idx_col).alias("_i"), action.alias("_a"))
    flagged = turns.withColumn(
        "_new", F.when(
            F.lag("_a").over(
                Window.partitionBy(conv_col).orderBy("_i")) == F.col("_a"),
            0).otherwise(1))
    islands = flagged.withColumn(
        "_island",
        F.sum("_new").over(
            Window.partitionBy(conv_col).orderBy("_i")
            .rowsBetween(Window.unboundedPreceding, 0)))
    runs = islands.groupBy(conv_col, "_island").agg(
        F.count(F.lit(1)).alias("_run"))
    return runs.groupBy(conv_col).agg(
        F.max("_run").cast("bigint").alias("max_run"),
        F.sum("_run").cast("bigint").alias("n_turns"),
        (F.max("_run") >= 3).alias("looping"),
    )


def response_contrast_pairs(df: DataFrame, conv_col: str = "conv_id",
                            idx_col: str = "turn_idx",
                            role_col: str = "role",
                            text_col: str = "text") -> DataFrame:
    """DPO-style preference-pair mining: assistant responses are grouped
    by the fingerprint of the user prompt they directly answer, and each
    prompt with >= 2 distinct responses yields ONE (chosen, rejected)
    pair under a deterministic ranker — response token count, ties by
    (conv_id, turn_idx).  Identical response texts are deduplicated
    BEFORE ranking (keeping the id-least occurrence), so a ranker tie
    can never place the same text at both extremes; ``n_candidates``
    counts DISTINCT responses.  The rejected side uses the exact
    reverse ordering, so it is always a different row.

    The ranker is a stand-in with the ranker's exact interface: a reward
    model's score column drops in for ``_tokens`` unchanged.

    Scale shape: prompts travel as 16-byte md5 fingerprints; the only
    wide shuffle is the per-fingerprint window carrying (fp, tokens,
    ids, text-md5) — response TEXT never shuffles, chosen/rejected
    bodies are fetched downstream by (conv_id, turn_idx) equi-join
    exactly like the ANN candidate fetch."""
    w_prev = Window.partitionBy(conv_col).orderBy(idx_col)
    resp = (
        df.select(
            conv_col, F.col(idx_col).alias("turn_idx"), role_col, text_col,
            F.lag(text_col).over(w_prev).alias("_prompt"),
            F.lag(role_col).over(w_prev).alias("_prev_role"),
        )
        .filter((F.col(role_col) == "assistant")
                & (F.col("_prev_role") == "user")
                & F.col("_prompt").isNotNull())
        .select(
            conv_col, "turn_idx",
            F.md5(F.col("_prompt")).alias("prompt_fp"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_rmd5"),
            F.when(F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "",
                   F.lit(0))
            .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
            .cast("bigint").alias("_tokens"),
        )
    )
    # dedupe identical response TEXTS first (keep the deterministic
    # (conv, turn)-least representative per md5): otherwise a ranker tie
    # can put the same text at both extremes and the contrast filter
    # drops a prompt that DOES have two distinct responses
    resp = (
        resp.groupBy("prompt_fp", "_rmd5")
        .agg(F.min(F.struct(F.col(conv_col).alias("c"),
                            F.col("turn_idx").alias("t"),
                            F.col("_tokens").alias("k"))).alias("_r"))
        .select("prompt_fp", "_rmd5",
                F.col("_r.c").alias(conv_col),
                F.col("_r.t").alias("turn_idx"),
                F.col("_r.k").alias("_tokens"))
    )
    fwd = Window.partitionBy("prompt_fp").orderBy(
        F.col("_tokens").desc(), F.col(conv_col).asc(),
        F.col("turn_idx").asc())
    rev = Window.partitionBy("prompt_fp").orderBy(
        F.col("_tokens").asc(), F.col(conv_col).desc(),
        F.col("turn_idx").desc())
    ranked = resp.select(
        "prompt_fp", conv_col, "turn_idx", "_rmd5", "_tokens",
        F.row_number().over(fwd).alias("_rn_hi"),
        F.row_number().over(rev).alias("_rn_lo"),
        F.count(F.lit(1)).over(
            Window.partitionBy("prompt_fp")).alias("n_candidates"),
    ).filter(F.col("n_candidates") >= 2)

    def side(rn_col):
        return F.min(F.when(F.col(rn_col) == 1, F.struct(
            F.col(conv_col).alias("conv"),
            F.col("turn_idx").alias("turn"),
            F.col("_rmd5").alias("md5"),
            F.col("_tokens").alias("tokens"))))

    # the groupBy key equals the window partition key, so this agg
    # reuses the window exchange — one shuffle total, no self-join
    agg = ranked.groupBy("prompt_fp").agg(
        F.max("n_candidates").alias("n_candidates"),
        side("_rn_hi").alias("_c"), side("_rn_lo").alias("_r"))
    return agg.select(
        "prompt_fp", "n_candidates",
        F.col("_c.conv").alias("chosen_conv"),
        F.col("_c.turn").alias("chosen_turn"),
        F.col("_c.md5").alias("chosen_md5"),
        F.col("_c.tokens").alias("chosen_tokens"),
        F.col("_r.conv").alias("rejected_conv"),
        F.col("_r.turn").alias("rejected_turn"),
        F.col("_r.md5").alias("rejected_md5"),
        F.col("_r.tokens").alias("rejected_tokens"),
    ).filter(F.col("chosen_md5") != F.col("rejected_md5"))
