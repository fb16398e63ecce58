"""Chat-template rendering / SFT pair extraction goldens
(functions/chatprep.py) + badwords and mojibake curation passes."""

from pyspark.sql import functions as F

from loongcollector_spark.functions.chatprep import (
    render_chat_samples, sft_pairs,
)


def _conv(spark):
    rows = [
        ("c1", 0, "user", "hi there"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "bye"),
        ("c1", 3, "assistant", "later"),
        ("c2", 0, "assistant", "orphan"),   # no prior turns → no SFT pair
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


def test_render_chat_samples_golden(spark):
    out = {r.conv_id: r for r in render_chat_samples(_conv(spark)).collect()}
    c1 = out["c1"]
    expected = ("<|user|>hi there\n<|assistant|>hello\n"
                "<|user|>bye\n<|assistant|>later")
    assert c1.sample_text == expected
    assert c1.n_turns == 4
    assert c1.sample_chars == len(expected)
    # assistant turns: '<|assistant|>hello' (18) + '<|assistant|>later' (18)
    assert c1.assistant_chars == 36
    assert c1.loss_frac_milli == 36 * 1000 // len(expected)
    assert out["c2"].sample_text == "<|assistant|>orphan"


def test_sft_pairs_golden(spark):
    out = {(r.conv_id, r.turn_idx): r for r in sft_pairs(_conv(spark)).collect()}
    # two pairs in c1 (turn 1 and 3); c2's turn-0 assistant is excluded
    assert set(out) == {("c1", 1), ("c1", 3)}
    p1 = out[("c1", 1)]
    assert p1.prompt_turns == 1
    assert p1.prompt_chars == len("<|user|>hi there")
    assert p1.completion == "hello"
    assert p1.completion_tokens == 1
    p3 = out[("c1", 3)]
    assert p3.prompt_turns == 3
    assert p3.prompt_chars == len(
        "<|user|>hi there\n<|assistant|>hello\n<|user|>bye")
    assert p3.completion_tokens == 1
    # same prefix ⇒ different fingerprints for different spans
    assert p1.prompt_md5 != p3.prompt_md5


def test_badwords_filter_counts_occurrences_word_bounded(spark):
    from loongcollector_spark.functions.curation import badwords_filter

    rows = [
        (1, "clean words only"),
        (2, "Spam! spam, and more SPAM"),      # 3 occurrences, case+punct
        (3, "spammy is not spam-adjacent"),    # substrings don't count...
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.flagged_tokens, r.kept)
           for r in badwords_filter(df, ["spam"]).collect()}
    assert got[1] == (0, True)
    assert got[2] == (3, False)
    # "spam-adjacent" strips to "spam-adjacent" (inner punct kept) — no hit;
    # "spammy" is a different word — no hit
    assert got[3] == (0, True)
    assert got[4] == (0, True)


def test_fix_mojibake_goldens(spark):
    from loongcollector_spark.functions.text import fix_mojibake

    r1 = "caf\u00c3\u00a9 is d\u00c3\u00a9j\u00c3\u00a0"     # e-acute mojibake x2, a-grave form not in table
    r2 = "\u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d"          # both double quotes
    rows = [(1, r1), (2, r2), (3, "plain ascii"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r.fixed_text, r.mojibake_chars)
           for r in fix_mojibake(df).collect()}
    assert got[1][0] == "caf\u00e9 is d\u00e9j\u00c3\u00a0"
    assert got[1][1] == 2
    assert got[2][0] == "\u201cquoted\u201d"
    assert got[2][1] == 4
    assert got[3] == ("plain ascii", 0)
    assert got[4] == ("", 0)


def test_badwords_hits_only_shuffle_plan(spark):
    """The count aggregation's exchange sits ABOVE the isin filter —
    clean documents never shuffle."""
    from loongcollector_spark.functions.curation import badwords_filter

    df = spark.createDataFrame([(1, "a spam b")], "doc_id bigint, text string")
    plan = badwords_filter(df, ["spam"])._jdf.queryExecution().executedPlan().toString()
    # blocklist filter must run BELOW the partial (map-side) count — only
    # hit rows reach the exchange
    f = plan.index("= spam")
    partial = plan.index("partial_count")
    exchange = plan.index("Exchange", plan.index("HashAggregate"))
    assert f > partial > exchange  # toString prints top-down: filter deepest


def test_agent_loop_stats_gaps_and_islands(spark):
    from loongcollector_spark.functions.chatprep import agent_loop_stats

    rows = [
        # c1: same tool call retried 3x consecutively → looping
        ("c1", 0, "user", "", "ask"),
        ("c1", 1, "tool", "python", "run()"),
        ("c1", 2, "tool", "python", "run()"),
        ("c1", 3, "tool", "python", "run()"),
        ("c1", 4, "assistant", "", "done"),
        # c2: repeats but never consecutively
        ("c2", 0, "tool", "sql", "q"),
        ("c2", 1, "assistant", "", "a"),
        ("c2", 2, "tool", "sql", "q"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, text string")
    got = {r.conv_id: (r.max_run, r.n_turns, r.looping)
           for r in agent_loop_stats(df).collect()}
    assert got["c1"] == (3, 5, True)
    assert got["c2"] == (1, 3, False)


def test_source_mix_weights_golden(spark):
    from loongcollector_spark.functions.curation import source_mix_weights

    rows = [
        (1, "a b c d", "web"),      # 4 tokens
        (2, "e f", "web"),          # 2 tokens → web 6
        (3, "x y", "code"),         # code 2 → total 8
        (4, None, "code"),          # null text → 0 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {r.source: r.asDict() for r in
           source_mix_weights(df, {"web": 0.5, "code": 0.5}).collect()}
    assert got["web"]["tokens"] == 6
    assert got["web"]["share_ppm"] == 750000
    assert got["web"]["target_ppm"] == 500000
    assert got["web"]["weight_milli"] == 500000 * 1000 // 750000  # 666
    assert got["code"]["share_ppm"] == 250000
    assert got["code"]["weight_milli"] == 2000
    # a source missing from the target mixture weights 0
    got2 = {r.source: r.weight_milli for r in
            source_mix_weights(df, {"web": 1.0}).collect()}
    assert got2["code"] == 0


def test_quality_bins_exact_cdf(spark):
    from loongcollector_spark.functions.curation import quality_bins

    # scores: 10 x4, 20 x4, 30 x2 → total 10, n_bins=5 (2 per bin)
    rows = [(i, 10) for i in range(4)] + \
           [(i + 4, 20) for i in range(4)] + [(8, 30), (9, 30)]
    df = spark.createDataFrame(rows, "doc_id bigint, score int")
    got = {r.doc_id: r.bin for r in
           quality_bins(df, n_bins=5, score_col="score").collect()}
    # below(10)=0 → bin 0; below(20)=4 → bin 2; below(30)=8 → bin 4
    assert all(got[i] == 0 for i in range(4))
    assert all(got[i + 4] == 2 for i in range(4))
    assert got[8] == got[9] == 4


def test_quality_bins_doc_side_join_is_broadcast(spark):
    from loongcollector_spark.functions.curation import quality_bins

    df = spark.createDataFrame([(1, 10), (2, 20)], "doc_id bigint, score int")
    plan = quality_bins(df, score_col="score")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_response_contrast_pairs(spark):
    from loongcollector_spark.functions.chatprep import (
        response_contrast_pairs,
    )

    rows = [
        # prompt P1: three responses, lengths 3/1/2 -> chosen c1(3),
        # rejected c2(1)
        ("c1", 0, "user", "P1", None, None),
        ("c1", 1, "assistant", "long answer here", None, None),
        ("c2", 0, "user", "P1", None, None),
        ("c2", 1, "assistant", "short", None, None),
        ("c3", 0, "user", "P1", None, None),
        ("c3", 1, "assistant", "medium answer", None, None),
        # prompt P2: two IDENTICAL responses -> dropped (no contrast)
        ("c4", 0, "user", "P2", None, None),
        ("c4", 1, "assistant", "same", None, None),
        ("c5", 0, "user", "P2", None, None),
        ("c5", 1, "assistant", "same", None, None),
        # prompt P3: single response -> below min candidates
        ("c6", 0, "user", "P3", None, None),
        ("c6", 1, "assistant", "only one", None, None),
        # assistant not directly after user -> not a candidate
        ("c7", 0, "tool", "P1", None, None),
        ("c7", 1, "assistant", "ignored", None, None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = response_contrast_pairs(t).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_candidates"] == 3
    assert r["chosen_conv"] == "c1" and r["chosen_tokens"] == 3
    assert r["rejected_conv"] == "c2" and r["rejected_tokens"] == 1


def test_response_contrast_tie_never_self_pairs(spark):
    from loongcollector_spark.functions.chatprep import (
        response_contrast_pairs,
    )

    rows = [
        ("a", 0, "user", "P", None, None),
        ("a", 1, "assistant", "x y", None, None),
        ("b", 0, "user", "P", None, None),
        ("b", 1, "assistant", "y z", None, None),   # tied token count
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    [r] = response_contrast_pairs(t).collect()
    # reverse tiebreak: chosen is conv a, rejected is conv b
    assert (r["chosen_conv"], r["rejected_conv"]) == ("a", "b")


def test_response_contrast_tied_duplicate_texts_still_pair(spark):
    """A ranker tie between duplicate texts must not eat the pair: P has
    'x y' twice and 'z w' once, all 2 tokens — dedupe-before-rank keeps
    one 'x y', so the (chosen, rejected) contrast survives."""
    from loongcollector_spark.functions.chatprep import (
        response_contrast_pairs,
    )

    rows = [
        ("c1", 0, "user", "P", None, None),
        ("c1", 1, "assistant", "x y", None, None),
        ("c2", 0, "user", "P", None, None),
        ("c2", 1, "assistant", "z w", None, None),
        ("c3", 0, "user", "P", None, None),
        ("c3", 1, "assistant", "x y", None, None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    [r] = response_contrast_pairs(t).collect()
    assert r["n_candidates"] == 2           # DISTINCT responses
    assert {r["chosen_conv"], r["rejected_conv"]} == {"c1", "c2"}
    assert r["chosen_md5"] != r["rejected_md5"]
