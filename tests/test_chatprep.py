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
