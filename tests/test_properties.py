"""Property-style robustness: the parse stage must never throw on ANY
text payload (ANSI-mode casts, regex, JSON, KV all see adversarial
input), and the salted repartition must preserve the in-partition
(conv_id, turn_idx) ordering contract."""

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from loongcollector_spark import routing
from loongcollector_spark.plans.pipeline import parse_stage, transcript_pipeline

_TS = datetime.datetime(2026, 1, 1)

# adversarial corpus: control chars (incl. the \x01 group separator),
# quotes, braces, format prefixes that sniff as json/nginx/kv/app but
# then violate the grammar
text_strategy = st.one_of(
    st.text(max_size=60),
    st.text(alphabet="\x01\x00\\\"'{}&=| \n\t.0123456789", max_size=40),
    st.builds(lambda s: "{" + s, st.text(max_size=30)),
    st.builds(lambda s: "10.0.0.1 - - [" + s, st.text(max_size=30)),
    st.builds(lambda s: "a=" + s + "&b=2", st.text(max_size=20)),
    st.builds(lambda s: "10.1.2.3 GET /" + s, st.text(max_size=20)),
    # PARTIAL structured payloads: parse partially but fail the format's ok
    # bit (kv missing tok, json missing action) — the null-on-fail invariant
    # regression ADVICE r01 found was invisible to the generators above
    st.just("action=x&lat_ms=1"),
    st.just('{"lat_ms":5}'),
    st.just("lat_ms=9&tok=3&x=1"),
    st.just('{"meta":{"tok":7,"model":"m"}}'),
    st.builds(lambda s: "action=" + s + "&lat_ms=2", st.text(max_size=10)),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=30))
def test_parse_stage_total_on_any_text(spark, texts):
    rows = [
        (f"c{i % 3}", i, "user", t, "", _TS) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = transcript_pipeline(df)
    collected = out.collect()
    assert len(collected) == len(rows)  # no row lost, no exception
    for r in collected:
        # ok rows of structured formats must carry their format's fields
        if r["_parse_ok"] and r["_fmt"] == "kv":
            assert r["action"] is not None
        if not r["_parse_ok"]:
            # failed rows keep EVERY extraction column null
            for c in ("client_ip", "method", "request", "response_code",
                      "bytes", "action", "lat_ms", "tok", "model"):
                assert r[c] is None, (c, r["text"])


def test_salted_repartition_order_contract(spark):
    from loongcollector_spark.datagen import gen_transcripts

    df = gen_transcripts(spark, 5_000, 200, hot_frac=0.3)
    routed = routing.salted_repartition(parse_stage(df), num_partitions=8)

    def check(it):
        import pandas as pd

        for pdf in it:
            keys = list(zip(pdf["conv_id"], pdf["turn_idx"]))
            yield pd.DataFrame({"sorted_ok": [keys == sorted(keys)]})

    res = routed.select("conv_id", "turn_idx").mapInPandas(
        check, "sorted_ok boolean"
    )
    assert res.filter("NOT sorted_ok").count() == 0


@settings(max_examples=8, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 5), st.text(max_size=16)),
    min_size=1, max_size=40,
))
def test_line_dedup_conserves_lines_and_matches_model(spark, items):
    """Invariants on arbitrary corpora: every input line is either kept
    or removed (n_kept + n_removed == doc's line count), and the
    survivors equal a direct Python model of the threshold rule."""
    from collections import Counter, defaultdict

    from loongcollector_spark.functions.curation import line_dedup

    rows = [(doc, i, txt) for i, (doc, txt) in enumerate(items)]
    df = spark.createDataFrame(rows, "doc_id long, line_idx int, text string")
    thr = 2
    got = {r["doc_id"]: r for r in line_dedup(
        df, threshold=thr, id_col="doc_id",
        order_col="line_idx", line_col="text").collect()}

    counts = Counter(t.strip() for _, _, t in rows if t.strip())
    boiler = {k for k, c in counts.items() if c >= thr}
    per_doc = defaultdict(list)
    for doc, i, txt in rows:
        per_doc[doc].append((i, txt))
    for doc, lines in per_doc.items():
        lines.sort()
        kept = [t for _, t in lines if t.strip() not in boiler]
        assert got[doc]["n_kept"] + got[doc]["n_removed"] == len(lines)
        assert got[doc]["n_kept"] == len(kept)
        assert got[doc]["text_clean"] == "\n".join(kept)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=25))
def test_normalize_text_idempotent_and_clean(spark, texts):
    """normalize(normalize(x)) == normalize(x); output carries no control
    chars, no double spaces, no curly quotes, no NBSP."""
    import re as _re

    from loongcollector_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    once = normalize_text(df, "text").select(
        "doc_id", F.col("text_norm").alias("text"))
    twice = normalize_text(once, "text")
    for r in twice.collect():
        assert r["text"] == r["text_norm"]  # idempotent
        assert not _re.search("[\x00-\x08\x0b-\x1f\x7f“”‘’—– ]", r["text"])
        assert "  " not in r["text"]
        assert r["text"] == r["text"].strip()


def test_salted_repartition_generic_key(spark):
    """The advertised key/order_within params must work for non-transcript
    schemas (the salt used to hardcode turn_idx)."""
    df = spark.createDataFrame(
        [("u1", i, f"e{i}") for i in range(100)] + [("u2", 0, "x")],
        "user_id string, seq int, payload string",
    )
    out = routing.salted_repartition(
        df, key="user_id", order_within=("user_id", "seq"),
        num_partitions=4, salt_mod=4,
    )
    rows = out.collect()
    assert len(rows) == 101  # no turn_idx column needed, no exception


def test_nginx_sniff_tolerates_auth_user(spark):
    """A combined-log line with a non-dash ident/auth user is valid nginx
    (NGINX_RX accepts it) and must parse, not route to sink_errors."""
    line = ('1.2.3.4 - alice [10/Oct/2025:13:55:36 +0000] '
            '"GET /x HTTP/1.1" 200 512 "-" "ua"')
    df = spark.createDataFrame(
        [("c1", 0, "user", line, "", datetime.datetime(2026, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    r = parse_stage(df).first()
    assert r["_fmt"] == "nginx" and r["_parse_ok"]
    assert r["client_ip"] == "1.2.3.4" and r["response_code"] == "200"
