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
