"""JsonSerializer golden-format tests: exact line shapes, tag stamping,
internal-column stripping, compressed round-trip."""

import json
import shutil
import tempfile

from pyspark.sql import functions as F

from loongcollector_spark.serializer import to_json_events, write_json_sink


def test_json_event_shape(spark, kv_df):
    out = to_json_events(
        kv_df.withColumn("_to_sink_x", F.lit(True)).withColumn("_parse_ok", F.lit(True)),
        tags={"__source__": "test-host"},
    )
    rows = [json.loads(r["value"]) for r in out.collect()]
    r = next(x for x in rows if x["conv_id"] == "c1" and x["turn_idx"] == 0)
    # __time__ first-class epoch seconds; tags stamped; internals stripped
    assert r["__time__"] == 1767225600  # 2026-01-01T00:00:00Z
    assert r["__source__"] == "test-host"
    assert "_to_sink_x" not in r and "_parse_ok" not in r
    assert r["role"] == "user" and r["text"].startswith("action=")


def test_json_sink_round_trip(spark, kv_df):
    path = tempfile.mkdtemp(prefix="lcs_json_sink_")
    try:
        write_json_sink(kv_df, path, compression="gzip")
        back = spark.read.text(path)
        assert back.count() == kv_df.count()
        parsed = [json.loads(r["value"]) for r in back.collect()]
        assert {p["conv_id"] for p in parsed} == {"c1", "c2"}
    finally:
        shutil.rmtree(path, ignore_errors=True)
