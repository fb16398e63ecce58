import pytest

from loongcollector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lcs-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def kv_df(spark):
    """Tiny frame shaped like a transcripts slice for operator goldens."""
    rows = [
        ("c1", 0, "user", "action=ask&lat_ms=12&ok=true&tok=34", "", "2026-01-01 00:00:00"),
        ("c1", 1, "assistant", '{"action":"reply","lat_ms":55,"ok":true,"meta":{"model":"m1","tok":99}}', "", "2026-01-01 00:00:07"),
        ("c2", 0, "tool", "10.1.0.2 - - [01/Jan/2026:00:00:07 +0000] \"GET /x HTTP/1.1\" 500 123 \"-\" \"ua\"", "python", "2026-01-01 01:00:00"),
        ("c2", 1, "assistant", "garbage", "", "2026-01-01 01:00:07"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    )
    return df.withColumn("ts", df.ts.cast("timestamp"))
