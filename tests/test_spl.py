"""SPL front-end tests: semantic goldens + a corpus smoke replay.

Mirrors the reference's SPL test strategy (core/unittest/spl/
SplUnittest.cpp replays spl.txt pipelines against fixed events): a fixture
frame shaped like the corpus events (content / content_csv / content_kv /
map_str columns) and a list of corpus-representative pipelines that must
compile and run.
"""

import pytest

from loongcollector_spark.spl import SplUnsupported, spl_run


@pytest.fixture()
def spl_df(spark):
    rows = [
        (
            "10.0.0.1 GET /index 200",
            "1.1.1.1,12:00,web01",
            "k1=v1&k2=v2?k3=v3",
            '{"a1":"x","b1":"2"}',
            '{"type":"kv","message":"u=1&v=2"}',
        ),
        (
            "10.0.0.2 POST /login 500",
            '"quoted,ip",13:00,web02',
            "k1=other&k2=z?k3=w",
            '{"a1":"y","b1":"3"}',
            '{"type":"csv","message":"a,b,c"}',
        ),
    ]
    return spark.createDataFrame(
        rows,
        "content string, content_csv string, content_kv string, "
        "map_str string, routed string",
    )


def test_parse_regexp_aliases_and_named(spl_df):
    out = spl_run(
        spl_df, r"* | parse-regexp content, '(\S+)\s+(\w+)' as ip, method"
    )["out"]
    r = out.orderBy("ip").first()
    assert (r["ip"], r["method"]) == ("10.0.0.1", "GET")

    out = spl_run(
        spl_df, r"* | parse-regexp content, '(?P<ip2>\S+)\s+(?P<m2>\w+)'"
    )["out"]
    r = out.orderBy("ip2").first()
    assert (r["ip2"], r["m2"]) == ("10.0.0.1", "GET")


def test_parse_csv_plain_quote_strict(spl_df):
    out = spl_run(spl_df, "* | parse-csv content_csv as ip, time, host")["out"]
    got = {r["host"]: r["ip"] for r in out.collect()}
    assert got["web01"] == "1.1.1.1"

    out = spl_run(
        spl_df, "* | parse-csv -quote='\"' content_csv as ip, time, host"
    )["out"]
    got = {r["host"]: r["ip"] for r in out.collect()}
    assert got["web02"] == "quoted,ip"   # quote-aware FSM path

    # -strict: exactly 2 keys vs 3 fields -> nulls
    out = spl_run(spl_df, "* | parse-csv -strict content_csv as ip, time")["out"]
    assert all(r["ip"] is None for r in out.collect())


def test_parse_kv_delims_and_prefix(spl_df):
    out = spl_run(spl_df, "* | parse-kv -delims='&?' content_kv")["out"]
    r = out.orderBy("k1").first()
    assert (r["k1"], r["k2"], r["k3"]) == ("k1=other".split("=")[1], "z", "w")

    out = spl_run(
        spl_df, "* | parse-kv -prefix='p_' -delims='&?' content_kv"
    )["out"]
    assert "p_k1" in out.columns


def test_parse_json_with_prefix_and_where(spl_df):
    out = spl_run(spl_df, "* | parse-json map_str | where b1 = '2'")["out"]
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["a1"] == "x"

    out = spl_run(spl_df, "* | parse-json -prefix='j_' map_str")["out"]
    assert "j_a1" in out.columns and "j_b1" in out.columns


def test_extend_project_rename_away(spl_df):
    out = spl_run(
        spl_df,
        "* | extend a = 23, b = upper('x') | extend c = concat(b, 'y') "
        "| project-rename d=a | project-away content_csv, content_kv, map_str, routed",
    )["out"]
    r = out.first()
    assert (r["d"], r["b"], r["c"]) == (23, "X", "Xy")
    assert "content_csv" not in out.columns


def test_presto_spellings(spl_df):
    out = spl_run(
        spl_df,
        "* | extend a = chr(65), b = codepoint('t'), "
        "c = strpos('hello volex', 'volex'), "
        "d = cast('4444' as VARBINARY) "
        "| extend e = md5(d), f = ARRAY [1, 2, 3] "
        "| extend g = element_at(f, 2), h = to_utf8('hi')",
    )["out"]
    r = out.first()
    assert r["a"] == "A" and r["b"] == 116 and r["c"] == 7
    assert r["g"] == 2 and bytes(r["h"]) == b"hi"


def test_multibranch_let_dag(spl_df):
    """The TestMultiParse fan-out (SplUnittest.cpp:560-576): one source,
    two filtered+parsed branches, both emitted."""
    script = """
.let src = * | parse-json routed;
.let ds1 = $src | where type = 'kv' | parse-kv -delims='&' message;
$ds1;
.let ds2 = $src | where type = 'csv' | parse-csv message as x, y, z;
$ds2;
"""
    outs = spl_run(spl_df, script)
    assert set(outs) == {"ds1", "ds2"}
    r1 = outs["ds1"].collect()
    assert len(r1) == 1 and r1[0]["u"] == "1" and r1[0]["v"] == "2"
    r2 = outs["ds2"].collect()
    assert len(r2) == 1 and (r2[0]["x"], r2[0]["y"], r2[0]["z"]) == ("a", "b", "c")


def test_spl_run_scoped_unpersists_let_caches(spl_df):
    """spl_run_scoped must release the multi-branch let cache on exit
    (bare spl_run leaves it to LRU — a long-lived session would leak)."""
    from pyspark import StorageLevel
    from loongcollector_spark.spl import spl_run_scoped

    script = """
.let src = * | parse-json routed;
.let ds1 = $src | where type = 'kv' | parse-kv -delims='&' message;
$ds1;
.let ds2 = $src | where type = 'csv' | parse-csv message as x, y, z;
$ds2;
"""
    # the shared `src` binding is persisted and tracked …
    persisted: list = []
    outs = spl_run(spl_df, script, _persisted=persisted)
    assert len(outs["ds1"].collect()) == 1
    assert len(persisted) == 1
    assert persisted[0].storageLevel.useMemory
    persisted[0].unpersist()
    assert persisted[0].storageLevel == StorageLevel(False, False, False, False)

    # … and the scoped runner does the unpersist itself
    with spl_run_scoped(spl_df, script) as outs2:
        assert len(outs2["ds2"].collect()) == 1


def test_unsupported_raises_at_compile(spl_df):
    with pytest.raises(SplUnsupported):
        spl_run(spl_df, "* | extend a = classify(content)")


CORPUS_SMOKE = [
    r"*| parse-regexp content, '(\S+)' as ip",
    r"*| parse-regexp content, '\S+\s+(\w+)' as method",
    "*| parse-json map_str",
    "*| parse-json -prefix='prefix_' map_str",
    "*| parse-json -path='$.message' routed",
    "*| parse-csv content_csv as ip, time, host",
    "*| parse-csv -delim=';' content_csv as ip, time, host",
    "*| parse-kv -delims='&?' content_kv",
    "*| parse-kv -kv-sep='=' -delims='&?' content_kv",
    "* | extend a = 23 | extend b = chr(a)",
    "* | extend a = 'hello', b = 'world', c = '111' | extend d = concat(a, b, c)",
    "* | extend a = 'this is word 555' | extend b = length(a)",
    "* | extend a = 'hello volex' | extend b = lpad(a, 100, 'rep')",
    "* | extend a = 'hello,volex,world,hello' | extend b = split(a, ',')",
    "* | extend a = 'hello,volex,world,hello' | extend b = split_part(a, ',', 2)",
    "* | extend a = 'hello velox' | extend d = substr(a, 1, 3)",
    "* | extend a = cast('4444' as VARBINARY) | extend b = crc32(a)",
    "* | extend a = cast('4444' as VARBINARY) | extend b = sha256(a)",
    "* | extend a = ARRAY ['cat', 'leopard', 'mouse'] | extend b = element_at(a, 2)",
    "* | extend a = ARRAY [5, 20, NULL, 50] | extend b = filter(a, x -> x IS NOT NULL)",
    "* | extend a = ARRAY [5, 20, NULL, 50] | extend b = reduce(a, 0, (s, x) -> IF(x IS NULL, s, s + x), s -> s)",
    "* | extend a = sequence(0, 10, 2)",
    "* | extend a = ARRAY [5, NULL, 6] | extend b = transform(a, x -> COALESCE(x, 0) + 1)",
    "* | extend a = ARRAY[1, 3, 5] | extend b = all_match(a, x -> x > 3)",
    "* | extend a = 'this is word 555' | extend b = regexp_extract(a, '(\\d+)', 1)",
    "* | extend a = 'this is word 555' | extend b = regexp_like(a, '(\\d+)')",
    "* | extend a = '1a 2b 14m' | extend b = regexp_replace(a, '(\\d+)([ab]) ', '3c$2' )",
    "* | extend a = 30 | extend b = abs(a)",
    "* | extend a = 30 | extend b = ceiling(a)",
    "* | extend a = 30 | extend b = exp(a)",
    "* | extend a = 1321, b = 8 | extend c = mod(a, b)",
    "* | extend a = 30 | extend b = pow(a, 3)",
    "* | extend a = 3.14 | extend b = round(a, 5)",
    "* | extend a = 30 | extend b = sqrt(a)",
    "* | extend a = 500 | extend b = width_bucket(a, 100, 5000, 10)",
    "* | extend a = MAP(ARRAY['k'], ARRAY['v']) | extend b = element_at(a, 'k')",
    "* | where length(content) > 3 | project content",
]


def test_corpus_smoke(spl_df):
    """Every supported corpus pipeline compiles and executes."""
    for script in CORPUS_SMOKE:
        outs = spl_run(spl_df, script)
        for frame in outs.values():
            assert frame.count() >= 0, script


DATETIME_CORPUS = [
    "* | extend a = date_parse('2026-01-02 03:04:05', '%Y-%m-%d %H:%i:%s') | extend b = to_unixtime(a)",
    "* | extend a = from_unixtime(1767322800) | extend b = year(a), c = month(a), d = hour(a)",
    "* | extend a = date_parse('2026-01-02', '%Y-%m-%d') | extend b = date_trunc('hour', a)",
    "* | extend a = date_parse('2026-01-05', '%Y-%m-%d') | extend b = day_of_week(a), c = day_of_year(a)",
    "* | extend a = date_parse('2026-01-02 03:04:05', '%Y-%m-%d %H:%i:%s') | extend b = date_add('hour', 2, a)",
    "* | extend a = date_parse('2026-01-02', '%Y-%m-%d'), b = date_parse('2026-02-02', '%Y-%m-%d') | extend c = date_diff('day', a, b)",
    "* | extend a = date_parse('2026-01-02 03:04:05', '%Y-%m-%d %H:%i:%s') | extend b = format_datetime(a, 'yyyy/MM/dd')",
    "* | extend a = now() | extend b = minute(a)",
]


def test_spl_datetime_family(spl_df):
    for script in DATETIME_CORPUS:
        outs = spl_run(spl_df, script)
        for frame in outs.values():
            assert frame.count() >= 0, script

    # semantic spot checks
    r = spl_run(
        spl_df,
        "* | extend a = date_parse('2026-01-05', '%Y-%m-%d') "
        "| extend dw = day_of_week(a), dy = day_of_year(a) | project dw, dy",
    )["out"].first()
    assert r["dw"] == 1 and r["dy"] == 5   # 2026-01-05 is a Monday (ISO 1)

    r = spl_run(
        spl_df,
        "* | extend a = date_parse('2026-01-02 03:00:00', '%Y-%m-%d %H:%i:%s') "
        "| extend b = date_add('hour', 2, a) | extend c = hour(b) | project c",
    )["out"].first()
    assert r["c"] == 5

    r = spl_run(
        spl_df,
        "* | extend u = to_unixtime(date_parse('1970-01-01 00:01:00', '%Y-%m-%d %H:%i:%s')) | project u",
    )["out"].first()
    assert r["u"] == 60  # UTC session timezone


def test_spl_url_and_bitwise(spl_df):
    r = spl_run(
        spl_df,
        "* | extend u = 'https://ex.com:8443/a/b?k=v&x=1#frag' "
        "| extend h = url_extract_host(u), p = url_extract_path(u), "
        "prt = url_extract_port(u), q = url_extract_parameter(u, 'k') "
        "| project h, p, prt, q",
    )["out"].first()
    assert (r["h"], r["p"], r["prt"], r["q"]) == ("ex.com", "/a/b", 8443, "v")

    r = spl_run(
        spl_df,
        "* | extend a = bitwise_and(12, 10), b = bitwise_or(12, 10), "
        "c = bitwise_xor(12, 10), d = bitwise_not(0), "
        "e = bitwise_left_shift(1, 4) | project a, b, c, d, e",
    )["out"].first()
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (8, 14, 6, -1, 16)


def test_dynamic_keys_are_exhaustive_not_sampled(spark):
    """A key first appearing far past any plausible sample window must
    still get its column (the reference expands keys per event,
    processor_json.go:75-78). Covers parse-json, parse-kv and
    parse-kv -regexp dynamic-key discovery."""
    n = 5000
    rows = [(i,
             '{"early":"%d"}' % i if i < n - 1 else '{"early":"x","late_json":"L"}',
             "a=%d" % i if i < n - 1 else "a=x&late_kv=L")
            for i in range(n)]
    df = spark.createDataFrame(rows, "i long, j string, kv string")
    out = spl_run(df, "* | parse-json j")["out"]
    assert "late_json" in out.columns
    assert out.filter("late_json = 'L'").count() == 1
    out2 = spl_run(df, "* | parse-kv kv")["out"]
    assert "late_kv" in out2.columns
    out3 = spl_run(df, "* | parse-kv -regexp kv, '(\\w+)=(\\w+)'")["out"]
    assert "late_kv" in out3.columns


def test_dynamic_keys_capped_fail_fast(spark, monkeypatch):
    """A hostile corpus whose dynamic key cardinality explodes (every
    row a fresh key) must fail fast with a clear error instead of
    collecting millions of keys onto the driver and emitting a
    million-column frame."""
    import pytest

    from loongcollector_spark.spl import SplUnsupported

    monkeypatch.setenv("LCS_SPL_MAX_KEYS", "50")
    df = spark.range(200).selectExpr(
        "id", "concat('{\"k', id, '\":\"v\"}') AS j",
        "concat('k', id, '=v') AS kv")
    with pytest.raises(SplUnsupported, match="distinct keys"):
        spl_run(df, "* | parse-json j")
    with pytest.raises(SplUnsupported, match="distinct keys"):
        spl_run(df, "* | parse-kv -regexp kv, '(\\w+)=(\\w+)'")
    # at-or-under the cap still works
    monkeypatch.setenv("LCS_SPL_MAX_KEYS", "200")
    out = spl_run(df, "* | parse-json j")["out"]
    assert len([c for c in out.columns
                if c.startswith("k") and c != "kv"]) == 200


def test_bounded_random_is_integer_in_range(spark):
    """Presto random(n) is a uniform INTEGER in [0, n); Spark's rand(n)
    would treat n as a seed and return a double — the translation must
    rewrite the bounded form, not alias it."""
    from loongcollector_spark.spl import _translate_expr

    out = _translate_expr("random(10)")
    assert "rand(10)" not in out and "floor" in out

    df = spark.range(200).withColumnRenamed("id", "i")
    r = spl_run(df, "* | extend r = random(10), u = random() | project r, u")["out"]
    rows = r.collect()
    assert all(isinstance(x["r"], int) and 0 <= x["r"] < 10 for x in rows)
    assert len({x["r"] for x in rows}) > 3  # actually uniform-ish, not constant
    assert all(0.0 <= x["u"] < 1.0 for x in rows)


def test_translate_never_corrupts_literals():
    """Property: quoted literal contents survive translation verbatim
    (modulo backslash doubling for Spark's SQL parser) even when they
    spell function names the rename passes target."""
    from hypothesis import given, settings, strategies as st

    from loongcollector_spark.spl import _translate_expr

    nasty = st.text(
        alphabet="now()chr strpos(a,b) map zip contains \\ &=| .09",
        max_size=24,
    ).filter(lambda s: "'" not in s)

    @settings(max_examples=200, deadline=None)
    @given(nasty)
    def check(lit):
        out = _translate_expr(f"concat(x, '{lit}', now())")
        expected = "'" + lit.replace("\\", "\\\\") + "'"
        assert expected in out, (lit, out)
        assert out.endswith("current_timestamp())")

    check()


def test_empty_approx_set_is_a_real_hll_sketch(spark):
    """empty_approx_set() inlines an empty datasketches HLL literal that
    Spark's own HLL family consumes: estimate = 0 and it's the identity
    under hll_union."""
    from loongcollector_spark.spl import spl_run

    df = spark.createDataFrame([("x",), ("y",)], "content string")
    out = list(spl_run(df, "* | extend a = empty_approx_set()").values())[0]
    rows = out.collect()
    assert len(rows) == 2
    sketch = bytes(rows[0]["a"])
    assert sketch == bytes(rows[1]["a"])  # a constant literal
    est, = spark.sql(
        "SELECT hll_sketch_estimate(unhex('%s'))" % sketch.hex().upper()
    ).first()
    assert est == 0
    merged, = spark.sql(
        "SELECT hll_sketch_estimate(hll_union(unhex('%s'), "
        "(SELECT hll_sketch_agg(col) FROM VALUES (1),(2),(2) AS t(col))))"
        % sketch.hex().upper()
    ).first()
    assert merged == 2


def test_parse_csv_strict_with_quote(spl_df):
    """-strict must apply on the quoted path too: 3 fields vs 2 keys →
    nulls, while an exact-count row still parses (quote-aware count)."""
    out = spl_run(
        spl_df, "* | parse-csv -strict -quote='\"' content_csv as ip, time"
    )["out"]
    assert all(r["ip"] is None for r in out.collect())

    out = spl_run(
        spl_df, "* | parse-csv -strict -quote='\"' content_csv as ip, time, host"
    )["out"]
    got = {r["host"]: r["ip"] for r in out.collect()}
    assert got["web02"] == "quoted,ip"  # embedded delimiter not miscounted


def test_multiple_anonymous_pipelines_keep_all_outputs(spl_df):
    outs = spl_run(
        spl_df,
        "* | where content like '%GET%'; * | where content like '%POST%';",
    )
    assert set(outs) == {"out", "out1"}
    assert outs["out"].count() == 1 and outs["out1"].count() == 1


def test_spooky_hash_v2_known_answer_and_spl_surface(spl_df):
    """SpookyHash V2 shim (spl.txt:77-78 corpus lines).

    Pinned to the public known-answer vector hash64("", 0) =
    0x232706FC6BF50919 (published in the test suites of multiple
    independent SpookyHash V2 ports), plus the spec identity
    hash32 == low 32 bits of hash64, on both the short (<192 B) and
    long (>=192 B) paths. The SPL surface mirrors Presto's output
    contract: VARBINARY in, hash bytes big-endian out.
    """
    from loongcollector_spark.functions import spooky

    assert spooky.hash64(b"", 0) == 0x232706FC6BF50919
    assert spooky.hash32(b"", 0) == 0x6BF50919
    for data in (b"4444", b"x" * 191, b"x" * 192, bytes(range(256)) * 3):
        assert spooky.hash32(data, 0) == spooky.hash64(data, 0) & 0xFFFFFFFF
        # avalanche: flipping one input bit flips a third+ of output bits
        flipped = bytes([data[0] ^ 1]) + data[1:]
        delta = spooky.hash64(data, 0) ^ spooky.hash64(flipped, 0)
        assert 20 <= bin(delta).count("1") <= 44

    outs = spl_run(
        spl_df,
        "* | extend a = cast('4444' as VARBINARY)"
        " | extend b32 = spooky_hash_v2_32(a)"
        " | extend b64 = spooky_hash_v2_64(a)",
    )
    row = outs["out"].select("b32", "b64").first()
    assert bytes(row["b32"]) == spooky.hash32(b"4444", 0).to_bytes(4, "big")
    assert bytes(row["b64"]) == spooky.hash64(b"4444", 0).to_bytes(8, "big")
    assert bytes(row["b64"])[4:] == bytes(row["b32"])
