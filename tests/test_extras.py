"""Golden tests for the extras operators (geoip, encrypt, tags, multiline
merge, aliases) and the multimodal / similarity additions."""

import hashlib

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators import build_operator


def test_geoip_range_join(spark):
    df = spark.createDataFrame(
        [("10.0.0.5",), ("10.64.1.1",), ("10.200.0.9",), ("192.168.1.1",)],
        "ip string",
    )
    op = build_operator({
        "Type": "processor_geoip", "SourceKey": "ip",
        "Ranges": [
            ["10.0.0.0", "10.63.255.255", "CN", "ZJ", "HZ"],
            ["10.64.0.0", "10.127.255.255", "CN", "BJ", "BJ"],
            ["10.128.0.0", "10.255.255.255", "US", "CA", "SF"],
        ],
    })
    got = {r["ip"]: (r["ip_country"], r["ip_city"]) for r in op(df).collect()}
    assert got == {
        "10.0.0.5": ("CN", "HZ"),
        "10.64.1.1": ("CN", "BJ"),
        "10.200.0.9": ("US", "SF"),
        "192.168.1.1": ("Unknown", "Unknown"),  # outside all ranges
    }


def test_encrypt_deterministic_and_reversible(spark):
    df = spark.createDataFrame([("secret",), ("secret",), ("other",)], "text string")
    op = build_operator({
        "Type": "processor_encrypt", "SourceKeys": ["text"],
        "EncryptionParameters": {"Key": "0123456789abcdef"},
    })
    vals = [r["text"] for r in op(df).collect()]
    assert vals[0] == vals[1] != vals[2]          # ECB: deterministic
    assert all(set(v) <= set("0123456789ABCDEF") for v in vals)  # hex out
    # round-trip through the JVM decrypt proves it's real AES, not a hash
    dec = spark.createDataFrame([(vals[0],)], "c string").select(
        F.aes_decrypt(F.unhex("c"), F.lit("0123456789abcdef"), F.lit("ECB"))
        .cast("string").alias("p")
    ).first()["p"]
    assert dec == "secret"


def test_encrypt_known_answer_vs_python_aes(spark):
    """Pin the JVM aes_encrypt output to the public FIPS-197 algorithm via
    the independent pure-Python model (tools/pyaes self-checks the FIPS-197
    C.1 vector on import)."""
    from tools.pyaes import aes_ecb_encrypt

    vectors = ["hello world", "x" * 16, "", "conv_00000001 turn 7",
               "白日依山尽"]  # incl. multi-byte UTF-8
    for key in ("0123456789abcdef", "0123456789abcdef01234567",
                "0123456789abcdef0123456789abcdef"):
        df = spark.createDataFrame([(v,) for v in vectors], "t string")
        op = build_operator({
            "Type": "processor_encrypt", "SourceKeys": ["t"],
            "EncryptionParameters": {"Key": key},
        })
        got = [r["t"] for r in op(df).collect()]
        exp = [aes_ecb_encrypt(v.encode(), key.encode()).hex().upper()
               for v in vectors]
        assert got == exp


def test_tag_and_cloud_meta_and_default(spark):
    df = spark.createDataFrame([("x",)], "text string")
    chain = [
        {"Type": "processor_tag", "Tags": {"__hostname__": "h1"},
         "Renames": {"text": "content"}},
        {"Type": "processor_cloud_meta", "Platform": "mock",
         "Metadata": {"instance_id": "i-123"}},
        {"Type": "processor_default"},
    ]
    out = df
    for cfg in chain:
        out = build_operator(cfg)(out)
    r = out.first()
    assert (r["content"], r["__hostname__"], r["cloud_platform"],
            r["instance_id"]) == ("x", "h1", "mock", "i-123")


def test_merge_multiline_by_regex(spark):
    rows = [
        ("c1", 0, "ERROR boom", "2026-01-01 00:00:00"),
        ("c1", 1, "  at frame1", "2026-01-01 00:00:01"),
        ("c1", 2, "  at frame2", "2026-01-01 00:00:02"),
        ("c1", 3, "ERROR again", "2026-01-01 00:00:03"),
        ("c2", 0, "stray continuation", "2026-01-01 00:00:00"),
        ("c2", 1, "ERROR solo", "2026-01-01 00:00:01"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    op = build_operator({
        "Type": "processor_merge_multiline_log", "StartPattern": r"ERROR.*",
        "UnmatchedContentTreatment": "single_line",
    })
    got = {(r["conv_id"], r["turn_idx"]): (r["text"], r["n_merged"])
           for r in op(df).collect()}
    assert got[("c1", 0)] == ("ERROR boom\n  at frame1\n  at frame2", 3)
    assert got[("c1", 3)] == ("ERROR again", 1)
    assert got[("c2", 0)] == ("stray continuation", 1)   # kept as own event
    assert got[("c2", 1)] == ("ERROR solo", 1)

    # discard mode drops the pre-start row
    op2 = build_operator({
        "Type": "processor_merge_multiline_log", "StartPattern": r"ERROR.*",
        "UnmatchedContentTreatment": "discard",
    })
    assert ("c2", 0) not in {
        (r["conv_id"], r["turn_idx"]) for r in op2(df).collect()
    }


def test_go_twin_aliases(spark):
    df = spark.createDataFrame([("a,b,c",)], "text string")
    op = build_operator({
        "Type": "processor_csv", "SourceKey": "text",
        "SplitSep": ",", "SplitKeys": ["x", "y", "z"],
    })
    r = op(df).first()
    assert (r["x"], r["y"], r["z"]) == ("a", "b", "c")

    op = build_operator({
        "Type": "processor_regex", "SourceKey": "text",
        "Regex": r"(\w+),.*", "Keys": ["first"],
    })
    r = op(spark.createDataFrame([("hi,there",)], "text string")).first()
    assert r["first"] == "hi"

    # Go twin defaults FullMatch=false (regex.go:134): match-anywhere —
    # a mid-string match must parse where the C++ native default (full
    # match) would fail the row
    op = build_operator({
        "Type": "processor_regex", "SourceKey": "text",
        "Regex": r"code=(\d+)", "Keys": ["code"],
    })
    r = op(spark.createDataFrame([("prefix code=42 suffix",)], "text string")).first()
    assert r["code"] == "42"


def test_simhash_excludes_null_and_empty_docs(spark):
    """Null/empty/whitespace-only docs carry no signature on EITHER
    engine — they are filtered identically in simhash_signatures and the
    DuckDB oracle CTE (an explode would silently drop only the NULLs)."""
    from loongcollector_spark.functions.dedup import simhash_signatures

    df = spark.createDataFrame(
        [(0, "real words here"), (1, None), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    assert [r["doc_id"] for r in simhash_signatures(df).collect()] == [0]


def test_simhash_matches_python_model(spark):
    texts = ["the quick brown fox", "the quick brown fix", "something else"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from loongcollector_spark.functions.dedup import simhash_signatures

    got = {
        r["doc_id"]: [r["sh0"], r["sh1"], r["sh2"], r["sh3"]]
        for r in simhash_signatures(df).collect()
    }

    def model(text):
        # the shared definition: word hash = first 16 hex digits of md5;
        # bit k = bit (k%4) of hex digit k//4; chunk c packs bits 16c..16c+15
        acc = [0] * 64
        for w in text.split():
            hx = hashlib.md5(w.encode()).hexdigest()[:16]
            for k in range(64):
                bit = (int(hx[k // 4], 16) >> (k % 4)) & 1
                acc[k] += 1 if bit else -1
        return [
            sum(1 << j for j in range(16) if acc[16 * c + j] > 0)
            for c in range(4)
        ]

    for i, t in enumerate(texts):
        assert got[i] == model(t), t

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    # near-identical texts must be close in hamming, unrelated text far
    assert ham(got[0], got[1]) < ham(got[0], got[2])


def test_multimodal_plumbing(spark):
    from loongcollector_spark.functions.multimodal import (
        _decode_stub, documents_as_media, extract_features, frame_sample,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "")], "doc_id long, text string"
    )
    media = documents_as_media(docs, "video")
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["feat_dim"] == 3 and feats[1]["ok"]
    assert feats[1]["feat_mean"] == pytest.approx((97 + 98 + 99) / 3)
    assert feats[2]["feat_dim"] == 0 and not feats[2]["ok"]

    frames = frame_sample(media, every_n=10)
    assert frames.count() > 0
    assert frames.columns == ["doc_id", "frame_idx", "payload"]

    with pytest.raises(NotImplementedError):
        _decode_stub(b"x", "hologram")


def test_multimodal_real_codecs():
    """PGM/WAV encode→decode round-trips, local (no Spark)."""
    import numpy as np

    from loongcollector_spark.functions.multimodal import (
        encode_pgm, encode_wav_pcm16, resize_nearest, try_decode_pgm,
        try_decode_wav,
    )

    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    img = try_decode_pgm(encode_pgm(4, 3, px))
    assert img.shape == (3, 4) and (img == px).all()
    # resize identity and downsample pick the expected source pixels
    assert (resize_nearest(img, 4, 3) == px).all()
    small = resize_nearest(img, 2, 2)
    assert small.tolist() == [[px[0, 0], px[0, 2]], [px[1, 0], px[1, 2]]]

    sr, samples = try_decode_wav(encode_wav_pcm16(8000, [0, 100, -100, 32767]))
    assert sr == 8000 and samples.tolist() == [0, 100, -100, 32767]

    # malformed payloads -> None, never an exception
    assert try_decode_pgm(b"") is None
    assert try_decode_pgm(b"P6\n2 2\n255\n....") is None       # wrong magic
    assert try_decode_pgm(b"P5\n9 9\n255\nxx") is None         # truncated
    assert try_decode_wav(b"RIFFxxxxWAVE") is None             # no chunks
    assert try_decode_wav(b"OggS" + b"\0" * 64) is None        # wrong container


def test_multimodal_real_decode_in_spark(spark):
    """synthetic_media payloads decode back to the closed-form features;
    a corrupt payload degrades to the stub path instead of failing."""
    import numpy as np

    from loongcollector_spark.functions.multimodal import (
        extract_features, image_resize, synthetic_media,
    )

    docs = spark.createDataFrame([(5,), (17,)], "doc_id long")
    feats = {r["doc_id"]: r
             for r in extract_features(synthetic_media(docs, "image")).collect()}
    for d in (5, 17):
        w, h = d % 64 + 16, d % 48 + 16
        expect = float(np.mean((d * 31 + np.arange(w * h)) % 256))
        assert feats[d]["feat_mean"] == pytest.approx(expect)
        assert feats[d]["feat_dim"] == w * h and feats[d]["ok"]

    afeats = {r["doc_id"]: r
              for r in extract_features(synthetic_media(docs, "audio")).collect()}
    for d in (5, 17):
        expect = float(np.abs(((d * 7 + np.arange(1600)) % 512 - 256) * 64).mean())
        assert afeats[d]["feat_mean"] == pytest.approx(expect)
        assert afeats[d]["feat_dim"] == 1600 and afeats[d]["ok"]

    resized = {r["doc_id"]: r
               for r in image_resize(synthetic_media(docs, "image"), 8, 8).collect()}
    assert all(r["ok"] and r["width"] == 8 and r["height"] == 8
               for r in resized.values())

    corrupt = spark.createDataFrame(
        [(1, "image", bytearray(b"JFIF not a pgm"))],
        "doc_id long, media_type string, payload binary",
    )
    row = extract_features(corrupt).collect()[0]
    assert not row["ok"] or row["feat_dim"] == 14  # stub fallback, no crash
    rrow = image_resize(corrupt, 8, 8).collect()[0]
    assert rrow["ok"] is False and bytes(rrow["payload"]) == b"JFIF not a pgm"


def test_embedding_near_dup_blocks_and_thresholds(spark):
    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, [1.0, 2.0, 3.01]),     # near-dup of 1: all sign bands agree
        (3, [-1.0, 2.0, 3.0]),     # differs in band0, shares bands 1-3
        (4, [3.0, -2.0, 1.0]),     # candidate of nothing similar
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from loongcollector_spark.functions.similarity import embedding_near_dup_pairs

    pairs = {(r["vec_a"], r["vec_b"]): r["cos_1e4"]
             for r in embedding_near_dup_pairs(df, min_cos_1e4=9990).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 9990
    assert all(a != 3 and b != 3 for a, b in pairs)  # below cos threshold

    # banding recall: a candidate pair must agree on every bit of >=1 band
    from loongcollector_spark.functions.similarity import band_values
    bv = df.select(
        "vec_id", *[v.alias(f"b{i}")
                    for i, v in enumerate(band_values(F.col("embedding")))]
    ).collect()
    by_id = {r["vec_id"]: [r[f"b{i}"] for i in range(4)] for r in bv}
    assert by_id[1] == by_id[2]
    assert by_id[1][0] != by_id[3][0] and by_id[1][1:] == by_id[3][1:]


def test_grok_backtracking_lint_rejects_pathological_patterns(spark):
    """The reference caps grok at 100 ms/regexp (processor_grok.go:41-58);
    this build rejects the exponential shapes at BUILD time instead."""
    import pytest as _pytest

    for bomb in [r"(%{WORD}\s?)+$", r"start(?:\w*)*end"]:
        with _pytest.raises(ValueError, match="backtracking"):
            build_operator({
                "Type": "processor_grok", "SourceKey": "text", "Match": [bomb],
            })
    # explicit override keeps the reference-parity escape hatch
    build_operator({
        "Type": "processor_grok", "SourceKey": "text",
        "Match": [r"start(?:\w*)*end"], "AllowRiskyPatterns": True,
    })
    # the safe path shapes (URIPATH/UNIXPATH/WINPATH) must still build
    build_operator({
        "Type": "processor_grok", "SourceKey": "text",
        "Match": ["%{URIPATHPARAM:p}", "%{PATH:q}"],
    })


def test_grok_combined_apache_pattern(spark):
    """Full default-library chain: COMBINEDAPACHELOG expands through
    COMMONAPACHELOG/HTTPDATE/QS/... to a working extraction."""
    line = ('203.0.113.9 - frank [10/Oct/2026:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
            '"http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98)"')
    df = spark.createDataFrame([(line,), ("not a log line",)], "text string")
    op = build_operator({
        "Type": "processor_grok", "SourceKey": "text",
        "Match": ["%{COMBINEDAPACHELOG}"],
    })
    out = op(df)
    ok = out.filter("_parse_ok").collect()
    assert len(ok) == 1
    r = ok[0]
    assert r["clientip"] == "203.0.113.9"
    assert r["verb"] == "GET" and r["request"] == "/apache_pb.gif"
    assert r["response"] == "200" and r["bytes"] == "2326"
    assert r["referrer"] == '"http://www.example.com/start.html"'
    assert out.filter("NOT _parse_ok").count() == 1


def test_grok_syslog_and_uuid_patterns(spark):
    df = spark.createDataFrame(
        [("Oct 11 22:14:15 myhost su[1024]: 550e8400-e29b-41d4-a716-446655440000",)],
        "text string",
    )
    op = build_operator({
        "Type": "processor_grok", "SourceKey": "text",
        "Match": ["%{SYSLOGBASE} %{UUID:req_id}"],
    })
    r = op(df).filter("_parse_ok").first()
    assert r is not None
    assert r["logsource"] == "myhost" and r["program"] == "su" and r["pid"] == "1024"
    assert r["req_id"] == "550e8400-e29b-41d4-a716-446655440000"


def test_unknown_config_keys_raise_everywhere():
    """Registry-wide: every operator declares its accepted keys, and
    build_operator rejects configs with unknown keys at build time (the
    reference's Init-time validation posture)."""
    from loongcollector_spark.operators import KNOWN_KEYS, REGISTRY

    assert set(REGISTRY) == set(KNOWN_KEYS)  # no silent-accept operators
    for name in sorted(REGISTRY):
        with pytest.raises((ValueError, KeyError)):
            build_operator({"Type": name, "DefinitelyNotAKey__": 1})


def test_split_char_quote(spark):
    df = spark.createDataFrame([('a,"b,c",d',)], "content string")
    op = build_operator({
        "Type": "processor_split_char", "SourceKey": "content",
        "SplitSep": ",", "SplitKeys": ["x", "y", "z"],
        "QuoteFlag": True, "Quote": '"',
    })
    r = op(df).first()
    assert (r["x"], r["y"], r["z"]) == ("a", "b,c", "d")


def test_split_string_expand_others(spark):
    df = spark.createDataFrame([("a|b|c|d|e",)], "content string")
    op = build_operator({
        "Type": "processor_split_string", "SourceKey": "content",
        "SplitSep": "|", "SplitKeys": ["k1", "k2"],
        "ExpandOthers": True, "ExpandKeyPrefix": "ex_",
    })
    r = op(df).first()
    assert (r["k1"], r["k2"]) == ("a", "b")
    assert (r["ex_1"], r["ex_2"], r["ex_3"]) == ("c", "d", "e")
    # without ExpandOthers the extras are discarded
    op2 = build_operator({
        "Type": "processor_split_string", "SourceKey": "content",
        "SplitSep": "|", "SplitKeys": ["k1", "k2"],
    })
    assert "ex_1" not in op2(df).columns


def test_filter_discarding_non_utf8(spark):
    df = spark.createDataFrame(
        [("ok line", "a"), ("bad � byte", "b"), (None, "c")],
        "text string, k string",
    )
    op = build_operator({"Type": "processor_filter", "DiscardingNonUTF8": True})
    kept = [r["k"] for r in op(df).collect()]
    assert sorted(kept) == ["a", "c"]


def test_gotime_go_layouts(spark):
    from loongcollector_spark.operators.timeops import go_layout_to_jdk

    assert go_layout_to_jdk("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss"
    assert go_layout_to_jdk("02/Jan/2006:15:04:05 -0700") == "dd/MMM/yyyy:HH:mm:ss xx"
    assert go_layout_to_jdk("2006-01-02T15:04:05.000Z07:00") == "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
    assert go_layout_to_jdk("yyyy-MM-dd HH:mm:ss") is None  # already JDK

    df = spark.createDataFrame(
        [("2026-03-01 10:20:30",), ("01/Mar/2026:10:20:30 +0000",)],
        "t string",
    )
    for fmt, col in (("2006-01-02 15:04:05", 0), ("02/Jan/2006:15:04:05 -0700", 1)):
        op = build_operator({
            "Type": "processor_gotime", "SourceKey": "t",
            "SourceFormat": fmt, "DestKey": "parsed",
        })
        rows = op(df).collect()
        assert str(rows[col]["parsed"]) == "2026-03-01 10:20:30"


def test_geoip_10k_ranges_equi_join_plan(spark):
    """Scale posture: with a realistic 10k-range table the plan must be a
    broadcast HASH join on the /16 prefix bucket, not a nested-loop probe
    of every range per row."""
    # 10k contiguous /24-ish blocks under 11.0.0.0/8: 11.x.y.0-11.x.y.255
    ranges = []
    for i in range(10_000):
        x, y = divmod(i, 256)
        ranges.append([f"11.{x}.{y}.0", f"11.{x}.{y}.255",
                       f"C{i % 7}", f"P{i % 13}", f"city{i}"])
    df = spark.createDataFrame(
        [("11.0.2.9",), ("11.3.1.200",), ("99.9.9.9",)], "ip string"
    )
    op = build_operator({
        "Type": "processor_geoip", "SourceKey": "ip", "Ranges": ranges,
    })
    out = op(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {r["ip"]: (r["ip_country"], r["ip_city"]) for r in out.collect()}
    assert got["11.0.2.9"] == ("C2", "city2")          # block index 2
    assert got["11.3.1.200"] == ("C" + str((3 * 256 + 1) % 7), f"city{3 * 256 + 1}")
    assert got["99.9.9.9"] == ("Unknown", "Unknown")


def test_csv_twin_preserve_trim_and_partial_regex(spark):
    df = spark.createDataFrame([("a, b,c,rest1,rest2",)], "text string")
    op = build_operator({
        "Type": "processor_csv", "SourceKey": "text",
        "SplitSep": ",", "SplitKeys": ["x", "y"],
        "TrimLeadingSpace": True, "PreserveOthers": True,
    })
    r = op(df).first()
    assert (r["x"], r["y"]) == ("a", "b")
    assert r["_decode_preserve_"] == "c,rest1,rest2"

    # FullMatch=False: the Go regex twin matches anywhere in the value
    op2 = build_operator({
        "Type": "processor_regex", "SourceKey": "text",
        "Regex": r"rest(\d)", "Keys": ["rest_no"], "FullMatch": False,
    })
    r2 = op2(spark.createDataFrame([("prefix rest7 suffix",)], "text string")).first()
    assert r2["rest_no"] == "7" and r2["_parse_ok"]


def test_png_codec_round_trip_and_filters():
    """PNG decode against the RFC 2083 spec: encode→decode identity for
    gray + RGB, CRC rejection, truncation rejection, and hand-built
    IDAT streams using Sub/Up/Average/Paeth row filters (the encoder
    only emits filter 0, so these vectors are independent of it)."""
    import binascii
    import struct
    import zlib

    import numpy as np

    from loongcollector_spark.functions.multimodal import (
        encode_png, try_decode_png)

    px = (np.arange(20 * 12) % 256).reshape(12, 20).astype(np.uint8)
    assert (try_decode_png(encode_png(20, 12, px)) == px).all()
    rgb = np.stack([(np.arange(240) + o) % 256 for o in (0, 85, 170)],
                   axis=-1).reshape(12, 20, 3).astype(np.uint8)
    assert (try_decode_png(encode_png(20, 12, rgb)) == rgb).all()

    good = encode_png(20, 12, px)
    bad = bytearray(good)
    bad[30] ^= 0xFF
    assert try_decode_png(bytes(bad)) is None          # chunk CRC
    assert try_decode_png(good[:40]) is None           # truncated
    assert try_decode_png(b"not a png") is None

    def chunk(t, d):
        crc = binascii.crc32(t + d) & 0xFFFFFFFF
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", crc)

    target = np.array([[10, 20, 30, 40], [15, 25, 35, 45],
                       [90, 80, 70, 60]], dtype=np.uint8)
    r0, r1, r2 = (target[i].astype(int) for i in range(3))
    f0 = bytes([1, r0[0]] + [(r0[x] - r0[x - 1]) % 256 for x in range(1, 4)])
    f1 = bytes([2] + [(r1[x] - r0[x]) % 256 for x in range(4)])
    paeth = []
    for x in range(4):
        a = r2[x - 1] if x else 0
        b = r1[x]
        c = r1[x - 1] if x else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        paeth.append((r2[x] - pred) % 256)
    f2 = bytes([4] + paeth)
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(f0 + f1 + f2))
           + chunk(b"IEND", b""))
    assert (try_decode_png(png) == target).all()

    favg = bytes([3] + [(r0[x] - ((r0[x - 1] if x else 0) >> 1)) % 256
                        for x in range(4)])
    png_avg = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(favg)) + chunk(b"IEND", b""))
    assert (try_decode_png(png_avg) == target[0:1]).all()


def test_y4m_codec_parse_and_frame_decode():
    import numpy as np

    from loongcollector_spark.functions.multimodal import (
        decode_y4m_frame, encode_y4m, try_parse_y4m)

    uv = np.full(32, 128, np.uint8)
    frames = [((f * 7 + np.arange(128)) % 256, uv, uv) for f in range(5)]
    buf = encode_y4m(16, 8, frames)
    w, h, n, offsets = try_parse_y4m(buf)
    assert (w, h, n) == (16, 8, 5) and len(offsets) == 5
    for f in range(5):
        got = decode_y4m_frame(buf, f).reshape(-1)
        assert (got == (f * 7 + np.arange(128)) % 256).all()
    assert try_parse_y4m(b"RIFFnot-a-y4m") is None
    assert try_parse_y4m(buf[:20]) is None          # header only, no frame
    assert decode_y4m_frame(buf, 5) is None         # out of range
    # odd dimensions are not C420-representable
    assert try_parse_y4m(b"YUV4MPEG2 W15 H8 F25:1\nFRAME\n" + b"\0" * 200) is None


def test_video_frame_features_spark(spark):
    from loongcollector_spark.functions.multimodal import (
        synthetic_media, video_frame_features)

    docs = spark.createDataFrame(
        [(7, "x", "s", 1), (23, "y", "s", 1)],
        "doc_id long, text string, source string, n_chars int")
    media = synthetic_media(docs, "video")
    got = {(r["doc_id"], r["frame_idx"]): r
           for r in video_frame_features(media, every_n=5).collect()}
    import numpy as np
    for d in (7, 23):
        nf = d % 12 + 1
        for f in range(0, nf, 5):
            r = got[(d, f)]
            assert r["ok"] and (r["width"], r["height"]) == (16, 8)
            exp = float(np.mean((d * 13 + f * 7 + np.arange(128)) % 256))
            assert abs(r["y_mean"] - exp) < 1e-9
    assert all(k[1] % 5 == 0 for k in got)


def test_image_resize_handles_png_rgb(spark):
    import numpy as np

    from loongcollector_spark.functions.multimodal import (
        encode_png, image_resize, try_decode_png)

    rgb = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(8, 6, rgb)))], "doc_id long, payload binary")
    [row] = image_resize(df, 4, 3).collect()
    assert row["ok"] and (row["width"], row["height"]) == (4, 3)
    out = try_decode_png(bytes(row["payload"]))
    assert out.shape == (3, 4, 3)
    # nearest-neighbor picks source pixels exactly
    assert (out == rgb[[0, 2, 4]][:, [0, 2, 4, 6]]).all()


class TestDockerStdoutService:
    """service_docker_stdout line semantics (docker_stdout_processor.go)."""

    def _lines(self, spark, rows):
        return spark.createDataFrame(
            [(r, "c.log", i) for i, r in enumerate(rows)],
            "content string, _ingest_file string, _line_idx long")

    def test_partial_lines_concatenate_without_separator(self, spark):
        import json as j
        from loongcollector_spark.operators import build_operator

        op = build_operator({"Type": "service_docker_stdout"})
        df = self._lines(spark, [
            j.dumps({"log": "part1", "stream": "stdout", "time": "t1"}),
            j.dumps({"log": "part2\n", "stream": "stdout", "time": "t2"}),
            j.dumps({"log": "whole\n", "stream": "stdout", "time": "t3"}),
        ])
        got = sorted((r["content"], r["_time_"], r["n_merged"])
                     for r in op(df).collect())
        # merged event carries the LAST line's time (newRawLogByMultiLine
        # uses lastOne, docker_stdout_processor.go:314-348)
        assert got == [("part1part2", "t2", 2), ("whole", "t3", 1)]

    def test_cri_and_json_lines_auto_detect(self, spark):
        import json as j
        from loongcollector_spark.operators import build_operator

        op = build_operator({"Type": "service_docker_stdout"})
        df = self._lines(spark, [
            "2024-01-01T00:00:01.0Z stdout P par",
            "2024-01-01T00:00:02.0Z stdout F tial",
            j.dumps({"log": "dockerline\n", "stream": "stdout", "time": "t"}),
        ])
        got = sorted((r["content"], r["n_merged"]) for r in op(df).collect())
        assert got == [("dockerline", 1), ("partial", 2)]

    def test_stream_filter_only_when_single_stream(self, spark):
        import json as j
        from loongcollector_spark.operators import build_operator

        rows = [
            j.dumps({"log": "out\n", "stream": "stdout", "time": "t1"}),
            j.dumps({"log": "err\n", "stream": "stderr", "time": "t2"}),
        ]
        both = build_operator({"Type": "service_docker_stdout"})
        assert both(self._lines(spark, rows)).count() == 2
        only_err = build_operator(
            {"Type": "service_docker_stdout", "Stdout": False})
        got = only_err(self._lines(spark, rows)).collect()
        assert [r["content"] for r in got] == ["err"]

    def test_begin_line_regex_leading_lines_join_first_event(self, spark):
        import json as j
        from loongcollector_spark.operators import build_operator

        op = build_operator(
            {"Type": "service_docker_stdout", "BeginLineRegex": "^BEGIN"})
        df = self._lines(spark, [
            j.dumps({"log": f"{ln}\n", "stream": "stdout", "time": f"t{i}"})
            for i, ln in enumerate(
                ["orphan1", "orphan2", "BEGIN a", "tail", "BEGIN b"])
        ])
        got = sorted(r["content"] for r in op(df).collect())
        assert got == ["BEGIN a\ntail", "BEGIN b", "orphan1\norphan2"]

    def test_raw_variant_anchored_check(self, spark):
        from loongcollector_spark.operators import build_operator

        # raw: the begin regex must span the whole check line
        # (rawstdout/input_docker_stdout.go:180 FindStringIndex ==len)
        op = build_operator({"Type": "service_docker_stdout_raw",
                             "BeginLineRegex": "today"})
        df = self._lines(spark, ["2024-01-01T00:00:01.0Z today-x",
                                 "2024-01-01T00:00:02.0Z today"])
        got = sorted(r["content"] for r in op(df).collect())
        # "today-x" does NOT full-match -> joins the leading event;
        # bare "today" does -> opens a new one
        assert got == ["today", "today-x"]

    def test_unparseable_line_kept_as_content(self, spark):
        from loongcollector_spark.operators import build_operator

        op = build_operator({"Type": "service_docker_stdout"})
        got = op(self._lines(spark, ["no framing here"])).collect()
        assert got[0]["content"] == "no framing here"
        assert got[0]["_time_"] == ""


def test_simhash_long_doc_no_overflow(spark):
    """A >=32k-token doc used to overflow the 16-bit-lane packing —
    ARITHMETIC_OVERFLOW under ANSI, silent lane-wrap without. The 32-bit
    lanes must match the Python model exactly."""
    from loongcollector_spark.functions.dedup import simhash_signatures

    text = "foo bar " * 40_000  # 80k tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = simhash_signatures(df).first()

    acc = [0] * 64
    for w in text.split():
        hx = hashlib.md5(w.encode()).hexdigest()[:16]
        for k in range(64):
            acc[k] += 1 if (int(hx[k // 4], 16) >> (k % 4)) & 1 else -1
    exp = [sum(1 << j for j in range(16) if acc[16 * c + j] > 0)
           for c in range(4)]
    assert [r["sh0"], r["sh1"], r["sh2"], r["sh3"]] == exp



class TestGroupInfoFilter:
    """ext_groupinfo_filter (group_info_filter.go:78-99): AND of per-key
    unanchored regex conditions, Reverse flips each, missing key tests
    against ''."""

    def _df(self, spark):
        return spark.createDataFrame(
            [("app-1", "prod", "a"), ("app-2", "dev", "b"),
             ("db-1", "prod", "c")],
            "`__tag__:service` string, env string, content string",
        )

    def test_tag_regex_match_anywhere(self, spark):
        op = build_operator({"Type": "ext_groupinfo_filter",
                             "Tags": {"service": {"Pattern": "app"}}})
        got = {r["content"] for r in op(self._df(spark)).collect()}
        assert got == {"a", "b"}  # unanchored: 'app' inside 'app-1'

    def test_reverse_and_multi_condition_and(self, spark):
        op = build_operator({
            "Type": "ext_groupinfo_filter",
            "Tags": {"service": {"Pattern": "^db", "Reverse": True}},
            "Metas": {"env": {"Pattern": "prod"}},
        })
        got = {r["content"] for r in op(self._df(spark)).collect()}
        assert got == {"a"}  # prod AND not-db

    def test_missing_key_tests_empty_string(self, spark):
        # key absent from the frame -> Get() returns '', '^$' matches it
        op = build_operator({"Type": "ext_groupinfo_filter",
                             "Tags": {"nope": {"Pattern": "^$"}}})
        assert op(self._df(spark)).count() == 3
        op2 = build_operator({"Type": "ext_groupinfo_filter",
                              "Tags": {"nope": {"Pattern": "x"}}})
        assert op2(self._df(spark)).count() == 0

    def test_bad_pattern_fails_at_build(self, spark):
        import re, pytest
        with pytest.raises(re.error):
            build_operator({"Type": "ext_groupinfo_filter",
                            "Tags": {"service": {"Pattern": "("}}})


def test_metric_nginx_status_contract(spark):
    """The canonical stub_status body → the Go reader's exact field map
    (input_nginx.go:125-170) and _server_/_port_ tags incl. the https
    default port (:175-191)."""
    body = ("Active connections: 291 \n"
            "server accepts handled requests\n"
            " 16630948 16630948 31070465 \n"
            "Reading: 6 Writing: 179 Waiting: 106 \n")
    df = spark.createDataFrame(
        [("https://nginx.example.com/status", body),
         ("http://10.0.0.1:8080/nginx_status", body)],
        "url string, content string")
    op = build_operator({"Type": "metric_nginx_status"})
    rows = {r["_server_"]: r for r in op(df).collect()}
    r = rows["nginx.example.com"]
    assert (r["_port_"], r["active"], r["accepts"], r["handled"],
            r["requests"], r["reading"], r["writing"], r["waiting"]) == (
        "443", "291", "16630948", "16630948", "31070465", "6", "179", "106")
    assert rows["10.0.0.1"]["_port_"] == "8080"
