"""Baseline JPEG codec (functions/jpegcodec.py): known-answer exactness,
round-trip error bounds, restart markers, hostile payloads, and the
Spark decode path."""

import numpy as np
import pytest

from loongcollector_spark.functions.jpegcodec import (
    encode_jpeg, try_decode_jpeg,
)


def test_uniform_gray_is_bit_exact_at_q50():
    # DC quant step at quality 50 is 16, so v = 128 + 2k reconstructs
    # exactly: 8*(v-128) = 16k quantizes losslessly, AC is all zero.
    for v in (16, 72, 128, 130, 200, 240):
        img = np.full((24, 32), v, np.uint8)
        dec = try_decode_jpeg(encode_jpeg(img, quality=50))
        assert dec is not None and dec.shape == (24, 32)
        assert (dec == v).all(), (v, int(dec.min()), int(dec.max()))


def test_block_uniform_mosaic_is_bit_exact_at_q50():
    # the media_decode_jpeg fixture shape: every 8x8 block uniform
    d = 17
    bw_, bh_ = d % 6 + 2, d % 4 + 2
    vals = 128 + 2 * ((d * 5 + np.arange(bh_ * bw_)) % 113 - 56)
    img = np.kron(vals.reshape(bh_, bw_), np.ones((8, 8), np.int64)).astype(np.uint8)
    dec = try_decode_jpeg(encode_jpeg(img, quality=50))
    assert (dec == img).all()


def test_noise_roundtrip_error_shrinks_with_quality():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (48, 56)).astype(np.uint8)
    errs = {}
    for q in (50, 75, 95):
        dec = try_decode_jpeg(encode_jpeg(img, quality=q))
        errs[q] = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert errs[95] < errs[75] < errs[50]
    assert errs[95] < 3.0


def test_rgb_444_and_420_roundtrip():
    rgb = np.stack(
        [((np.arange(24)[:, None] + np.arange(32)[None, :] * k) % 256)
         for k in (1, 2, 3)], axis=-1).astype(np.uint8)
    d444 = try_decode_jpeg(encode_jpeg(rgb, quality=90))
    d420 = try_decode_jpeg(encode_jpeg(rgb, quality=90, subsample=True))
    assert d444.shape == d420.shape == (24, 32, 3)
    assert np.abs(d444.astype(int) - rgb.astype(int)).max() <= 4
    # chroma subsampling loses more but smooth gradients stay close
    assert np.abs(d420.astype(int) - rgb.astype(int)).mean() < 4.0


def test_non_multiple_of_8_dimensions():
    img = ((np.arange(19)[:, None] * 5 + np.arange(21)[None, :]) % 256
           ).astype(np.uint8)
    dec = try_decode_jpeg(encode_jpeg(img, quality=85))
    assert dec.shape == (19, 21)
    rgb = np.stack([img, img, img], -1)
    dec = try_decode_jpeg(encode_jpeg(rgb, quality=85, subsample=True))
    assert dec.shape == (19, 21, 3)


def test_restart_markers_decode_identically():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 48)).astype(np.uint8)
    plain = try_decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 2, 5, 7):
        dec = try_decode_jpeg(encode_jpeg(img, quality=90,
                                          restart_interval=ri))
        assert (dec == plain).all(), ri


@pytest.mark.parametrize("payload", [
    None, b"", b"not a jpeg", b"\xff\xd8\xff\xd9",
    b"\xff\xd8" + b"\x00" * 50,
])
def test_hostile_payloads_return_none(payload):
    assert try_decode_jpeg(payload) is None


def test_truncated_stream_returns_none():
    full = encode_jpeg(np.full((16, 16), 99, np.uint8), 75)
    for cut in (10, len(full) // 2, len(full) - 3):
        assert try_decode_jpeg(full[:cut]) is None


def test_progressive_sof_rejected():
    full = bytearray(encode_jpeg(np.full((8, 8), 130, np.uint8), 75))
    sof = full.find(b"\xff\xc0")
    full[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    assert try_decode_jpeg(bytes(full)) is None


def test_corrupted_entropy_degrades_to_none_not_crash():
    full = bytearray(encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8), 75))
    # stomp bytes in the entropy segment (after SOS header)
    sos = full.find(b"\xff\xda")
    for off in range(sos + 14, min(sos + 20, len(full) - 2)):
        mutated = bytearray(full)
        mutated[off] ^= 0xFF
        try_decode_jpeg(bytes(mutated))  # must not raise


def test_single_component_scan_is_noninterleaved():
    """T.81 A.2.3: a single-component scan is NON-interleaved — blocks
    walk the 8x8 raster grid regardless of the declared sampling
    factors. A grayscale file whose SOF says 2x2 (legal; factors are
    relative and the sole component is still full resolution) must
    decode identically to the 1x1 encoding of the same stream."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    blob = bytearray(encode_jpeg(img, quality=75))
    i = blob.find(b"\xff\xc0")
    assert i >= 0
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) Nf(1) [id(1) HV(1) Tq(1)]
    assert blob[i + 11] == 0x11
    blob[i + 11] = 0x22
    ref = try_decode_jpeg(encode_jpeg(img, quality=75))
    dec = try_decode_jpeg(bytes(blob))
    assert dec is not None and dec.shape == ref.shape
    assert (dec == ref).all()


def test_multiscan_sequential_rejected_not_garbled():
    """A color SOS carrying fewer components than the SOF declares is a
    multi-scan sequential file; only the first scan would be read, so
    the decoder must refuse (None), never return a garbled image."""
    rgb = np.zeros((16, 16, 3), np.uint8)
    blob = bytearray(encode_jpeg(rgb, quality=75))
    i = blob.find(b"\xff\xda")
    assert i >= 0
    # SOS: marker(2) len(2) Ns(1) [Cs(1) Td/Ta(1)]*Ns ...; shrink Ns to 1
    # and splice out the other two component entries
    assert blob[i + 4] == 3
    patched = (blob[:i + 2] + (8).to_bytes(2, "big") + bytes([1])
               + blob[i + 5:i + 7] + blob[i + 11:])
    assert try_decode_jpeg(bytes(patched)) is None


def test_spark_image_path_decodes_jpeg(spark):
    from loongcollector_spark.functions.multimodal import (
        extract_features, image_resize, synthetic_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    media = synthetic_media(docs, "jpeg")
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert all(feats[i]["ok"] for i in range(12))
    for i in range(12):
        bw_, bh_ = i % 6 + 2, i % 4 + 2
        vals = 128 + 2 * ((i * 5 + np.arange(bh_ * bw_)) % 113 - 56)
        assert feats[i]["feat_mean"] == pytest.approx(vals.mean(), abs=1e-9)
        assert feats[i]["feat_dim"] == 64 * bw_ * bh_
    # resize re-encodes as JPEG and the thumbnail still decodes
    small = image_resize(media, 8, 8).collect()
    assert all(r["ok"] for r in small)
    assert all(bytes(r["payload"])[:2] == b"\xff\xd8" for r in small)


def test_avi_mjpeg_roundtrip_and_frame_sampling(spark):
    """MJPEG AVI: RIFF walk finds every 00dc chunk, each frame JPEG
    reconstructs bit-exact (q50 uniform blocks), video_frame_features
    samples through the AVI path."""
    import numpy as np

    from loongcollector_spark.functions.jpegcodec import encode_jpeg
    from loongcollector_spark.functions.multimodal import (
        decode_avi_frame, encode_avi_mjpeg, synthetic_media, try_parse_avi,
        video_frame_features,
    )

    d = 11
    bw_, bh_ = d % 6 + 2, d % 4 + 2
    w, h = 8 * bw_, 8 * bh_
    frames, imgs = [], []
    for f in range(4):
        vals = 128 + 2 * ((d * 5 + f * 7 + np.arange(bh_ * bw_)) % 113 - 56)
        img = np.kron(vals.reshape(bh_, bw_),
                      np.ones((8, 8), np.int64)).astype(np.uint8)
        imgs.append(img)
        frames.append(encode_jpeg(img, quality=50))
    avi = encode_avi_mjpeg(w, h, frames)
    assert try_parse_avi(avi)[:3] == (w, h, 4)
    for f in range(4):
        assert (decode_avi_frame(avi, f) == imgs[f]).all()
    assert try_parse_avi(b"RIFFxxxxWAVE") is None
    assert try_parse_avi(avi[:30]) is None  # truncated header

    docs = spark.createDataFrame([(3, "x"), (9, "y")], "doc_id long, text string")
    media = synthetic_media(docs, "avi")
    rows = video_frame_features(media, every_n=2).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    for doc_id in (3, 9):
        nf = doc_id % 5 + 2
        got = sorted(r["frame_idx"] for r in by[doc_id])
        assert got == list(range(0, nf, 2))
        for r in by[doc_id]:
            blocks = (doc_id % 6 + 2) * (doc_id % 4 + 2)
            want = np.mean(
                128 + 2 * ((doc_id * 5 + r["frame_idx"] * 7
                            + np.arange(blocks)) % 113 - 56))
            assert abs(r["y_mean"] - want) < 1e-9
            assert r["ok"]


def test_mp4_container_walk_and_codec_gate(spark):
    """ISO BMFF sample-table walk: JPEG-codec samples decode bit-exact;
    an avc1 track parses (REAL frame indexing) but decode returns None
    and the frame sampler marks rows not-ok instead of crashing."""
    import numpy as np

    from loongcollector_spark.functions.jpegcodec import encode_jpeg
    from loongcollector_spark.functions.multimodal import (
        decode_mp4_frame, encode_mp4_mjpeg, synthetic_media, try_parse_mp4,
        video_frame_features,
    )

    d = 5
    bw_, bh_ = d % 6 + 2, d % 4 + 2
    w, h = 8 * bw_, 8 * bh_
    frames, imgs = [], []
    for f in range(3):
        vals = 128 + 2 * ((d * 5 + f * 11 + np.arange(bh_ * bw_)) % 113 - 56)
        img = np.kron(vals.reshape(bh_, bw_),
                      np.ones((8, 8), np.int64)).astype(np.uint8)
        imgs.append(img)
        frames.append(encode_jpeg(img, quality=50))
    mp4 = encode_mp4_mjpeg(w, h, frames)
    parsed = try_parse_mp4(mp4)
    assert parsed[:3] == (w, h, 3) and parsed[4] == "jpeg"
    for f in range(3):
        assert (decode_mp4_frame(mp4, f, parsed) == imgs[f]).all()

    # same container, codec fourcc swapped to avc1: the walk still
    # indexes every sample; only the decode is (honestly) stubbed
    avc = mp4.replace(b"jpeg", b"avc1", 1)
    p2 = try_parse_mp4(avc)
    assert p2 is not None and p2[2] == 3 and p2[4] == "avc1"
    assert decode_mp4_frame(avc, 0, p2) is None

    docs = spark.createDataFrame([(4, "x")], "doc_id long, text string")
    media = synthetic_media(docs, "mp4")
    rows = video_frame_features(media, every_n=2).collect()
    nf = 4 % 5 + 2
    assert sorted(r["frame_idx"] for r in rows) == list(range(0, nf, 2))
    assert all(r["ok"] for r in rows)


def test_container_walkers_never_raise_on_truncations():
    """Every prefix truncation and byte corruption of valid AVI/MP4
    containers must parse to None or a smaller frame set — never raise
    (a poisoned asset row must never kill a worker)."""
    import numpy as np

    from loongcollector_spark.functions.jpegcodec import encode_jpeg
    from loongcollector_spark.functions.multimodal import (
        decode_avi_frame, decode_mp4_frame, encode_avi_mjpeg,
        encode_mp4_mjpeg, try_parse_avi, try_parse_mp4,
    )

    img = np.full((16, 16), 128, np.uint8)
    jf = [encode_jpeg(img, quality=50)] * 2
    for blob, parse, decode in (
        (encode_avi_mjpeg(16, 16, jf), try_parse_avi, decode_avi_frame),
        (encode_mp4_mjpeg(16, 16, jf), try_parse_mp4, decode_mp4_frame),
    ):
        for cut in range(0, len(blob), 7):
            p = parse(blob[:cut])
            if p is not None:
                decode(blob[:cut], 0, p)  # may be None, must not raise
        # single-byte corruptions across the WHOLE container (the sample
        # tables live in moov, after mdat — counts/offsets there must
        # fail soft too)
        for i in range(0, len(blob), 3):
            mut = blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1:]
            p = parse(mut)
            if p is not None:
                decode(mut, 0, p)


def test_fast_decoder_matches_reference_bit_exactly():
    """The vectorized production decoder (LUT Huffman + batched IDCT)
    must be BYTE-IDENTICAL to the from-spec per-symbol reference decoder
    over the whole encoder matrix: gray/RGB, 4:4:4/4:2:0, quality sweep,
    restart intervals, odd (non-multiple-of-8/16) sizes, uniform-block
    fixtures AND full-entropy random images."""
    import numpy as np

    from loongcollector_spark.functions.jpegcodec import (
        encode_jpeg, try_decode_jpeg, try_decode_jpeg_ref,
    )

    rng = np.random.default_rng(7)
    cases = []
    for i in range(6):
        h = ((i % 6) + 2) * 16
        w = ((i % 4) + 2) * 16
        img = np.kron(((rng.integers(0, 113, (h // 8, w // 8)) * 2 + 16)
                       % 256).astype(np.uint8), np.ones((8, 8), np.uint8))
        cases.append(encode_jpeg(img, quality=50))
    for i in range(6):
        img = rng.integers(0, 256, (61 + i, 83 + i), dtype=np.uint8)
        cases.append(encode_jpeg(img, quality=30 + 10 * i))
    for i in range(4):
        img = rng.integers(0, 256, (50 + i, 70 + i, 3), dtype=np.uint8)
        cases.append(encode_jpeg(img, quality=60, subsample=(i % 2 == 0)))
    for ri in (1, 3, 7):
        g = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        cases.append(encode_jpeg(g, quality=70, restart_interval=ri))
        c = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        cases.append(encode_jpeg(c, quality=70, subsample=True,
                                 restart_interval=ri))
    for n, blob in enumerate(cases):
        fast = try_decode_jpeg(blob)
        ref = try_decode_jpeg_ref(blob)
        assert fast is not None and ref is not None, n
        assert fast.shape == ref.shape, n
        assert (fast == ref).all(), n

    # corrupted streams: both paths must fail soft (None or an array),
    # never raise — truncations AND byte corruption
    blob = cases[0]
    for cut in range(0, len(blob), 11):
        try_decode_jpeg(blob[:cut])
        try_decode_jpeg_ref(blob[:cut])
    for i in range(0, len(blob), 5):
        mut = blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1:]
        try_decode_jpeg(mut)
        try_decode_jpeg_ref(mut)


def test_avi_walk_survives_deep_list_nesting():
    """A crafted AVI of ~4000 nested LIST headers must not RecursionError
    (the walk is iterative with an explicit stack); a valid avih + frame
    buried at the bottom is still found."""
    import struct

    from loongcollector_spark.functions.multimodal import try_parse_avi

    depth = 4000
    avih = struct.pack("<8I", 0, 0, 0, 0, 0, 0, 0, 0) \
        + struct.pack("<II", 16, 16)
    inner = (b"avih" + struct.pack("<I", len(avih)) + avih
             + b"00dc" + struct.pack("<I", 4) + b"fake")
    body = inner
    for _ in range(depth):
        body = b"LIST" + struct.pack("<I", len(body) + 4) + b"nest" + body
    blob = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    parsed = try_parse_avi(blob)
    assert parsed is not None
    w, h, n, frames = parsed
    assert (w, h, n) == (16, 16, 1)

    # pure nested-LIST chain with nothing inside: parses to None, no raise
    empty = b""
    for _ in range(depth):
        empty = b"LIST" + struct.pack("<I", len(empty) + 4) + b"nest" + empty
    assert try_parse_avi(
        b"RIFF" + struct.pack("<I", len(empty) + 4) + b"AVI " + empty) is None
