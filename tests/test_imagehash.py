"""Image dHash near-dup family — box filter exactness, band packing,
decode integration, pair blocking recall."""

from __future__ import annotations

import numpy as np


def test_box_resize_exact_on_aligned_and_fractional():
    from loongcollector_spark.functions.imagehash import box_resize

    # aligned: 4x6 -> 2x3 cells are plain block means
    img = np.arange(24, dtype=np.float64).reshape(4, 6)
    cells = box_resize(img, 2, 3)
    for r in range(2):
        for c in range(3):
            assert cells[r, c] == img[2 * r:2 * r + 2,
                                      2 * c:2 * c + 2].mean()
    # fractional: 3 -> 2 along one axis; cell 0 covers rows [0, 1.5)
    img2 = np.array([[0.0], [12.0], [24.0]])
    cells2 = box_resize(img2, 2, 1)
    assert cells2[0, 0] == (0 * 1.0 + 12 * 0.5) / 1.5
    assert cells2[1, 0] == (12 * 0.5 + 24 * 1.0) / 1.5
    # mean is preserved overall
    assert abs(cells2.mean() - img2.mean()) < 1e-12


def test_dhash_bands_bit_layout():
    from loongcollector_spark.functions.imagehash import dhash_bands

    # cells grid aligned: 64x72 image of uniform 8x8 blocks
    vals = np.arange(72, dtype=np.float64).reshape(8, 9)  # increasing
    img = np.kron(vals, np.ones((8, 8)))
    b = dhash_bands(img)
    # every adjacent comparison is < : all 64 bits set
    assert b == (0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF)
    # decreasing: no bits
    img2 = np.kron(vals[:, ::-1].copy(), np.ones((8, 8)))
    assert dhash_bands(img2) == (0, 0, 0, 0)
    # single bit: make cell (r=2, c=3) < (r=2, c=4) only
    flat = np.full((8, 9), 50.0)
    flat[2, 4] = 60.0  # bit r*8+c = 2*8+3 = 19 -> band 1, j = 0*8+3...
    # r=2 -> band 1 (rows 2,3), j = (2%2)*8 + 3 = 3
    bands = dhash_bands(np.kron(flat, np.ones((8, 8))))
    assert bands == (0, 1 << 3, 0, 0) or bands[1] & (1 << 3)
    # the c=4 bump also makes (2,4) > (2,5): bit only where < holds
    assert bands[1] == 1 << 3


def test_dhash_over_real_jpeg_decode():
    """The engine path: q50 uniform-block JPEG (exact round trip) ->
    decode -> dHash equals the closed-form hash of the block values."""
    from loongcollector_spark.functions.imagehash import dhash_bands
    from loongcollector_spark.functions.jpegcodec import (
        encode_jpeg, try_decode_jpeg,
    )

    rng = np.random.default_rng(3)
    vals = (128 + 2 * rng.integers(0, 57, (8, 9))).astype(np.float64)
    img = np.kron(vals, np.ones((8, 8))).astype(np.uint8)
    blob = encode_jpeg(img, quality=50)
    decoded = try_decode_jpeg(blob)
    assert (decoded == img).all()  # the exactness precondition
    got = dhash_bands(decoded)
    bits = vals[:, :-1] < vals[:, 1:]
    rows = (bits.astype(np.int64) << np.arange(8)[None, :]).sum(axis=1)
    want = tuple(int(rows[2 * b] + (rows[2 * b + 1] << 8))
                 for b in range(4))
    assert got == want


def test_image_near_pairs_blocking_recall(spark):
    """Blocked pair join finds exactly the pairs within the radius —
    verified against a brute-force python model over the signature
    set, including a pair at hamming 3 and one beyond at 4."""
    from loongcollector_spark.functions.imagehash import (
        dhash_bands, image_dhash, image_near_pairs,
    )
    from loongcollector_spark.functions.jpegcodec import encode_jpeg

    rng = np.random.default_rng(5)
    base = 128 + 2 * rng.integers(0, 57, (8, 9)).astype(np.int64)
    imgs = {}
    for i in range(8):
        v = base.copy()
        # flip a growing number of comparisons by bumping cells
        for k in range(i):
            v[k % 8, (k * 3) % 9] += 40
        imgs[i] = np.kron(v.astype(np.float64),
                          np.ones((8, 8))).astype(np.uint8)
    rows = [(i, bytearray(encode_jpeg(im, quality=50)))
            for i, im in imgs.items()]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    sig = image_dhash(df)
    got = {(r["media_a"], r["media_b"]): r["hamming"]
           for r in image_near_pairs(sig, max_hamming=3).collect()}

    hashes = {i: dhash_bands(im) for i, im in imgs.items()}
    want = {}
    for a in range(8):
        for b in range(a + 1, 8):
            d = sum(bin(x ^ y).count("1")
                    for x, y in zip(hashes[a], hashes[b]))
            if d <= 3:
                want[(a, b)] = d
    assert got == want and len(want) > 0

    # undecodable payload: ok=false, excluded from pairs, no task kill
    bad = spark.createDataFrame(
        [(99, bytearray(b"\xff\xd8garbage"))], "media_id long, payload binary")
    s2 = image_dhash(bad).collect()[0]
    assert s2["ok"] is False


def test_video_near_dups_by_shared_frames(spark):
    """A head-trimmed copy shares its frames' fingerprints with the
    original (>= min_shared), an unrelated video shares none, a garbage
    container emits one ok=false marker and no pairs."""
    from loongcollector_spark.functions.imagehash import (
        video_frame_dhash, video_near_dups,
    )
    from loongcollector_spark.functions.jpegcodec import encode_jpeg
    from loongcollector_spark.functions.multimodal import encode_avi_mjpeg

    rng = np.random.default_rng(11)

    def frame(seed):
        v = 128 + 2 * rng.integers(0, 57, (8, 9)).astype(np.float64)
        return encode_jpeg(
            np.kron(v, np.ones((8, 8))).astype(np.uint8), quality=50)

    f1, f2, f3, f4 = frame(1), frame(2), frame(3), frame(4)
    rows = [
        (0, bytearray(encode_avi_mjpeg(72, 64, [f1, f2, f3]))),
        (1, bytearray(encode_avi_mjpeg(72, 64, [f2, f3]))),   # trimmed
        (2, bytearray(encode_avi_mjpeg(72, 64, [f4]))),       # unrelated
        (3, bytearray(b"RIFFgarbage")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    frames = video_frame_dhash(df)
    got = frames.collect()
    assert {r["media_id"] for r in got if not r["ok"]} == {3}
    assert len([r for r in got if r["ok"]]) == 6  # 3 + 2 + 1 frames
    pairs = {(r["media_a"], r["media_b"]): r["n_shared"]
             for r in video_near_dups(frames, min_shared=2).collect()}
    assert pairs == {(0, 1): 2}


def test_video_container_dedup_covers_avc1(spark):
    """Container-fingerprint dedup reaches inter-frame codecs the frame
    decoder can't: identical avc1 sample bytes collide across a
    trimmed re-mux, AVI containers fingerprint through the same path,
    a still-loop (repeated sample) collapses before the pair join, and
    garbage emits one ok=false marker."""
    import hashlib

    from loongcollector_spark.functions.imagehash import (
        video_container_dedup, video_container_fingerprints,
    )
    from loongcollector_spark.functions.multimodal import encode_mp4_video

    s1, s2, s3, s4 = (f"sample-{i}".encode() * 10 for i in range(4))
    rows = [
        (0, bytearray(encode_mp4_video(64, 48, [s1, s2, s3],
                                       codec="avc1"))),
        (1, bytearray(encode_mp4_video(64, 48, [s2, s3], codec="avc1"))),
        # still loop: s4 three times — must count once per video
        (2, bytearray(encode_mp4_video(64, 48, [s4, s4, s4],
                                       codec="avc1"))),
        (3, bytearray(encode_mp4_video(64, 48, [s4], codec="hvc1"))),
        (4, bytearray(b"\x00\x00\x00\x08ftypnope")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = video_container_fingerprints(df)
    got = fps.collect()
    assert {r["media_id"] for r in got if not r["ok"]} == {4}
    by_vid = {}
    for r in got:
        if r["ok"]:
            by_vid.setdefault(r["media_id"], []).append(r)
    assert {v: len(rs) for v, rs in by_vid.items()} == {0: 3, 1: 2,
                                                       2: 3, 3: 1}
    assert by_vid[0][0]["codec"] == "avc1"
    assert by_vid[3][0]["codec"] == "hvc1"
    assert by_vid[0][1]["fp"] == hashlib.md5(s2).hexdigest()
    pairs = {(r["media_a"], r["media_b"]): r["n_shared"]
             for r in video_container_dedup(fps, min_shared=1).collect()}
    # (0,1) share s2+s3; (2,3) share the collapsed s4 ONCE
    assert pairs == {(0, 1): 2, (2, 3): 1}
    strict = {(r["media_a"], r["media_b"])
              for r in video_container_dedup(fps, min_shared=2).collect()}
    assert strict == {(0, 1)}


def test_audio_energy_hash_short_and_garbage(spark):
    """Energy fingerprint: frame-aligned constant amplitudes hash to
    the closed-form bits; clips shorter than 65 frames zero the missing
    bits; non-WAV payloads emit ok=false."""
    import numpy as np

    from loongcollector_spark.functions.imagehash import (
        audio_energy_bands, audio_energy_hash,
    )
    from loongcollector_spark.functions.multimodal import encode_wav_pcm16

    amp = np.array([(7 * f * f + 3) % 101 for f in range(65)]) * 50
    samples = np.repeat(amp, 1024).astype(np.int16)
    want = audio_energy_bands(samples)
    bits = [1 if amp[i] < amp[i + 1] else 0 for i in range(64)]
    manual = tuple(sum(bits[16 * b + j] << j for j in range(16))
                   for b in range(4))
    assert want == manual

    short = np.repeat(amp[:3], 1024).astype(np.int16)  # 3 frames: 2 bits
    sb = audio_energy_bands(short)
    assert sb[1] == sb[2] == sb[3] == 0 and sb[0] < 4

    rows = [(0, bytearray(encode_wav_pcm16(16000, samples))),
            (1, bytearray(encode_wav_pcm16(16000, short))),
            (2, bytearray(b"RIFFnope"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_energy_hash(df).collect()}
    assert (got[0]["dh0"], got[0]["dh1"], got[0]["dh2"],
            got[0]["dh3"]) == want
    assert got[0]["ok"] and got[1]["ok"] and not got[2]["ok"]


def test_incremental_media_admission_statuses(spark):
    """All three admission statuses with controlled signatures: an
    index hit (within hamming 3), a batch-internal dup (min-id winner
    stays 'new' when it matches nothing indexed), and a novel image."""
    from loongcollector_spark.functions.imagehash import (
        incremental_media_admission,
    )

    sig_schema = "media_id long, dh0 int, dh1 int, dh2 int, dh3 int, ok boolean"
    index = spark.createDataFrame(
        [(0, 0x1111, 0x2222, 0x3333, 0x4444, True)],
        sig_schema.replace(", ok boolean", "") + ", ok boolean")
    batch = spark.createDataFrame([
        # hamming 1 from the indexed signature -> dup_index
        (10, 0x1110, 0x2222, 0x3333, 0x4444, True),
        # novel pair, hamming 1 apart: 11 is 'new', 12 is 'dup_batch'
        (11, 0x00FF, 0x7700, 0x0001, 0x0000, True),
        (12, 0x00FF, 0x7700, 0x0003, 0x0000, True),
        # novel and alone
        (13, 0x5A5A, 0x0F0F, 0x55AA, 0x1234, True),
        # undecodable upstream: excluded entirely
        (14, 0, 0, 0, 0, False),
    ], sig_schema)
    got = {r["media_id"]: r["status"]
           for r in incremental_media_admission(batch, index).collect()}
    assert got == {10: "dup_index", 11: "new", 12: "dup_batch",
                   13: "new"}
