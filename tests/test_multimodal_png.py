"""PNG synth/decode round trip + MaxSim scoring semantics."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.multimodal import (
    PNG_SIGNATURE,
    decode_png_meta,
    synth_png_payload,
)
from mongo_iceberg_lakehouse_spark.operators.similarity import (
    maxsim_multivector,
)


def test_png_bytes_are_spec_valid(spark):
    df = spark.createDataFrame(
        [(0, "alpha"), (1023, "beta"), (1024, "gamma")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: bytes(r["payload"]) for r in synth_png_payload(df).collect()}
    for doc_id, b in rows.items():
        assert b[:8] == PNG_SIGNATURE
        assert b[12:16] == b"IHDR"
        w, h = struct.unpack(">II", b[16:24])
        assert w == 16 + doc_id % 1024
        assert h == 16 + (doc_id * 7) % 768
        assert b[24] == 8 and b[25] == 2
    # body carries the text payload after the 33-byte header
    # (8 sig + 4 len + 4 tag + 13 IHDR fields + 4 crc)
    assert rows[0][33:] == b"alpha"


def test_png_decode_round_trip_and_invalid(spark):
    df = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    out = decode_png_meta(synth_png_payload(df)).collect()[0]
    assert (out["width"], out["height"]) == (16 + 7, 16 + 49)
    assert out["is_png"] is True

    bad = spark.createDataFrame(
        [(1, bytearray(b"not a png at all, definitely"))],
        "doc_id long, payload binary",
    )
    r = decode_png_meta(bad).collect()[0]
    assert r["is_png"] is False and r["width"] is None


def test_maxsim_prefers_group_with_matching_vectors(spark):
    # group 1 contains exact matches for both query vectors; group 2 holds
    # orthogonal vectors -> score(group 1) == 2.0, score(group 2) == 0.0
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.0, 0.0, 1.0]),
        ],
        "label int, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "qid int, embedding array<float>",
    )
    got = {
        r["label"]: (r["maxsim_score"], r["n_query_vecs"])
        for r in maxsim_multivector(corpus, queries).collect()
    }
    assert abs(got[1][0] - 2.0) < 1e-12 and got[1][1] == 2
    assert abs(got[2][0] - 0.0) < 1e-12


def test_wav_round_trip(spark):
    import struct as _struct

    from mongo_iceberg_lakehouse_spark.operators.multimodal import (
        decode_wav_meta,
        synth_wav_payload,
    )

    df = spark.createDataFrame(
        [(3, "pcm body bytes"), (4, "x")], "doc_id long, text string"
    )
    raw = {r["doc_id"]: bytes(r["payload"]) for r in synth_wav_payload(df).collect()}
    b = raw[3]
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    # RIFF chunk size = 36 + data bytes, little-endian
    assert _struct.unpack("<I", b[4:8])[0] == 36 + len("pcm body bytes")
    assert b[44:] == b"pcm body bytes"

    out = {r["doc_id"]: r for r in decode_wav_meta(synth_wav_payload(df)).collect()}
    assert out[3]["sample_rate"] == 8000 + (3 % 8) * 4000
    assert out[3]["channels"] == 1 + 3 % 2
    assert out[4]["channels"] == 1 and out[4]["n_data_bytes"] == 1
    assert out[3]["bits_per_sample"] == 16 and out[3]["is_wav"] is True


def test_transform_with_state_probe_is_honest():
    from mongo_iceberg_lakehouse_spark.streaming.stateful import (
        transform_with_state_available,
    )

    avail = transform_with_state_available()
    try:
        from google.protobuf import descriptor  # noqa: F401

        assert avail is True
    except ImportError:
        assert avail is False


# ---------------------------------------------------------------------------
# Full-codec round trips (round 4: the codec stub is retired)
# ---------------------------------------------------------------------------

def test_png_full_codec_round_trip_all_filters():
    import numpy as np

    from mongo_iceberg_lakehouse_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    rng = np.random.default_rng(11)
    for h, w, ch in [(1, 1, 1), (5, 7, 1), (11, 16, 3), (8, 4, 3)]:
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        for f in [None, [0] * h, [1] * h, [2] * h, [3] * h, [4] * h]:
            b = png_encode(px, f)
            w2, h2, ch2, out = png_decode(b)
            assert (w2, h2, ch2) == (w, h, ch)
            assert (out == px).all()


def test_png_decode_rejects_corruption():
    import struct as _s

    import numpy as np
    import pytest

    from mongo_iceberg_lakehouse_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    b = bytearray(png_encode(np.zeros((2, 2, 3), dtype=np.uint8)))
    b[20] ^= 0xFF  # flip a byte inside IHDR -> CRC check must fire
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(b))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png at all")
    # interlaced / 16-bit variants are declared unsupported, not mis-parsed
    good = bytearray(png_encode(np.zeros((2, 2, 3), dtype=np.uint8)))
    ihdr = bytearray(good[16:29])
    ihdr[8] = 16  # bit depth
    crc = _s.pack(">I", __import__("zlib").crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported"):
        png_decode(bytes(good[:16]) + bytes(ihdr) + crc + bytes(good[33:]))


def test_wav_full_codec_round_trip_and_alignment():
    import struct as _s

    import numpy as np
    import pytest

    from mongo_iceberg_lakehouse_spark.operators.multimodal import wav_decode

    samples = np.array([[1, -2], [32767, -32768], [0, 5]], dtype="<i2")
    data = samples.tobytes()
    # include an extra LIST chunk before data: the walk must skip it
    extra = b"LIST" + _s.pack("<I", 3) + b"abc" + b"\x00"  # odd len -> pad
    hdr = (
        b"RIFF" + _s.pack("<I", 36 + len(extra) + len(data)) + b"WAVE"
        + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + extra
        + b"data" + _s.pack("<I", len(data))
    )
    rate, nch, bits, out = wav_decode(hdr + data)
    assert (rate, nch, bits) == (16000, 2, 16)
    assert (out == samples).all()
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxNOPE")


def test_png_pixels_spark_round_trip(spark):
    from mongo_iceberg_lakehouse_spark.operators.multimodal import (
        decode_png_pixels,
        synth_png_image,
    )

    df = spark.createDataFrame([(0,), (7,), (12345,)], "doc_id long")
    rows = {r["doc_id"]: r for r in decode_png_pixels(synth_png_image(df)).collect()}
    for i, r in rows.items():
        w, h = 4 + i % 13, 4 + (i * 7) % 11
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["is_png"]
        exp = sum(
            (i * 31 + rr * 7 + cc * 3) % 256
            for rr in range(h) for cc in range(w)
        )
        assert r["sum_r"] == exp


def test_resize_nearest_and_round_trip():
    import numpy as np

    from mongo_iceberg_lakehouse_spark.operators.multimodal import (
        png_decode,
        png_encode,
        resize_nearest,
    )

    px = np.arange(7 * 9 * 3, dtype=np.uint8).reshape(7, 9, 3)
    small = resize_nearest(px, 2)
    assert small.shape == (4, 5, 3)
    assert (small == px[::2, ::2, :]).all()
    w, h, ch, out = png_decode(png_encode(small))
    assert (out == small).all()


def test_wav_window_features_spark(spark):
    from mongo_iceberg_lakehouse_spark.operators.multimodal import (
        synth_wav_audio,
        wav_window_features,
    )

    df = spark.createDataFrame([(5,)], "doc_id long")
    rows = sorted(
        wav_window_features(synth_wav_audio(df), win=16).collect(),
        key=lambda r: r["win_no"],
    )
    i = 5
    n, nch = 32 + i % 97, 1 + i % 2  # 37 frames, 2 channels
    assert [r["n_in_win"] for r in rows] == [16, 16, 5]
    samples = [
        (i * 13 + fr * 7 + ch * 5) % 65536 - 32768
        for fr in range(n) for ch in range(nch)
    ]
    byfr = [samples[f * nch:(f + 1) * nch] for f in range(n)]
    for r in rows:
        blk = [s for f in byfr[r["win_no"] * 16:(r["win_no"] + 1) * 16] for s in f]
        assert r["sum_win"] == sum(blk)
        assert r["sumsq_win"] == sum(s * s for s in blk)
