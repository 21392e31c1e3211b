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
