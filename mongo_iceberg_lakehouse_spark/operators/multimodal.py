"""Multimodal columns: opaque binary payloads + typed metadata.

Charter extension (SURVEY.md §2.11): image/audio/video travel through the
lake as ``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas``. The image/audio codec libraries are not available in this
container, so the decode step is STUBBED (``NotImplementedError`` behind
``decode_payload``) with a deterministic fake used by tests — the Spark-side
plumbing (schema, batch iteration, partitioning) is real.

Scale notes: binary payloads dominate row size, so (1) feature extraction is
``mapInPandas`` — one Arrow batch in, one out, no shuffle; (2) select away the
payload column as early as possible after feature extraction so downstream
stages move only features; (3) partition count should target
~128 MB of payload per task (`spark.sql.files.maxPartitionBytes`).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, byte_sum bigint, "
    "head_hex string"
)


def attach_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    modality: str = "text",
) -> DataFrame:
    """Wrap a source column as an opaque binary payload + metadata struct —
    the canonical multimodal row shape (payload binary, meta struct)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(payload).alias("n_bytes"),
            F.md5(F.col(text_col)).alias("content_hash"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, modality: str) -> Any:
    """Decode a binary payload into a media object.

    STUB: real decoding needs PIL/ffmpeg/soundfile, which are not in this
    container. The Spark plumbing calls this only behind
    ``extract_features(..., use_codec=True)``.
    """
    raise NotImplementedError(
        f"no codec available for modality={modality!r} in this environment; "
        "install PIL/ffmpeg/soundfile and implement decode_payload"
    )


def _fake_features(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decoded-media features: byte length, byte
    sum (mod 2^31), first-4-bytes hex."""
    return len(payload), sum(payload) % (2**31), payload[:4].hex()


def extract_features(df: DataFrame, use_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over multimodal rows.

    Input rows must carry (doc_id, payload, meta). Output drops the payload
    (see module scale notes). With ``use_codec`` the stubbed real decoder is
    invoked (raises until codecs exist).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                modality = meta["modality"] if isinstance(meta, dict) else meta.modality
                if use_codec:
                    decode_payload(bytes(payload), str(modality))
                n_bytes, byte_sum, head_hex = _fake_features(bytes(payload))
                rows.append((int(doc_id), str(modality), n_bytes, byte_sum, head_hex))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "modality", "n_bytes", "byte_sum", "head_hex"],
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


PNG_SIGNATURE = bytes.fromhex("89504e470d0a1a0a")

PNG_META_SCHEMA = (
    "doc_id bigint, width int, height int, bit_depth int, color_type int, "
    "is_png boolean"
)


def synth_png_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic, spec-valid PNG header bytes per row (signature + IHDR),
    built entirely JVM-side: ints become big-endian 4-byte words via
    hex/lpad/unhex, body bytes come from the text column. Width/height are
    pure functions of the id so an SQL oracle can reconstruct them without
    parsing bytes. (CRC is zeroed: header parsers don't verify it.)"""

    def be4(c):
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    width = (F.lit(16) + F.pmod(F.col(id_col), F.lit(1024))).cast("long")
    height = (F.lit(16) + F.pmod(F.col(id_col) * 7, F.lit(768))).cast("long")
    payload = F.concat(
        F.lit(PNG_SIGNATURE),
        be4(F.lit(13)),                 # IHDR chunk length
        F.lit(b"IHDR"),
        be4(width),
        be4(height),
        F.lit(bytes([8, 2, 0, 0, 0])),  # bit depth 8, truecolor, no interlace
        F.lit(bytes(4)),                # CRC placeholder
        F.encode(F.col(text_col), "UTF-8"),
    )
    return df.select(F.col(id_col).alias("doc_id"), payload.alias("payload"))


def decode_png_meta(df: DataFrame) -> DataFrame:
    """REAL byte-level image-metadata decode (no codec library needed):
    Arrow-batched ``mapInPandas`` that validates the 8-byte PNG signature and
    parses width/height/bit-depth/color-type out of the IHDR chunk with
    ``struct.unpack`` — the exact plumbing a PIL-backed decoder would use
    (swap the parser body for ``Image.open`` when codecs exist; schema,
    batching, and payload-dropping stay identical)."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                ok = len(b) >= 26 and b[:8] == PNG_SIGNATURE and b[12:16] == b"IHDR"
                if ok:
                    w, h = struct.unpack(">II", b[16:24])
                    rows.append((int(doc_id), w, h, b[24], b[25], True))
                else:
                    rows.append((int(doc_id), None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "bit_depth", "color_type",
                    "is_png",
                ],
            )

    return df.mapInPandas(batches, schema=PNG_META_SCHEMA)


WAV_META_SCHEMA = (
    "doc_id bigint, sample_rate int, channels int, bits_per_sample int, "
    "n_data_bytes int, is_wav boolean"
)


def synth_wav_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic, spec-valid WAV (RIFF) header bytes per row, built
    JVM-side. Little-endian words are assembled by byte-swapping the hex
    string before unhex. Audio params are pure functions of the id so an
    SQL oracle can reconstruct them; the 'audio data' is the text bytes."""

    def le(c, nbytes):
        h = F.lpad(F.hex(c), 2 * nbytes, "0")
        swapped = F.concat(
            *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
        )
        return F.unhex(swapped)

    rate = (F.lit(8000) + F.pmod(F.col(id_col), F.lit(8)) * 4000).cast("long")
    channels = (F.lit(1) + F.pmod(F.col(id_col), F.lit(2))).cast("long")
    bits = F.lit(16).cast("long")
    data = F.encode(F.col(text_col), "UTF-8")
    data_len = F.length(data).cast("long")
    block_align = (channels * bits / 8).cast("long")
    byte_rate = (rate * block_align).cast("long")
    payload = F.concat(
        F.lit(b"RIFF"), le(data_len + 36, 4), F.lit(b"WAVE"),
        F.lit(b"fmt "), le(F.lit(16).cast("long"), 4),
        le(F.lit(1).cast("long"), 2),      # PCM
        le(channels, 2), le(rate, 4), le(byte_rate, 4),
        le(block_align, 2), le(bits, 2),
        F.lit(b"data"), le(data_len, 4),
        data,
    )
    return df.select(F.col(id_col).alias("doc_id"), payload.alias("payload"))


def decode_wav_meta(df: DataFrame) -> DataFrame:
    """REAL audio-metadata decode: parse the RIFF/WAVE fmt chunk with
    struct.unpack inside Arrow-batched mapInPandas — same plumbing a
    soundfile-backed decoder would use (swap the body when codecs exist)."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                ok = (
                    len(b) >= 44
                    and b[:4] == b"RIFF"
                    and b[8:12] == b"WAVE"
                    and b[12:16] == b"fmt "
                )
                if ok:
                    channels, rate = struct.unpack("<HI", b[22:28])
                    bits = struct.unpack("<H", b[34:36])[0]
                    ndata = struct.unpack("<I", b[40:44])[0]
                    rows.append((int(doc_id), rate, channels, bits, ndata, True))
                else:
                    rows.append((int(doc_id), None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "bits_per_sample",
                    "n_data_bytes", "is_wav",
                ],
            )

    return df.mapInPandas(batches, schema=WAV_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling plumbing: emit (doc_id, frame_no) rows for
    every ``every_n``-th 'frame', where frame count is derived from payload
    size (stub: 1 frame per 100 bytes). Demonstrates the explode-shaped
    fan-out a real frame sampler produces, with payload dropped post-fanout."""
    n_frames = (F.col("meta.n_bytes") / F.lit(100)).cast("int")
    frames = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    # outer + null-filter: avoid the inferred-filter re-evaluation of the
    # frame sequence; null metadata degrades to no frames, same as explode
    return df.select(
        F.col("doc_id"), F.explode_outer(frames).alias("frame_no")
    ).filter(F.col("frame_no").isNotNull())
