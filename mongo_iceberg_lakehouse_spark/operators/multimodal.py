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


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling plumbing: emit (doc_id, frame_no) rows for
    every ``every_n``-th 'frame', where frame count is derived from payload
    size (stub: 1 frame per 100 bytes). Demonstrates the explode-shaped
    fan-out a real frame sampler produces, with payload dropped post-fanout."""
    n_frames = (F.col("meta.n_bytes") / F.lit(100)).cast("int")
    frames = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select(F.col("doc_id"), F.explode(frames).alias("frame_no"))
