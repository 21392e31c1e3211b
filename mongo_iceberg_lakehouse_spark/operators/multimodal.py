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


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling plumbing: emit (doc_id, frame_no) rows for
    every ``every_n``-th 'frame', where frame count is derived from payload
    size (stub: 1 frame per 100 bytes). Demonstrates the explode-shaped
    fan-out a real frame sampler produces, with payload dropped post-fanout."""
    n_frames = (F.col("meta.n_bytes") / F.lit(100)).cast("int")
    frames = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select(F.col("doc_id"), F.explode(frames).alias("frame_no"))
