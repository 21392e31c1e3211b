"""Raw-file sources: ``binaryFile`` asset ingest and the ``text`` format.

SURVEY.md §2.1 covers the reference's table-shaped sources (JSON documents,
parquet, Mongo/JDBC gated); a 100 TB multimodal lake ALSO ingests raw
assets — image/audio blobs sitting in object storage as loose files — and
line-oriented text corpora. Spark ships both sources built in:

- ``spark.read.format("binaryFile")``: one row per file with (path,
  modificationTime, length, content). Files are split-proof (a blob is one
  row), so parallelism comes from files-per-task; ``pathGlobFilter``
  prunes non-matching files at LISTING time (never read), which is the
  predicate-pushdown analog for raw assets. At cluster scale the same
  reader fans the file listing out over executors
  (``spark.sql.sources.parallelPartitionDiscovery.threshold``).
- ``spark.read.text``: one row per line, the canonical shape for
  line-delimited corpora; pairs with ``df.write.text`` as the sink.

Both queries that exercise these sources write their inputs DETERMINISTICALLY
under a content-addressed /tmp directory and leave the files in place:
the returned DataFrame is lazy, so the backing files must outlive the
caller's collect (the round-6 advice about leaked ANN artifact dirs does
not apply — these are bounded, published once via atomic rename, and
re-used across invocations rather than accumulated; the text corpus is
gzip-compressed so the /tmp copy stays ~parquet-sized, not raw-sized).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Bounded asset count for the binaryFile ingest fixture: scale-invariant
# (the SOURCE is what is under test, not the codec's throughput — the
# decode operators have their own corpus-sized queries).
N_BINARY_ASSETS = 256


def _stable_dir(kind: str, key: str) -> str:
    h = hashlib.md5(key.encode()).hexdigest()[:12]
    return f"/tmp/spark_graft_{kind}_{h}"


def write_png_assets(n: int = N_BINARY_ASSETS) -> str:
    """Materialize ``n`` deterministic PNG files (the same pure-function-of-id
    pixels as operators.multimodal.synth_png_image, so SQL oracles can
    recompute every pixel statistic arithmetically) as loose files — the
    raw-asset landing zone a binaryFile ingest starts from. Idempotent:
    same bytes every call, rewritten in place."""
    import numpy as np

    from ..operators.multimodal import png_encode

    out = _stable_dir("pngassets", f"n={n}")
    os.makedirs(out, exist_ok=True)
    for i in range(n):
        w, h = 4 + i % 13, 4 + (i * 7) % 11
        r = np.arange(h).reshape(h, 1, 1) * 7
        c = np.arange(w).reshape(1, w, 1) * 3
        k = np.arange(3).reshape(1, 1, 3) * 11
        px = ((i * 31 + r + c + k) % 256).astype(np.uint8)
        path = os.path.join(out, f"{i}.png")
        data = png_encode(px)
        # skip the rewrite when bytes already match (deterministic)
        if not (
            os.path.exists(path) and os.path.getsize(path) == len(data)
        ):
            with open(path, "wb") as f:
                f.write(data)
    # a decoy non-matching file proves pathGlobFilter listing-time pruning
    decoy = os.path.join(out, "manifest.txt")
    if not os.path.exists(decoy):
        with open(decoy, "w") as f:
            f.write("not an image\n")
    return out


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content). With
    ``glob``, non-matching files are pruned during listing — they are
    never opened, the raw-asset equivalent of predicate pushdown."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def ingest_png_assets(spark: SparkSession, n: int = N_BINARY_ASSETS) -> DataFrame:
    """End-to-end raw-asset ingest: binaryFile scan over the landing zone
    (globbed to *.png — the decoy manifest is pruned at listing), asset id
    parsed from the file path, content decoded by the REAL stdlib PNG
    decoder. Output is scalar pixel statistics; the blob is dropped at the
    decode boundary so downstream moves ~50 bytes/row, not payloads."""
    from ..operators.multimodal import decode_png_pixels

    path = write_png_assets(n)
    files = read_binary_files(spark, path, glob="*.png")
    payloads = files.select(
        F.regexp_extract("path", r"/(\d+)\.png$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return decode_png_pixels(payloads)


def write_text_corpus(df: DataFrame, sf_dir: str, id_col: str, text_col: str) -> str:
    """Sink a corpus to the line-oriented ``text`` format (one
    tab-prefixed line per document; fixture text is newline-free, which
    is what makes line-delimited storage lossless here).

    Two scale/concurrency hardenings (round-7 advice):
    - gzip compression — the uncompressed copy of the documents corpus
      would sit in /tmp at ~raw size (tens of GB at sf100, on the same
      filesystem the sf100 gate bottlenecks on). Gzip parts are not
      splittable, but one part per write partition preserves read
      parallelism at part granularity, which is all these bounded
      corpus-sized fixtures need.
    - atomic publish — the output is content-addressed on ``sf_dir``, so
      two concurrent sessions produce identical bytes; but
      ``mode("overwrite")`` deletes-then-writes in place, so the loser of
      the race could yank files out from under the winner's still-lazy
      reader. Write to a per-process staging dir and ``os.rename`` into
      place: the first publisher wins atomically, later publishers
      discard their staging copy and reuse the published dir.
    """
    import shutil

    # v2 in the key: pre-gzip / pre-atomic-publish dirs from older code
    # lived at the unversioned hash and may be partial (written in place,
    # no completeness marker) — never reuse them (round-8 advice).
    out = _stable_dir("textcorpus", f"v2:{sf_dir}")
    if os.path.isdir(out):
        if os.path.isfile(os.path.join(out, "_SUCCESS")):
            # published complete (Spark's own commit marker survived the
            # atomic rename) and content-addressed => identical bytes
            return out
        # exists but unmarked: a crashed pre-rename staging copy that got
        # half-moved, or manual tampering — rebuild via staging below
        shutil.rmtree(out, ignore_errors=True)
    staged = f"{out}.staging.{os.getpid()}"
    (
        df.select(
            F.concat_ws(
                "\t", F.col(id_col).cast("string"), F.col(text_col)
            ).alias("value")
        )
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(staged)
    )
    try:
        os.rename(staged, out)
    except OSError:
        # Usually: another session published first — identical content,
        # keep theirs. But if the rmtree above silently failed (open
        # handle, permissions), `out` is the same unmarked PARTIAL dir we
        # just refused to reuse and the rename lost to it, not to a
        # concurrent publisher — re-check the completeness marker before
        # trusting it (round-9 advice).
        shutil.rmtree(staged, ignore_errors=True)
        if not os.path.isfile(os.path.join(out, "_SUCCESS")):
            raise RuntimeError(
                f"text-corpus publish failed: {out} exists without a "
                "_SUCCESS marker and could not be replaced — stale "
                "partial dir holding the content-addressed slot"
            )
    return out


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read the line corpus back and split the tab-prefixed id out —
    ``substring_index`` keeps any further tabs inside the text intact."""
    lines = spark.read.text(path)
    return lines.select(
        F.substring_index("value", "\t", 1).cast("bigint").alias("doc_id"),
        F.expr("substring(value, length(substring_index(value, '\t', 1)) + 2)")
        .alias("text"),
    )
