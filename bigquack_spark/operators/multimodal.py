"""Multimodal column plumbing (SURVEY §2.9): images/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched pandas
functions over ``mapInPandas``.

The container ships no image/audio codecs, so the decode kernels are
deterministic fakes behind the same signatures a real implementation would
use (PIL/librosa would slot into ``_decode_image_real``-shaped functions and
raise NotImplementedError here).  The Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested.

Scale notes: binary payloads ride in their own column so column pruning
drops them unless a kernel asks; ``mapInPandas`` processes whole Arrow
batches (no per-row Python); repartition before decode spreads byte-heavy
rows across executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_meta", T.StringType(), True),  # JSON sidecar
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("phash", T.StringType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset_ms", T.LongType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, src_col: str, kind: str = "image") -> DataFrame:
    """Adapter: wrap any column's bytes as the canonical media record shape
    (the offline stand-in for ``spark.read.format('binaryFile')``)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(src_col).cast("string"), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.col(id_col))).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder.  A real build would call
    PIL.Image.open here; the container has no codecs, so dimensions derive
    from a stable digest of the bytes."""
    if payload is None:
        return (0, 0, "none")
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    fmt = ("jpeg", "png", "webp")[digest[2] % 3]
    return (width, height, fmt)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/feature-extract over Arrow batches via ``mapInPandas``.

    Batch shape: each pandas chunk is one Arrow batch of media records; the
    kernel is vectorized per batch.  Swap ``_fake_decode`` for a real codec
    to productionize — the plan shape does not change.

    Only the three columns the kernel reads cross the Python boundary
    (guide §4.1: Spark cannot see inside the function, so an opaque map
    would otherwise ship — and prevent pruning of — every input column;
    here that pruning folds the caller's ``media_meta`` to_json away
    entirely).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "width": decoded.map(lambda d: d[0]).astype("int32"),
                    "height": decoded.map(lambda d: d[1]).astype("int32"),
                    "format": decoded.map(lambda d: d[2]),
                    "phash": pdf["payload"].map(
                        lambda b: None if b is None else hashlib.sha256(b).hexdigest()[:16]
                    ),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: real implementation needs an image codec."""
    raise NotImplementedError(
        "image resize requires a codec library (PIL) not present in this "
        "container; plumbing shape is decode_media -> per-batch resize kernel"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits ``max_frames`` frame
    stubs per video at ``every_ms`` spacing.  A real build would demux the
    container format inside the kernel; the fan-out shape (one input row ->
    N frame rows, batch-at-a-time) is the part that matters for scale."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_offset_ms": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = 0 if payload is None else min(max_frames, 1 + len(payload) % max_frames)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_offset_ms"].append(i * every_ms)
                    out["frame_bytes"].append(None)  # real demuxer would fill
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload")  # only what the kernel reads (§4.1)
        .mapInPandas(kernel, FRAME_SCHEMA)
    )


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
    ]
)


def pseudo_embed(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic payload -> embedding kernel (Arrow-batched mapInPandas).

    A real build would run a vision/audio encoder here; the container ships
    none, so the embedding derives each dimension from one sha256 digest
    byte, centered to [-1, 1].  Same contract as the real thing: bytes in,
    fixed-dim float vector out, whole Arrow batches at a time — and because
    the derivation is a pure digest function, the kernel is oracle-diffable
    (DuckDB recomputes the identical vector from sha256 hex of the same
    utf-8 bytes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                if payload is None:
                    embs.append(None)
                    continue
                d = hashlib.sha256(bytes(payload)).digest()
                embs.append([(d[i] - 127.5) / 127.5 for i in range(dim)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=EMBED_SCHEMA
    )


AUDIO_CHUNK_BYTES = 400  # stand-in for a fixed-duration PCM window


def segment_audio(df: DataFrame, chunk_bytes: int = AUDIO_CHUNK_BYTES) -> DataFrame:
    """Audio segmentation plumbing: split each media payload into
    fixed-size windows (≅ fixed-duration PCM chunks) and emit one row per
    window with an exact integer ENERGY (sum of squared byte values) —
    the deterministic stand-in for RMS loudness that makes the whole
    Arrow-batched kernel oracle-diffable, the q60 trick applied to the
    audio axis (decode_media covers images, sample_frames covers video).
    A real build swaps the byte math for a PCM decode + true RMS; the
    Spark-side shape — mapInPandas fan-out of one media row to N window
    rows, exact integer metrics, bounded per-row output — is the part
    that carries to 100 TB."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("chunk_idx", T.IntegerType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("energy", T.LongType(), False),
        ]
    )

    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {"media_id": [], "chunk_idx": [], "n_bytes": [], "energy": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                buf = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                if len(buf) == 0:
                    continue  # zero chunks for empty media — matches the oracle's ceil(len/chunk) semantics
                for i in range(0, len(buf), chunk_bytes):
                    chunk = buf[i : i + chunk_bytes]
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(i // chunk_bytes)
                    out["n_bytes"].append(int(len(chunk)))
                    out["energy"].append(int((chunk * chunk).sum()))
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(kernel, out_schema)


def scene_cuts(df: DataFrame, chunk_bytes: int = AUDIO_CHUNK_BYTES) -> DataFrame:
    """Video-axis scene segmentation stand-in: fixed-size frame windows via
    the ``segment_audio`` kernel (exact integer energy per window — the
    deterministic fake for a frame-difference metric), then a cut wherever
    the energy jumps by more than half the previous frame's energy
    (``2*|Δ| > e_prev``, exact BIGINT math), and a running scene index as
    the cumulative cut count.  A real build swaps the byte-energy kernel
    for a decoded frame-difference (histogram/SSIM delta) — the windowing,
    lag, and scene-numbering plan is unchanged.  Scale: the kernel is
    Arrow-batched per partition; the lag/cumsum windows partition by
    media_id (bounded frames per video), never global."""
    from pyspark.sql.window import Window

    frames = segment_audio(df, chunk_bytes)
    w = Window.partitionBy("media_id").orderBy("chunk_idx")
    prev = F.lag("energy").over(w)
    delta = F.when(prev.isNull(), F.lit(0)).otherwise(F.col("energy") - prev)
    is_cut = F.when(prev.isNull(), F.lit(False)).otherwise(
        2 * F.abs(F.col("energy") - prev) > prev
    )
    cur = frames.select(
        "media_id", "chunk_idx", "n_bytes", "energy",
        delta.cast("long").alias("delta"),
        is_cut.alias("is_cut"),
    )
    scene = F.sum(F.col("is_cut").cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cur.withColumn("scene_id", scene.cast("long"))
