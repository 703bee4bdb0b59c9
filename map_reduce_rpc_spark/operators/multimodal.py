"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Design for 100 TB of media:

- Binary payloads ride in a ``binary`` column next to a typed
  ``meta`` struct. Filters/joins/pruning run on the cheap typed
  columns; the heavy bytes are only deserialized inside the Pandas UDF
  of the stage that needs them (column pruning keeps them out of every
  other stage's shuffle).
- Decode/resize/feature-extract run per Arrow batch, not per row;
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory.
- Real codecs (PIL/ffmpeg/librosa) are NOT in this container. The
  decode step is isolated behind :func:`decode_image` /
  :func:`decode_audio`: they try the real library and otherwise fall
  back to a *deterministic* synthetic decode (bytes -> pixel/sample
  arrays) so every downstream stage — batching, shapes, schemas,
  partitioning — is real and testable. Swapping in the real codec
  changes no plumbing.

The media table itself is synthesized deterministically from the
``documents`` table (sha256-based bytes), so a SQL oracle can
reproduce the catalog-level facts exactly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

KINDS = ("image", "audio", "video")

# data = unhex(repeat(sha256(hex of text), REPEATS)) -> 32*REPEATS bytes
BLOB_REPEATS = 8
BLOB_BYTES = 32 * BLOB_REPEATS

META_DDL = (
    "struct<width:int, height:int, sample_rate:int, n_frames:int, format:string>"
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table over documents: one blob per doc.

    All JVM-side expressions (sha2/unhex/repeat), so the same table is
    derivable in ANSI SQL for the oracle. kind cycles by doc_id;
    metadata is a pure function of doc_id.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    width = (F.col("doc_id") % 7 + 2).cast("int") * 8
    height = (F.col("doc_id") % 5 + 2).cast("int") * 8
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.unhex(F.repeat(F.sha2(F.col("text"), 256), BLOB_REPEATS)).alias("data"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("doc_id") % 11 + 1).cast("int").alias("n_frames"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------- decode

def _tile_bytes(data: bytes, n: int) -> np.ndarray:
    """Deterministically extend ``data`` to n bytes (tile + trim)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    reps = -(-n // max(len(buf), 1))
    return np.tile(buf, reps)[:n]


def decode_image(data: bytes, width: int, height: int) -> np.ndarray:
    """bytes -> (height, width, 3) uint8 pixel array.

    Tries Pillow; this container has no codec libs, so the fallback is
    the deterministic synthetic decode (payload bytes tiled into the
    pixel grid). Replace-in-place point for a real deployment.
    """
    try:  # pragma: no cover - not installed here
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError:
        return _tile_bytes(data, width * height * 3).reshape(height, width, 3)


def decode_audio(data: bytes, n_samples: int = 2048) -> np.ndarray:
    """bytes -> int16 PCM mono sample array.

    Real decode first: soundfile when importable (any libsndfile
    format), else the stdlib ``wave`` reader for RIFF/WAV payloads —
    both REACHABLE and tested (tests/test_multimodal.py feeds a real
    WAV through this). Undecodable payloads (including this
    container's synthetic sha2-derived fixtures) fall back to the
    deterministic tile decode so plans stay engine-replayable;
    ``n_samples`` sizes only that synthetic path. Multi-channel input
    keeps channel 0 (the features downstream are mono)."""
    import io

    try:  # pragma: no cover - soundfile not installed in this container
        import soundfile as sf

        pcm, _rate = sf.read(io.BytesIO(data), dtype="int16", always_2d=True)
        return np.ascontiguousarray(pcm[:, 0])
    except Exception:  # noqa: BLE001 - absent module OR undecodable bytes
        pass
    if data[:4] == b"RIFF":
        try:
            import wave

            with wave.open(io.BytesIO(data)) as wf:
                if wf.getsampwidth() != 2:
                    raise ValueError("only 16-bit PCM WAV")
                raw = wf.readframes(wf.getnframes())
                pcm = np.frombuffer(raw, dtype="<i2")
                return np.ascontiguousarray(pcm[:: wf.getnchannels()])
        except Exception:  # noqa: BLE001 - corrupt RIFF: synthetic fallback
            pass
    return _tile_bytes(data, n_samples * 2).view("<i2")


# ------------------------------------------------- mapInPandas operators

IMAGE_FEATURES_DDL = (
    "media_id long, mean_r double, mean_g double, mean_b double, brightness double"
)


def image_features(media: DataFrame) -> DataFrame:
    """Per-image channel means + brightness via Arrow-batched decode.

    Rows are pruned/filtered JVM-side (kind='image') before any byte
    reaches Python.
    """
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data, w, h in zip(
                pdf["media_id"], pdf["data"], pdf["width"], pdf["height"]
            ):
                px = decode_image(bytes(data), int(w), int(h)).astype(np.float64)
                means = px.reshape(-1, 3).mean(axis=0)
                out.append((int(mid), means[0], means[1], means[2], means.mean()))
            yield pd.DataFrame(
                out, columns=["media_id", "mean_r", "mean_g", "mean_b", "brightness"]
            )

    return (
        media.where(F.col("kind") == "image")
        .select(
            "media_id", "data", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
        )
        .mapInPandas(compute, schema=IMAGE_FEATURES_DDL)
    )


RESIZED_DDL = "media_id long, data binary, width int, height int"


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h), re-emitted as raw RGB
    bytes + updated dims. Pure numpy — works identically with a real
    decoder in front."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data, w, h in zip(
                pdf["media_id"], pdf["data"], pdf["width"], pdf["height"]
            ):
                px = decode_image(bytes(data), int(w), int(h))
                ys = (np.arange(out_h) * h // out_h).astype(np.intp)
                xs = (np.arange(out_w) * w // out_w).astype(np.intp)
                resized = px[np.ix_(ys, xs)]
                out.append((int(mid), resized.tobytes(), out_w, out_h))
            yield pd.DataFrame(out, columns=["media_id", "data", "width", "height"])

    return (
        media.where(F.col("kind") == "image")
        .select(
            "media_id", "data", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
        )
        .mapInPandas(compute, schema=RESIZED_DDL)
    )


AUDIO_FEATURES_DDL = "media_id long, rms double, peak int, n_samples int"


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip RMS / peak over int16 PCM samples."""
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                pcm = decode_audio(bytes(data)).astype(np.float64)
                rms = float(np.sqrt(np.mean(pcm**2)))
                out.append((int(mid), rms, int(np.abs(pcm).max()), len(pcm)))
            yield pd.DataFrame(out, columns=["media_id", "rms", "peak", "n_samples"])

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "data")
        .mapInPandas(compute, schema=AUDIO_FEATURES_DDL)
    )


def frame_index(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling plan: explode meta.n_frames into sampled
    frame rows with byte offsets — entirely JVM-side (sequence +
    explode); the per-frame byte slice is a later mapInPandas stage.
    At scale this is the cheap planning pass that decides which frames
    to decode before any video byte is touched."""
    frame_bytes = F.col("meta.width") * F.col("meta.height") * F.lit(3)
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            frame_bytes.alias("frame_bytes"),
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * F.col("frame_bytes")).alias("byte_offset"),
        )
    )


def frame_checksums(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Sampled-frame extraction: join the frame plan back to the blobs
    and checksum each (tiled) 64-byte frame slice in Arrow batches —
    the decode-side half of frame sampling.

    The digest is sha256 over the slice's lowercase-hex encoding, not
    the raw bytes: ANSI SQL engines hash strings, not blobs (DuckDB
    sha256 is VARCHAR-only), so hex-domain hashing is what makes this
    decode-side operator fully oracle-checkable while remaining a real
    per-frame content checksum."""
    plan = frame_index(media, every_n)
    joined = plan.join(media.select("media_id", "data"), "media_id").select(
        "media_id", "frame_idx", "byte_offset", "data"
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, idx, off, data in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["byte_offset"], pdf["data"]
            ):
                frame = _tile_bytes(bytes(data), int(off) + 64)[int(off) : int(off) + 64]
                digest = hashlib.sha256(frame.tobytes().hex().encode()).hexdigest()
                out.append((int(mid), int(idx), digest))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_sha"])

    return joined.mapInPandas(compute, schema="media_id long, frame_idx int, frame_sha string")
