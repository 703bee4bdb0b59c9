"""Multimodal queries for the driver contract.

The media table is synthesized deterministically from ``documents``
(operators/multimodal.py), so catalog- and plan-level queries have full
DuckDB oracles — including a blob round-trip digest
(``sha2(hex(data))``) that proves the binary payloads are byte-equal
across engines — and so does the frame-checksum decode stage (the
slice digests run in hex space, which SQL can reproduce). The
remaining decode-side operators (pixel/PCM math inside mapInPandas)
are not SQL-expressible; they get rows-only driver checks plus numpy
cross-checks in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as mm


def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind media inventory + blob digest parity check."""
    media = mm.synthesize_media(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length("data")).alias("total_bytes"),
        F.min("meta.width").alias("min_w"),
        F.max("meta.height").alias("max_h"),
        F.sum("meta.n_frames").alias("total_frames"),
        F.min(F.sha2(F.hex("data"), 256)).alias("min_blob_sha"),
    )


def media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side frame-sampling plan (every 2nd frame + byte offsets)."""
    return mm.frame_index(mm.synthesize_media(spark, sf_dir), every_n=2)


def image_features_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.image_features(mm.synthesize_media(spark, sf_dir))


def audio_features_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.audio_features(mm.synthesize_media(spark, sf_dir))


def frame_checksums_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.frame_checksums(mm.synthesize_media(spark, sf_dir), every_n=2)


RESIZE_W, RESIZE_H = 16, 12


def image_resize_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize with a fully hash-checked decode: the nearest-
    neighbor resize runs in numpy inside mapInPandas (the REAL decode
    path — swap decode_image's fallback for Pillow in production), and
    the output buffer is digested in hex space so the DuckDB oracle can
    replay byte selection exactly: output byte i maps to source byte
    ((y*h//out_h)*w + (x*w//out_w))*3 + c, tiled mod 256 over the
    synthetic blob."""
    media = mm.synthesize_media(spark, sf_dir)
    resized = mm.resize_images(media, RESIZE_W, RESIZE_H)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.sha2(F.lower(F.hex("data")), 256).alias("resized_sha"),
    )


# Shared synthesis CTE — must mirror operators/multimodal.synthesize_media
# expression-for-expression.
_MEDIA_CTE = """
    WITH media AS (
        SELECT doc_id AS media_id,
               ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
               unhex(repeat(sha256(text), 8)) AS data,
               ((doc_id % 7 + 2) * 8)::INT AS width,
               ((doc_id % 5 + 2) * 8)::INT AS height,
               (doc_id % 11 + 1)::INT AS n_frames
        FROM documents
    )
"""

MULTIMODAL_ORACLES: dict[str, str] = {
    "media_catalog": _MEDIA_CTE + """
        SELECT kind,
               count(*) AS n,
               CAST(sum(octet_length(data)) AS BIGINT) AS total_bytes,
               min(width) AS min_w,
               max(height) AS max_h,
               CAST(sum(n_frames) AS BIGINT) AS total_frames,
               min(sha256(hex(data))) AS min_blob_sha
        FROM media GROUP BY kind
    """,
    "media_frame_plan": _MEDIA_CTE + """
        SELECT media_id,
               CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx,
               CAST(unnest(range(0, n_frames, 2)) * width * height * 3 AS BIGINT)
                   AS byte_offset
        FROM media WHERE kind = 'video'
    """,
    # Frame checksums: the blob is deterministic (unhex of repeated
    # sha256 hex), so the tiled 64-byte slice at byte offset
    # frame_idx*w*h*3 is, in hex space, a 128-char substring of the
    # doubled 512-char hex string starting at 2*(offset % 256) —
    # wrap-around included. The engine digests the slice's lowercase
    # hex, which DuckDB's VARCHAR sha256 reproduces exactly.
    "frame_checksums_mm": """
        WITH m AS (
            SELECT doc_id AS media_id,
                   repeat(sha256(text), 8) AS hexstr,
                   ((doc_id % 7 + 2) * 8)::BIGINT AS width,
                   ((doc_id % 5 + 2) * 8)::BIGINT AS height,
                   (doc_id % 11 + 1)::INT AS n_frames
            FROM documents
            WHERE ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] = 'video'
        ),
        frames AS (
            SELECT media_id, hexstr,
                   CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx,
                   width * height * 3 AS frame_bytes
            FROM m
        )
        SELECT media_id, frame_idx,
               sha256(substring(hexstr || hexstr,
                                2 * ((frame_idx * frame_bytes) % 256) + 1,
                                128)) AS frame_sha
        FROM frames
    """,
    # image_features_mm / audio_features_mm: decode-side pixel/PCM
    # math, rows-only (numpy cross-checked in tests).
}

# Resize oracle: replay the nearest-neighbor byte selection in hex
# space. Output buffer is RESIZE_W*RESIZE_H*3 bytes; byte i decomposes
# as y = i // (W*3), x = (i % (W*3)) // 3, c = i % 3; its source index
# is ((y*h // RESIZE_H)*w + (x*w // RESIZE_W))*3 + c, and the synthetic
# blob tiles every 256 bytes (512 hex chars).
MULTIMODAL_ORACLES["image_resize_mm"] = f"""
    WITH m AS (
        SELECT doc_id AS media_id,
               repeat(sha256(text), 8) AS hexstr,
               ((doc_id % 7 + 2) * 8)::BIGINT AS w,
               ((doc_id % 5 + 2) * 8)::BIGINT AS h
        FROM documents
        WHERE ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] = 'image'
    ),
    outbytes AS (
        SELECT media_id, hexstr, w, h,
               CAST(unnest(range(0, {RESIZE_W * RESIZE_H * 3})) AS BIGINT) AS i
        FROM m
    ),
    mapped AS (
        SELECT media_id, i,
               substring(
                   hexstr,
                   2 * (((((i // {RESIZE_W * 3}) * h // {RESIZE_H}) * w
                          + ((i % {RESIZE_W * 3}) // 3) * w // {RESIZE_W}) * 3
                         + i % 3) % 256) + 1,
                   2) AS hx
        FROM outbytes
    )
    SELECT media_id,
           {RESIZE_W} AS width,
           {RESIZE_H} AS height,
           sha256(string_agg(hx, '' ORDER BY i)) AS resized_sha
    FROM mapped
    GROUP BY media_id
"""
