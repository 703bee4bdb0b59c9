"""Multimodal queries for the driver contract.

The media table is synthesized deterministically from ``documents``
(operators/multimodal.py), so EVERY query here — catalog, frame plan,
and all four decode stages (frame checksums, resize, pixel features,
PCM features) — carries a full DuckDB oracle. The trick throughout is
replaying byte selection in hex space (2 hex chars per byte of the
256-byte tiled blob) and keeping the math on exact integers: digests
hash the slice's hex, and the float outputs (channel means, rms) are
double divisions/sqrt of exact integer sums, which both engines
compute bit-identically. numpy cross-checks remain in
tests/test_multimodal.py as semantic (not just parity) coverage.
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
    # image_features_mm / audio_features_mm: the decode-side pixel/PCM
    # math is replayed below in hex space with exact-integer sums, so
    # even the float outputs hash-match: channel means are double
    # divisions of exact ints, rms is sqrt of an exact int over 2048
    # (a power of two — the division is exact), and numpy's pairwise
    # summation is irrelevant because every partial sum of byte/sample
    # squares stays below 2^53.
}

# Pixel means: source byte for pixel i, channel c is blob[(i*3+c) % 256]
# (the synthetic decode tiles the 256-byte blob over the w*h*3 grid).
MULTIMODAL_ORACLES["image_features_mm"] = """
    WITH m AS (
        SELECT doc_id AS media_id,
               repeat(sha256(text), 8) AS hexstr,
               ((doc_id % 7 + 2) * 8)::BIGINT AS w,
               ((doc_id % 5 + 2) * 8)::BIGINT AS h
        FROM documents
        WHERE ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] = 'image'
    ),
    vals AS (
        SELECT media_id, w, h, i % 3 AS c,
               ('0x' || substring(hexstr, 2 * (i % 256) + 1, 2))::BIGINT AS v
        FROM (SELECT media_id, hexstr, w, h,
                     CAST(unnest(range(0, w * h * 3)) AS BIGINT) AS i
              FROM m)
    ),
    chans AS (
        SELECT media_id,
               sum(CASE WHEN c = 0 THEN v END)::DOUBLE / (w * h) AS mean_r,
               sum(CASE WHEN c = 1 THEN v END)::DOUBLE / (w * h) AS mean_g,
               sum(CASE WHEN c = 2 THEN v END)::DOUBLE / (w * h) AS mean_b
        FROM vals GROUP BY media_id, w, h
    )
    SELECT media_id, mean_r, mean_g, mean_b,
           (mean_r + mean_g + mean_b) / 3 AS brightness
    FROM chans
"""

# PCM samples: little-endian int16 pairs over the tiled blob —
# sample k = signed(blob[(2k) % 256] + 256 * blob[(2k+1) % 256]).
MULTIMODAL_ORACLES["audio_features_mm"] = """
    WITH m AS (
        SELECT doc_id AS media_id, repeat(sha256(text), 8) AS hexstr
        FROM documents
        WHERE ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] = 'audio'
    ),
    raw AS (
        SELECT media_id,
               ('0x' || substring(hexstr, 2 * ((2 * k) % 256) + 1, 2))::BIGINT
               + 256 * ('0x' || substring(hexstr, 2 * ((2 * k + 1) % 256) + 1, 2))::BIGINT
                   AS u
        FROM (SELECT media_id, hexstr,
                     CAST(unnest(range(0, 2048)) AS BIGINT) AS k
              FROM m)
    ),
    pcm AS (
        SELECT media_id, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
        FROM raw
    )
    SELECT media_id,
           sqrt(sum(s * s)::DOUBLE / 2048) AS rms,
           max(abs(s))::INT AS peak,
           2048 AS n_samples
    FROM pcm GROUP BY media_id
"""

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


def media_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate detection over OPAQUE media bytes — the first
    pass of any multimodal dedup stack (hash the blob, group, keep
    one): per kind, the number of duplicate groups, duplicated items,
    and reclaimable bytes ((multiplicity-1) x blob size per group).
    Text dedup's dedup_exact, applied to the binary column: the blob
    never shuffles — only its sha2 digest and byte length do, so at
    100 TB the exchange carries ~70 bytes per object regardless of
    object size. Output: (kind, n_objects, dup_groups, dup_items,
    reclaimable_bytes)."""
    media = mm.synthesize_media(spark, sf_dir)
    groups = media.groupBy(
        "kind", F.sha2(F.hex("data"), 256).alias("h")
    ).agg(
        F.count("*").alias("m"),
        F.min(F.octet_length("data")).alias("nbytes"),
    )
    d = F.col("m") >= 2
    return groups.groupBy("kind").agg(
        F.sum("m").cast("long").alias("n_objects"),
        F.sum(F.when(d, 1).otherwise(0)).cast("long").alias("dup_groups"),
        F.sum(F.when(d, F.col("m")).otherwise(0))
        .cast("long")
        .alias("dup_items"),
        F.sum(F.when(d, (F.col("m") - 1) * F.col("nbytes")).otherwise(0))
        .cast("long")
        .alias("reclaimable_bytes"),
    )


MULTIMODAL_ORACLES["media_exact_dups"] = _MEDIA_CTE + """
    , groups AS (
        SELECT kind, sha256(hex(data)) AS h, count(*) AS m,
               min(octet_length(data)) AS nbytes
        FROM media GROUP BY 1, 2
    )
    SELECT kind,
           CAST(sum(m) AS BIGINT) AS n_objects,
           CAST(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_groups,
           CAST(sum(CASE WHEN m >= 2 THEN m ELSE 0 END) AS BIGINT)
               AS dup_items,
           CAST(sum(CASE WHEN m >= 2 THEN (m - 1) * nbytes ELSE 0 END)
                AS BIGINT) AS reclaimable_bytes
    FROM groups GROUP BY kind
"""
