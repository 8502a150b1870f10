"""Multimodal-column queries: binary payloads + typed metadata over the
`documents` table (operators.multimodal). The payload derivation is
deterministic (UTF-8 bytes of ASCII text), so every byte-level result
has an exact DuckDB oracle expressed over codepoints — while the Spark
side exercises the real media plumbing: BinaryType columns, struct
metadata, JVM frame slicing, Arrow-batched pandas decode/resize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..sources.tables import load_table
from .registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.as_media_table(load_table(spark, sf_dir, "documents"))


@register(
    "q_media_metadata",
    oracle="""
    SELECT doc_id,
           'raw' AS format,
           CAST(doc_id % 8 + 8 AS INT) AS width,
           CAST(doc_id % 4 + 4 AS INT) AS height,
           CAST(doc_id % 5 + 1 AS INT) AS n_frames,
           CAST(length(text) AS INT) AS payload_bytes
    FROM documents
    """,
    tags=("multimodal",),
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over an opaque binary column: the
    planner-visible side of a media table. Selecting struct fields +
    length(binary) never touches payload contents — column pruning
    keeps the scan narrow even though payloads dominate the bytes."""
    m = _media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("media.format").alias("format"),
        F.col("media.width").alias("width"),
        F.col("media.height").alias("height"),
        F.col("media.n_frames").alias("n_frames"),
        F.length("payload").alias("payload_bytes"),
    )


@register(
    "q_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(length(substring(text, CAST(frame_idx * 8 + 1 AS INT), 8)) AS INT) AS frame_len,
           substring(text, CAST(frame_idx * 8 + 1 AS INT), 8) AS frame_text
    FROM (
      SELECT doc_id, text, unnest(range(0, doc_id % 5 + 1, 2)) AS frame_idx
      FROM documents
    )
    """,
    tags=("multimodal",),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling (operators.multimodal.sample_frames):
    sequence + posexplode + binary substring, all JVM-side. frame_text
    decodes the slice only for oracle comparability — production keeps
    frames binary."""
    frames = MM.sample_frames(_media(spark, sf_dir), every_n=2)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.col("frame_len").cast("int").alias("frame_len"),
        F.decode("frame", "UTF-8").alias("frame_text"),
    )


@register(
    "q_media_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_bytes,
           CAST(list_aggregate(
                 list_transform(range(length(text)),
                                i -> ord(substring(text, CAST(i AS INT) + 1, 1))),
                 'sum') AS BIGINT) AS byte_sum,
           list_aggregate(
                 list_transform(range(length(text)),
                                i -> ord(substring(text, CAST(i AS INT) + 1, 1))),
                 'sum') * 1.0 / length(text) AS byte_mean
    FROM documents
    """,
    tags=("multimodal",),
    bench=True,  # Arrow-batch throughput belongs in the headline set
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + scalar feature extraction through the Arrow-batched
    mapInPandas path (operators.multimodal.extract_features): byte
    count/sum/mean per payload via the decode seam. The oracle recomputes
    the same reduction over codepoints (payload bytes == ASCII codes)."""
    return MM.extract_features(_media(spark, sf_dir))


@register(
    "q_media_resize",
    oracle="""
    SELECT doc_id,
           CAST((doc_id % 8 + 8) * (doc_id % 4 + 4) AS INT) AS resized_len,
           CAST(list_aggregate(
                 list_transform(range((doc_id % 8 + 8) * (doc_id % 4 + 4)),
                                i -> ord(substring(text, CAST(i % length(text) AS INT) + 1, 1))),
                 'sum') AS BIGINT) AS resized_byte_sum
    FROM documents
    """,
    tags=("multimodal",),
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize to the metadata target via the vectorized binary→binary
    pandas UDF, then re-reduce the output bytes through the feature
    path — exercising both Arrow directions (JVM→Python payloads in,
    Python→JVM payloads out). Oracle: cyclic-extension byte sum."""
    resized = MM.resize_images(_media(spark, sf_dir))
    out = MM.extract_features(
        resized.select(
            "doc_id",
            F.col("resized").alias("payload"),
            "media",
        )
    )
    return out.select(
        "doc_id",
        F.col("n_bytes").alias("resized_len"),
        F.col("byte_sum").alias("resized_byte_sum"),
    )


@register(
    "q_media_phash",
    oracle=None,  # banded candidate generation → rows-only; invariants in tests/test_multimodal.py
    tags=("multimodal", "dedup"),
)
def q_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate media pairs (operators/
    multimodal.py phash64 + operators/dedup.py hamming_pairs64): 64-bit
    content fingerprints from the Arrow-batched decode seam, complete
    pigeonhole banding (blocks = max_hamming + 1), bit_count verify.
    Only 8-byte hashes shuffle — payload bytes never leave the scan.
    Invariants (byte-identical payloads pair at distance 0, pair set ≡
    brute-force pairwise Hamming, skew cap determinism) pinned in
    tests/test_multimodal.py."""
    return MM.phash_pairs(_media(spark, sf_dir), max_hamming=6).orderBy(
        "id_a", "id_b"
    )


@register(
    "q_audio_vad",
    oracle="""
    WITH frames AS (
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             CAST(list_sum(list_transform(range(0, 8),
                    j -> pow(unicode(substr(text, frame_idx * 8 + j + 1, 1)) - 64, 2)))
                  AS BIGINT) AS sq_sum
      FROM (SELECT doc_id, text,
                   unnest(range(0, length(text) // 8)) AS frame_idx
            FROM documents)
    ),
    voiced AS (SELECT * FROM frames WHERE sq_sum >= 14400),
    isl AS (SELECT doc_id, frame_idx, sq_sum,
                   frame_idx - row_number() OVER (PARTITION BY doc_id
                                                  ORDER BY frame_idx) AS grp
            FROM voiced)
    SELECT doc_id,
           CAST(min(frame_idx) AS INT) AS seg_start,
           CAST(max(frame_idx) AS INT) AS seg_end,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(sq_sum) AS BIGINT) AS total_sq
    FROM isl GROUP BY doc_id, grp
    """,
    tags=("multimodal", "audio"),
)
def q_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based voice-activity detection over PCM-u8 audio payloads:
    numpy frame-energy kernel (mapInPandas, Arrow batches) → JVM
    gaps-and-islands segment merge. The payload derivation is the same
    deterministic text-bytes scheme as the other media queries, so the
    oracle recomputes every frame energy from codepoints; the Spark side
    is the real audio plumbing (binary column → vectorized numpy →
    windowed segmentation). Threshold 14400 = mean-square 1800 over
    8-sample frames — letters score voiced, space-heavy frames don't."""
    m = _media(spark, sf_dir)
    frames = MM.pcm_energy_frames(m, frame_samples=8, center=64)
    return MM.vad_segments(frames, threshold_sq=14_400)


@register(
    "q_audio_resample",
    oracle="""
    SELECT doc_id,
           CAST((length(text) + 3) // 4 AS INT) AS n_out,
           array_to_string(list_transform(range(0, (length(text) + 3) // 4),
               i -> substr(text, i * 4 + 1, 1)), '') AS resampled_text
    FROM documents
    """,
    tags=("multimodal", "audio"),
)
def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4× PCM decimation (operators.multimodal.decimate_pcm): numpy
    stride slicing over Arrow batches, binary in / binary out. The
    oracle reconstructs the decimated byte stream from codepoints; the
    text decode here exists only for comparability — production keeps
    the resampled payload binary."""
    m = MM.decimate_pcm(_media(spark, sf_dir), factor=4)
    return m.select(
        "doc_id",
        F.col("resampled_len").cast("int").alias("n_out"),
        F.decode("resampled", "UTF-8").alias("resampled_text"),
    )


@register(
    "q_media_patchify",
    oracle="""
    WITH geo AS (
        SELECT doc_id, text, length(text) AS n,
               CAST(doc_id % 8 + 8 AS INT) AS w,
               CAST(doc_id % 4 + 4 AS INT) AS h
        FROM documents
    ),
    px AS (SELECT *, unnest(range(0, w // 4)) AS patch_x FROM geo),
    grid AS (SELECT *, unnest(range(0, h // 2)) AS patch_y FROM px)
    SELECT doc_id, CAST(patch_x AS INT) AS patch_x,
           CAST(patch_y AS INT) AS patch_y,
           array_to_string(list_transform(range(0, 8),
               k -> substr(text,
                    CAST(((patch_y * 2 + k // 4) * w + patch_x * 4 + (k % 4)) % n AS INT) + 1,
                    1)), '') AS patch_text
    FROM grid
    """,
    tags=("multimodal",),
)
def q_media_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch extraction (operators.multimodal.patchify):
    resize-normalized images sliced into 4×2 patches, one row per
    patch, assembled JVM-side from binary substrings — no Python in
    the loop, payload never shuffles. The oracle recomputes every
    patch byte from codepoints through the same cycle-resize
    indexing; patch bytes decode to text only for comparability."""
    patches = MM.patchify(_media(spark, sf_dir), tile_w=4, tile_h=2)
    return patches.select(
        "doc_id",
        "patch_x",
        "patch_y",
        F.decode("patch", "UTF-8").alias("patch_text"),
    )
