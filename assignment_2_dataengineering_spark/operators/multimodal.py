"""Multimodal columns: opaque `binary` payloads + typed metadata.

The reference pipeline is tabular/stream-only (no media ops), but a
training-data engine at 100 TB carries images/audio/video alongside
text. The design here:

- media payloads are **opaque BinaryType columns**; everything the
  planner needs (format, dimensions, frame geometry, sample rate) lives
  in a typed `media` StructType column, so filters/partitioning/pruning
  run JVM-side without touching the bytes;
- structure-aware slicing (frame sampling, chunking) is pure Catalyst —
  `sequence` + `posexplode` + binary `substring` — so it scales at scan
  speed with zero Python;
- content-aware steps (decode, feature extraction, resize) run as
  Arrow-batched pandas plumbing (`mapInPandas` / `pandas_udf`): one
  Python worker per partition, whole Arrow record batches, never
  row-at-a-time.

Real codec libraries (PIL, soundfile, av) are NOT available in this
container, so `decode_payload` is an explicit seam: the deterministic
`raw` format decodes to its own bytes; real formats raise
NotImplementedError until a codec is plugged in. The Spark-side schema,
batching, and UDF signatures are real and oracle-tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("sample_rate_hz", T.IntegerType()),
    ]
)

FRAME_BYTES = 8  # fixture frame geometry: ≤5 frames × 8 B fits every doc


def as_media_table(docs: DataFrame, fmt: str = "raw") -> DataFrame:
    """Derive a deterministic media table from `documents`: the UTF-8
    bytes of `text` become the opaque payload, and synthetic-but-stable
    geometry (keyed off doc_id) fills the metadata struct. In production
    this is `spark.read.format("binaryFile")` plus a header probe; here
    the derivation keeps the oracle computable.

    Payload bytes are opaque to every downstream operator — nothing
    below assumes they are text.
    """
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(fmt).alias("format"),
            (d % 8 + 8).cast("int").alias("width"),
            (d % 4 + 4).cast("int").alias("height"),
            (d % 5 + 1).cast("int").alias("n_frames"),
            F.lit(FRAME_BYTES).alias("frame_bytes"),
            F.lit(16_000).alias("sample_rate_hz"),
        ).alias("media"),
    )


def media_from_binary_files(files: DataFrame, fmt: str = "raw", frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """The production entry as_media_table's docstring promises: adapt
    `sources.io.read_binary_files` rows (path, content, length, mtime)
    into the engine's media-table shape. doc_id = xxhash64(path) so ids
    are stable across reruns and listing order; FRAME geometry derives
    from byte length, and the IMAGE geometry is a square-ish synthetic
    derived from the payload size (side = floor(sqrt(length)), capped
    ≥ 1) — honest placeholder values a real header probe replaces at
    the decode seam (decode_payload) without touching this adapter.
    Downstream operators (sample_frames / extract_features /
    resize_images / patchify) run on the result WITHOUT degenerate
    zero-geometry outputs (width=height=0 previously made
    resize_images emit empty bytes for every file)."""
    side = F.greatest(
        F.floor(F.sqrt(F.col("length").cast("double"))), F.lit(1)
    ).cast("int")
    return files.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(fmt).alias("format"),
            side.alias("width"),
            side.alias("height"),
            F.greatest(F.floor(F.col("length") / frame_bytes), F.lit(1))
            .cast("int")
            .alias("n_frames"),
            F.lit(frame_bytes).cast("int").alias("frame_bytes"),
            F.lit(16_000).alias("sample_rate_hz"),
        ).alias("media"),
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling (audio chunking is the identical op with
    frame_bytes = samples-per-chunk × bytes-per-sample): keep every
    n-th frame as its own row with the frame's byte slice.

    Entirely JVM-side — `sequence` builds the kept indices,
    `posexplode` fans out rows, binary `substring` slices the payload.
    No shuffle, no Python: at 100 TB this runs at scan speed and the
    explode multiplies rows before any exchange."""
    idx = F.explode(
        F.sequence(F.lit(0), F.col("media.n_frames") - 1, F.lit(every_n))
    ).alias("frame_idx")
    fb = F.col("media.frame_bytes")
    frame = F.expr("substring(payload, frame_idx * media.frame_bytes + 1, media.frame_bytes)")
    return (
        media.select("doc_id", "payload", "media", idx)
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            frame.alias("frame"),
        )
        .withColumn("frame_len", F.length("frame"))
    )


def decode_payload(fmt: str, payload: bytes) -> np.ndarray:
    """THE decode seam. `raw` → the bytes themselves (deterministic
    fake used by tests/oracles). Real formats need codec libs absent
    from this container — they raise rather than silently fake."""
    if fmt == "raw":
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"decode for format {fmt!r} requires a codec library (PIL/soundfile/av) "
        "not present in this environment; plug one in via decode_payload"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Content features via `mapInPandas`: decode each payload (seam
    above) and reduce to scalar features. Arrow moves whole record
    batches; numpy reduces vectorized — the per-partition loop is over
    Arrow batches, not rows. Partition count, not row count, bounds the
    Python-call overhead at scale."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts = pdf["media"].map(lambda m: m["format"])
            arrs = [decode_payload(f, p) for f, p in zip(fmts, pdf["payload"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [a.size for a in arrs],
                    "byte_sum": [int(a.sum()) for a in arrs],
                    "byte_mean": [float(a.mean()) if a.size else 0.0 for a in arrs],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


PCM_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("sq_sum", T.LongType()),
    ]
)


def pcm_energy_frames(
    media: DataFrame, frame_samples: int = 8, center: int = 64
) -> DataFrame:
    """Per-frame audio energy over PCM-u8 payloads: interpret the opaque
    payload as unsigned 8-bit samples, frame it into `frame_samples`
    windows, and emit the integer energy Σ(sample − center)² per full
    frame (trailing partial frames are dropped — standard frame-analysis
    behavior).

    The kernel is the real audio path: `mapInPandas` over Arrow batches,
    `np.frombuffer` → truncate-reshape → one vectorized reduction per
    batch, never per-row Python. Swapping PCM-u8 for a real codec only
    changes the frombuffer line (the decode_payload seam). Energy is a
    pure integer so results are bit-exact across engines, partitionings,
    and cluster sizes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sq = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                nf = a.size // frame_samples
                if nf == 0:
                    continue
                d = (a[: nf * frame_samples].reshape(nf, frame_samples) - center) ** 2
                ids.extend([int(did)] * nf)
                idxs.extend(range(nf))
                sq.extend(d.sum(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "sq_sum": pd.Series(sq, dtype="int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, PCM_FRAME_SCHEMA)


def vad_segments(
    frames: DataFrame, threshold_sq: int = 14_400, id_col: str = "doc_id"
) -> DataFrame:
    """Voice-activity segments from per-frame energies: frames with
    sq_sum ≥ threshold are voiced; consecutive voiced frames merge into
    one segment (gaps-and-islands: frame_idx − row_number is constant
    within a run). Returns (doc_id, seg_start, seg_end, n_frames,
    total_sq) — integer-exact end to end.

    Scale shape: the island window partitions by doc, so state never
    exceeds one document's frames; one hash exchange on doc_id covers
    both the window and the segment aggregate (the groupBy reuses the
    window's partitioning — no second shuffle)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("frame_idx")
    voiced = frames.filter(F.col("sq_sum") >= threshold_sq)
    isl = voiced.withColumn("grp", F.col("frame_idx") - F.row_number().over(w))
    return (
        isl.groupBy(id_col, "grp")
        .agg(
            F.min("frame_idx").alias("seg_start"),
            F.max("frame_idx").alias("seg_end"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("sq_sum").alias("total_sq"),
        )
        .drop("grp")
    )


def patchify(media: DataFrame, tile_w: int = 4, tile_h: int = 2) -> DataFrame:
    """ViT-style image patching: slice each (width × height)-byte image
    into non-overlapping tile_w × tile_h patches, one output row per
    patch — (doc_id, patch_x, patch_y, patch) with patch bytes in
    row-major order. The training-data step between raw images and a
    vision-transformer tokenizer.

    Pure Catalyst: a 2-D posexplode (sequence × sequence) over patch
    coordinates, each patch assembled by concatenating tile_h binary
    substrings of the RESIZED payload (resize_images normalizes every
    image to its metadata geometry first, so the grid is exact).
    Payload bytes are sliced in the scan stage and never enter a
    shuffle; images whose geometry doesn't divide evenly simply emit
    the floor(w/tile_w)·floor(h/tile_h) full patches."""
    resized = resize_images(media).select(
        "doc_id",
        F.col("resized").alias("img"),
        F.col("media.width").alias("w"),
        F.col("media.height").alias("h"),
    )
    grid = resized.select(
        "doc_id",
        "img",
        "w",
        # Spark evaluates sequence(0, -1) DESCENDING ([0, -1]), so an
        # image narrower/shorter than one tile must emit an EMPTY
        # array, not bogus negative coordinates (same ANSI-sequence
        # trap as tokenize.py's pair guard)
        F.explode(
            F.expr(
                f"CASE WHEN w >= {tile_w}"
                f" THEN sequence(0, CAST(w / {tile_w} AS INT) - 1)"
                f" ELSE CAST(array() AS ARRAY<INT>) END"
            )
        ).alias("patch_x"),
        F.col("h"),
    ).select(
        "doc_id",
        "img",
        "w",
        "patch_x",
        F.explode(
            F.expr(
                f"CASE WHEN h >= {tile_h}"
                f" THEN sequence(0, CAST(h / {tile_h} AS INT) - 1)"
                f" ELSE CAST(array() AS ARRAY<INT>) END"
            )
        ).alias("patch_y"),
    )
    rows = F.expr(
        f"transform(sequence(0, {tile_h} - 1),"
        f" r -> substring(img, patch_y * {tile_h} * w + r * w + patch_x * {tile_w} + 1, {tile_w}))"
    )
    return grid.select(
        "doc_id",
        "patch_x",
        "patch_y",
        F.aggregate(rows, F.lit(b""), lambda acc, x: F.concat(acc, x)).alias("patch"),
    )


@F.pandas_udf(T.BinaryType())
def _decimate8(payload: pd.Series, factor: pd.Series) -> pd.Series:
    """Keep every `factor`-th PCM-u8 sample (numpy stride slice over the
    Arrow batch). Real resampling swaps this body for a polyphase
    filter; the binary→binary Arrow signature and stride math are the
    engine-side contract."""
    out = []
    for p, f in zip(payload, factor):
        a = np.frombuffer(p, dtype=np.uint8)
        out.append(a[:: int(f)].tobytes())
    return pd.Series(out)


def decimate_pcm(media: DataFrame, factor: int = 4) -> DataFrame:
    """Downsample each audio payload by an integer factor: sample i of
    the output is sample i·factor of the input (zero-phase decimation,
    anti-alias filtering stubbed at the documented seam). Adds
    `resampled` + `resampled_len`; metadata sample rate divides by the
    factor JVM-side."""
    return media.withColumn(
        "resampled", _decimate8("payload", F.lit(factor))
    ).withColumn("resampled_len", F.length("resampled"))


@F.pandas_udf(T.BinaryType())
def _resize_cycle(payload: pd.Series, out_n: pd.Series) -> pd.Series:
    """Deterministic stand-in for image resample: cycle the source
    bytes to the target size (out[i] = in[i mod n]). A real resize
    swaps the body for PIL/cv2 — the Arrow-batched binary→binary
    signature is the part that matters for the engine."""
    out = []
    for p, n in zip(payload, out_n):
        a = np.frombuffer(p, dtype=np.uint8)
        n = int(n)
        reps = int(np.ceil(n / max(a.size, 1)))
        out.append(np.tile(a, reps)[:n].tobytes() if a.size else b"")
    return pd.Series(out)


def resize_images(media: DataFrame) -> DataFrame:
    """Resize every payload to its metadata target (width × height
    bytes): vectorized pandas UDF over binary columns. The target size
    is computed JVM-side; only the byte transform crosses into Python."""
    out_n = (F.col("media.width") * F.col("media.height")).cast("int")
    return media.withColumn("resized", _resize_cycle("payload", out_n)).withColumn(
        "resized_len", F.length("resized")
    )


# ---------------------------------------------------------------------------
# Perceptual hashing: 64-bit media fingerprints + Hamming near-dup pairs
# ---------------------------------------------------------------------------


def _phash_kernel(payload: bytes, fmt: str) -> int:
    """64-bit perceptual hash of a decoded payload: mean-pool the byte
    signal into 64 buckets, threshold each bucket against the median
    bucket energy (the aHash/pHash shape — resample, then
    median-threshold to bits; a real image pHash swaps the pooling for
    a DCT low-band, through the same decode seam). Deterministic,
    content-addressed: byte-identical payloads hash identically, and
    small local edits flip only the buckets they touch."""
    a = decode_payload(fmt, payload).astype(np.float64)
    if a.size == 0:
        return 0
    pooled = np.resize(a, (64, max(a.size // 64, 1))).mean(axis=1)
    med = float(np.median(pooled))
    bits = pooled > med
    v = 0
    for i in range(64):
        if bits[i]:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def phash64(media: DataFrame) -> DataFrame:
    """(doc_id, phash) via mapInPandas over Arrow batches: bytes cross
    into Python once per partition batch, only 8-byte hashes come back
    — the payload column never travels further (at 100 TB the pair
    search downstream shuffles longs, not media)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts = pdf["media"].map(lambda m: m["format"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "phash": [
                        _phash_kernel(p, f)
                        for p, f in zip(pdf["payload"], fmts)
                    ],
                }
            )

    return media.mapInPandas(batches, "doc_id long, phash long")


def phash_pairs(
    media: DataFrame,
    max_hamming: int = 8,
    blocks: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate media pairs at perceptual-hash Hamming distance ≤
    max_hamming: phash64 fingerprints feed the generic complete
    pigeonhole banding (operators/dedup.py hamming_pairs64 — blocks ≥
    max_hamming + 1, streamed equal-block self-join, deterministic
    skew cap). The one Python crossing is the hash itself; candidate
    generation and the bit_count verify are pure Catalyst over longs."""
    from .dedup import hamming_pairs64

    return hamming_pairs64(
        phash64(media),
        id_col="doc_id",
        sig_col="phash",
        max_hamming=max_hamming,
        blocks=blocks,
        max_bucket_size=max_bucket_size,
    )
