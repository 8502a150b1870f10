"""Multimodal-column plumbing: binary payloads, struct metadata, JVM
frame slicing, Arrow-batched decode/feature/resize, and the decode seam
contract (real formats raise until a codec is plugged in)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from assignment_2_dataengineering_spark.operators import multimodal as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    from assignment_2_dataengineering_spark.sources.tables import load_table

    return MM.as_media_table(load_table(spark, SF, "documents")).cache()


def test_media_schema_is_binary_plus_struct(media):
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["media"].startswith("struct<format:string,width:int")


def test_payload_is_opaque_bytes(media):
    row = media.select("doc_id", "payload").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert len(row.payload) > 0


def test_frame_sample_geometry(media):
    frames = MM.sample_frames(media, every_n=2).collect()
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    metas = {r.doc_id: r for r in media.select("doc_id", "media.n_frames").collect()}
    for doc_id, rs in by_doc.items():
        want_idx = list(range(0, metas[doc_id].n_frames, 2))
        assert sorted(r.frame_idx for r in rs) == want_idx
        for r in rs:
            assert r.frame_len == MM.FRAME_BYTES  # all docs ≥ 48 B, slices full
            assert isinstance(r.frame, (bytes, bytearray))


def test_frames_are_payload_slices(media):
    doc = media.first()
    frames = {
        r.frame_idx: bytes(r.frame)
        for r in MM.sample_frames(media.limit(1), every_n=1).collect()
    }
    payload = bytes(doc.payload)
    fb = MM.FRAME_BYTES
    for idx, frame in frames.items():
        assert frame == payload[idx * fb : (idx + 1) * fb]


def test_extract_features_matches_numpy(media):
    got = {r.doc_id: r for r in MM.extract_features(media).collect()}
    for r in media.select("doc_id", "payload").collect():
        a = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        assert got[r.doc_id].n_bytes == a.size
        assert got[r.doc_id].byte_sum == int(a.sum())
        assert abs(got[r.doc_id].byte_mean - float(a.mean())) < 1e-9


def test_resize_cycles_bytes_to_target(media):
    out = MM.resize_images(media)
    rows = out.select("doc_id", "payload", "resized", "media.width", "media.height").collect()
    for r in rows:
        n = r.width * r.height
        assert len(r.resized) == n
        src = bytes(r.payload)
        want = (src * (n // len(src) + 1))[:n]
        assert bytes(r.resized) == want


def test_decode_seam_raises_for_real_formats(spark):
    from assignment_2_dataengineering_spark.sources.tables import load_table

    with pytest.raises(NotImplementedError):
        MM.decode_payload("jpeg", b"\xff\xd8\xff")
    # and through the Spark plumbing: a jpeg-tagged table fails at decode
    jpeg = MM.as_media_table(load_table(spark, SF, "documents").limit(2), fmt="jpeg")
    with pytest.raises(Exception):
        MM.extract_features(jpeg).collect()


def test_feature_schema_stable(media):
    assert MM.extract_features(media).schema == MM.FEATURE_SCHEMA


# ---------------------------------------------------------------------------
# Perceptual hashing (phash64 / phash_pairs)
# ---------------------------------------------------------------------------


def _brute_hamming_pairs(hashes: dict[int, int], max_hamming: int) -> set[tuple[int, int, int]]:
    ids = sorted(hashes)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                out.add((a, b, d))
    return out


def test_phash_deterministic_and_content_addressed(media):
    h1 = {r.doc_id: r.phash for r in MM.phash64(media).collect()}
    h2 = {r.doc_id: r.phash for r in MM.phash64(media).collect()}
    assert h1 == h2
    assert len(h1) == media.count()


def test_phash_identical_payloads_pair_at_distance_zero(spark, media):
    """A byte-identical copy of a payload under a fresh id must be
    found at Hamming 0 — the true-positive completeness contract."""
    dup = media.filter(F.col("doc_id") < 3).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    pairs = MM.phash_pairs(media.unionByName(dup), max_hamming=6).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    for i in range(3):
        assert got.get((i, i + 100000)) == 0


def test_phash_pairs_equal_bruteforce(media):
    """Banded candidate generation is COMPLETE for d <= max_hamming
    (blocks = max_hamming + 1 pigeonhole): the pair set must equal
    brute-force pairwise Hamming over all signatures — no recall loss,
    no false extras (the verify filter is exact)."""
    hashes = {r.doc_id: r.phash for r in MM.phash64(media).collect()}
    for mh in (2, 6):
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in MM.phash_pairs(media, max_hamming=mh).collect()
        }
        assert got == _brute_hamming_pairs(hashes, mh)


def test_phash_blocks_guard(media):
    with pytest.raises(ValueError):
        MM.phash_pairs(media, max_hamming=8, blocks=8).collect()


def test_phash_bucket_cap_subset_and_deterministic(media):
    full = {
        (r.id_a, r.id_b) for r in MM.phash_pairs(media, max_hamming=6).collect()
    }
    capped_df = MM.phash_pairs(media, max_hamming=6, max_bucket_size=5)
    capped = {(r.id_a, r.id_b) for r in capped_df.collect()}
    assert capped <= full
    assert capped == {(r.id_a, r.id_b) for r in capped_df.collect()}


def test_pcm_energy_frames_matches_numpy_reference(spark):
    import numpy as np

    payloads = [(1, b"aaaaaaaabbbbbbbbcc"), (2, b"  " * 4), (3, b"short")]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.frame_idx): r.sq_sum
        for r in MM.pcm_energy_frames(df, frame_samples=8, center=64).collect()
    }
    want = {}
    for did, p in payloads:
        a = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
        for f in range(a.size // 8):
            want[(did, f)] = int((((a[f * 8 : f * 8 + 8]) - 64) ** 2).sum())
    # doc 3 is shorter than one frame -> contributes nothing (partial dropped)
    assert got == want and not any(d == 3 for d, _ in got)


def test_vad_segments_gaps_and_islands(spark):
    # frames: doc 1 voiced at 0,1,2, silent 3, voiced 5 -> segments [0..2], [5..5]
    rows = [
        (1, 0, 20000), (1, 1, 15000), (1, 2, 14400), (1, 3, 100), (1, 5, 99999),
        (2, 0, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, frame_idx int, sq_sum long")
    segs = {
        (r.doc_id, r.seg_start, r.seg_end): (r.n_frames, r.total_sq)
        for r in MM.vad_segments(df, threshold_sq=14_400).collect()
    }
    assert segs == {(1, 0, 2): (3, 49400), (1, 5, 5): (1, 99999)}


def test_patchify_geometry_and_content(spark):
    # 1 image: 8×4 bytes, value = row-major position 0..31
    payload = bytes(range(32))
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary").select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("raw").alias("format"),
            F.lit(8).alias("width"),
            F.lit(4).alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(8).alias("frame_bytes"),
            F.lit(16_000).alias("sample_rate_hz"),
        ).alias("media"),
    )
    got = {
        (r.patch_x, r.patch_y): bytes(r.patch)
        for r in MM.patchify(df, tile_w=4, tile_h=2).collect()
    }
    # 8/4 × 4/2 = 2×2 patches; patch (0,0) = rows 0-1, cols 0-3
    assert got[(0, 0)] == bytes([0, 1, 2, 3, 8, 9, 10, 11])
    assert got[(1, 0)] == bytes([4, 5, 6, 7, 12, 13, 14, 15])
    assert got[(0, 1)] == bytes([16, 17, 18, 19, 24, 25, 26, 27])
    assert got[(1, 1)] == bytes([20, 21, 22, 23, 28, 29, 30, 31])
