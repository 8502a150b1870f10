"""Incremental embedding near-duplicate detection against a persisted
hyperplane-LSH index — dedup modality #5's streaming tier, the exact
counterpart of streaming/dedup_index.py for vectors: embeddings arrive
in micro-batches (a crawler's encoder output, a feature-store feed) and
each batch is checked against EVERYTHING seen so far without ever
re-scoring the historical corpus.

Per batch (a foreachBatch worker, so it composes with any streaming
source):
  1. band the new vectors (operators/similarity.vector_band_buckets —
     the same code the batch operator embedding_near_dupes uses;
     narrow, no shuffle);
  2. probe the persisted bucket table for rows sharing a (band, bucket)
     with the batch — a semi-join touching only colliding history;
  3. expand candidates (dedup.bucket_pairs — skew-capped, never a
     self-join) and keep pairs with ≥ 1 new vector (old-old pairs were
     reported by the batch that introduced them);
  4. verify with exact cosine (similarity.verify_cosine_pairs) over
     the new vectors + only the colliding old vectors;
  5. publish: bucket rows + vectors + confirmed pairs land in
     batch_id-scoped partition directories (overwrite, not append), so
     a crash between the writes and the high-water-mark commit makes
     the redelivered batch REPLACE its partial output.

Exactly-once: the high-water-mark makes LATE replays no-ops, and the
batch-scoped overwrites make the crash-window redelivery (outputs
written, HWM not committed) idempotent; redelivered ids' stale indexed
copies are anti-joined out of the probe so nothing pairs with itself.
Equivalence to the one-shot batch operator holds for UNCAPPED runs;
with max_bucket_size the per-batch cap keeps different bucket
survivors than a one-shot cap would, and the pinned contract is
capped-pairs ⊆ uncapped-pairs (see the hamming sibling's test). State growth is
the bucket table (`bands` rows/vector, 24 B each) and the vector store
— at 100 TB both are date-partitioned parquet compacted by
io.compact_parquet; the probe stays cheap because it is keyed on
(band, bucket).

No reference analog; this is the engine's similarity tier meeting its
streaming tier — replay-idempotence ≡ one-shot embedding_near_dupes is
pinned in tests/test_embedding_index.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.dedup import bucket_pairs
from ..operators.similarity import vector_band_buckets, verify_cosine_pairs
from .publish import HWM_NAME, already_applied, commit_meta, read_table_or_none


def incremental_embedding_near_dup_batch(
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    threshold: float = 0.45,
    max_bucket_size: int | None = 64,
):
    """Returns the (batch_df, batch_id) foreachBatch worker described in
    the module docstring. Layout under `index_dir`: buckets/ vecs/
    pairs/ plus a batch high-water-mark for replay idempotence."""
    buckets_path = os.path.join(index_dir, "buckets")
    vecs_path = os.path.join(index_dir, "vecs")
    pairs_path = os.path.join(index_dir, "pairs")

    def worker(batch_df: DataFrame, batch_id: int) -> None:
        if already_applied(index_dir, batch_id, name=HWM_NAME):
            return  # replayed batch — already applied
        spark = batch_df.sparkSession
        batch_df = batch_df.select(id_col, vec_col)

        new_buckets = vector_band_buckets(
            batch_df, id_col, vec_col, dim, n_planes, bands, seed
        )
        old_buckets = read_table_or_none(
            spark, buckets_path, [id_col, "band", "bucket"]
        )
        old_vecs = read_table_or_none(spark, vecs_path, [id_col, vec_col])

        # ids being re-delivered after a mid-batch crash already sit in
        # the index: drop their STALE indexed copies from the probe and
        # the verification corpus, or x would pair with its own copy
        batch_ids = batch_df.select(id_col).distinct()
        if old_buckets is not None:
            colliding_old = old_buckets.join(
                new_buckets.select("band", "bucket").distinct(),
                ["band", "bucket"],
                "left_semi",
            ).join(batch_ids, id_col, "left_anti")
            probe = new_buckets.unionByName(colliding_old)
        else:
            probe = new_buckets

        candidates = bucket_pairs(probe, id_col, max_bucket_size)
        # keep pairs touching ≥1 NEW vector: two hash semi-joins +
        # distinct (an OR-predicate semi-join can only plan as a
        # nested loop — candidate_count × batch_ids work per batch)
        new_ids = batch_df.select(id_col).distinct()
        candidates = (
            candidates.join(
                new_ids.withColumnRenamed(id_col, "id_a"), "id_a", "left_semi"
            )
            .unionByName(
                candidates.join(
                    new_ids.withColumnRenamed(id_col, "id_b"), "id_b", "left_semi"
                )
            )
            .distinct()
        )

        corpus = (
            batch_df
            if old_vecs is None
            else batch_df.unionByName(
                old_vecs.join(batch_ids, id_col, "left_anti")
            )
        )
        confirmed = verify_cosine_pairs(
            candidates, corpus, threshold, id_col, vec_col
        )
        # batch-scoped partition overwrites: crash-then-redeliver
        # replaces partial output instead of double-appending (see
        # dedup_index.py — the HWM stays required for late replays)
        confirmed.write.mode("overwrite").parquet(
            f"{pairs_path}/batch_id={batch_id}"
        )
        new_buckets.write.mode("overwrite").parquet(
            f"{buckets_path}/batch_id={batch_id}"
        )
        batch_df.write.mode("overwrite").parquet(f"{vecs_path}/batch_id={batch_id}")
        commit_meta(index_dir, {"last_batch": batch_id}, name=HWM_NAME)

    return worker
