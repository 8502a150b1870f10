"""Incremental 64-bit-signature (SimHash / perceptual-hash) near-dup
detection against a persisted pigeonhole-block index — the third leg of
the streaming dedup matrix (MinHash: dedup_index.py, embedding cosine:
embedding_index.py, Hamming: here). Signatures arrive in micro-batches
(SimHash of crawled text, pHash of ingested media) and each batch is
checked against everything seen so far without re-scoring history.

Per batch (a foreachBatch worker):
  1. band the new signatures into max_hamming+1 contiguous blocks
     (operators/dedup.hamming_band_buckets — the same code
     simhash_pairs/hamming_pairs64 use; complete by pigeonhole: two
     sigs within distance max_hamming agree on ≥ 1 block);
  2. probe the persisted block table for rows sharing a (band, bucket)
     with the batch — a semi-join touching only colliding history; the
     8-byte signature rides in the block rows, so verification needs
     NO separate payload store;
  3. join new-side blocks against (new ∪ colliding-old) blocks,
     normalize id_a < id_b, drop old-old pairs (reported by the batch
     that introduced them), verify bit_count(xor) ≤ max_hamming,
     distinct;
  4. publish: block rows + confirmed pairs land in batch_id-scoped
     partition directories (overwrite, not append) — crash-window
     redelivery replaces partial output.

Exactly-once: the high-water-mark makes late replays no-ops; batch-
scoped overwrites make crash-window redelivery idempotent (pinned).
State growth is blocks rows/signature at 24 B each — date-partition +
compact at scale. Equivalence to one-shot hamming_pairs64 holds for
UNCAPPED runs and is pinned in tests/test_hamming_index.py; with
max_bucket_size the per-batch cap keeps different bucket survivors
than a one-shot cap, and the pinned contract is capped ⊆ uncapped.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import hamming_band_buckets
from .publish import HWM_NAME, already_applied, commit_meta, read_table_or_none


def incremental_hamming_near_dup_batch(
    index_dir: str,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    max_hamming: int = 8,
    blocks: int | None = None,
    max_bucket_size: int | None = 64,
):
    """Returns the (batch_df, batch_id) foreachBatch worker described in
    the module docstring. Layout under `index_dir`: buckets/ pairs/
    plus a batch high-water-mark for replay idempotence."""
    buckets_path = os.path.join(index_dir, "buckets")
    pairs_path = os.path.join(index_dir, "pairs")

    def worker(batch_df: DataFrame, batch_id: int) -> None:
        if already_applied(index_dir, batch_id, name=HWM_NAME):
            return  # replayed batch — already applied
        spark = batch_df.sparkSession
        batch_df = batch_df.select(id_col, sig_col)

        new_buckets = hamming_band_buckets(
            batch_df, id_col, sig_col, max_hamming, blocks
        )
        old_buckets = read_table_or_none(
            spark, buckets_path, [id_col, sig_col, "band", "bucket"]
        )
        # crash-redelivered ids already sit in the index — drop their
        # stale copies from the probe (the strict id_a < id_b filter
        # already excludes self-pairs, but duplicates would double-
        # count candidate work)
        batch_ids = batch_df.select(id_col).distinct()
        if old_buckets is not None:
            colliding_old = old_buckets.join(
                new_buckets.select("band", "bucket").distinct(),
                ["band", "bucket"],
                "left_semi",
            ).join(batch_ids, id_col, "left_anti")
            probe = new_buckets.withColumn(
                "__new", F.lit(True)
            ).unionByName(colliding_old.withColumn("__new", F.lit(False)))
        else:
            probe = new_buckets.withColumn("__new", F.lit(True))

        if max_bucket_size is not None:
            # deterministic skew cap, same contract as hamming_pairs64:
            # keep the lowest ids per (band, bucket)
            from pyspark.sql import Window

            w = Window.partitionBy("band", "bucket").orderBy(F.col(id_col).asc())
            probe = (
                probe.withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= max_bucket_size)
                .drop("__rk")
            )

        a = probe.select(
            "band",
            "bucket",
            F.col(id_col).alias("id_a"),
            F.col(sig_col).alias("__sig_a"),
            F.col("__new").alias("__new_a"),
        )
        b = probe.select(
            "band",
            "bucket",
            F.col(id_col).alias("id_b"),
            F.col(sig_col).alias("__sig_b"),
            F.col("__new").alias("__new_b"),
        )
        hamming = F.bit_count(F.col("__sig_a").bitwiseXOR(F.col("__sig_b")))
        confirmed = (
            a.join(b, ["band", "bucket"])
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (F.col("__new_a") | F.col("__new_b"))
                & (hamming <= max_hamming)
            )
            .select("id_a", "id_b", hamming.alias("hamming"))
            .distinct()
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
        commit_meta(index_dir, {"last_batch": batch_id}, name=HWM_NAME)

    return worker
