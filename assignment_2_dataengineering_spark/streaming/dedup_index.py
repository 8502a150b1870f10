"""Incremental near-duplicate detection against a persisted LSH index —
the continuously-crawled-corpus dedup shape: documents arrive in
micro-batches and each batch is checked against EVERYTHING seen so far
without ever re-scoring the historical corpus.

Per batch (a foreachBatch worker, so it composes with any streaming
source):
  1. band the new docs (operators/dedup.band_buckets — narrow, no
     shuffle);
  2. probe the persisted bucket table for rows sharing a (band, bucket)
     with the batch — a semi-join that touches only colliding history,
     never the full index;
  3. expand candidates (bucket_pairs — skew-capped, no self-join) and
     keep pairs with ≥ 1 new doc (old-old pairs were already reported
     in the batch that introduced them);
  4. verify with exact Jaccard (verify_pairs_exact) over the new docs +
     only the colliding old docs;
  5. publish: bucket rows + doc texts + confirmed pairs land in
     batch_id-scoped partition directories (overwrite, not append) —
     crash-window redelivery replaces partial output.

Exactly-once: the high-water-mark makes late replays no-ops (the same
idempotence the engine's merge-upsert sink uses), and batch-scoped
overwrites make the crash-window redelivery (outputs written, HWM not
committed) idempotent — redelivered ids' stale indexed copies are
anti-joined out of the probe and corpus. State growth is the bucket table (bands
rows/doc, 24 B each) and the doc store — at 100 TB both are
date-partitioned parquet compacted by io.compact_parquet; the probe
stays cheap because it is keyed on (band, bucket).

No reference analog (the reference dedups only within its 5000-event
buffer, readme.md:157); this is the engine's LLM-pipeline tier meeting
its streaming tier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.dedup import band_buckets, bucket_pairs, verify_pairs_exact
from .publish import HWM_NAME, already_applied, commit_meta, read_table_or_none


def incremental_near_dup_batch(
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.3,
    seed: int = 42,
    max_bucket_size: int | None = 64,
):
    """Returns the (batch_df, batch_id) foreachBatch worker described in
    the module docstring. Layout under `index_dir`: buckets/ docs/
    pairs/ plus a batch high-water-mark for replay idempotence."""
    buckets_path = os.path.join(index_dir, "buckets")
    docs_path = os.path.join(index_dir, "docs")
    pairs_path = os.path.join(index_dir, "pairs")

    def worker(batch_df: DataFrame, batch_id: int) -> None:
        if already_applied(index_dir, batch_id, name=HWM_NAME):
            return  # replayed batch — already applied
        spark = batch_df.sparkSession
        batch_df = batch_df.select(id_col, text_col)

        new_buckets = band_buckets(
            batch_df, text_col, id_col, n, num_hashes, bands, seed
        )
        old_buckets = read_table_or_none(
            spark, buckets_path, [id_col, "band", "bucket"]
        )
        old_docs = read_table_or_none(spark, docs_path, [id_col, text_col])

        # crash-redelivered ids already sit in the index — drop their
        # stale copies from the probe and the verification corpus
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
        # keep pairs touching ≥1 NEW doc: two hash semi-joins + distinct
        # (an OR-predicate semi-join can only plan as a nested loop)
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
            if old_docs is None
            else batch_df.unionByName(
                old_docs.join(batch_ids, id_col, "left_anti")
            )
        )
        confirmed = verify_pairs_exact(
            candidates, corpus, text_col, id_col, n, threshold
        )
        # Batch-scoped partition OVERWRITES, not appends: a crash after
        # some writes but before the high-water-mark commit re-delivers
        # the batch, and overwriting batch_id=N replaces any partial
        # output instead of double-appending — the HWM check above
        # stays required for LATE replays (the index has since grown,
        # so recomputation would yield a different pair set).
        confirmed.write.mode("overwrite").parquet(
            f"{pairs_path}/batch_id={batch_id}"
        )
        new_buckets.write.mode("overwrite").parquet(
            f"{buckets_path}/batch_id={batch_id}"
        )
        batch_df.write.mode("overwrite").parquet(f"{docs_path}/batch_id={batch_id}")
        commit_meta(index_dir, {"last_batch": batch_id}, name=HWM_NAME)

    return worker
