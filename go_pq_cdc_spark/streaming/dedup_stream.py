"""Streaming incremental dedup: the online path of a training-data
ingestion pipeline. Each micro-batch of documents is (1) deduped against
the persisted MinHash index (`operators.dedup.minhash_index_write` layout)
WITHOUT touching the indexed corpus text, then (2) appended to that index,
so the next batch sees it. Near-dup pairs stream out partitioned by batch.

This is the CDC engine's sink-dispatch pattern (reference:
/root/reference/pq/connector.go sink apply loop) applied to the dedup
domain: foreachBatch gives per-batch transactional boundaries, and the
index plays the mirror's role — continuously maintained distributed state
that lookups never have to rebuild.

Scale shape per batch (B = batch docs, I = indexed corpus):
  - one narrow pass over B (shingle + signatures),
  - a partition-pruned scan of only the index buckets B's band keys touch
    (never O(I)),
  - candidate equi-join on (band, band_key) — AQE broadcasts the B side
    when it is small,
  - one partitioned append of B's band rows.
Nothing in the batch path scales with corpus size except the pruned
bucket scan, which scales with the CANDIDATE mass, not |I|.

Failure semantics: pairs are written with dynamic partition overwrite to
`pairs_dir/batch_id=N` (a retried batch rewrites its own partition —
idempotent); the index append is guarded by a per-batch marker file under
`<index>/_batches/` (a retried batch skips the append instead of
double-inserting band rows). Candidate generation additionally
`dropDuplicates` on the pair key, so even a marker lost to a torn failure
degrades to extra storage, never wrong pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as D

PAIR_SCHEMA = "doc_a bigint, doc_b bigint, jaccard double"


def _index_exists(index_path: str) -> bool:
    # local-FS existence probe; at scale swap for the FileSystem API — a
    # single driver-side namenode call either way
    return os.path.isdir(index_path) and any(
        e.startswith("bucket=") for e in os.listdir(index_path)
    )


def dedup_batch_against_index(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    *,
    portable: bool = True,
    n_buckets: int = D.MINHASH_INDEX_BUCKETS,
    within_batch: bool = True,
) -> None:
    """One micro-batch: look up near-dups against the index (plus, by
    default, within the batch itself — new duplicates often arrive
    together), write pairs to this batch's partition, then append the
    batch's band rows to the index exactly once."""
    spark = batch_df.sparkSession
    batch_df = batch_df.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    )
    if _index_exists(index_path):
        pairs = D.dedup_incremental(
            spark,
            batch_df,
            index_path,
            id_col,
            text_col,
            threshold,
            portable=portable,
            n_buckets=n_buckets,
        )
        # Drop index-side hits that are THIS batch's own ids: after a
        # mid-batch failure the append may already have landed, and the
        # retried lookup would otherwise pair the batch against itself.
        # (Also the right call for same-id re-ingest: a doc pairing with
        # its own previous version is an update, not a duplicate.)
        pairs = pairs.join(
            F.broadcast(batch_df.select(F.col(id_col).alias("doc_a"))),
            "doc_a",
            "left_anti",
        )
    else:
        pairs = spark.createDataFrame([], PAIR_SCHEMA)
    if within_batch:
        pairs = pairs.unionByName(
            D.minhash_lsh_pairs(
                batch_df, id_col, text_col, threshold, portable=portable
            )
        )
    (
        pairs.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(pairs_dir)
    )
    marker_dir = os.path.join(index_path, "_batches")
    marker = os.path.join(marker_dir, str(int(batch_id)))
    if os.path.exists(marker):
        return  # retried batch: pairs rewritten above, index already has us
    bands = (
        D.minhash_per_doc(batch_df, id_col, text_col, portable=portable)
        .select(
            "id",
            "sh",
            F.expr(f"explode(array({D._band_structs_sql()}))").alias("bb"),
        )
        .select(
            "id",
            F.col("bb.band").alias("band"),
            F.col("bb.band_key").alias("band_key"),
            "sh",
        )
        .withColumn("bucket", D._bucket_expr(n_buckets))
    )
    bands.write.mode("append").partitionBy("bucket").parquet(index_path)
    os.makedirs(marker_dir, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write("done")


def incremental_dedup_sink(
    stream_df: DataFrame,
    index_path: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    *,
    portable: bool = True,
    n_buckets: int = D.MINHASH_INDEX_BUCKETS,
    within_batch: bool = True,
):
    """Attach streaming incremental dedup to a document stream. Returns
    the StreamingQuery; processAllAvailable() drains in tests. The index
    may start empty (first batch creates it) or be pre-seeded with
    `minhash_index_write` over a historical corpus."""
    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda batch_df, epoch: dedup_batch_against_index(
                batch_df,
                epoch,
                index_path,
                pairs_dir,
                id_col,
                text_col,
                threshold,
                portable=portable,
                n_buckets=n_buckets,
                within_batch=within_batch,
            )
        )
        .start()
    )
