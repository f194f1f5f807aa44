"""End-to-end lifecycle test (the reference's §3.2 snapshot-then-CDC flow):

  1. chunk-parallel 'snapshot' of table state at LSN L0 seeds the mirror
  2. post-L0 changes land as WAL segments
  3. the pq_cdc_wal LSN source streams them from startlsn=L0
  4. the TOAST-aware mirror merge maintains current state

Invariant (snapshot_consistency_test.go): the stream-maintained mirror
equals batch latest_state over the FULL changelog — no gap, no duplicate,
TOAST repaired across the handoff seam.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from go_pq_cdc_spark.operators.cdc import filter_heartbeat, latest_state
from go_pq_cdc_spark.sources import lsn_stream
from go_pq_cdc_spark.sources.changelog import committed_changelog
from go_pq_cdc_spark.streaming.changelog_stream import merge_mirror_batch, mirror_sink, read_mirror

from .conftest import SF_DIR


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="gpcs_e2e_")
    yield {
        "wal": os.path.join(base, "wal"),
        "state": os.path.join(base, "state"),
        "ckpt": os.path.join(base, "ckpt"),
    }
    shutil.rmtree(base, ignore_errors=True)


def test_snapshot_then_cdc_equals_batch_state(spark, dirs):
    log = filter_heartbeat(committed_changelog(spark, SF_DIR)).select(
        "op", "lsn", "xid", "commit_ts", "pk", "after_val"
    )
    max_lsn = log.agg(F.max("lsn")).collect()[0][0]
    l0 = max_lsn // 2

    # 1) snapshot at L0: current state rows become the mirror seed (op='R')
    snap_state = latest_state(log.filter(F.col("lsn") <= l0)).select(
        "pk",
        F.col("last_lsn").alias("lsn"),
        F.lit("R").alias("op"),
        F.col("last_val").alias("after_val"),
    )
    os.makedirs(dirs["state"], exist_ok=True)
    merge_mirror_batch(snap_state, dirs["state"])

    # 2) post-snapshot WAL, segmented into 3 files
    os.makedirs(dirs["wal"], exist_ok=True)
    stream_rows = log.filter(F.col("lsn") > l0).orderBy("lsn").toPandas()
    thirds = max(1, len(stream_rows) // 3)
    for i in range(0, len(stream_rows), thirds):
        seg = stream_rows.iloc[i : i + thirds]
        if seg.empty:
            continue
        lo, hi = int(seg["lsn"].min()), int(seg["lsn"].max())
        tbl = pa.Table.from_pandas(seg, preserve_index=False)
        pq.write_table(tbl, lsn_stream.segment_path(dirs["wal"], lo, hi))

    # 3) stream from startlsn=L0 into the mirror
    lsn_stream.register(spark)
    stream = (
        spark.readStream.format("pq_cdc_wal")
        .option("path", dirs["wal"])
        .option("startlsn", l0)
        .load()
    )
    q = mirror_sink(stream, dirs["state"], dirs["ckpt"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # 4) invariant: mirror == batch latest_state over the whole log
    mirror = {
        r["pk"]: (r["after_val"], r["lsn"])
        for r in read_mirror(spark, dirs["state"]).collect()
    }
    direct = {
        r["pk"]: (r["last_val"], r["last_lsn"]) for r in latest_state(log).collect()
    }
    assert mirror == direct


def test_wal_source_through_txn_buffer_to_mirror(spark, dirs):
    """Full O1+O8+O21 path: WAL segments carrying interleaved streamed-txn
    chunks with C/A markers -> pq_cdc_wal source -> per-XID stateful buffer
    -> mirror. Only committed txns' effects reach the mirror."""
    import datetime

    import pandas as pd

    from go_pq_cdc_spark.streaming import buffer_streamed_txns, merge_mirror_batch

    def seg(rows, lo, hi):
        pdf = pd.DataFrame(
            rows, columns=["op", "lsn", "xid", "commit_ts", "pk", "after_val"]
        )
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(tbl, lsn_stream.segment_path(dirs["wal"], lo, hi))

    ts = datetime.datetime(2024, 1, 1)
    os.makedirs(dirs["wal"], exist_ok=True)
    # segment 1: txn 1 starts (2 events), txn 2 starts (1 event)
    seg(
        [("I", 1, 1, ts, 10, 1.0), ("I", 2, 2, ts, 20, 2.0), ("U", 3, 1, ts, 10, 1.5)],
        1,
        3,
    )
    # segment 2: txn 1 commits at lsn 5, txn 2 aborts
    seg([("C", 5, 1, ts, 0, None), ("A", 6, 2, ts, 0, None)], 4, 6)

    lsn_stream.register(spark)
    stream = spark.readStream.format("pq_cdc_wal").option("path", dirs["wal"]).load()
    committed = buffer_streamed_txns(stream)
    q = (
        committed.writeStream.outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .foreachBatch(
            lambda b, _e: merge_mirror_batch(
                b.select("pk", "lsn", "op", "after_val"), dirs["state"]
            )
            if b.count()
            else None
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = {
        r["pk"]: r["after_val"]
        for r in read_mirror(spark, dirs["state"]).collect()
    }
    assert state == {10: 1.5}, f"committed txn applied, aborted invisible: {state}"


def test_dedup_clusters_connected_components(spark):
    """Pairs -> components via hash-min propagation: a chain, a triangle,
    and a disjoint pair resolve to min-id clusters in few rounds."""
    from go_pq_cdc_spark.operators.dedup import canonical_survivors, dedup_clusters

    pairs = spark.createDataFrame(
        # chain 1-2-3-4, triangle 10-11-12 (one edge redundant), pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    corpus = spark.createDataFrame(
        [(i, f"text-{i}") for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]],
        "doc_id bigint, text string",
    )
    kept = sorted(
        r["doc_id"] for r in canonical_survivors(pairs, corpus, "doc_id").collect()
    )
    assert kept == [1, 10, 20, 99]  # one survivor per cluster + untouched doc


def test_dedup_clusters_plan_is_truncated(spark):
    """Optimization r13: the label-propagation loop truncates lineage with
    eager localCheckpoint each round, so the RETURNED plan is a leaf RDD
    scan — not the full iterated join tree over the candidate-generation
    pipeline (whose analysis cost grew exponentially with rounds and was
    re-paid by every downstream consumer). Pin both properties: the plan
    bottoms out at an ExistingRDD leaf and never references the input
    pairs' lineage (the source table scan must be gone)."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.catalog import load_table
    from go_pq_cdc_spark.operators.dedup import dedup_clusters

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(20)
    dup = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    both = docs.unionByName(dup)
    pairs = both.alias("a").join(
        both.alias("b"),
        (F.xxhash64("a.text") == F.xxhash64("b.text"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    clusters = dedup_clusters(pairs)
    plan = clusters._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan, f"expected truncated leaf plan, got:\n{plan}"
    assert "parquet" not in plan.lower(), (
        f"returned plan still drags the pair-generation lineage:\n{plan}"
    )
    # and it still computes the right thing through that truncated plan
    got = {r["id"]: r["cluster_id"] for r in clusters.collect()}
    for doc_id, cluster in got.items():
        if doc_id >= 1000000:
            assert cluster == doc_id - 1000000


def test_dedup_clusters_over_minhash_pairs(spark):
    """End-to-end: minhash pairs over the real corpus (with injected exact
    dups) cluster so every injected copy collapses onto its original."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.catalog import load_table
    from go_pq_cdc_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(50)
    dup = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    pairs = minhash_lsh_pairs(docs.unionByName(dup), "doc_id")
    clusters = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    for doc_id, cluster in clusters.items():
        if doc_id >= 1000000:
            # every injected copy is clustered with (at least) its original
            assert cluster <= doc_id - 1000000


def test_embedding_near_dup_lsh_blocks_by_bucket(spark):
    """LSH-blocked near-dup: every reported pair is a true >=threshold pair
    (verification is exact), identical vectors are always found (same
    bucket by construction), and orthogonal vectors never pair."""
    from go_pq_cdc_spark.operators.dedup import (
        embedding_near_dup,
        embedding_near_dup_lsh,
    )

    dim = 8
    base = [1.0] * dim
    near = [1.0] * (dim - 1) + [0.9]
    ortho = [1.0, -1.0] * (dim // 2)
    rows = [(1, base, "x"), (2, list(base), "x"), (3, near, "x"), (4, ortho, "x")]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label string"
    )
    lsh = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_dup_lsh(df, threshold=0.9).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_dup(df, threshold=0.9).collect()
    }
    assert (1, 2) in lsh  # identical vectors share every hyperplane sign
    assert set(lsh) <= set(exact)  # no false positives — verify is exact
    assert all(abs(lsh[k] - exact[k]) < 1e-12 for k in lsh)
    assert not any(4 in k for k in lsh)  # orthogonal vector pairs with nobody


def test_minhash_production_hash_path(spark):
    """portable=False (xxhash64 shingle hashing — the 100 TB path) keeps
    the pipeline's semantics: every injected exact duplicate is found with
    jaccard 1.0 (identical shingle sets collide in all bands under ANY
    hash), and timing-path parity with the portable hash is not required."""
    from go_pq_cdc_spark.catalog import load_table
    from go_pq_cdc_spark.operators.dedup import minhash_lsh_pairs

    from .conftest import SF_DIR

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
    )
    dup = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    corpus = docs.unionByName(dup)
    pairs = minhash_lsh_pairs(corpus, "doc_id", portable=False).collect()
    exact = {(r["doc_a"], r["doc_b"]) for r in pairs if r["jaccard"] == 1.0}
    # every shingle-able doc must pair with its injected duplicate
    n_shingleable = (
        docs.filter(F.expr("size(split(trim(text), '\\\\s+')) >= 3")).count()
    )
    injected = {p for p in exact if p[1] - p[0] == 100000}
    assert len(injected) >= n_shingleable


def test_minhash_incremental_index_prunes_buckets(spark, tmp_path):
    """The 100 TB incremental-dedup serving shape: the corpus's MinHash
    state is persisted PARTITIONED BY band-key bucket; a new batch scans
    only the buckets its own band keys hash to. Proven BEHAVIORALLY: every
    non-touched bucket's files are corrupted and the pruned lookup still
    returns the exact same pairs — a full-index scan would throw."""
    import glob

    from go_pq_cdc_spark.catalog import load_table
    from go_pq_cdc_spark.operators import dedup as D
    from pyspark.sql import functions as F2

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    shingleable = docs.filter(F2.expr("size(split(trim(text), '\\\\s+')) >= 3"))
    new_ids = [r["doc_id"] for r in shingleable.limit(3).collect()]
    assert len(new_ids) == 3
    new = docs.filter(F2.col("doc_id").isin(new_ids)).select(
        (F2.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    path = str(tmp_path / "mh_index")
    D.minhash_index_write(docs, path, "doc_id")

    got = D.dedup_incremental(spark, new, path, "doc_id")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in got.collect()}
    # every injected copy pairs with its indexed original at jaccard 1.0
    for i in new_ids:
        assert pairs.get((i, i + 1000000)) == 1.0

    # 3 docs touch at most 3*LSH_BANDS buckets — the rest must be skipped
    touched = {
        r["bucket"]
        for r in D.minhash_per_doc(new, "doc_id")
        .select(
            "id", F2.expr(f"explode(array({D._band_structs_sql()}))").alias("bb")
        )
        .select(F2.col("bb.band").alias("band"), F2.col("bb.band_key").alias("band_key"))
        .withColumn("bucket", D._bucket_expr(D.MINHASH_INDEX_BUCKETS))
        .select("bucket")
        .distinct()
        .collect()
    }
    assert touched and len(touched) <= 3 * D.LSH_BANDS
    corrupted = 0
    for d in glob.glob(f"{path}/bucket=*"):
        if int(d.rsplit("=", 1)[1]) not in touched:
            for f in glob.glob(f"{d}/*.parquet"):
                with open(f, "wb") as fh:
                    fh.write(b"not a parquet file")
                corrupted += 1
    assert corrupted > 0  # the prune is non-trivial
    fresh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.dedup_incremental(spark, new, path, "doc_id").collect()
    }
    assert fresh == pairs
