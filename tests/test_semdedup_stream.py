"""Streaming semantic dedup: cross-batch near-dup detection against the
persisted IVF index, partition-pruned lookups, retry idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from go_pq_cdc_spark.streaming.semdedup_stream import (
    SEM_PAIR_SCHEMA,
    semdedup_batch_against_index,
)

import pytest

# slow tier (r13 verdict item 1): excluded from the default pytest run
# so the driver's gate finishes inside its window; run with
# `pytest -m "slow or not slow"` (full) or `-m slow` (this tier only).
pytestmark = pytest.mark.slow



def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _cents(spark):
    # two orthogonal cells
    return _df(spark, [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])])


def _pairs(spark, pairs_dir):
    # an all-empty-batches stream writes no files at all; declared schema
    # keeps an existing-but-empty dir readable
    if not os.path.isdir(pairs_dir):
        return set()
    return {
        (r["vec_id"], r["dup_of"], r["batch_id"])
        for r in spark.read.schema(SEM_PAIR_SCHEMA + ", batch_id int")
        .parquet(pairs_dir)
        .collect()
    }


class TestSemDedupStream:
    def test_cross_batch_near_dup_found(self, spark, tmp_path):
        idx, pd_ = str(tmp_path / "idx"), str(tmp_path / "pairs")
        cents = _cents(spark)
        b0 = _df(spark, [(10, [1.0, 0.01, 0.0, 0.0]), (11, [0.0, 1.0, 0.02, 0.0])])
        semdedup_batch_against_index(b0, 0, idx, pd_, cents)
        # batch 0 against an empty index: no cross pairs, none within
        assert _pairs(spark, pd_) == set()
        # batch 1: 20 ~dups 10 (same cell), 21 is orthogonal to everything
        b1 = _df(spark, [(20, [0.99, 0.012, 0.0, 0.0]), (21, [0.0, 0.0, 1.0, 0.0])])
        semdedup_batch_against_index(b1, 1, idx, pd_, cents)
        assert _pairs(spark, pd_) == {(20, 10, 1)}

    def test_within_batch_pairs_and_orientation(self, spark, tmp_path):
        idx, pd_ = str(tmp_path / "idx"), str(tmp_path / "pairs")
        b0 = _df(
            spark,
            [(5, [1.0, 0.0, 0.0, 0.0]), (7, [0.999, 0.001, 0.0, 0.0])],
        )
        semdedup_batch_against_index(b0, 0, idx, pd_, _cents(spark))
        # newer (larger id) points at the kept (smaller id) member
        assert _pairs(spark, pd_) == {(7, 5, 0)}

    def test_retry_is_idempotent(self, spark, tmp_path):
        idx, pd_ = str(tmp_path / "idx"), str(tmp_path / "pairs")
        cents = _cents(spark)
        b0 = _df(spark, [(10, [1.0, 0.01, 0.0, 0.0])])
        semdedup_batch_against_index(b0, 0, idx, pd_, cents)
        b1 = _df(spark, [(20, [0.99, 0.012, 0.0, 0.0]), (22, [0.991, 0.011, 0.0, 0.0])])
        semdedup_batch_against_index(b1, 1, idx, pd_, cents)
        first = _pairs(spark, pd_)
        n_idx = spark.read.parquet(idx).count()
        semdedup_batch_against_index(b1, 1, idx, pd_, cents)  # retry
        assert _pairs(spark, pd_) == first  # no (20,22)-via-index double
        assert spark.read.parquet(idx).count() == n_idx  # no double append
        # the cross pair and the within pair each appear exactly once
        assert (20, 10, 1) in first and (22, 20, 1) in first

    def test_same_id_new_content_still_pairs(self, spark, tmp_path):
        idx, pd_ = str(tmp_path / "idx"), str(tmp_path / "pairs")
        cents = _cents(spark)
        semdedup_batch_against_index(
            _df(spark, [(10, [1.0, 0.01, 0.0, 0.0])]), 0, idx, pd_, cents
        )
        # vec 10 re-ingested with a CHANGED embedding: the indexed old
        # version must still count as a near-dup source
        semdedup_batch_against_index(
            _df(spark, [(10, [0.999, 0.012, 0.0, 0.0])]), 1, idx, pd_, cents
        )
        assert (10, 10, 1) in _pairs(spark, pd_)

    def test_index_layout_is_cell_partitioned(self, spark, tmp_path):
        idx, pd_ = str(tmp_path / "idx"), str(tmp_path / "pairs")
        semdedup_batch_against_index(
            _df(spark, [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0])]),
            0,
            idx,
            pd_,
            _cents(spark),
        )
        cells = {e for e in os.listdir(idx) if e.startswith("cent_id=")}
        assert cells == {"cent_id=0", "cent_id=1"}

    def test_lookup_scan_is_partition_pruned(self, spark, tmp_path):
        idx, pd_ = str(tmp_path / "idx"), str(tmp_path / "pairs")
        cents = _cents(spark)
        semdedup_batch_against_index(
            _df(spark, [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0])]),
            0,
            idx,
            pd_,
            cents,
        )
        # a batch living entirely in cell 0 must plan a cent_id partition
        # filter over the index (directory-level skip, never O(index))
        from go_pq_cdc_spark.operators.similarity import IVF_INDEX_SCHEMA

        probe = (
            spark.read.schema(IVF_INDEX_SCHEMA)
            .parquet(idx)
            .filter(F.col("cent_id").isin([0]))
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters:" in plan
        pruned = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "cent_id" in pruned
