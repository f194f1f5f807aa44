"""O31: Timescale chunk→hypertable remap operator + refreshable mapper
(`pq/timescaledb/hypertable.go:35-116` SyncHyperTables/FindHyperTables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pq_cdc_spark.operators.timescale import (
    HypertableMapper,
    hypertable_mapping_sql,
    mapping_df,
    remap_hypertables,
)


def test_mapping_sql_targets_timescale_catalog():
    sql = hypertable_mapping_sql()
    assert "timescaledb_information.chunks" in sql
    assert "timescaledb_information.hypertables" in sql


def test_remap_broadcast_left_join(spark):
    """Known chunks re-attribute; unknown chunks pass through with NULL
    hypertable (map-miss keeps the physical name until the next sync)."""
    events = spark.createDataFrame(
        [("_timescaledb_internal._hyper_1_1_chunk", 1),
         ("_timescaledb_internal._hyper_1_2_chunk", 2),
         ("_timescaledb_internal._hyper_9_9_chunk", 3)],
        "chunk_table string, pk long",
    )
    mapping = mapping_df(
        spark,
        [("public", "metrics", "_timescaledb_internal", "_hyper_1_1_chunk"),
         ("public", "metrics", "_timescaledb_internal", "_hyper_1_2_chunk")],
    )
    out = {r["pk"]: r["hypertable"] for r in remap_hypertables(events, mapping).collect()}
    assert out == {1: "public.metrics", 2: "public.metrics", 3: None}
    # the mapping side must be broadcast — no shuffle of the event stream
    plan = remap_hypertables(events, mapping)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_mapper_refresh_swaps_mapping_mid_stream(spark):
    """VERDICT r3 item 8: a catalog refresh (new chunk appears) is picked up
    by the next remap — the ticker-loop semantics of SyncHyperTables."""
    catalog = {
        "rows": [("public", "metrics", "_timescaledb_internal", "_hyper_1_1_chunk")]
    }

    def run_sql(_sql):
        return catalog["rows"]

    mapper = HypertableMapper(spark, run_sql, min_refresh_interval_s=0.0)
    events = spark.createDataFrame(
        [("_timescaledb_internal._hyper_1_1_chunk", 1),
         ("_timescaledb_internal._hyper_1_2_chunk", 2)],
        "chunk_table string, pk long",
    )
    first = {r["pk"]: r["hypertable"] for r in mapper.remap(events).collect()}
    assert first == {1: "public.metrics", 2: None}

    # a new chunk materializes server-side; the next poll must see it
    catalog["rows"] = catalog["rows"] + [
        ("public", "metrics", "_timescaledb_internal", "_hyper_1_2_chunk")
    ]
    second = {r["pk"]: r["hypertable"] for r in mapper.remap(events).collect()}
    assert second == {1: "public.metrics", 2: "public.metrics"}


def test_mapper_disables_on_missing_catalog(spark):
    """SQLSTATE 42P01 (relation missing — not a Timescale server) disables
    polling, as the reference does (hypertable.go:52-58); remap degrades to
    a NULL hypertable column instead of erroring."""
    calls = {"n": 0}

    def run_sql(_sql):
        calls["n"] += 1
        raise RuntimeError('relation "timescaledb_information.chunks" '
                           "does not exist (SQLSTATE 42P01)")

    mapper = HypertableMapper(spark, run_sql, min_refresh_interval_s=0.0)
    events = spark.createDataFrame([("c1", 1)], "chunk_table string, pk long")
    out = mapper.remap(events).collect()
    assert [r["hypertable"] for r in out] == [None]
    mapper.remap(events).collect()
    assert calls["n"] == 1  # disabled after the first 42P01 — no re-poll

    # min-interval gating: a healthy mapper doesn't hammer the catalog
    ok = HypertableMapper(
        spark, lambda _s: [("public", "m", "s", "c1")], min_refresh_interval_s=3600.0
    )
    ok.remap(events).collect()
    ok.remap(events).collect()
    assert ok._last_refresh > 0
