"""Config validation (O34) + PostgreSQL SQL-generation (O25-O27, O9-O16) +
multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from go_pq_cdc_spark.config import ConfigError, EngineConfig, TableConfig
from go_pq_cdc_spark.operators.multimodal import extract_features, media_dedup
from go_pq_cdc_spark.snapshot import plan_ctid_blocks, plan_integer_range
from go_pq_cdc_spark.sources import postgres as PG


def _cfg(**kw):
    base = dict(
        tables=[
            TableConfig("users"),
            TableConfig("cdc_heartbeat"),
        ],
    )
    base.update(kw)
    return EngineConfig(**base)


class TestConfig:
    def test_defaults_valid(self):
        _cfg().validate()

    def test_chunk_default_matches_reference(self):
        assert EngineConfig().chunk_size == 8000  # config.go:113-114

    def test_bad_proto(self):
        with pytest.raises(ConfigError, match="proto_version"):
            _cfg(proto_version=3).validate()

    def test_full_identity_forbids_column_list(self):
        with pytest.raises(ConfigError, match="FULL"):
            TableConfig("users", columns=["id"], replica_identity="FULL").validate()

    def test_snapshot_tables_must_be_published(self):
        with pytest.raises(ConfigError, match="snapshot tables"):
            _cfg(snapshot_tables=["public.ghost"]).validate()

    def test_heartbeat_must_be_published(self):
        with pytest.raises(ConfigError, match="heartbeat"):
            EngineConfig(tables=[TableConfig("users")]).validate()

    def test_query_condition_blocklist(self):
        with pytest.raises(ConfigError, match="forbidden"):
            TableConfig("users", query_condition="id > 5; DROP TABLE x").validate()
        TableConfig("users", query_condition="deleted_at IS NULL").validate()


class TestPostgresSQL:
    def test_publication_sql(self):
        cfg = _cfg()
        cfg.tables[0].columns = ["id", "name"]
        sql = PG.create_publication_sql(cfg)
        assert "FOR TABLE public.users (id, name), public.cdc_heartbeat" in sql
        assert "publish = 'insert, update, delete, truncate'" in sql

    def test_slot_sql(self):
        assert "pg_create_logical_replication_slot('s1', 'pgoutput')" in PG.create_slot_sql("s1")
        assert "pg_wal_lsn_diff" in PG.slot_status_sql("s1")

    def test_chunk_query_combines_projection_filter_condition(self):
        t = TableConfig("users", columns=["id", "name"], query_condition="deleted_at IS NULL")
        sql = PG.chunk_query(t, "id >= 0 AND id <= 7999", t.query_condition)
        assert sql == (
            "SELECT id, name FROM public.users "
            "WHERE (id >= 0 AND id <= 7999) AND (deleted_at IS NULL)"
        )

    def test_jdbc_options_integer_range(self):
        conn = PG.PostgresConnection("h", 5432, "db", "u", "p")
        plan = plan_integer_range("id", 0, 79999, 8000)
        opts = PG.snapshot_jdbc_options(conn, TableConfig("users"), plan, snapshot_id="SNAP-1")
        assert opts["url"] == "jdbc:postgresql://h:5432/db"
        assert opts["partitionColumn"] == "id"
        assert opts["numPartitions"] == "10"
        assert "SET TRANSACTION SNAPSHOT 'SNAP-1'" in opts["sessionInitStatement"]

    def test_ctid_predicates(self):
        plan = plan_ctid_blocks(relpages=100, reltuples=10_000.0, chunk_size=8000)
        preds = PG.snapshot_predicates(plan)
        assert preds[0].startswith("ctid >= '(0,0)'::tid AND ctid < '(80,0)'")
        assert preds[-1] == "ctid >= '(80,0)'::tid"  # unbounded tail chunk

    def test_poll_changes_sql(self):
        """wal2json polling must PEEK (non-consuming) with wal2json options
        — pgoutput options (proto_version/publication_names) would error on
        a real server, and get_changes would ack before delivery."""
        sql = PG.poll_changes_sql("s1", ["public.users", "public.orders"])
        assert "pg_logical_slot_peek_changes" in sql
        assert "'format-version', '2'" in sql
        assert "'add-tables', 'public.users,public.orders'" in sql
        assert "proto_version" not in sql and "publication_names" not in sql

    def test_advance_slot_sql(self):
        sql = PG.advance_slot_sql("s1", "0/16B3748")
        assert "pg_replication_slot_advance" in sql and "'0/16B3748'::pg_lsn" in sql


class TestMultimodal:
    def test_extract_features_and_dedup(self, spark):
        rows = [
            Row(media_id=1, kind="image", payload=b"imgbytes-a", meta=None),
            Row(media_id=2, kind="image", payload=b"imgbytes-a", meta=None),
            Row(media_id=3, kind="audio", payload=b"au", meta=None),
            Row(media_id=4, kind="video", payload=None, meta=None),
        ]
        from go_pq_cdc_spark.operators.multimodal import MEDIA_SCHEMA

        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        feats = extract_features(df).collect()
        by_id = {r["media_id"]: r for r in feats}
        assert by_id[1]["content_hash"] == by_id[2]["content_hash"]
        assert by_id[1]["n_bytes"] == 10
        assert len(by_id[3]["feature"]) == 8
        assert by_id[4]["n_bytes"] == 0

        dups = media_dedup(extract_features(df)).collect()
        grp = {r["canonical_id"]: r["n_copies"] for r in dups}
        assert grp[1] == 2  # ids 1,2 collapse


def test_snapshot_pin_probe_options():
    """What's-wrong r2 #6: the pin-verification probe must use the SAME
    sessionInitStatement as the real snapshot read and fan out one probe
    row per partition connection."""
    from go_pq_cdc_spark.sources.postgres import (
        PostgresConnection,
        snapshot_pin_probe_options,
    )

    conn = PostgresConnection("h", 5432, "db", "u", "p")
    opts = snapshot_pin_probe_options(conn, "00000003-00000002-1", n_partitions=4)
    assert "SET TRANSACTION SNAPSHOT '00000003-00000002-1'" in opts["sessionInitStatement"]
    assert "pg_current_snapshot()" in opts["dbtable"]
    assert opts["numPartitions"] == "4" and opts["partitionColumn"] == "probe_id"


def test_snapshot_offset_dbtables():
    """OFFSET chunks render as ordered LIMIT/OFFSET dbtable subqueries, and
    must never be passed as WHERE predicates."""
    from go_pq_cdc_spark.snapshot import plan_offset

    plan = plan_offset(20_000, "ctid", chunk_size=8000)
    t = TableConfig("users", columns=["id", "name"], query_condition="id > 0")
    subqs = PG.snapshot_offset_dbtables(t, plan, t.query_condition)
    assert len(subqs) == 3
    assert subqs[0] == (
        "(SELECT id, name FROM public.users WHERE id > 0 "
        "ORDER BY ctid LIMIT 8000 OFFSET 0) AS chunk_0"
    )
    assert subqs[-1].endswith("OFFSET 16000) AS chunk_2")
    with pytest.raises(ValueError, match="not WHERE predicates"):
        PG.snapshot_predicates(plan)
