"""CdcEngine facade test: setup DDL ordering (O28) + parquet-transport
snapshot + plan wiring."""

from __future__ import annotations

from go_pq_cdc_spark.config import EngineConfig, TableConfig
from go_pq_cdc_spark.engine import CdcEngine
from go_pq_cdc_spark.snapshot.planner import Strategy

from .conftest import SF_DIR


def _engine(spark):
    cfg = EngineConfig(
        tables=[
            TableConfig("users", replica_identity="FULL"),
            TableConfig("cdc_heartbeat"),
        ]
    )
    return CdcEngine(cfg, spark)


def test_setup_sql_order(spark):
    eng = _engine(spark)
    stmts = eng.setup_sql()
    joined = "\n".join(stmts)
    # heartbeat table before publication, publication before slot —
    # slot creation pins WAL before any snapshot (connector.go:350-379)
    assert joined.index("CREATE TABLE IF NOT EXISTS") < joined.index("CREATE PUBLICATION")
    assert joined.index("CREATE PUBLICATION") < joined.index(
        "pg_create_logical_replication_slot"
    )
    assert "ALTER TABLE public.users REPLICA IDENTITY FULL" in stmts


def test_snapshot_plan_and_parquet_transport(spark):
    eng = _engine(spark)
    plan = eng.plan_snapshot(eng.config.tables[0], integer_pk="id", min_val=0, max_val=99_999)
    assert plan.strategy is Strategy.INTEGER_RANGE
    assert len(plan.chunks) == 13  # ceil(100000/8000)
    df = eng.snapshot_parquet(f"{SF_DIR}/orders.parquet", ["o_orderkey", "o_totalprice"])
    assert df.columns == ["o_orderkey", "o_totalprice"]
    assert df.count() > 0


def test_snapshot_only_resume(spark, tmp_path):
    from go_pq_cdc_spark.engine import snapshot_only

    out = str(tmp_path / "snap")
    df = _engine(spark).snapshot_parquet(f"{SF_DIR}/region.parquet")
    assert snapshot_only(df, out) is True
    # second run resumes: committed output is not rewritten
    assert snapshot_only(df, out) is False
    assert spark.read.parquet(out).count() == df.count()


def test_engine_slot_keeper_and_raw_changes(spark, tmp_path):
    """Facade glue: config -> SlotKeeper (slot name, table filter, heartbeat
    tick) and raw segments -> decoded streaming envelope."""
    import json

    from go_pq_cdc_spark.config import EngineConfig, TableConfig
    from go_pq_cdc_spark.engine import CdcEngine
    from go_pq_cdc_spark.sources.slot_keeper import int_to_lsn

    cfg = EngineConfig(
        slot_name="s_eng",
        tables=[TableConfig("users"), TableConfig("cdc_heartbeat")],
    )
    eng = CdcEngine(cfg, spark)
    wal_dir = str(tmp_path / "wal")

    doc = json.dumps(
        {
            "action": "I",
            "schema": "public",
            "table": "users",
            "timestamp": "2024-01-01 00:00:00",
            "columns": [{"name": "pk", "type": "bigint", "value": "1"}],
        }
    )
    polled = {"rows": [(int_to_lsn(10), 5, doc)]}

    def run_sql(sql):
        if "peek_changes" in sql:
            assert "'add-tables', 'public.users,public.cdc_heartbeat'" in sql
            assert "'s_eng'" in sql
            return polled["rows"]
        return [(1,)]

    k = eng.slot_keeper(run_sql, wal_dir, sleep=lambda _s: None)
    assert "cdc_heartbeat SET last_heartbeat" in k.heartbeat_sql
    assert k.poll_once() == 1 and k.advance_once()

    env = eng.raw_changes(wal_dir)
    q = (
        env.writeStream.outputMode("append")
        .format("memory")
        .queryName("eng_raw")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT op, lsn, xid, after['pk'] pk FROM eng_raw").collect()
        assert [(r["op"], r["lsn"], r["xid"], r["pk"]) for r in rows] == [("I", 10, 5, "1")]
    finally:
        q.stop()
