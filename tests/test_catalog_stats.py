"""O14 catalog stats -> plan_auto wiring, O27 heartbeat runner, O34 config
file loading, O33 HTTP status surface."""

from __future__ import annotations

import json
import os
import tempfile
import urllib.request

import pytest

from go_pq_cdc_spark.catalog_stats import (
    count_sql,
    minmax_sql,
    pk_columns_sql,
    plan_from_connection,
    relstats_sql,
    table_stats,
)
from go_pq_cdc_spark.config import ConfigError, EngineConfig, TableConfig
from go_pq_cdc_spark.config_file import load_config
from go_pq_cdc_spark.heartbeat import HeartbeatRunner
from go_pq_cdc_spark.observability import CdcMetricsListener, StatusServer
from go_pq_cdc_spark.snapshot.planner import Strategy

USERS = TableConfig("users")


class FakeCatalog:
    """Answers the catalog SQL like a live server (tables keyed by name)."""

    def __init__(self, pk=None, pk_type=None, minmax=(None, None),
                 relstats=None, count=0):
        self.pk, self.pk_type = pk, pk_type
        self.minmax, self.relstats, self.count = minmax, relstats, count
        self.queries: list[str] = []

    def run_sql(self, sql):
        self.queries.append(sql)
        if "pg_index" in sql:
            return [(self.pk, self.pk_type)] if self.pk else []
        if "MIN(" in sql:
            return [self.minmax]
        if "pg_class" in sql:
            return [self.relstats] if self.relstats else []
        if "COUNT(*)" in sql:
            return [(self.count,)]
        raise AssertionError(f"unexpected SQL: {sql}")


class TestCatalogSql:
    def test_pk_sql_targets_pg_index(self):
        sql = pk_columns_sql(USERS)
        assert "pg_index" in sql and "indisprimary" in sql
        assert "'public.users'::regclass" in sql

    def test_relstats_and_minmax_and_count(self):
        assert "relpages" in relstats_sql(USERS) and "reltuples" in relstats_sql(USERS)
        assert minmax_sql(USERS, "id") == "SELECT MIN(id), MAX(id) FROM public.users"
        assert minmax_sql(USERS, "id", "id > 5").endswith("WHERE id > 5")
        assert count_sql(USERS) == "SELECT COUNT(*) FROM public.users"


class TestStatsToPlan:
    def test_integer_pk_goes_range_and_stops_early(self):
        cat = FakeCatalog(pk="id", pk_type="bigint", minmax=(10, 100009))
        plan = plan_from_connection(cat.run_sql, USERS, chunk_size=8000)
        assert plan.strategy is Strategy.INTEGER_RANGE
        assert plan.chunks[0].range_start == 10
        assert plan.chunks[-1].range_end == 100009
        # lazily resolved: no pg_class/COUNT queries once range is decided
        assert not [q for q in cat.queries if "pg_class" in q or "COUNT" in q]

    def test_text_pk_falls_back_to_ctid(self):
        cat = FakeCatalog(pk="slug", pk_type="text", relstats=(1000, 100000.0))
        plan = plan_from_connection(cat.run_sql, USERS)
        assert plan.strategy is Strategy.CTID_BLOCK
        assert plan.chunks[-1].block_end is None  # unbounded tail

    def test_no_stats_falls_back_to_offset_count(self):
        cat = FakeCatalog(pk=None, relstats=(0, 0.0), count=100_001)
        plan = plan_from_connection(cat.run_sql, USERS)
        assert plan.strategy is Strategy.OFFSET
        assert any("COUNT(*)" in q for q in cat.queries)

    def test_composite_pk_not_treated_as_integer(self):
        class Composite(FakeCatalog):
            def run_sql(self, sql):
                self.queries.append(sql)
                if "pg_index" in sql:
                    return [("a", "integer"), ("b", "integer")]
                if "pg_class" in sql:
                    return [(10, 1000.0)]
                raise AssertionError(sql)

        stats = table_stats(Composite().run_sql, USERS)
        assert stats.integer_pk is None

    def test_empty_table_integer_pk(self):
        """MIN/MAX NULL (empty table) must not plan a range over None."""
        cat = FakeCatalog(pk="id", pk_type="integer", minmax=(None, None),
                          relstats=(0, 0.0), count=0)
        plan = plan_from_connection(cat.run_sql, USERS)
        assert plan.strategy is Strategy.OFFSET  # degenerate -> 1 chunk
        assert len(plan.chunks) == 1


class TestHeartbeatRunner:
    def _cfg(self):
        return EngineConfig(tables=[])

    def test_tick_executes_heartbeat_sql(self):
        ticks = []
        hb = HeartbeatRunner(lambda sql: ticks.append(sql) or [(1,)], self._cfg(),
                             sleep=lambda _s: None)
        hb.tick()
        assert len(ticks) == 1 and "last_heartbeat = NOW()" in ticks[0]

    def test_interval_gate_and_loop(self):
        t = [0.0]
        ran = []
        hb = HeartbeatRunner(
            lambda sql: ran.append(sql) or [(1,)],
            self._cfg(),
            interval_s=10.0,
            sleep=lambda _s: None,
            clock=lambda: t[0],
        )
        assert hb.tick_if_due()       # first tick immediate
        assert not hb.tick_if_due()   # gated
        t[0] = 10.5
        assert hb.tick_if_due()
        assert hb.ticks == 2

    def test_tick_retries_transient(self):
        calls = {"n": 0}

        def run_sql(_sql):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ConnectionError("connection reset")
            return [(1,)]

        hb = HeartbeatRunner(run_sql, self._cfg(), sleep=lambda _s: None)
        hb.tick()
        assert calls["n"] == 2 and hb.ticks == 1


class TestConfigFile:
    def _load(self, text: str, suffix: str):
        with tempfile.NamedTemporaryFile(
            "w", suffix=suffix, delete=False
        ) as f:
            f.write(text)
            path = f.name
        try:
            return load_config(path)
        finally:
            os.unlink(path)

    def test_json_roundtrip(self):
        cfg = self._load(
            json.dumps(
                {
                    "publication_name": "pub",
                    "slot_name": "slot",
                    "chunk_size": 500,
                    "heartbeat_enabled": False,
                    "publish_ops": ["insert", "update"],
                    "tables": [
                        {"name": "users", "columns": ["id", "name"]},
                        {"name": "orders", "query_condition": "amount > 0"},
                    ],
                }
            ),
            ".json",
        )
        assert cfg.publication_name == "pub" and cfg.chunk_size == 500
        assert cfg.publish_ops == ("insert", "update")
        assert [t.qualified for t in cfg.tables] == ["public.users", "public.orders"]

    def test_yaml_roundtrip(self):
        pytest.importorskip("yaml")
        cfg = self._load(
            """
publication_name: pub
slot_name: slot
heartbeat_enabled: false
tables:
  - name: users
    replica_identity: FULL
""",
            ".yaml",
        )
        assert cfg.tables[0].replica_identity == "FULL"

    def test_unknown_key_rejected(self):
        with pytest.raises(ConfigError, match="unknown config keys"):
            self._load('{"slot_nam": "typo"}', ".json")
        with pytest.raises(ConfigError, match="unknown keys"):
            self._load(
                '{"tables": [{"name": "u", "colums": ["id"]}]}', ".json"
            )

    def test_validation_still_applies(self):
        with pytest.raises(ConfigError, match="heartbeat"):
            self._load(
                json.dumps({"tables": [{"name": "users"}]}), ".json"
            )  # heartbeat enabled but not published


class TestStatusServer:
    def test_status_and_metrics_endpoints(self):
        listener = CdcMetricsListener()
        listener.metrics.total_input_rows = 42
        listener.record_confirmed_lsn(105)
        srv = StatusServer(listener).start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/status"
            ) as resp:
                status = json.loads(resp.read())
            assert status["total_input_rows"] == 42
            assert status["confirmed_lsn"] == 105
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics"
            ) as resp:
                text = resp.read().decode()
            assert "go_pq_cdc_spark_total_input_rows 42" in text
            assert "go_pq_cdc_spark_confirmed_lsn 105" in text
            with pytest.raises(urllib.error.HTTPError):
                urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/nope")
        finally:
            srv.stop()

    def test_slot_endpoint(self):
        """/slot mirrors internal/http/server.go:36-60 serving the slot
        struct of pq/slot/slot.go:127-148: confirmed vs current LSN and the
        retained-WAL estimate."""
        listener = CdcMetricsListener()
        listener.record_confirmed_lsn(105)
        listener.record_frontier(250, slot_name="cdc_slot")
        srv = StatusServer(listener).start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/slot"
            ) as resp:
                slot = json.loads(resp.read())
            assert slot["slot_name"] == "cdc_slot"
            assert slot["confirmed_flush_lsn"] == 105
            assert slot["current_lsn"] == 250
            assert slot["retained_wal_bytes"] == 145
            text = listener.prometheus_text()
            assert "go_pq_cdc_spark_current_lsn 250" in text
            assert "go_pq_cdc_spark_retained_wal_bytes 145" in text
        finally:
            srv.stop()

    def test_slot_endpoint_live_from_wal_dir(self, tmp_path):
        """With a wal_dir attached, /slot re-reads the segment-log frontier
        and the consumer-ack file per request — no stale cached values."""
        from go_pq_cdc_spark.sources import lsn_stream

        wal = tmp_path / "wal"
        wal.mkdir()
        open(lsn_stream.segment_path(str(wal), 100, 400), "wb").close()
        (wal / "_confirmed").write_text('{"confirmed_lsn": 150}')

        listener = CdcMetricsListener()
        listener.attach_wal_dir(str(wal), slot_name="cdc_slot")
        slot = listener.get_slot()
        assert slot["slot_name"] == "cdc_slot"
        assert slot["current_lsn"] == 400
        assert slot["confirmed_flush_lsn"] == 150
        assert slot["retained_wal_bytes"] == 250

        # transport advances + consumer acks -> next request sees it
        open(lsn_stream.segment_path(str(wal), 401, 900), "wb").close()
        (wal / "_confirmed").write_text('{"confirmed_lsn": 400}')
        slot = listener.get_slot()
        assert slot["current_lsn"] == 900
        assert slot["confirmed_flush_lsn"] == 400
        assert slot["retained_wal_bytes"] == 500


    def test_slot_active_tracks_stream_liveness(self):
        """ADVICE r4: /slot 'active' mirrors live stream state (started and
        not yet terminated) — not a forever-true cumulative batch count."""
        from types import SimpleNamespace

        listener = CdcMetricsListener()
        assert listener.get_slot()["active"] is False
        listener.onQueryStarted(SimpleNamespace(id="q1"))
        assert listener.get_slot()["active"] is True
        listener.onQueryTerminated(SimpleNamespace(id="q1"))
        assert listener.get_slot()["active"] is False

    def test_debug_endpoints(self):
        """/debug/threads dumps every Python thread's stack (pprof-goroutine
        analogue); /debug/config serves the engine config when provided and
        404s when not."""
        import urllib.error

        from go_pq_cdc_spark.config import EngineConfig

        listener = CdcMetricsListener()
        srv = StatusServer(listener, config=EngineConfig(slot_name="dbg_slot")).start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/debug/threads"
            ) as resp:
                dump = resp.read().decode()
            assert "--- thread" in dump and "MainThread" in dump
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/debug/config"
            ) as resp:
                cfg = json.loads(resp.read())
            assert cfg["slot_name"] == "dbg_slot"
        finally:
            srv.stop()

        bare = StatusServer(CdcMetricsListener()).start()
        try:
            with pytest.raises(urllib.error.HTTPError):
                urllib.request.urlopen(f"http://127.0.0.1:{bare.port}/debug/config")
        finally:
            bare.stop()

    def test_stop_detaches_listener_from_session(self):
        """ADVICE r4: StatusServer.stop() must remove the listener from the
        stream manager — repeated start/stop cycles used to leak one per
        call."""
        from unittest.mock import MagicMock

        listener = CdcMetricsListener()
        fake_spark = MagicMock()
        srv = StatusServer(listener, spark=fake_spark).start()
        srv.stop()
        fake_spark.streams.removeListener.assert_called_once_with(listener)


def test_engine_plan_snapshot_auto_wiring():
    """CdcEngine.plan_snapshot_auto: connection -> catalog stats -> plan,
    honoring the table's query condition and the configured chunk size."""
    from unittest.mock import MagicMock

    from go_pq_cdc_spark.engine import CdcEngine

    cfg = EngineConfig(
        tables=[TableConfig("users", query_condition="id > 0"),
                TableConfig("cdc_heartbeat")],
        chunk_size=1000,
    )
    eng = CdcEngine(cfg, spark=MagicMock())
    cat = FakeCatalog(pk="id", pk_type="bigint", minmax=(1, 5000))
    plan = eng.plan_snapshot_auto(cat.run_sql, cfg.tables[0])
    assert plan.strategy is Strategy.INTEGER_RANGE
    assert len(plan.chunks) == 5
    assert any("WHERE id > 0" in q for q in cat.queries)  # condition pushed
