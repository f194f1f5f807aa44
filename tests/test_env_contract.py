"""Environment-drift guard (VERDICT r3 item 9).

One obvious failure instead of 24 mysterious ones when the Spark runtime
shifts under us: assert the session factory's assumptions actually hold in
the *running* Spark — events loads with a usable timestamp column, the
session timezone is pinned, Arrow is on, and the ts values agree with
DuckDB's read of the same parquet to the microsecond.
"""

from __future__ import annotations

import datetime

import duckdb

from go_pq_cdc_spark.catalog import TABLES, load_table, table_path
from tests.conftest import SF_DIR


def test_session_confs_hold(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_all_tables_load(spark):
    for name in TABLES:
        df = load_table(spark, SF_DIR, name)
        assert len(df.columns) > 0, name


def test_events_ts_is_session_timestamp(spark):
    """events.ts must come out of the catalog as plain TIMESTAMP (session-tz,
    micros) regardless of how this Spark version loads parquet
    TIMESTAMP(NANOS) — bigint under Spark 3 + nanosAsLong, TIMESTAMP_NTZ
    natively under Spark 4 (the legacy flag was removed there)."""
    ev = load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # and it must be computable: a filter + window-ish expression analyzes
    row = ev.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    assert isinstance(row["lo"], datetime.datetime)
    assert row["lo"] <= row["hi"]


def test_events_ts_matches_duckdb_to_the_microsecond(spark):
    """Value parity with the oracle's CAST(ts AS TIMESTAMP) — the exact
    comparison the driver's value-hash performs on every events-backed
    query."""
    ev = load_table(spark, SF_DIR, "events")
    got = {
        r["event_id"]: r["ts"]
        for r in ev.select("event_id", "ts").orderBy("event_id").limit(50).collect()
    }
    con = duckdb.connect()
    try:
        want = dict(
            con.execute(
                "SELECT event_id, CAST(ts AS TIMESTAMP) FROM "
                f"read_parquet('{table_path(SF_DIR, 'events')}') "
                "ORDER BY event_id LIMIT 50"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want


def test_raw_events_ts_dtype_is_a_handled_form(spark):
    """The raw parquet read of events.ts must load as one of the two forms
    load_table normalizes: bigint (Spark 3 + nanosAsLong) or a timestamp
    type (Spark 4 native NANOS read). A third form on a future Spark bump
    should fail HERE, loudly, not as 24 downstream analysis errors."""
    raw = spark.read.parquet(table_path(SF_DIR, "events"))
    ts_type = dict(raw.dtypes)["ts"]
    assert ts_type == "bigint" or ts_type.startswith("timestamp"), ts_type
