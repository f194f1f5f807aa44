"""JVM-side decode of the test_decoding contrib plugin's text grammar
(sources/test_decoding.py) — the poll transport's no-extra-extension arm.

Fixture lines mirror PostgreSQL's contrib/test_decoding output verbatim
(include-xids + include-timestamp). No PostgreSQL needed here; the live
round-trip is tests/test_live_postgres.py."""

from __future__ import annotations

import pytest

from go_pq_cdc_spark.sources.test_decoding import decode_test_decoding
from go_pq_cdc_spark.sources.test_decoding import (
    test_decoding_rejects as td_rejects,  # aliased: pytest must not collect it
)

RAW_DDL = "lsn long, xid long, data string"

LINES = [
    (100, 770, "BEGIN 770"),
    (101, 770, "table public.users: INSERT: id[bigint]:1 val[text]:'plain'"),
    (
        102,
        770,
        "table public.users: INSERT: id[bigint]:2 "
        "val[text]:'a ''quoted'' v, with: [brackets] and spaces' "
        "tags[integer[]]:'{1,2,NULL}' n[numeric]:3.14 b[boolean]:true "
        "miss[text]:null",
    ),
    (
        103,
        770,
        "table public.users: UPDATE: old-key: id[bigint]:1 val[text]:'plain' "
        "new-tuple: id[bigint]:1 val[text]:'updated'",
    ),
    (104, 770, "table public.users: UPDATE: id[bigint]:2 val[text]:'no-old'"),
    (105, 770, "table public.users: DELETE: id[bigint]:1 val[text]:'updated'"),
    (106, 770, "COMMIT 770 (at 2026-01-02 03:04:05.123456+00)"),
    (200, 771, "BEGIN 771"),
    (201, 771, "table public.users, public.other: TRUNCATE: (no flags)"),
    (202, 771, "COMMIT 771 (at 2026-01-02 03:04:06+00)"),
    (300, 772, "some unparseable garbage line"),
    (400, 773, "BEGIN 773"),
    (
        401,
        773,
        "table public.users: UPDATE: old-key: id[bigint]:9 new-tuple: "
        "id[bigint]:9 big[text]:unchanged-toast-datum val[text]:'t'",
    ),
    (402, 773, "COMMIT 773 (at 2026-01-02 03:04:07+00)"),
]


@pytest.fixture()
def env(spark):
    raw = spark.createDataFrame(LINES, RAW_DDL)
    return decode_test_decoding(raw).orderBy("lsn").collect()


def test_ops_tables_and_commit_ts(spark, env):
    assert [(r["op"], r["lsn"], r["xid"]) for r in env] == [
        ("I", 101, 770), ("I", 102, 770), ("U", 103, 770), ("U", 104, 770),
        ("D", 105, 770), ("T", 201, 771), ("T", 201, 771), ("U", 401, 773),
    ]
    assert all(r["schema"] == "public" for r in env)
    # TRUNCATE names two relations -> one op='T' row per table
    assert sorted(r["table"] for r in env if r["op"] == "T") == [
        "other", "users",
    ]
    # COMMIT's timestamp lands on every row of the transaction
    ts = {r["commit_ts"].isoformat() for r in env if r["xid"] == 770}
    assert ts == {"2026-01-02T03:04:05.123456"}


def test_tuple_grammar_quoted_arrays_null(spark, env):
    r = [x for x in env if x["lsn"] == 102][0]
    assert r["after"]["val"] == "a 'quoted' v, with: [brackets] and spaces"
    assert r["after"]["tags"] == "{1,2,NULL}"  # array type integer[] parses
    assert r["after"]["n"] == "3.14" and r["after"]["b"] == "true"
    assert r["after"]["miss"] is None  # bare null -> SQL NULL
    assert r["before"] is None


def test_update_old_new_and_delete_images(spark, env):
    with_old = [x for x in env if x["lsn"] == 103][0]
    assert with_old["before"] == {"id": "1", "val": "plain"}
    assert with_old["after"] == {"id": "1", "val": "updated"}
    no_old = [x for x in env if x["lsn"] == 104][0]
    assert no_old["before"] is None
    assert no_old["after"] == {"id": "2", "val": "no-old"}
    dele = [x for x in env if x["lsn"] == 105][0]
    assert dele["before"] == {"id": "1", "val": "updated"}
    assert dele["after"] is None


def test_unchanged_toast_maps_to_null(spark, env):
    """`unchanged-toast-datum` (tuple tag 'u') -> the envelope's
    NULL-means-unchanged convention toast_fill repairs — same as the
    pgoutput path's UNCHANGED_TOAST sentinel."""
    r = [x for x in env if x["lsn"] == 401][0]
    assert r["after"] == {"id": "9", "big": None, "val": "t"}
    assert r["before"] == {"id": "9"}


def test_rejects_disjoint_and_table_filter(spark):
    raw = spark.createDataFrame(LINES, RAW_DDL)
    bad = td_rejects(raw).collect()
    assert [r["lsn"] for r in bad] == [300]
    # every input row is exactly one of: marker, DML envelope, reject
    n_env = decode_test_decoding(raw).count()
    n_markers = sum(
        1 for _l, _x, d in LINES if d.startswith(("BEGIN", "COMMIT"))
    )
    # the multi-table TRUNCATE fans out to 2 rows from 1 input line
    assert n_env == len(LINES) - n_markers - len(bad) + 1
    only = decode_test_decoding(raw, tables=["public.other"]).collect()
    assert [(r["op"], r["table"]) for r in only] == [("T", "other")]


def test_poll_sql_plugin_arms():
    from go_pq_cdc_spark.sources.postgres import poll_changes_sql

    td = poll_changes_sql("s1", ["public.users"], plugin="test_decoding")
    assert "pg_logical_slot_peek_changes" in td
    assert "include-xids" in td and "include-timestamp" in td
    assert "add-tables" not in td  # test_decoding has no table filter
    w2j = poll_changes_sql("s1", ["public.users"])
    assert "format-version" in w2j and "add-tables" in w2j
    with pytest.raises(ValueError, match="unknown poll plugin"):
        poll_changes_sql("s1", plugin="bogus")


def test_update_old_value_containing_new_tuple_literal(spark):
    """r9: the UPDATE old/new split is an ATOMIC pair-run match, so a
    quoted OLD value containing the literal ` new-tuple: ` no longer
    mis-splits (the r8 documented caveat, now closed). Malformed lines
    still take the first-delimiter fallback rather than dropping."""
    from pyspark.sql import Row

    from go_pq_cdc_spark.sources.test_decoding import decode_test_decoding

    rows = [
        Row(lsn=1, xid=1, data=(
            "table public.users: UPDATE: old-key: id[bigint]:1 "
            "val[text]:'x new-tuple: y' new-tuple: id[bigint]:1 "
            "val[text]:'clean'"
        )),
        Row(lsn=2, xid=1, data=(
            "table public.users: UPDATE: old-key: id[bigint]:2 "
            "val[text]:'a ''quote'' and new-tuple: trap' "
            "new-tuple: id[bigint]:2 val[text]:'b'"
        )),
        Row(lsn=3, xid=1, data="COMMIT 1 (at 2024-01-01 00:00:00.000000+00)"),
    ]
    env = {
        r["lsn"]: r
        for r in decode_test_decoding(spark.createDataFrame(rows)).collect()
    }
    assert env[1]["before"] == {"id": "1", "val": "x new-tuple: y"}
    assert env[1]["after"] == {"id": "1", "val": "clean"}
    assert env[2]["before"] == {"id": "2", "val": "a 'quote' and new-tuple: trap"}
    assert env[2]["after"] == {"id": "2", "val": "b"}
