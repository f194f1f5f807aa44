"""Kafka sink surface (O21 dispatch to the reference's companion sink).

The reference's benchmark pipeline publishes every change event to Kafka
(BASELINE.md workload: go-pq-cdc -> go-pq-cdc-kafka -> RedPanda), keyed so
all events of one row land in one partition — per-key ordering, the same
guarantee the reference's ordered callback gives in-process
(`connector.go` handler contract; stream.go:302-348 delivery order).

Spark-native shape: serialize the change envelope to (key, value) frames
and hand them to the built-in `writeStream.format("kafka")` sink — at
scale the Kafka producer runs per-partition inside the executors, no
driver funnel. The container has no broker, so `to_kafka_frames` (pure
DataFrame transform, JVM-side `to_json`) and the option builder are the
tested seam; `kafka_sink` is the one-line wiring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_kafka_frames(
    df: DataFrame,
    topic: str,
    pk_keys: list[str] | None = None,
) -> DataFrame:
    """Envelope rows -> Kafka (key, value, topic) frames.

    key   = JSON of (schema, table, identity) where identity is the row's
            key image — the before-image for DELETEs (the after side is
            gone), the after-image otherwise, filtered to `pk_keys` when
            given so key bytes stay stable across non-key column updates.
    value = the full envelope as JSON, timestamps as epoch micros (exact,
            engine-portable — no formatted-string drift).

    Same-key events keep WAL order within a Kafka partition; keys embed
    (schema, table) so one topic can carry every published table.
    """
    identity = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    if pk_keys is not None:
        entries = [
            (F.lit(k), F.element_at(identity, k)) for k in pk_keys
        ]
        identity = F.map_from_arrays(
            F.array(*[e[0] for e in entries]), F.array(*[e[1] for e in entries])
        )
    key = F.to_json(
        F.struct(
            F.col("schema").alias("schema"),
            F.col("table").alias("table"),
            identity.alias("identity"),
        )
    )
    value = F.to_json(
        F.struct(
            "op",
            "lsn",
            "xid",
            F.unix_micros(F.col("commit_ts")).alias("commit_ts_us"),
            "schema",
            "table",
            "before",
            "after",
        )
    )
    return df.select(
        key.cast("binary").alias("key"),
        value.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    )


def kafka_sink_options(bootstrap_servers: str, checkpoint_dir: str) -> dict[str, str]:
    """writeStream options for the built-in Kafka sink. Idempotence +
    acks=all on the embedded producer pairs with the idempotent mirror
    merge downstream: at-least-once delivery, effectively-once effect."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "kafka.enable.idempotence": "true",
        "kafka.acks": "all",
        "checkpointLocation": checkpoint_dir,
    }


def kafka_sink(
    stream_df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint_dir: str,
    pk_keys: list[str] | None = None,
):
    """Attach the Kafka publisher to a change stream (needs a broker and
    the spark-sql-kafka package at runtime; serialization above is the
    unit-tested part)."""
    frames = to_kafka_frames(stream_df, topic, pk_keys)
    return (
        frames.writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, checkpoint_dir))
        .start()
    )
