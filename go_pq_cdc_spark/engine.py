"""User-facing engine facade — the Spark-native equivalent of the
reference's `cdc.NewConnector(ctx, cfg, handler) / connector.Start(ctx)`
(`connector.go:57-142`, SURVEY.md §3).

Where the reference delivers events to a callback, this engine delivers
DataFrames: the snapshot is a partitioned batch read, the change feed is a
Structured Streaming DataFrame, and the 'handler' becomes either normal
DataFrame code over those or a maintained current-state mirror table.

    cfg = EngineConfig(tables=[TableConfig("users"), TableConfig("cdc_heartbeat")])
    eng = CdcEngine(cfg, spark)

    eng.setup_sql()                  # DDL to run against Postgres once
    df  = eng.snapshot_df(...)       # consistent chunk-parallel snapshot
    st  = eng.changes(dir)           # streaming change events
    q   = eng.mirror(st, state, ck)  # maintained queryable mirror
    cur = eng.current_state(state)   # the mirror as a DataFrame

One-call lifecycle (the reference's `connector.Start`):

    eng.replicate(wal_dir, host=..., port=5432, user=..., database=...)
        # transport: START_REPLICATION socket -> envelope segments,
        # reconnect-with-backoff, durable-log resume  (own thread/process)
    lsn, q = eng.start(run_sql, wal_dir, state_dir, ckpt_dir,
                       snapshot_reader=...)
        # DDL -> snapshot seeds the mirror at the handoff LSN ->
        # post-handoff changes stream into the same mirror
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession

from .config import EngineConfig, TableConfig
from .snapshot.planner import SnapshotPlan, plan_auto
from .sources import postgres as pg
from .streaming.changelog_stream import changelog_stream, mirror_sink

_log = logging.getLogger(__name__)


class CdcEngine:
    def __init__(self, config: EngineConfig, spark: SparkSession):
        config.validate()
        self.config = config
        self.spark = spark

    # -- management plane (O25-O27): DDL the operator executes against PG --

    def setup_sql(self) -> list[str]:
        """Ordered setup statements: heartbeat ensure → publication create →
        replica-identity reconciliation → slot create (slot LAST here, but
        BEFORE any snapshot — O28's WAL-pinning order)."""
        if any(op in self.config.publish_ops for op in ("update", "delete")):
            # reference warns on this foot-gun: NOTHING emits no old image,
            # so UPDATE/DELETE events cannot be keyed
            # (replica_identity.go:61-76)
            for t in self.config.tables:
                if t.replica_identity == "NOTHING":
                    _log.warning(
                        "table %s uses REPLICA IDENTITY NOTHING with "
                        "update/delete publication ops; NOTHING suits "
                        "insert-only tables",
                        t.qualified,
                    )
        stmts: list[str] = []
        if self.config.heartbeat_enabled:
            stmts += pg.heartbeat_ensure_sql(self.config)
        stmts.append(pg.create_publication_sql(self.config))
        for t in self.config.tables:
            if t.replica_identity != "DEFAULT":
                stmts.append(pg.replica_identity_sql(t))
        if self.config.slot_create_if_not_exists:
            # slot.Config.CreateIfNotExists (slot/config.go:16): when false
            # the slot must pre-exist (e.g. a takeover deployment) and no
            # create statement is emitted
            stmts.append(
                pg.create_slot_sql(self.config.slot_name, self.config.slot_plugin)
            )
        return stmts

    # -- snapshot plane (O9-O16) -------------------------------------------

    def plan_snapshot(
        self,
        table: TableConfig,
        *,
        integer_pk: str | None = None,
        min_val: int | None = None,
        max_val: int | None = None,
        relpages: int | None = None,
        reltuples: float | None = None,
        total_rows: int | None = None,
    ) -> SnapshotPlan:
        """O13 auto-detection over caller-supplied stats (offline planning
        path; `plan_snapshot_auto` resolves them from a connection)."""
        return plan_auto(
            integer_pk=integer_pk,
            min_val=min_val,
            max_val=max_val,
            relpages=relpages,
            reltuples=reltuples,
            total_rows=total_rows,
            chunk_size=self.config.chunk_size,
        )

    def plan_snapshot_auto(self, run_sql, table: TableConfig) -> SnapshotPlan:
        """O13+O14: resolve PK/MIN-MAX/relpages stats from the server
        catalogs (`catalog_stats`) and auto-detect the chunk strategy —
        `run_sql(sql) -> list[tuple]` is any live connection."""
        from .catalog_stats import plan_from_connection

        return plan_from_connection(
            run_sql,
            table,
            condition=self.config.table_query_condition(table),
            chunk_size=self.config.chunk_size,
        )

    def snapshot_jdbc(
        self,
        conn: pg.PostgresConnection,
        table: TableConfig,
        plan: SnapshotPlan,
        snapshot_id: str | None = None,
    ) -> DataFrame:
        """Chunk-parallel JDBC snapshot read, every partition pinned to one
        exported snapshot. Untestable without a PG server + JDBC jar; the
        parquet transport below exercises the same planner."""
        opts = pg.snapshot_jdbc_options(
            conn, table, plan, snapshot_id, self.config.table_query_condition(table)
        )
        return self.spark.read.format("jdbc").options(**opts).load()

    def snapshot_parquet(self, path: str, columns: list[str] | None = None) -> DataFrame:
        """Parquet-transport snapshot (test harness / lakehouse re-read)."""
        df = self.spark.read.parquet(path)
        return df.select(*columns) if columns else df

    # -- streaming plane (O1-O8, O17-O21) ----------------------------------

    def changes(self, transport_dir: str) -> DataFrame:
        """Change-event stream from the file/Kafka transport directory."""
        return changelog_stream(self.spark, transport_dir)

    def slot_keeper(self, run_sql, wal_dir: str, **kw):
        """The production transport loop for this config: polls the slot
        with the config's text plugin (wal2json, or test_decoding on
        builds without it), ships durable WAL segments to `wal_dir`, advances
        `confirmed_flush_lsn`, heartbeats when idle (the reference's
        replication goroutine, `connector.Start` -> stream.go loop)."""
        from .sources.postgres import heartbeat_tick_sql
        from .sources.slot_keeper import SlotKeeper

        hb = heartbeat_tick_sql(self.config) if self.config.heartbeat_enabled else None
        kw.setdefault("keepalive_interval_s", self.config.heartbeat_interval_s)
        if self.config.slot_plugin in ("wal2json", "test_decoding"):
            # match the plugin the config's slot was created with; pgoutput
            # is socket-only, so the keeper keeps its wal2json default
            kw.setdefault("plugin", self.config.slot_plugin)
        return SlotKeeper(
            run_sql,
            wal_dir,
            self.config.slot_name,
            tables=[t.qualified for t in self.config.tables] or None,
            heartbeat_sql=hb,
            **kw,
        )

    def heartbeat_runner(self, run_sql, **kw):
        """Standalone heartbeat ticker at the configured interval
        (HeartbeatConfig.Interval, config.go:48-51)."""
        from .heartbeat import HeartbeatRunner

        kw.setdefault("interval_s", self.config.heartbeat_interval_s)
        return HeartbeatRunner(run_sql, self.config, **kw)

    def capture_slot(self, run_sql, timeout_s: float | None = None, **kw):
        """Passive-takeover wait at the configured slot-activity-checker
        interval (slot/config.go:11; connector.go:631-652). `run_sql` is any
        live connection; its `slot_status_sql` row is adapted to the status
        dict `capture_slot` polls. A missing slot returns inactive (the
        passive instance may start before the slot exists)."""
        kw.setdefault("poll_interval_s", self.config.slot_activity_checker_interval_s)
        sql = pg.slot_status_sql(self.config.slot_name)
        cols = (
            "slot_name", "active", "restart_lsn", "confirmed_flush_lsn",
            "current_lsn", "lag_bytes", "retained_wal_bytes",
        )

        def status_fn() -> dict:
            rows = run_sql(sql)
            if not rows:
                return {"active": False}
            return dict(zip(cols, rows[0]))

        return pg.capture_slot(status_fn, timeout_s=timeout_s, **kw)

    def hypertable_mapper(self, run_sql, **kw):
        """Chunk→hypertable remapper, only when the TimescaleDB extension
        support is enabled (ExtensionSupport.EnableTimeScaleDB,
        config.go:44-46) — returns None otherwise, as the reference skips
        hypertable sync entirely without the flag."""
        if not self.config.enable_timescaledb:
            return None
        from .operators.timescale import HypertableMapper

        return HypertableMapper(self.spark, run_sql, **kw)

    def replicate(
        self,
        wal_dir: str,
        *,
        host: str,
        port: int,
        user: str,
        database: str,
        password: str | None = None,
        **kw,
    ) -> int:
        """The socket transport loop for this config: START_REPLICATION on
        the slot over a raw socket, pump pgoutput frames into commit-aligned
        envelope segments under `wal_dir`, ack via standby-status. Blocks
        until the server ends the stream; transient drops redial with
        backoff (connector.go:446-559) and resume from the durable segment
        log. Pair with `envelope_changes(wal_dir)`."""
        from .sources.slot_keeper import run_replication_resilient

        return run_replication_resilient(
            host,
            port,
            user,
            database,
            self.config.slot_name,
            [self.config.publication_name],
            wal_dir,
            password=password,
            **kw,
        )

    def envelope_changes(self, wal_dir: str) -> DataFrame:
        """Streaming change envelope from socket-transport segments (already
        decoded driver-side by the pgoutput pump — no JVM decode step)."""
        from .sources import lsn_stream

        lsn_stream.register(self.spark)
        return (
            self.spark.readStream.format("pq_cdc_wal")
            .option("path", wal_dir)
            .option("envelope", "true")
            .load()
        )

    def raw_changes(self, wal_dir: str, plugin: str | None = None) -> DataFrame:
        """Streaming change envelope from slot-keeper segments: raw
        (lsn, xid, data) rows decoded JVM-side — wal2json `from_json`
        (production) or the test_decoding text grammar (contrib fallback,
        present in every PostgreSQL build; see sources/test_decoding.py).

        `plugin` defaults to `config.slot_plugin` so the decode arm ALWAYS
        matches the plugin the slot was created with: a wal2json decode
        over test_decoding text lines has its `from_json` action filter
        drop every row — a silently empty change stream, the data-loss
        class the rejects accessors exist to prevent (r8 advisor).
        pgoutput is socket-framed, not poll-segment text — use
        `envelope_changes` for that transport."""
        from .sources import lsn_stream

        if plugin is None:
            plugin = self.config.slot_plugin
        if plugin == "pgoutput":
            raise ValueError(
                "slot_plugin='pgoutput' is the socket transport (binary "
                "COPY-BOTH frames, no text poll segments) — use "
                "envelope_changes(wal_dir) instead of raw_changes"
            )
        lsn_stream.register(self.spark)
        raw = (
            self.spark.readStream.format("pq_cdc_wal")
            .option("path", wal_dir)
            .option("raw", "true")
            .load()
        )
        if plugin == "wal2json":
            from .sources.wal2json import decode_wal2json

            return decode_wal2json(raw)
        if plugin == "test_decoding":
            from .sources.test_decoding import decode_test_decoding

            return decode_test_decoding(raw)
        raise ValueError(f"unknown poll plugin {plugin!r}")

    def mirror(
        self,
        stream_df: DataFrame,
        state_dir: str,
        checkpoint_dir: str,
        n_buckets: int | None = None,
        keep_epochs: int | None = None,
        claim_backend=None,
        merge_mode: str = "cow",
        compact_deltas: int = 8,
    ):
        """Maintain a queryable current-state mirror (M3 apply idiom).
        `n_buckets` sizes a fresh mirror (buckets ~ state_size /
        target_rewrite_size, `suggest_mirror_buckets`); existing mirrors
        keep their manifest-pinned count. `keep_epochs` > 1 retains epoch
        snapshots for `state_as_of` time travel (None keeps the mirror's
        pinned policy). `claim_backend` selects the mirror's coordination
        medium (lock/manifest/snapshots — `snapshot.claim_backend`);
        default POSIX, pass an ObjectStoreBackend for S3/GCS state
        dirs. `merge_mode="delta"` is the state≫batch production arm:
        micro-batches append per-epoch delta files (write ∝ batch, not
        mirror size) and reads fold base+deltas; a bucket compacts when
        its pending delta count reaches `compact_deltas` (see
        merge_mirror_batch)."""
        from .snapshot.claim_backend import DEFAULT_BACKEND

        return mirror_sink(
            stream_df, state_dir, checkpoint_dir, n_buckets=n_buckets,
            keep_epochs=keep_epochs,
            backend=claim_backend or DEFAULT_BACKEND,
            merge_mode=merge_mode, compact_deltas=compact_deltas,
        )

    def typed_mirror(
        self,
        changes: DataFrame,
        state_dir: str,
        checkpoint_dir: str,
        table: str,
        value_schema: str,
        pk_col: str = "pk",
        n_buckets: int | None = None,
        claim_backend=None,
    ):
        """Whole-row TYPED mirror straight from the change envelope — the
        reference's sink contract (typed full-row events applied in commit
        order; connector.go sink dispatch + tuple/data.go decode) end to
        end. `changes` is either transport's envelope stream
        (`raw_changes` wal2json decode or the socket/pgoutput envelope
        reader): filter to `table`, type the after-image string map with
        `envelope.typed_projection` (the pk comes from the BEFORE image
        for DELETEs — replica identity), and maintain the full row in the
        bucketed mirror with per-column TOAST repair (a column absent
        from an update's after map types to NULL and inherits the stored
        value)."""
        from .streaming.changelog_stream import mirror_sink as _sink

        from .snapshot.claim_backend import DEFAULT_BACKEND

        flat, value_cols = self._typed_flat(changes, table, value_schema, pk_col)
        return _sink(
            flat, state_dir, checkpoint_dir, n_buckets=n_buckets,
            value_cols=value_cols, backend=claim_backend or DEFAULT_BACKEND,
        )

    def _typed_flat(self, changes, table: str, value_schema: str, pk_col: str):
        """Envelope -> typed flat change rows for one table: filter, type
        the after image per the declared DDL (pk from the before image for
        DELETEs), project to the mirror's (op, lsn, xid, commit_ts, pk,
        *values) shape. Pure DataFrame transforms — works identically on a
        stream and on a foreachBatch micro-batch."""
        from pyspark.sql import functions as F

        from .envelope import typed_projection

        # DDL-aware parse — a naive split(',') would shred types that
        # contain commas (decimal(10,2), map<...>, struct<...>)
        value_cols = tuple(
            f.name for f in self.spark.createDataFrame([], value_schema).schema.fields
        )
        sch, _, tbl = table.rpartition(".")
        env = changes.filter(
            (F.col("schema") == (sch or "public")) & (F.col("table") == tbl)
        ).withColumn(
            "_img", F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
        )
        pk_struct = self.spark.createDataFrame([], f"{pk_col} bigint").schema
        val_struct = self.spark.createDataFrame([], value_schema).schema
        typed = typed_projection(
            typed_projection(env, "_img", pk_struct), "after", val_struct
        )
        flat = typed.select(
            "op",
            "lsn",
            # commit-rewritten envelopes carry the intra-transaction order
            # key — keep it so the mirror merge orders same-commit events
            *(["txn_seq"] if "txn_seq" in typed.columns else []),
            "xid",
            "commit_ts",
            F.col(pk_col).alias("pk"),
            *value_cols,
        )
        return flat, value_cols

    def _evolved_value_schema(
        self, wal_dir: str, table: str, declared_ddl: str
    ) -> tuple[str, tuple[str, ...]]:
        """(evolved DDL, dropped column names) from the pump's Relation
        sidecar — the transport-level schema authority (relation.go:11-19,
        refreshed on every Relation re-send):

        * sidecar-only columns APPEND in relation order (ADD COLUMN);
        * a declared column whose sidecar type differs WIDENS in place
          when the pair is a safe parquet read-promotion
          (`streaming.changelog_stream.widened_type` — ALTER COLUMN TYPE
          int4->int8 etc.); a non-widenable change raises (rebuild);
        * a declared column ABSENT from the sidecar is DROPPED only when
          the sidecar's provenance (`seen` — the union of every column
          name any Relation message ever carried) shows the live table
          previously HAD it; it keeps its slot in the DDL (the mirror
          masks it dead from this epoch; see merge_mirror_batch
          dropped_cols) and is returned in the drop list. A declared
          column the live schema has NEVER shipped (declaration leading
          the actual PG DDL, or a sidecar written by an older Relation
          message) is NOT a drop — masking it would physically NULL its
          carried-forward values in every bucket rewritten meanwhile and
          force a rebuild when the column finally appears (ADVICE r9);
          it simply passes through until a Relation message mentions it.

        Columns named like the flat envelope's own (op/lsn/pk/...) are
        skipped — they cannot be value columns of the mirror row."""
        from .envelope import pg_type_to_spark
        from .sources.slot_keeper import read_relation_sidecar
        from .streaming.changelog_stream import widened_type

        sidecar = read_relation_sidecar(wal_dir, table)
        if not sidecar or not sidecar["columns"]:
            return declared_ddl, ()
        rel_cols = [(c, t) for c, t in sidecar["columns"]]
        ever_seen = set(sidecar["seen"])
        declared = [
            (f.name, f.dataType.simpleString())
            for f in self.spark.createDataFrame([], declared_ddl).schema.fields
        ]
        rel_types = {n: pg_type_to_spark(t).simpleString() for n, t in rel_cols}
        out: list[tuple[str, str]] = []
        dropped: list[str] = []
        for n, t in declared:
            if n not in rel_types:
                if n in ever_seen:
                    dropped.append(n)
                out.append((n, t))  # keeps its slot; the merge masks it
                continue
            rt = rel_types[n]
            if rt == t:
                out.append((n, t))
                continue
            w = widened_type(t, rt)
            if w is None:
                raise ValueError(
                    f"column {table}.{n} changed type {t} -> {rt}, which "
                    "is not a safe parquet widening — the mirror requires "
                    "a rebuild"
                )
            out.append((n, w))
        have = {n for n, _t in declared} | {
            "op", "lsn", "txn_seq", "xid", "commit_ts", "pk", "pb",
        }
        out += [
            (n, pg_type_to_spark(t).simpleString())
            for n, t in rel_cols
            if n not in have
        ]
        return ", ".join(f"{n} {t}" for n, t in out), tuple(dropped)

    def typed_multi_mirror(
        self,
        changes: DataFrame,
        state_root: str,
        checkpoint_dir: str,
        tables: dict[str, str],
        pk_col: str = "pk",
        n_buckets: int | None = None,
        evolve_schema: bool = False,
        wal_dir: str | None = None,
        claim_backend=None,
    ):
        """O17 typed fan-out: ONE slot's envelope stream feeds every
        published table's whole-row mirror (the reference runs one
        replication stream and dispatches per table — connector.go sink
        dispatch). `tables` maps qualified name -> value-column DDL; each
        micro-batch is split per table (driver-side control flow only —
        tables are few, rows are many), typed per that table's schema, and
        merged into `<state_root>/<schema>__<table>` with per-column TOAST
        repair.

        `evolve_schema=True` (requires `wal_dir`, the directory the
        socket pump fills) makes EACH table's mirror follow mid-stream
        DDL independently through the pump's per-table Relation sidecar —
        same contract as `start(evolve_schema=True)`: supersets widen the
        manifest pin, pre-DDL rows read NULL for new columns."""
        import os as _os

        from .snapshot.claim_backend import DEFAULT_BACKEND
        from .streaming.changelog_stream import merge_mirror_batch

        if evolve_schema and wal_dir is None:
            raise ValueError("evolve_schema=True requires wal_dir=")
        backend = claim_backend or DEFAULT_BACKEND

        def apply(batch_df, _spark_epoch: int) -> None:
            for table, vschema in tables.items():
                dropped = None
                if evolve_schema:
                    vschema, dropped = self._evolved_value_schema(
                        wal_dir, table, vschema
                    )
                flat, value_cols = self._typed_flat(batch_df, table, vschema, pk_col)
                # epoch=None: each mirror numbers epochs from its own
                # manifest counter — Spark's batch id collides with any
                # epoch a seed already wrote (see mirror_sink)
                merge_mirror_batch(
                    flat,
                    _os.path.join(state_root, table.replace(".", "__")),
                    epoch=None,
                    n_buckets=n_buckets,
                    value_cols=value_cols,
                    evolve_schema=evolve_schema,
                    backend=backend,
                    dropped_cols=dropped,
                )

        return (
            changes.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(apply)
            .start()
        )

    # -- lifecycle orchestration (connector.Start, SURVEY §3.1-3.3) --------

    def start(
        self,
        run_sql,
        wal_dir: str,
        state_dir: str,
        checkpoint_dir: str,
        snapshot_reader=None,
        mirror_buckets: int | None = None,
        value_schema: str = "after_val double",
        transport: str = "flat",
        table: str | None = None,
        keep_epochs: int | None = None,
        chunk_planner=None,
        chunk_reader=None,
        claim_ttl_s: float = 300.0,
        drain_timeout_s: float = 600.0,
        heartbeat_every_s: float | None = None,
        claim_backend=None,
        merge_lock_ttl_s: float | None = None,
        evolve_schema: bool = False,
        merge_mode: str = "cow",
        compact_deltas: int = 8,
        view_state_dir: str | None = None,
        view_groups: int = 8,
        view_value_col: str = "after_val",
        view_minmax: bool = False,
        maintain_every: int | None = None,
        maintain_min_deltas: int = 4,
        maintain_auto_rebucket: bool = False,
        on_maintenance=None,
    ):
        """The reference's `connector.Start(ctx)` in one call
        (connector.go:57-142 sequencing; SURVEY §3.1-3.3):

        1. management DDL via `run_sql` — heartbeat, publication, replica
           identities, slot LAST-but-before-snapshot, so the slot pins WAL
           from before any snapshot row is read (O28 ordering)
        2. record the snapshot LSN (`pg_current_wal_lsn`) with the slot in
           place — the handoff watermark
        3. `initial` / `snapshot_only`: bulk-load each captured table
           (`snapshot_reader(table) -> DataFrame` with (pk, after_val),
           e.g. a `snapshot_jdbc`/`snapshot_parquet` read) into the
           bucketed mirror as op='R' rows at the snapshot LSN
        4. `snapshot_only`: done. `initial`/`never`: start the changelog
           stream from `wal_dir`, dropping events at or below the snapshot
           LSN (O28 — no gap, no duplicate) and merging into the mirror.

        The transport runs separately (`slot_keeper` / `replicate` fill
        `wal_dir` with segments); this sequences control plane + data
        plane. Returns (snapshot_lsn, streaming_query_or_None).

        `value_schema` is the captured table's VALUE-column DDL (default
        the single after_val column): the snapshot reader must produce
        those columns, WAL segments must carry them, and the mirror
        stores the whole row with per-column TOAST repair (reference
        parity: sinks receive full-row images).

        `transport` selects the stream format in `wal_dir`:
          - "flat": pre-flattened typed segments (op/lsn/.../pk/values) —
            the test-harness and lakehouse-replay shape;
          - "envelope": the socket/pgoutput pump's envelope segments
            (string-map before/after images) typed per `value_schema`;
          - "wal2json": the slot keeper's raw (lsn, xid, json) segments,
            decoded JVM-side then typed the same way;
          - "test_decoding": the keeper's raw segments under the contrib
            text plugin (every PG build ships it), decoded JVM-side by
            sources/test_decoding.py — the no-extra-extension poll arm.
        All but the first need `table` (qualified name) and run the FULL
        reference lifecycle on the real transport: snapshot seeds typed
        rows, post-handoff envelope events are typed and merged with
        per-column TOAST repair.

        `chunk_planner` (tcfg -> chunk dicts, e.g.
        `chunk_queue.manifest_from_plan(plan_auto(...))`) switches the
        seed to PER-CHUNK COOPERATIVE mode (O23 at the reference's
        worker-queue granularity): N apps started against the same
        state_dir split each table's chunks through the shared claim
        queue; `chunk_reader(tcfg, chunk) -> DataFrame` (REQUIRED with
        chunk_planner — snapshot_reader's whole-table contract cannot
        substitute) reads one chunk. The first app publishes the
        snapshot LSN; every app adopts it. `claim_ttl_s` /
        `drain_timeout_s` / `heartbeat_every_s` tune the queue: a chunk
        claim goes stale (reclaimable by a peer) after `claim_ttl_s`
        without a heartbeat; a background heartbeat refreshes every
        `heartbeat_every_s` while a chunk processes (default
        claim_ttl_s/4, so a long chunk read is never reclaimed
        mid-processing); `drain_timeout_s` bounds IDLE time — no chunk
        completing anywhere — not total drain wall-clock. `claim_backend`
        selects the queue's atomic-marker medium
        (`snapshot.claim_backend.ClaimBackend`): default POSIX hard-link
        claims for filesystem/NFS state dirs; pass an
        `ObjectStoreBackend` when state_dir is S3/GCS, where claims ride
        conditional PUTs (If-None-Match / If-Match) instead of links.
        `merge_lock_ttl_s` tunes the cross-process mirror merge lock's
        staleness window for the cooperative seed: a SIGKILLed peer that
        died holding the lock is taken over after this long (default the
        merge lock's own 300s; size it to a few times the longest single
        chunk merge, like claim_ttl_s for claims).

        `evolve_schema=True` (envelope transport only) lets the typed
        mirror follow mid-stream DDL: the pump persists every pgoutput
        Relation (re-)send's column list to `wal_dir/_schema/`, each
        micro-batch types against the declared DDL widened with any new
        sidecar columns, and the mirror merge widens its manifest pin
        (reference parity: sinks receive a Relation re-send's new columns
        immediately — relation.go:11-19). Rows not touched since the DDL
        read NULL for the new column: logical decoding does not ship
        DEFAULT backfills, so NULL is the honest CDC answer until the row
        is next written.

        `merge_mode="delta"` applies the mirror's merge-on-read arm to
        the STREAM's micro-batch merges (write ∝ batch instead of
        touched-bucket state; per-bucket compaction at `compact_deltas`
        pending files — see merge_mirror_batch). The snapshot seed is
        always a full base write regardless: it IS the base the deltas
        fold over.

        `view_state_dir` co-maintains an incremental aggregate view
        (per-group live-key count / exact sum, optionally min/max with
        `view_minmax=True`) alongside the mirror from the same
        micro-batches (`streaming.agg_view_stream`): the mirror supplies
        before images (no REPLICA IDENTITY FULL needed), the seeded
        mirror initializes view version 0, and min/max dirty-repair
        reads the post-merge mirror. `view_value_col` picks the numeric
        value column the view aggregates.

        `maintain_every=N` (opt-in) runs the mirror maintenance policy
        every N micro-batches: compact delta debt past
        `maintain_min_deltas`, surface (or with
        `maintain_auto_rebucket=True`, execute) a rebucket
        recommendation; the report goes to `on_maintenance` (wire
        `observability.CdcMetricsListener.record_mirror` for /status).
        See `streaming.changelog_stream.run_mirror_maintenance`."""
        from pyspark.sql import functions as F

        from .snapshot.claim_backend import DEFAULT_BACKEND
        from .sources.slot_keeper import lsn_to_int
        from .streaming.changelog_stream import merge_mirror_batch

        mirror_backend = claim_backend or DEFAULT_BACKEND
        if evolve_schema and transport != "envelope":
            # fail BEFORE any snapshot work: the text-plugin transports
            # carry no Relation messages, so there is no typed schema
            # authority to evolve from
            raise ValueError(
                "evolve_schema=True requires transport='envelope' (the "
                "pgoutput Relation sidecar is the schema authority)"
            )
        # DDL-aware parse (see _typed_flat: split(',') breaks decimal/map)
        value_cols = tuple(
            f.name for f in self.spark.createDataFrame([], value_schema).schema.fields
        )
        for stmt in self.setup_sql():
            run_sql(stmt)
        (row,) = run_sql(pg.current_wal_lsn_sql())
        snapshot_lsn = lsn_to_int(row[0])

        if self.config.snapshot_mode in ("initial", "snapshot_only"):
            if chunk_planner is not None:
                # O23 at CHUNK granularity (the reference's SKIP-LOCKED
                # worker queue, worker.go:421-484): N apps share ONE
                # table's chunks through the claim queue instead of one
                # app owning the whole seed.
                if chunk_reader is None:
                    # snapshot_reader is NOT a substitute: its contract is
                    # one whole-table read — calling it per chunk would
                    # re-merge the full table once per chunk (or TypeError
                    # on the documented 1-arg signature)
                    raise ValueError("chunk_planner= requires chunk_reader=")
                snapshot_lsn = self._cooperative_seed(
                    chunk_planner,
                    chunk_reader,
                    state_dir,
                    snapshot_lsn,
                    value_cols,
                    mirror_buckets,
                    keep_epochs,
                    claim_ttl_s=claim_ttl_s,
                    drain_timeout_s=drain_timeout_s,
                    heartbeat_every_s=heartbeat_every_s,
                    claim_backend=claim_backend,
                    merge_lock_ttl_s=merge_lock_ttl_s,
                )
                if self.config.snapshot_mode == "snapshot_only":
                    return snapshot_lsn, None
                return self._start_stream(
                    wal_dir, state_dir, checkpoint_dir, snapshot_lsn,
                    mirror_buckets, value_schema, value_cols, transport,
                    table, keep_epochs, evolve_schema, backend=mirror_backend,
                    merge_mode=merge_mode, compact_deltas=compact_deltas,
                    view_state_dir=view_state_dir, view_groups=view_groups,
                    view_value_col=view_value_col, view_minmax=view_minmax,
                    maintain_every=maintain_every,
                    maintain_min_deltas=maintain_min_deltas,
                    maintain_auto_rebucket=maintain_auto_rebucket,
                    on_maintenance=on_maintenance,
                )
            if snapshot_reader is None:
                raise ValueError(
                    f"snapshot_mode={self.config.snapshot_mode!r} needs a snapshot_reader"
                )
            # Snapshot-job doc (connector.go:406-444 pseudo-slot resume +
            # worker.go claim queue at app granularity): a completed seed is
            # SKIPPED on restart; `resnapshot=True` clears the marker so
            # everything reprocesses (config.go:328, force_resnapshot
            # integration tests); a live peer app holding the claim means
            # the seed is theirs — we proceed to streaming either way.
            from .snapshot import job_claim

            if self.config.resnapshot:
                job_claim.reset(state_dir)
            while True:
                claim = job_claim.acquire(state_dir)
                if claim.acquired:
                    wanted = set(
                        self.config.snapshot_tables
                        or [t.qualified for t in self.config.tables]
                    )
                    for tcfg in self.config.tables:
                        if tcfg.qualified not in wanted:
                            continue
                        rows = snapshot_reader(tcfg).select(
                            "pk",
                            F.lit(snapshot_lsn).cast("long").alias("lsn"),
                            F.lit("R").alias("op"),
                            *value_cols,
                        )
                        merge_mirror_batch(
                            rows,
                            state_dir,
                            n_buckets=mirror_buckets,
                            value_cols=value_cols,
                            # the seed merge is often the mirror's FIRST
                            # write — it must pin the caller's retention,
                            # or snapshot_only mode silently keeps 1
                            keep_epochs=keep_epochs,
                            backend=mirror_backend,
                        )
                    # Persist the seam: a later restart must anchor its
                    # stream filter HERE, not at a fresh wal_lsn read —
                    # re-reading the watermark after skipping the seed
                    # would silently drop every event that landed while
                    # the app was down.
                    claim.mark_completed(info={"snapshot_lsn": snapshot_lsn})
                    break
                if job_claim.is_completed(state_dir):
                    stored = job_claim.completed_info(state_dir).get("snapshot_lsn")
                    # Legacy marker without an LSN: replay the whole WAL
                    # dir — safe (idempotent max-LSN-wins merge; seeded
                    # rows sit at the original snapshot LSN and win over
                    # older replayed events), unlike any guess that could
                    # skip events.
                    snapshot_lsn = int(stored) if stored is not None else 0
                    break
                # a live peer is seeding this state_dir: streaming now
                # would read a half-seeded mirror AND anchor at the wrong
                # LSN — wait for its completion marker (or its crash,
                # after which acquire() takes over via the TTL arm)
                if job_claim.wait_completed(state_dir):
                    continue  # completed: loop reads the stored LSN
        if self.config.snapshot_mode == "snapshot_only":
            return snapshot_lsn, None
        return self._start_stream(
            wal_dir, state_dir, checkpoint_dir, snapshot_lsn, mirror_buckets,
            value_schema, value_cols, transport, table, keep_epochs,
            evolve_schema, backend=mirror_backend, merge_mode=merge_mode,
            compact_deltas=compact_deltas,
            view_state_dir=view_state_dir, view_groups=view_groups,
            view_value_col=view_value_col, view_minmax=view_minmax,
            maintain_every=maintain_every,
            maintain_min_deltas=maintain_min_deltas,
            maintain_auto_rebucket=maintain_auto_rebucket,
            on_maintenance=on_maintenance,
        )

    def _start_stream(
        self,
        wal_dir,
        state_dir,
        checkpoint_dir,
        snapshot_lsn,
        mirror_buckets,
        value_schema,
        value_cols,
        transport,
        table,
        keep_epochs,
        evolve_schema=False,
        backend=None,
        merge_mode="cow",
        compact_deltas=8,
        view_state_dir=None,
        view_groups=8,
        view_value_col="after_val",
        view_minmax=False,
        maintain_every=None,
        maintain_min_deltas=4,
        maintain_auto_rebucket=False,
        on_maintenance=None,
    ):
        """Post-seed data plane: the changelog stream from `wal_dir`,
        filtered to post-handoff events, merging into the mirror."""
        from .snapshot.claim_backend import DEFAULT_BACKEND

        backend = backend or DEFAULT_BACKEND
        from pyspark.sql import functions as F

        from .streaming.changelog_stream import (
            changelog_stream,
            mirror_sink,
            read_mirror,
        )

        view_kwargs = {}
        if view_state_dir is not None:
            from .streaming.agg_view_stream import (
                latest_version,
                seed_agg_view_from_state,
            )

            if latest_version(view_state_dir, backend=backend) is None:
                # version 0 = the seeded mirror's state: without this,
                # the first stream update of a snapshot-seeded key would
                # retract value the view never credited. Idempotent
                # (recomputes version 0); an empty mirror seeds an empty
                # view, pinning the minmax-tracking mode either way.
                seed_agg_view_from_state(
                    read_mirror(self.spark, state_dir, backend),
                    view_state_dir,
                    n_groups=view_groups,
                    value_col=view_value_col,
                    track_minmax=view_minmax,
                    backend=backend,
                )
            view_kwargs = {
                "view_state_dir": view_state_dir,
                "view_groups": view_groups,
                "view_value_col": view_value_col,
                "view_minmax": view_minmax,
            }
        if maintain_every:
            view_kwargs.update(
                maintain_every=maintain_every,
                maintain_min_deltas=maintain_min_deltas,
                maintain_auto_rebucket=maintain_auto_rebucket,
                on_maintenance=on_maintenance,
            )

        if transport == "flat":
            stream_schema = self.spark.createDataFrame(
                [],
                "op string, lsn bigint, xid bigint, commit_ts timestamp, "
                f"pk bigint, {value_schema}",
            ).schema
            flat = changelog_stream(self.spark, wal_dir, schema=stream_schema)
        elif transport == "test_decoding":
            # The text grammar's commit-ts stamp is a per-xid aggregate +
            # join — not expressible incrementally on an unbounded stream.
            # Stream the RAW segments and run decode + typing per
            # micro-batch inside the sink. The keeper cuts raw segments at
            # COMMIT boundaries (SlotKeeper.poll_once, r9), so a txn never
            # straddles a segment and the per-batch join always sees its
            # COMMIT — commit_ts is exact on any batch boundary (the only
            # degraded case is a txn that out-sizes the keeper's bounded
            # window escalation, which ships with NULL commit_ts, never a
            # wrong one; ordering rides (lsn, txn_seq), not commit_ts).
            if table is None:
                raise ValueError(f"transport={transport!r} requires table=")
            from .sources import lsn_stream
            from .sources.test_decoding import decode_test_decoding

            lsn_stream.register(self.spark)
            raw = (
                self.spark.readStream.format("pq_cdc_wal")
                .option("path", wal_dir)
                .option("raw", "true")
                .load()
            )

            def transform(batch_df):
                env = decode_test_decoding(batch_df)
                flat, _ = self._typed_flat(env, table, value_schema, "pk")
                return flat.filter(F.col("lsn") > snapshot_lsn)

            return snapshot_lsn, mirror_sink(
                raw,
                state_dir,
                checkpoint_dir,
                n_buckets=mirror_buckets,
                value_cols=value_cols,
                keep_epochs=keep_epochs,
                transform=transform,
                backend=backend,
                merge_mode=merge_mode,
                compact_deltas=compact_deltas,
                **view_kwargs,
            )
        elif transport in ("envelope", "wal2json"):
            if table is None:
                raise ValueError(f"transport={transport!r} requires table=")
            env = (
                self.envelope_changes(wal_dir)
                if transport == "envelope"
                else self.raw_changes(wal_dir, plugin="wal2json")
            )
            if evolve_schema:
                if transport != "envelope":
                    # the text-plugin transports carry no Relation
                    # messages — there is no typed schema authority to
                    # evolve from (wal2json/test_decoding payloads are
                    # untyped JSON/text)
                    raise ValueError(
                        "evolve_schema=True requires transport='envelope' "
                        "(the pgoutput Relation sidecar is the schema "
                        "authority)"
                    )

                # one sidecar interpretation per micro-batch, shared by
                # the typing transform AND the sink's drop list (review
                # r9: calling _evolved_value_schema twice doubled the
                # sidecar read + schema parse on the hot streaming path);
                # re-read EVERY batch because mid-stream DDL (ADD/ALTER
                # TYPE/DROP) changes the answer between batches
                batch_schema = {"dropped": ()}

                def transform(batch_df):
                    vschema, dropped = self._evolved_value_schema(
                        wal_dir, table, value_schema
                    )
                    batch_schema["dropped"] = dropped
                    flat, _ = self._typed_flat(batch_df, table, vschema, "pk")
                    return flat.filter(F.col("lsn") > snapshot_lsn)

                def dropped_now() -> tuple[str, ...]:
                    # the sink calls this after transform ran for the
                    # same batch — consumes its cached answer
                    return batch_schema["dropped"]

                return snapshot_lsn, mirror_sink(
                    env,
                    state_dir,
                    checkpoint_dir,
                    n_buckets=mirror_buckets,
                    value_cols=None,  # inferred per batch (post-transform)
                    keep_epochs=keep_epochs,
                    transform=transform,
                    evolve_schema=True,
                    backend=backend,
                    dropped_cols=dropped_now,
                    merge_mode=merge_mode,
                    compact_deltas=compact_deltas,
                    **view_kwargs,
                )
            flat, _ = self._typed_flat(env, table, value_schema, "pk")
        else:
            raise ValueError(f"unknown transport {transport!r}")
        if evolve_schema:
            raise ValueError(
                "evolve_schema=True requires transport='envelope' (the "
                "pgoutput Relation sidecar is the schema authority)"
            )
        changes = flat.filter(F.col("lsn") > snapshot_lsn)
        return snapshot_lsn, mirror_sink(
            changes,
            state_dir,
            checkpoint_dir,
            n_buckets=mirror_buckets,
            value_cols=value_cols,
            keep_epochs=keep_epochs,
            backend=backend,
            merge_mode=merge_mode,
            compact_deltas=compact_deltas,
            **view_kwargs,
        )

    def _cooperative_seed(
        self,
        chunk_planner,
        chunk_reader,
        state_dir,
        snapshot_lsn,
        value_cols,
        mirror_buckets,
        keep_epochs,
        claim_ttl_s: float = 300.0,
        drain_timeout_s: float = 600.0,
        heartbeat_every_s: float | None = None,
        claim_backend=None,
        merge_lock_ttl_s: float | None = None,
    ) -> int:
        """Per-chunk cooperative snapshot seed (O23 at the reference's
        granularity, worker.go:421-484): each captured table's chunk plan
        is published first-writer-wins to a shared claim queue under
        `state_dir`; every cooperating app drains it — claim, read the
        chunk (`chunk_reader(tcfg, chunk) -> DataFrame` of (pk, *values)),
        merge, mark done — with crashed peers' chunks reclaimed after
        their heartbeat TTL. The FIRST app's snapshot LSN is published in
        the queue manifest and adopted by everyone (one shared handoff
        point); chunk reads later than that LSN may see newer data, which
        the max-(lsn,txn_seq)-wins stream merge reconciles — the
        reference's multi-pod model. Returns the shared snapshot LSN —
        the MINIMUM of the published per-table LSNs: with several tables
        the queues can be published by different apps at different WAL
        positions (e.g. after a crash-restart), and the single stream
        filter must not drop any table's events between its own anchor
        and a later table's (review r7: anchoring at the LAST table's
        LSN silently lost the window in between)."""
        from pyspark.sql import functions as F

        from .snapshot import chunk_queue as cq
        from .streaming.changelog_stream import merge_mirror_batch

        if claim_backend is None:
            claim_backend = cq.DEFAULT_BACKEND
        if heartbeat_every_s is None:
            # default: beat well inside the claim TTL so a chunk whose
            # read outlasts claim_ttl_s is never reclaimed by a live peer
            # mid-processing (r7 advisor: no heartbeat meant duplicate
            # merges for any chunk slower than the TTL)
            heartbeat_every_s = claim_ttl_s / 4
        wanted = set(
            self.config.snapshot_tables
            or [t.qualified for t in self.config.tables]
        )
        published: list[int] = []
        for tcfg in self.config.tables:
            if tcfg.qualified not in wanted:
                continue
            qdir = os.path.join(
                state_dir, "chunks", tcfg.qualified.replace(".", "__")
            )
            if self.config.resnapshot:
                # force-resnapshot must clear the per-table chunk queue or
                # persisted done markers silently re-seed NOTHING (r7
                # advisor); like job_claim.reset / the reference's
                # metadata wipe, this is a start-the-fleet-after action,
                # not safe concurrent with a live peer's drain.
                cq.reset(qdir, backend=claim_backend)
            cq.init_chunk_queue(
                qdir,
                chunk_planner(tcfg),
                meta={"snapshot_lsn": snapshot_lsn},
                backend=claim_backend,
            )
            # first-writer-wins: adopt THIS table's PUBLISHED handoff point
            table_lsn = int(
                cq.read_queue_meta(qdir, backend=claim_backend).get(
                    "snapshot_lsn", snapshot_lsn
                )
            )
            published.append(table_lsn)

            def process(chunk, claim, tcfg=tcfg, lsn=table_lsn):
                rows = chunk_reader(tcfg, chunk).select(
                    "pk",
                    F.lit(lsn).cast("long").alias("lsn"),
                    F.lit("R").alias("op"),
                    *value_cols,
                )
                lock_kw = (
                    {} if merge_lock_ttl_s is None
                    else {"lock_ttl_s": merge_lock_ttl_s}
                )
                merge_mirror_batch(
                    rows,
                    state_dir,
                    n_buckets=mirror_buckets,
                    value_cols=value_cols,
                    keep_epochs=keep_epochs,
                    backend=claim_backend,
                    **lock_kw,
                )
                # rows_processed=0: an exact count would cost one extra
                # Spark job per chunk; queue progress tracks chunks, and
                # the mirror itself is the row-level source of truth
                return 0

            cq.drain(
                qdir,
                process,
                claim_ttl_s=claim_ttl_s,
                timeout_s=drain_timeout_s,
                heartbeat_every_s=heartbeat_every_s,
                backend=claim_backend,
            )
        return min(published) if published else snapshot_lsn

    def state_as_of(
        self, state_dir: str, epoch: int, claim_backend=None
    ) -> DataFrame:
        """Time-travel read of a retained mirror epoch (see
        `streaming.read_mirror_as_of`; requires the mirror's pinned
        keep_epochs retention to cover it)."""
        from .snapshot.claim_backend import DEFAULT_BACKEND
        from .streaming import read_mirror_as_of

        return read_mirror_as_of(
            self.spark, state_dir, epoch, backend=claim_backend or DEFAULT_BACKEND
        )

    def current_state(self, state_dir: str, claim_backend=None) -> DataFrame:
        from .snapshot.claim_backend import DEFAULT_BACKEND
        from .streaming import read_mirror

        return read_mirror(
            self.spark, state_dir, backend=claim_backend or DEFAULT_BACKEND
        )

    def lookup(self, state_dir: str, pks: list[int], claim_backend=None) -> DataFrame:
        """Bucket-pruned point lookup in the mirror: reads only the bucket
        files the keys hash into (~len(pks)/n_buckets of the state)."""
        from .snapshot.claim_backend import DEFAULT_BACKEND
        from .streaming import lookup_mirror

        return lookup_mirror(
            self.spark, state_dir, pks, backend=claim_backend or DEFAULT_BACKEND
        )

    def register_view(self, state_dir: str, name: str, claim_backend=None) -> DataFrame:
        """Expose the mirror to SQL: `spark.sql(f"SELECT ... FROM {name}")`
        resolves to the state at the LAST MERGE COMMIT (SURVEY §7's
        catalog-resolution nice-to-have, done the Spark-first way).

        The view binds the bucket paths of the manifest snapshot, and GC
        deletes superseded bucket dirs — so the view is KEPT CURRENT by the
        merge itself: `merge_mirror_batch` re-registers every view recorded
        for this state_dir right after the manifest swap and before GC
        (ADVICE r4). A query planned concurrently with a merge can still
        race file deletion — the same exposure any non-MVCC file source
        has; use a table format (Delta/Iceberg) when snapshot-isolated
        readers are required."""
        from .snapshot.claim_backend import DEFAULT_BACKEND
        from .streaming.changelog_stream import register_mirror_view

        return register_mirror_view(
            self.spark, state_dir, name, backend=claim_backend or DEFAULT_BACKEND
        )

    # -- observability (O33) ------------------------------------------------

    def status_server(self, wal_dir: str | None = None, host: str = "127.0.0.1", port: int = 0):
        """Start the /status + /metrics + /slot HTTP surface
        (`internal/http/server.go:36-60`). EACH server registers its OWN
        CdcMetricsListener and `stop()` detaches exactly that one — a
        shared cached listener (the first r4-ADVICE fix) froze a second
        concurrent server's metrics the moment the first was stopped (r5
        review); per-server listeners keep stop() leak-free without the
        cross-interference. Pass `wal_dir` so /slot serves live
        confirmed/current LSNs from the segment log. Returns the started
        `StatusServer` (`.port`, `.listener`, `.stop()`)."""
        from .observability import CdcMetricsListener, StatusServer

        listener = CdcMetricsListener()
        self.spark.streams.addListener(listener)
        if wal_dir is not None:
            listener.attach_wal_dir(wal_dir, self.config.slot_name)
        try:
            return StatusServer(
                listener, host=host, port=port, spark=self.spark, config=self.config
            ).start()
        except Exception:
            # a bind failure (port taken) must not leak the registered
            # listener — it would keep receiving callbacks forever
            self.spark.streams.removeListener(listener)
            raise


def snapshot_only(
    df, out_dir: str, mode: str = "error_if_exists", resnapshot: bool = False
) -> bool:
    """§3.3 snapshot-only mode: one-shot export with resume — if the output
    is already committed (Spark's _SUCCESS marker), skip the work (the
    reference resumes via its pseudo-slot job row, connector.go:406-444).
    `resnapshot=True` ignores the marker and rewrites everything
    (config.go:328; TestForceResnapshotOnlyMode).
    Returns True if a snapshot was written, False if resumed/skipped."""
    import os as _os

    if not resnapshot and _os.path.exists(_os.path.join(out_dir, "_SUCCESS")):
        return False
    df.write.mode(
        "overwrite" if (resnapshot or mode == "overwrite") else "errorifexists"
    ).parquet(out_dir)
    return True
