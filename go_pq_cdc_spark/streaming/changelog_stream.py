"""Structured Streaming surface of the engine (SURVEY.md §7 M2/M3).

Transport: the stream source reads change-event batches from a directory
(parquet/json files) — the transport-agnostic seam the reference fills with
its replication socket (O1-O3). In production the same DataFrame shape
comes from a Kafka topic fed by wal2json/pgoutput, or from the
`sources.postgres` poll reader; every operator downstream is identical.

Apply idiom (M3): `mirror_sink` maintains a queryable current-state mirror
of the captured table via foreachBatch + max-LSN-wins merge — the
Spark-native replacement for the reference's ordered callback delivery
(O21), giving effectively-once semantics on top of at-least-once delivery
because the merge is idempotent (SURVEY.md §2.2 'Exactly-once').

Mirror layout (the scale-critical part): state is hash-bucketed by pk into
`MIRROR_BUCKETS` buckets; a micro-batch rewrites ONLY the buckets whose
keys appear in the batch, so per-batch IO scales with batch size, not with
total state size (the Delta/Iceberg `MERGE INTO` access pattern expressed
on plain parquet). A manifest file maps bucket -> current data directory
and is swapped atomically, so a crash at any point leaves the previous
consistent snapshot readable — no rename pair to die between.

Coordination medium (r8 verdict item 1): every coordination FILE — the
merge lock, the live manifest, the per-epoch manifest snapshots — goes
through the same pluggable `snapshot.claim_backend.ClaimBackend` the
cooperative chunk queue uses. The default `PosixLinkBackend` keeps the
pre-r9 on-disk layout byte-compatible; an `ObjectStoreBackend` maps the
lock's acquire/heartbeat/takeover and the MANIFEST SWAP ITSELF to
conditional requests, where the swap becomes a true compare-and-swap
(If-Match on the etag read at merge start) — the residual POSIX
last-writer-wins window between check_owned and os.replace does not
exist there. Data directories (the `epochs/**` parquet Spark writes)
are listed and garbage-collected through Spark's own Hadoop filesystem,
which resolves file://, s3a:// and gs:// URIs alike — so a mirror whose
state_dir is a bucket needs no POSIX anywhere. The reference's
equivalent coordination is Postgres-backed and location-independent
(pq/snapshot/worker.go:421-484); this is the Spark-native analogue.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..snapshot.claim_backend import DEFAULT_BACKEND, ClaimBackend

# Flat envelope used by the streaming tests/fixtures (a typed projection of
# envelope.CHANGE_EVENT_SCHEMA for a single table).
FLAT_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("xid", T.LongType(), True),
        T.StructField("commit_ts", T.TimestampType(), True),
        # nullable: TRUNCATE rows (op 'T') carry no key
        T.StructField("pk", T.LongType(), True),
        T.StructField("after_val", T.DoubleType(), True),
    ]
)


def changelog_stream(
    spark: SparkSession, path: str, schema: T.StructType = FLAT_CHANGE_SCHEMA
) -> DataFrame:
    """File-transport change stream; one file = one WAL segment's worth of
    events. maxFilesPerTrigger bounds batch size (the analogue of the
    reference's 1000-message channel backpressure, stream.go:93)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


# Default bucket count for a fresh mirror. Sizing rule at scale:
#   n_buckets ≈ total_state_size / target_rewrite_size
# where target_rewrite_size is how much a single touched bucket may rewrite
# per micro-batch (256 MB-1 GB is a good parquet rewrite unit). E.g. a 10 TB
# mirror at 512 MB/bucket wants ~20k buckets; the 32 default only fits test
# scale. The count is pinned at mirror creation and persisted in the
# manifest; growing it later is an ONLINE epochs-atomic migration
# (`rebucket_mirror` — power-of-two doubling under the merge lock), never
# a silent re-hash.
MIRROR_BUCKETS = 32

# txn_seq assigned to stored mirror rows inside a merge: consolidated
# post-transaction state must order AFTER any replayed event of the same
# commit lsn (real txn_seq values are small positive ints).
STORED_ROW_SEQ = 1 << 62
_MANIFEST = "manifest.json"


def suggest_mirror_buckets(
    state_bytes: int, target_rewrite_bytes: int = 512 << 20
) -> int:
    """Apply the sizing rule, rounded up to a power of two (keeps pmod
    distribution stable under doubling) with the test-scale default floor."""
    n = MIRROR_BUCKETS
    while n * target_rewrite_bytes < state_bytes:
        n *= 2
    return n


def _bucket_col(pk: str = "pk", n_buckets: int = MIRROR_BUCKETS):
    # Deterministic content hash — NEVER a nondeterministic salt — so stage
    # retries land every row in the same bucket.
    return F.pmod(F.xxhash64(F.col(pk)), F.lit(n_buckets)).cast("int")


def _read_manifest_versioned(
    state_dir: str, backend: ClaimBackend
) -> tuple[dict, object]:
    """(manifest, etag). The etag is the commit-time CAS token: a merge
    that read the manifest at etag E may only swap it while it is still
    at E (enforced on etag-bearing backends; None on POSIX, where the
    lock's pre-swap ownership fence is the guard)."""
    p = os.path.join(state_dir, _MANIFEST)
    doc, etag = backend.read(p)
    if doc is None:
        if backend.exists(p):
            # unparseable manifest object: atomic publish makes this
            # impossible in normal operation — never degrade it to "fresh
            # mirror" (the next merge would orphan every bucket)
            raise ValueError(f"mirror manifest at {p} exists but is unreadable")
        return {"epoch": -1, "buckets": {}}, etag
    return doc, etag


def _read_manifest(
    state_dir: str, backend: ClaimBackend = DEFAULT_BACKEND
) -> dict:
    return _read_manifest_versioned(state_dir, backend)[0]


def _snapshot_manifest_path(state_dir: str, epoch: int) -> str:
    return os.path.join(state_dir, "manifests", f"e{epoch:09d}.json")


def _publish_manifest_snapshot(
    state_dir: str, manifest: dict, backend: ClaimBackend
) -> None:
    """Pre-commit publish of the per-epoch manifest copy — the time-travel
    commit log (the single-table analogue of a Delta/Iceberg snapshot
    list). Written BEFORE the live-manifest swap so a retained epoch is
    readable the moment the swap lands — but GUARDED, never unconditional:
    a zombie writer that will lose the live CAS must not get to overwrite
    the epoch snapshot a committed peer already published (review r9 —
    the live state would be right while read_mirror_as_of(N) served the
    aborted merge's bucket set).

      * put_if_absent wins the normal case outright;
      * if epoch N's snapshot already exists and the LIVE manifest is
        already at epoch >= N, a peer committed N — this writer is a
        zombie and aborts here, snapshot untouched;
      * otherwise the existing object is a crashed pre-swap attempt's
        orphan (nobody committed N yet) — replace it via etag CAS, so a
        concurrently racing writer's replace loses cleanly.

    The committing writer RE-PUTS the snapshot after winning the live
    swap (`commit_manifest`), which bumps the etag and invalidates any
    pre-commit read a still-racing zombie holds — its conditional
    replace can then never land on top of committed state."""
    p = _snapshot_manifest_path(state_dir, manifest["epoch"])
    backend.ensure_dir(os.path.dirname(p))
    if backend.put_if_absent(p, manifest):
        return
    live, _ = _read_manifest_versioned(state_dir, backend)
    if int(live.get("epoch", -1)) >= int(manifest["epoch"]):
        raise MirrorLockLost(
            f"epoch {manifest['epoch']} snapshot at {state_dir} was already "
            "committed by a peer; this merge is stale and aborted before "
            "touching it"
        )
    _doc, etag = backend.read(p)
    if not backend.swap(p, manifest, etag):
        raise MirrorLockLost(
            f"lost the race republishing epoch {manifest['epoch']} snapshot "
            f"at {state_dir}; merge aborted"
        )


# --- data-directory primitives (the parquet Spark writes) -------------------
#
# Coordination files ride the ClaimBackend; the DATA directories live
# wherever Spark wrote them, so listing and deleting them goes through
# Spark's Hadoop filesystem — the one component that already resolves
# file://, s3a://, gs:// (and inherits the session's credentials). os.*
# here would silently pin the mirror to POSIX.


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _fs_list_names(spark: SparkSession, d: str) -> list[str]:
    """Child entry names directly under a data dir; [] when absent."""
    fs, jpath = _hadoop_fs(spark, d)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def _fs_delete(spark: SparkSession, d: str) -> None:
    fs, jpath = _hadoop_fs(spark, d)
    fs.delete(jpath, True)


def _mirror_struct(spark: SparkSession, value_schema: str):
    """StructType of the stored mirror row shape for a value DDL."""
    return spark.createDataFrame(
        [], f"pk bigint, lsn bigint, op string, {value_schema}"
    ).schema


def _delta_struct(spark: SparkSession, value_schema: str):
    """StructType of a DELTA file row: raw change events, so the full
    event identity (txn_seq) and the real op ('I'/'U'/'D'/'R') ride along
    — the read-side fold needs both (base rows synthesize
    txn_seq=STORED_ROW_SEQ at read, exactly like the COW merge's
    stored-row read-back)."""
    return spark.createDataFrame(
        [], f"pk bigint, lsn bigint, op string, txn_seq bigint, {value_schema}"
    ).schema


def _masked_cols(struct, dropped) -> list:
    """Projection over a mirror struct with DROPPED columns masked to
    NULL: a column the source table dropped keeps its slot in the row
    shape (bucket files still hold pre-drop values) but reads as NULL
    from the drop epoch on — new tuples are authoritative, exactly the
    reference's Relation-cache overwrite semantics (relation.go:68-87).
    Time travel is untouched: a pre-drop epoch's manifest snapshot has no
    drop marker, so reads through it serve the real stored values."""
    return [
        F.lit(None).cast(f.dataType).alias(f.name)
        if f.name in dropped
        else F.col(f.name)
        for f in struct.fields
    ]


def _fold_events(merged: DataFrame, value_cols: tuple[str, ...]) -> DataFrame:
    """The ONE merge fold, shared by the COW merge, delta compaction, and
    the merge-on-read fold: dedupe replayed events on their full identity
    (pk, lsn, txn_seq) preferring the stored 'R' row (it already carries
    the TOAST-repaired value, so the fill never sees an ambiguous tie),
    per-column TOAST carry-forward, then max-(lsn, txn_seq)-wins with
    DELETE removing the key. Input rows are events OR stored rows
    (stored rows synthesize txn_seq=STORED_ROW_SEQ so they out-order any
    replayed event of their own commit lsn); dropped columns must be
    pre-masked to NULL by the caller — the fill then never resurrects
    them. Output: (pk, lsn, op='R', *value_cols)."""
    from ..operators.cdc import toast_fill_cols

    w_dup = Window.partitionBy("pk", "lsn", "txn_seq").orderBy(
        F.desc(F.col("op") == "R")
    )
    merged = (
        merged.withColumn("dup_rn", F.row_number().over(w_dup))
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn")
    )
    filled = toast_fill_cols(merged, value_cols)
    w = Window.partitionBy("pk")
    ev_key = F.struct("lsn", "txn_seq")
    return (
        filled.withColumn("max_k", F.max(ev_key).over(w))
        .filter((ev_key == F.col("max_k")) & (F.col("op") != "D"))
        .select(
            "pk",
            "lsn",
            F.lit("R").alias("op"),
            *[F.col(f"filled_{c}").alias(c) for c in value_cols],
        )
    )


def _manifest_df(
    spark: SparkSession,
    state_dir: str,
    manifest: dict,
    pks: list[int] | None = None,
) -> DataFrame:
    """DataFrame over one manifest's bucket set (shared by current,
    time-travel, and point-lookup reads — one copy of the
    schema/paths/fold logic).

    The read passes the manifest's pinned schema EXPLICITLY: after a
    schema evolution (`merge_mirror_batch(evolve_schema=True)`) buckets
    untouched since the widening still hold the narrower row shape, and
    an explicit-schema parquet read fills the missing columns with NULL
    (schema-inference over mixed files would either miss the new column
    or fail the select; narrower stored types promote per SPARK-40876).
    Columns the manifest marks dropped read as NULL (`_masked_cols`).

    MERGE-ON-READ (r9 verdict item 1): buckets with pending delta files
    fold base + deltas per pk at read time (`_fold_events` — identical
    semantics to the COW merge, so a delta-merged mirror reads equal to
    a COW-merged one over the same log); buckets with NO deltas read
    directly, zero fold overhead — the read cost of delta debt is
    bounded by the compaction budget, never paid by untouched buckets.

    `pks`, when given, filters every scan BEFORE the fold (the fold is
    per-pk, so pre-filtering is exact) — the point-lookup fast path."""
    value_schema = manifest.get("value_schema", "after_val double")
    struct = _mirror_struct(spark, value_schema)
    dead = set(manifest.get("dropped", {}))
    masked = _masked_cols(struct, dead)
    value_cols = tuple(f.name for f in struct.fields[3:])
    buckets = manifest["buckets"]
    deltas = {
        b: rels for b, rels in (manifest.get("deltas") or {}).items() if rels
    }

    def flt(df: DataFrame) -> DataFrame:
        return df if pks is None else df.filter(F.col("pk").isin(pks))

    parts: list[DataFrame] = []
    plain = [
        os.path.join(state_dir, rel)
        for b, rel in buckets.items()
        if b not in deltas
    ]
    if plain:
        parts.append(flt(spark.read.schema(struct).parquet(*plain)).select(*masked))
    if deltas:
        delta_paths = [
            os.path.join(state_dir, rel)
            for rels in deltas.values()
            for rel in rels
        ]
        dstruct = _delta_struct(spark, value_schema)
        ev = flt(spark.read.schema(dstruct).parquet(*delta_paths)).select(
            "pk", "lsn", "op", "txn_seq", *value_cols
        )
        base_paths = [
            os.path.join(state_dir, buckets[b]) for b in deltas if b in buckets
        ]
        if base_paths:
            base = flt(spark.read.schema(struct).parquet(*base_paths)).select(
                "pk",
                "lsn",
                "op",
                F.lit(STORED_ROW_SEQ).cast("long").alias("txn_seq"),
                *value_cols,
            )
            ev = base.unionByName(ev)
        if dead:
            ev = ev.select(
                "pk",
                "lsn",
                "op",
                "txn_seq",
                *[
                    F.lit(None).cast(struct[c].dataType).alias(c)
                    if c in dead
                    else F.col(c)
                    for c in value_cols
                ],
            )
        parts.append(_fold_events(ev, value_cols))
    if not parts:
        return spark.createDataFrame([], struct)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_mirror_as_of(
    spark: SparkSession,
    state_dir: str,
    epoch: int,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> DataFrame:
    """TIME-TRAVEL read: the mirror exactly as of `epoch`'s commit. Reads
    the retained immutable manifest snapshot; raises a clear error when
    the epoch has been garbage-collected (older than the mirror's
    `keep_epochs` retention) rather than serving partial state.

    Concurrency caveat (inherent to any non-MVCC file layout — same class
    as the register_mirror_view note): the retention check happens at
    manifest-open time. If the stream keeps committing while this
    DataFrame is still being consumed and the epoch falls out of the
    retention window meanwhile, the lazy scan can hit deleted files.
    Size `keep_epochs` to cover the longest reader, exactly like a Delta
    VACUUM horizon."""
    p = _snapshot_manifest_path(state_dir, epoch)
    manifest, _ = backend.read(p)
    if manifest is None:
        raise ValueError(
            f"mirror epoch {epoch} is not retained at {state_dir} "
            "(garbage-collected or never written; raise keep_epochs)"
        )
    return _manifest_df(spark, state_dir, manifest)


def read_mirror(
    spark: SparkSession, state_dir: str, backend: ClaimBackend = DEFAULT_BACKEND
) -> DataFrame:
    """The queryable current state: union of every bucket's live directory
    as recorded by the manifest (consistent at the last merge commit).
    Column shape comes from the manifest's pinned value schema (mirrors
    created before multi-column support default to `after_val double`)."""
    manifest = _read_manifest(state_dir, backend)
    return _manifest_df(spark, state_dir, manifest)


_MIRROR_VIEWS: dict[str, set[str]] = {}  # state_dir key -> view names


def _views_key(state_dir: str) -> str:
    # URIs (s3a://...) must not go through abspath but DO normalize
    # trailing slashes — 's3a://b/state' and 's3a://b/state/' are the
    # same mirror and must share one registry key, or merge-time view
    # refresh misses one spelling and its stale plan can reference
    # GC-deleted bucket dirs (ADVICE r9). Local paths go through abspath.
    if "://" in state_dir:
        return state_dir.rstrip("/")
    return os.path.abspath(state_dir)


def register_mirror_view(
    spark: SparkSession,
    state_dir: str,
    name: str,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> DataFrame:
    """Temp view over the mirror's current manifest, KEPT CURRENT across
    merges: `merge_mirror_batch` re-registers every view recorded here
    right after its manifest swap (and before GC deletes the superseded
    bucket dirs the old view plan referenced — ADVICE r4)."""
    _MIRROR_VIEWS.setdefault(_views_key(state_dir), set()).add(name)
    df = read_mirror(spark, state_dir, backend)
    df.createOrReplaceTempView(name)
    return df


def lookup_mirror(
    spark: SparkSession,
    state_dir: str,
    pks: list[int],
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> DataFrame:
    """Point lookup with bucket pruning: each pk hashes to exactly one
    bucket (`_bucket_col`, the same deterministic expression the merge
    uses), so a point query reads ~len(pks)/n_buckets of the state
    regardless of total mirror size — the read-side counterpart of the
    merge's touched-buckets-only write guarantee. At 100 TB this is the
    difference between scanning the table and opening a few files.

    The bucket ids are resolved with a len(pks)-row local job (the hash must
    be Spark's xxhash64 — recomputing it driver-side would risk drift)."""
    manifest = _read_manifest(state_dir, backend)
    n = int(manifest.get("n_buckets") or MIRROR_BUCKETS)
    value_schema = manifest.get("value_schema", "after_val double")
    struct = _mirror_struct(spark, value_schema)
    empty = spark.createDataFrame([], struct)
    all_deltas = manifest.get("deltas") or {}
    if not pks or (not manifest["buckets"] and not all_deltas):
        return empty
    keys = spark.createDataFrame([(int(p),) for p in pks], "pk bigint")
    wanted = {r["b"] for r in keys.select(_bucket_col("pk", n).alias("b")).collect()}
    # subset manifest over just the wanted buckets: the shared reader
    # applies the pinned schema, the dropped-column mask, and the
    # merge-on-read fold for buckets with pending deltas; the pk filter
    # is pushed below the fold (per-pk semantics make that exact)
    sub = {
        "value_schema": value_schema,
        "dropped": manifest.get("dropped", {}),
        "buckets": {
            b: rel for b, rel in manifest["buckets"].items() if int(b) in wanted
        },
        "deltas": {
            b: rels for b, rels in all_deltas.items() if int(b) in wanted
        },
    }
    if not sub["buckets"] and not any(sub["deltas"].values()):
        return empty
    return _manifest_df(
        spark, state_dir, sub, pks=[int(p) for p in pks]
    )


def mirror_befores_for(
    spark: SparkSession,
    state_dir: str,
    keys_df: DataFrame,
    value_col: str = "after_val",
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> DataFrame | None:
    """Pre-batch images for a batch's keys — the before-image source for
    incremental view maintenance on streams WITHOUT replica identity
    full: `lookup_mirror`'s bucket pruning, but keyed by a DataFrame of
    pks (distributed semi-join instead of a driver-side pk list, so the
    batch never collects). The only driver-side materialization is the
    touched-BUCKET id set, bounded by n_buckets exactly like the merge's
    own touched-bucket routing. None = fresh mirror (no state, every
    batch key is new)."""
    manifest = _read_manifest(state_dir, backend)
    all_deltas = manifest.get("deltas") or {}
    if not manifest["buckets"] and not any(all_deltas.values()):
        return None
    n = int(manifest.get("n_buckets") or MIRROR_BUCKETS)
    keys = keys_df.select("pk").distinct()
    wanted = {r["b"] for r in keys.select(_bucket_col("pk", n).alias("b")).distinct().collect()}
    sub = {
        "value_schema": manifest.get("value_schema", "after_val double"),
        "dropped": manifest.get("dropped", {}),
        "buckets": {
            b: rel for b, rel in manifest["buckets"].items() if int(b) in wanted
        },
        "deltas": {b: rels for b, rels in all_deltas.items() if int(b) in wanted},
    }
    if not sub["buckets"] and not any(sub["deltas"].values()):
        return None
    return (
        _manifest_df(spark, state_dir, sub)
        .join(keys, "pk", "left_semi")
        .select("pk", value_col)
    )


def _gc_epochs(
    spark: SparkSession,
    state_dir: str,
    manifest: dict,
    keep_epochs: int = 1,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> None:
    """Remove bucket dirs referenced by NO retained manifest: the live
    one plus the last `keep_epochs - 1` snapshot manifests (time-travel
    retention). Snapshot manifests older than the retention window are
    deleted first, so a crash mid-GC can never leave a readable snapshot
    pointing at deleted buckets. Safe after the manifest swap: a crash
    mid-GC only leaves garbage, never dangling references.

    Manifest snapshots are coordination files (ClaimBackend); the bucket
    dirs are Spark-written parquet (Hadoop FS — works on any scheme the
    session can read)."""
    mroot = os.path.join(state_dir, "manifests")
    retained: list[dict] = [manifest]
    # sort by the PARSED epoch number — a lexicographic filename sort
    # inverts once the epoch outgrows the zero padding (r6 review)
    snaps = sorted(
        (f for f in backend.list_names(mroot) if f.endswith(".json")),
        key=lambda f: int(f[1:-5]),
        reverse=True,
    )
    for f in snaps[keep_epochs:]:
        backend.delete(os.path.join(mroot, f))
    for f in snaps[:keep_epochs]:
        doc, _ = backend.read(os.path.join(mroot, f))
        if doc is not None:
            retained.append(doc)
    live = {m["buckets"][b] for m in retained for b in m["buckets"]}
    # delta dirs referenced by ANY retained manifest stay (merge-on-read)
    live |= {
        rel
        for m in retained
        for rels in (m.get("deltas") or {}).values()
        for rel in rels
    }
    eroot = os.path.join(state_dir, "epochs")
    for epoch in _fs_list_names(spark, eroot):
        edir = os.path.join(eroot, epoch)
        remaining = []
        for bdir in _fs_list_names(spark, edir):
            rel = os.path.join("epochs", epoch, bdir)
            if bdir.startswith("pb=") and rel not in live:
                _fs_delete(spark, os.path.join(edir, bdir))
            else:
                remaining.append(bdir)
        if not remaining:
            _fs_delete(spark, edir)


# --- cross-process merge serialization --------------------------------------
#
# Two PROCESSES merging into one mirror concurrently (the cooperative
# chunk-seed topology: N apps drain one chunk queue into one shared mirror)
# would both read the manifest at epoch N, both write epochs/e{N+1} (the
# second overwrite deletes the first's bucket dirs), and the last manifest
# swap drops the other's bucket updates — silent data loss because the lost
# chunk is already marked done (r7 advisor, engine.py cooperative seed).
# Within one process the streaming sinks are already serial per query; the
# lock makes the multi-app case safe with the same link-claim scheme the
# chunk queue uses: claim = hard link of a privately written file, liveness
# = heartbeat timestamp refreshed by a background thread while held,
# takeover = os.replace once the heartbeat is ttl-stale (a crashed holder
# never wedges the mirror). The residual zombie window — a paused holder
# resuming after takeover — is fenced at the COMMIT POINT: ownership is
# re-checked immediately before the manifest swap and the merge aborts
# (pre-swap, so the mirror is untouched) if the lock was lost.
#
# The lock rides the same ClaimBackend as every other coordination file
# (r8 verdict item 1): POSIX default keeps the hard-link scheme; an
# object-store backend makes acquire/heartbeat/takeover TRUE conditional
# requests AND the commit itself a CAS — the manifest swap carries the
# etag read at merge start, so a zombie passing the ownership fence
# still loses the swap (the POSIX residual window does not exist there).

_MERGE_LOCK = ".merge.lock.json"
_MERGE_LOCK_TTL_S = 300.0


class MirrorLockLost(RuntimeError):
    """This process lost the mirror merge lock mid-merge (heartbeat went
    ttl-stale — e.g. a long GC pause — and a peer took over). The merge
    aborted BEFORE its manifest swap; re-running it converges."""


class _MergeLock:
    def __init__(
        self,
        state_dir: str,
        ttl_s: float = _MERGE_LOCK_TTL_S,
        backend: ClaimBackend = DEFAULT_BACKEND,
    ):
        import uuid

        self.path = os.path.join(state_dir, _MERGE_LOCK)
        self.owner = f"merge-{uuid.uuid4().hex[:12]}"
        self.ttl_s = ttl_s
        self.backend = backend
        self._beat_stop = None
        self._beat_thread = None

    def _doc(self) -> dict:
        import time

        return {"owner": self.owner, "heartbeat_at": time.time()}

    def acquire(self) -> None:
        import time

        while True:
            if self.backend.put_if_absent(self.path, self._doc()):
                break
            cur, etag = self.backend.read(self.path)
            if cur is None and not self.backend.exists(self.path):
                continue  # holder released between publish and read — retry
            stale = cur is None or (
                time.time() - float(cur.get("heartbeat_at", 0)) > self.ttl_s
            )
            if stale and self.backend.swap(self.path, self._doc(), etag):
                # takeover: a true CAS on etag-enforcing backends (losing
                # the swap means a peer took it first — keep waiting);
                # last-writer-wins on POSIX inside the rare double-stale
                # window, where the pre-swap fence catches the loser
                break
            time.sleep(min(0.05 + self.ttl_s / 1000.0, 0.25))
        # heartbeat while held: a merge spans Spark jobs that can outlast
        # any fixed ttl at scale
        import threading

        self._beat_stop = threading.Event()

        def beat():
            while not self._beat_stop.wait(self.ttl_s / 4):
                cur, etag = self.backend.read(self.path)
                if cur is None or cur.get("owner") != self.owner:
                    return  # lost — the pre-swap fence will abort the merge
                if not self.backend.swap(self.path, self._doc(), etag):
                    return  # CAS lost to a concurrent takeover
                # POSIX swap is unconditional; this read-back catches only
                # a takeover that lands AFTER our replace — a pause between
                # the ownership read above and the replace still
                # re-installs over a peer (the read-back then sees our own
                # doc). That window is POSIX-fundamental without fcntl
                # (whose NFS semantics are implementation-defined) and is
                # why the commit itself is etag-CAS'd on object stores:
                # there the beat's swap is conditional and the window is
                # ZERO. On POSIX the residual risk is bounded by the
                # fence + writer-unique epoch dirs (documented).
                cur2, _ = self.backend.read(self.path)
                if cur2 is None or cur2.get("owner") != self.owner:
                    return

        self._beat_thread = threading.Thread(target=beat, daemon=True)
        self._beat_thread.start()

    def check_owned(self) -> None:
        cur, _ = self.backend.read(self.path)
        if cur is None or cur.get("owner") != self.owner:
            raise MirrorLockLost(
                f"mirror merge lock at {self.path} lost to "
                f"{cur and cur.get('owner')}; merge aborted before commit"
            )

    def release(self) -> None:
        if self._beat_stop is not None:
            self._beat_stop.set()
            self._beat_thread.join(timeout=2)
        # The conditional delete can lose its etag to our OWN heartbeat
        # thread if it outlived the 2s join (blocked in store I/O) and
        # bumped the lock between the read and the delete — retry while
        # the doc still names us, or the released lock lingers for the
        # full TTL and stalls the next writer's acquire (ADVICE r9). Two
        # reads bound the retry: the beat is stopped, so at most one
        # in-flight bump can invalidate the first etag.
        for _ in range(2):
            cur, etag = self.backend.read(self.path)
            if cur is None or cur.get("owner") != self.owner:
                return  # lost/taken over: never delete a peer's lock
            if self.backend.delete(self.path, etag):
                return


def _commit_manifest(
    state_dir: str,
    manifest: dict,
    manifest_etag: object,
    lock: _MergeLock,
    backend: ClaimBackend,
) -> None:
    """The commit point (shared by the merge and the rebucket tool).
    Fence (ownership), guarded snapshot pre-publish (time travel —
    readable the moment the swap lands, but a zombie can never overwrite
    a committed peer's snapshot: `_publish_manifest_snapshot`), then the
    LIVE swap — conditional on the etag the writer read its manifest at:
    on etag-enforcing backends a writer whose view went stale (zombie
    past the fence, or a racing first-writer on a fresh mirror) loses
    the CAS and aborts with the mirror untouched by it; POSIX swaps
    unconditionally (fence-guarded, documented). The winner re-puts the
    snapshot AFTER the swap, invalidating any etag a still-racing zombie
    captured pre-commit."""
    lock.check_owned()  # fence: never swap a manifest we no longer own
    _publish_manifest_snapshot(state_dir, manifest, backend)
    if not backend.swap(
        os.path.join(state_dir, _MANIFEST), manifest, manifest_etag
    ):
        raise MirrorLockLost(
            f"mirror manifest at {state_dir} changed since this writer "
            "read it (epoch CAS failed); aborted — its epoch dirs are "
            "unreferenced orphans the next GC removes"
        )
    # committed: re-assert the snapshot so its etag postdates the
    # commit — a zombie's pre-commit conditional replace can no
    # longer land on it
    backend.put(
        _snapshot_manifest_path(state_dir, manifest["epoch"]), manifest
    )


_RESERVED_COLS = frozenset({"op", "lsn", "txn_seq", "xid", "commit_ts", "pk", "pb"})

# --- safe type widening (r8 verdict item 7) ---------------------------------
#
# Spark 4's parquet readers support WIDENING TYPE PROMOTIONS (SPARK-40876):
# a file written with int32 reads cleanly under a bigint schema, float
# under double, ints under decimal, and decimals under higher precision.
# That makes in-place type widening of the mirror's value pin safe: old
# bucket files keep their narrow physical type, the manifest pin widens,
# and every explicit-schema read promotes on the fly — no rewrite. The
# allowlist below is exactly the set empirically pinned by
# tests/test_schema_evolution.py::test_widening_promotions_read_back
# (each pair exercised through real mixed-type parquet); anything off the
# list still demands a rebuild, because a wrong guess here is unreadable
# state.

_INT_CHAIN = ("tinyint", "smallint", "int", "bigint")
_INT_DECIMAL_DIGITS = {"tinyint": 3, "smallint": 5, "int": 10, "bigint": 20}


def _parse_decimal(t: str) -> tuple[int, int] | None:
    if not t.startswith("decimal(") or not t.endswith(")"):
        return None
    p, s = t[8:-1].split(",")
    return int(p), int(s)


def widened_type(a: str, b: str) -> str | None:
    """The wider of two Spark SQL types when the narrow->wide direction is
    a parquet read-promotion Spark supports; None when the pair is not
    safely widenable (a rebuild). Symmetric: callers pass (stored, batch)
    in either order — a replayed pre-DDL segment is NARROWER than the pin
    and must widen up to it, not shrink it."""
    if a == b:
        return a
    if a in _INT_CHAIN and b in _INT_CHAIN:
        return a if _INT_CHAIN.index(a) > _INT_CHAIN.index(b) else b
    if {a, b} == {"float", "double"}:
        return "double"
    da, db = _parse_decimal(a), _parse_decimal(b)
    if da and db and da[1] == db[1]:
        return a if da[0] >= db[0] else b
    # int-chain -> decimal(p,0) with p covering every value of the int type
    for int_t, dec_t, dec in ((a, b, db), (b, a, da)):
        if (
            int_t in _INT_CHAIN
            and dec is not None
            and dec[1] == 0
            and dec[0] >= _INT_DECIMAL_DIGITS[int_t]
        ):
            return dec_t
    return None


def merge_mirror_batch(
    batch_df: DataFrame,
    state_dir: str,
    epoch: int | None = None,
    n_buckets: int | None = None,
    value_cols: tuple[str, ...] | None = ("after_val",),
    keep_epochs: int | None = None,
    lock_ttl_s: float = _MERGE_LOCK_TTL_S,
    evolve_schema: bool = False,
    backend: ClaimBackend = DEFAULT_BACKEND,
    dropped_cols: tuple[str, ...] | None = None,
    merge_mode: str = "cow",
    compact_deltas: int = 8,
) -> None:
    """Idempotent TOAST-aware max-LSN-wins merge of one micro-batch into
    the pk-bucketed parquet mirror (Delta/Iceberg `MERGE INTO` stand-in).

    Only the buckets whose keys appear in the batch are read and rewritten
    — per-batch IO is O(batch ∪ touched-bucket state), independent of total
    mirror size. The stored mirror row is the old image for TOAST repair: a
    NULL new-image value inherits the stored value (unless a DELETE
    intervenes) — `operators.cdc.toast_fill` applied batch-side, so
    stream-maintained state equals batch `latest_state` over the full log.

    Commit protocol: write new bucket dirs under `epochs/e<epoch>/`, then
    atomically swap the manifest. A crash before the swap leaves the old
    manifest (and every directory it references) intact; replaying the same
    epoch overwrites the orphan and converges because the merge is
    idempotent.

    Concurrency: the whole read-manifest → write-epoch → swap critical
    section runs under a per-mirror cross-process lock (see _MergeLock), so
    N cooperating apps merging chunks into one shared mirror serialize
    instead of wiping each other's epoch dirs. Raises `MirrorLockLost`
    (pre-swap, mirror untouched) if the lock is lost mid-merge.

    Schema evolution: `value_cols=None` infers the batch's value columns
    (everything but the op/lsn/txn_seq/xid/commit_ts/pk envelope columns);
    `evolve_schema=True` lets a batch whose value columns are a
    TYPE-COMPATIBLE superset (or subset — a replayed pre-DDL segment) of
    the stored pin WIDEN the manifest's value schema instead of raising —
    the Spark-side analogue of the reference delivering a Relation
    re-send's new columns straight to sinks (relation.go:68-87 →
    stream.go decode). Pre-evolution buckets are untouched; reads fill
    the widened columns with NULL (a column added mid-stream has no CDC
    value for rows not touched since the DDL — PG doesn't ship DEFAULT
    backfills through logical decoding). A column whose type changed
    WIDENS the pin in place when the pair is a safe parquet
    read-promotion (`widened_type`: int-chain, float->double, decimal
    precision, int->decimal — SPARK-40876 makes old narrow bucket files
    readable under the wider pin); any other type change still raises.

    `dropped_cols` (requires evolve_schema) marks source-dropped columns
    dead in the manifest: the row shape keeps the column, reads mask it
    to NULL from this epoch on, the TOAST fill stops inheriting its
    stored values, and time travel through pre-drop manifest snapshots
    still serves the old values. A dropped name re-added later raises
    (rebuild) — un-masking would resurrect pre-drop values as the new
    column's.

    `backend` selects the coordination medium for the lock, the live
    manifest, and the epoch manifest snapshots (the data parquet rides
    Spark's own filesystem either way): default POSIX for
    filesystem/NFS mirrors; an `ObjectStoreBackend` for S3/GCS state
    dirs, where the commit-point manifest swap is a TRUE CAS on the etag
    read at merge start — a zombie that slipped past the ownership fence
    still loses the swap and raises `MirrorLockLost`.

    `merge_mode` (r9 verdict item 1 — the 100 TB write-amplification
    fix): "cow" (default) rewrites every affected bucket in full per
    batch — write volume ∝ touched-bucket STATE, which at uniform
    pk-hash bucketing means the whole mirror once batch ≳ n_buckets
    rows. "delta" appends the batch's raw events as per-epoch delta
    files for the touched buckets WITHOUT reading base — write volume ∝
    BATCH size — and `read_mirror`/`read_mirror_as_of`/`lookup_mirror`
    fold base+deltas per pk at read (`_fold_events`, the same dedup/
    TOAST/winner semantics as the COW merge, so both arms read
    identically over the same log). A bucket whose pending delta count
    reaches `compact_deltas` is compacted INSIDE the same merge (base +
    deltas + batch folded and rewritten, delta debt cleared) — steady
    state, every bucket's read cost is bounded by the budget and its
    amortized write cost by state/budget per compaction. Modes compose:
    a COW merge over a mirror with pending deltas folds and clears them
    for the buckets it touches; TRUNCATE always takes the full-rewrite
    path (all stored state dies, all delta debt clears).

    The delta arm's trade (the standard LSM one): a batch touching K
    buckets appends K small files (~1 per bucket, bounded open-file
    count at read by the budget). BYTES per batch drop from
    O(touched-bucket state) to O(batch); FILE COUNT per batch is K —
    size the trigger interval so batches are worth their K files, and
    let the budget-driven compaction fold the debt back into ~1 file
    per bucket. Reads never list the delta space: the manifest holds
    the exact rel paths."""
    if merge_mode not in ("cow", "delta"):
        raise ValueError(f"merge_mode must be 'cow' or 'delta', got {merge_mode!r}")
    backend.ensure_dir(state_dir)
    lock = _MergeLock(state_dir, ttl_s=lock_ttl_s, backend=backend)
    lock.acquire()
    try:
        _merge_mirror_batch_locked(
            batch_df, state_dir, lock, epoch=epoch, n_buckets=n_buckets,
            value_cols=value_cols, keep_epochs=keep_epochs,
            evolve_schema=evolve_schema, backend=backend,
            dropped_cols=dropped_cols, merge_mode=merge_mode,
            compact_deltas=compact_deltas,
        )
    finally:
        lock.release()


def _merge_mirror_batch_locked(
    batch_df: DataFrame,
    state_dir: str,
    lock: _MergeLock,
    epoch: int | None = None,
    n_buckets: int | None = None,
    value_cols: tuple[str, ...] | None = ("after_val",),
    keep_epochs: int | None = None,
    evolve_schema: bool = False,
    backend: ClaimBackend = DEFAULT_BACKEND,
    dropped_cols: tuple[str, ...] | None = None,
    merge_mode: str = "cow",
    compact_deltas: int = 8,
) -> None:
    spark = batch_df.sparkSession
    if value_cols is None:
        value_cols = tuple(
            f.name for f in batch_df.schema.fields if f.name not in _RESERVED_COLS
        )
    # capture the manifest's version at read: the commit swap below is
    # conditional on it (etag-enforcing backends make that a true CAS)
    manifest, manifest_etag = _read_manifest_versioned(state_dir, backend)
    if epoch is None:
        epoch = manifest["epoch"] + 1
    elif epoch <= manifest["epoch"]:
        # Reusing a committed epoch number would overwrite bucket dirs /
        # the immutable manifest snapshot retained manifests still
        # reference (the mirror_sink/seed collision class, live-PG
        # lifecycle finding) — time-travel history must never be
        # rewritten. A crash-before-swap replay is fine: the manifest
        # counter never advanced, so the replayed epoch is still fresh.
        raise ValueError(
            f"mirror epoch {epoch} at {state_dir} is not fresh (live "
            f"manifest epoch {manifest['epoch']}) and would overwrite bucket "
            "dirs or manifest snapshots a retained manifest still "
            "references; pass epoch=None to use the manifest counter"
        )
    # Retention is a property of the STORED mirror (like n_buckets /
    # value_schema): pinned in the manifest so a writer using the default
    # (engine seeding, multi_mirror_sink, an ad-hoc merge) can never
    # silently destroy another writer's retained time-travel history
    # (r6 review). Passing an explicit value UPDATES the pin — retention
    # is an adjustable policy, not a layout invariant.
    if keep_epochs is None:
        keep_epochs = int(manifest.get("keep_epochs", 1))
    manifest["keep_epochs"] = int(keep_epochs)
    # Bucket count is a property of the STORED mirror, not of the caller:
    # first write pins it in the manifest; after that a conflicting request
    # is a rebuild, not a silent re-hash (keys would land in other buckets
    # and the touched-bucket invariant would corrupt state).
    stored_n = manifest.get("n_buckets")
    if stored_n is None:
        n_buckets = n_buckets or MIRROR_BUCKETS
        manifest["n_buckets"] = n_buckets
    elif n_buckets is not None and n_buckets != stored_n:
        raise ValueError(
            f"mirror at {state_dir} was created with n_buckets={stored_n}; "
            f"re-bucketing to {n_buckets} is an explicit migration "
            "(rebucket_mirror / tools/rebucket_mirror.py), never a "
            "silent re-hash"
        )
    else:
        n_buckets = stored_n
    # The value-column schema is likewise a property of the STORED mirror
    # (reference parity: a sink table's row shape). Pinned at first write;
    # a later merge with different columns is a rebuild, not a silent
    # schema drift.
    incoming_fields = [
        (c, batch_df.schema[c].dataType.simpleString()) for c in value_cols
    ]
    value_schema = ", ".join(f"{n} {t}" for n, t in incoming_fields)
    stored_schema = manifest.get("value_schema")
    if stored_schema is None:
        if manifest["buckets"] and value_schema != "after_val double":
            # pre-multi-column mirror: its buckets hold (after_val double)
            # by construction — pinning ANY other schema over them (other
            # columns OR a differently-typed after_val) would mix parquet
            # types across buckets
            raise ValueError(
                f"mirror at {state_dir} predates multi-column support "
                f"(stores after_val double); merging [{value_schema}] "
                "requires a rebuild"
            )
        manifest["value_schema"] = value_schema
    elif stored_schema != value_schema:
        if not evolve_schema:
            # full DDL comparison — same NAMES with different TYPES would
            # write mixed-type parquet across buckets and break the union
            # at read time (r5 review finding)
            raise ValueError(
                f"mirror at {state_dir} stores [{stored_schema}]; merging "
                f"[{value_schema}] requires a rebuild"
            )
        # Widen: the union of stored + batch columns, stored order first
        # (bucket files already on disk keep their layout; an explicit-
        # schema read fills what a file lacks with NULL). A column whose
        # TYPE differs widens IN PLACE when the pair is a safe parquet
        # read-promotion (`widened_type` — the reference's Relation-cache
        # overwrite makes the new tuples authoritative, relation.go:68-87;
        # Spark's promotion rules make the old files readable under the
        # wider pin). A non-widenable change is still a rebuild.
        stored_fields = [
            (f.name, f.dataType.simpleString())
            for f in spark.createDataFrame([], stored_schema).schema.fields
        ]
        st_types = dict(stored_fields)
        in_types = dict(incoming_fields)
        conflicts = []
        target_fields = []
        for n, st_t in stored_fields:
            in_t = in_types.get(n, st_t)
            w = widened_type(st_t, in_t)
            if w is None:
                conflicts.append(f"{n} ({st_t} vs {in_t})")
                w = st_t
            target_fields.append((n, w))
        if conflicts:
            raise ValueError(
                f"mirror at {state_dir} stores [{stored_schema}]; batch "
                f"columns [{', '.join(conflicts)}] change type in a way "
                "parquet read-promotion cannot widen — rebuild required "
                "(safe widenings: int-chain, float->double, decimal "
                "precision, int->decimal)"
            )
        target_fields += [
            (n, t) for n, t in incoming_fields if n not in st_types
        ]
        value_schema = ", ".join(f"{n} {t}" for n, t in target_fields)
        manifest["value_schema"] = value_schema
        # project the batch onto the union: a replayed pre-DDL segment is
        # missing the new column — NULL there means "unchanged" to the
        # TOAST fill, which inherits any stored value (exactly right).
        # The cast is the widening direction by construction (lossless);
        # a replayed NARROW segment casts up to the pin.
        batch_df = batch_df.select(
            *[c for c in batch_df.columns if c not in in_types],
            *[
                F.col(n).cast(t).alias(n)
                if n in in_types
                else F.lit(None).cast(t).alias(n)
                for n, t in target_fields
            ],
        )
        value_cols = tuple(n for n, _t in target_fields)

    # Column DROPS (evolve_schema; r8 verdict item 7): record the drop
    # epoch in the manifest. The column keeps its slot in the pinned row
    # shape (bucket files still hold pre-drop values; time travel through
    # pre-drop manifest snapshots still serves them), but from this epoch
    # on reads mask it to NULL and the merge stops inheriting its stored
    # values through the TOAST fill — new tuples are authoritative, the
    # reference's Relation-cache overwrite (relation.go:68-87).
    pin_fields = [
        (f.name, f.dataType.simpleString())
        for f in spark.createDataFrame([], manifest["value_schema"]).schema.fields
    ]
    pin_types = dict(pin_fields)
    if dropped_cols:
        if not evolve_schema:
            raise ValueError("dropped_cols= requires evolve_schema=True")
        drops = manifest.setdefault("dropped", {})
        for c in dropped_cols:
            if c in pin_types and c not in drops:
                drops[c] = epoch
    dead = set(manifest.get("dropped", {}))
    if dropped_cols is not None:
        # authoritative per-batch drop list (the engine's Relation
        # sidecar): a manifest-dropped column that REAPPEARS in the live
        # schema is a re-created same-name column — un-masking it would
        # resurrect pre-drop stored values as if they were the new
        # column's; fail loudly instead of either loss mode
        readded = (dead - set(dropped_cols)) & set(value_cols)
        if readded:
            raise ValueError(
                f"columns {sorted(readded)} were dropped (mirror at "
                f"{state_dir}) and re-added with the same name; the "
                "mirror cannot distinguish old stored values from the "
                "new column — rebuild required"
            )

    # Event-order key: commit-rewritten envelopes carry (lsn, txn_seq) —
    # all rows of one transaction share the commit lsn and txn_seq splits
    # them; flat fixtures without txn_seq get 0 (their lsns are unique).
    seq_in = (
        F.col("txn_seq") if "txn_seq" in batch_df.columns else F.lit(0)
    ).cast("long")
    incoming = batch_df.select(
        "pk", "lsn", "op", *value_cols, seq_in.alias("txn_seq")
    ).withColumn("pb", _bucket_col(n_buckets=n_buckets))
    # Driver-side bucket routing (<= n_buckets ints — a plan-time scalar,
    # like the reference's per-batch table routing), plus the last
    # TRUNCATE position in the same single aggregate job.
    stats = incoming.agg(
        F.collect_set("pb").alias("pbs"),
        F.max(F.when(F.col("op") == "T", F.struct("lsn", "txn_seq"))).alias(
            "t_max"
        ),
    ).collect()[0]
    truncated = stats["t_max"] is not None
    if truncated:
        # TRUNCATE semantics (op 'T' from either transport): every stored
        # row and every batch event at or before the LAST truncate dies;
        # only events strictly after it survive. All stored buckets are
        # affected — each is rewritten with survivors or dropped from the
        # manifest.
        t_max = stats["t_max"]
        incoming = incoming.filter(
            F.struct("lsn", "txn_seq")
            > F.struct(
                F.lit(t_max["lsn"]).cast("long"),
                F.lit(t_max["txn_seq"]).cast("long"),
            )
        )
        affected = sorted(
            {int(b) for b in manifest["buckets"]}
            # delta-only buckets (merge-on-read debt, no base yet) die too
            | {int(b) for b, rels in (manifest.get("deltas") or {}).items() if rels}
            | {
                r["pb"]
                for r in incoming.select("pb").distinct().collect()
                if r["pb"] is not None  # NULL-pk rows hash to a NULL bucket
            }
        )
    else:
        affected = sorted(b for b in stats["pbs"] if b is not None)
    def commit_manifest() -> None:
        _commit_manifest(state_dir, manifest, manifest_etag, lock, backend)

    if not affected:
        # an EMPTY epoch still committed in the stream's checkpoint — give
        # it a snapshot (same buckets as the previous epoch) so
        # read_mirror_as_of(empty_epoch) works and the retention window
        # counts epochs, not just non-empty ones (r6 review)
        manifest["epoch"] = epoch
        commit_manifest()
        _gc_epochs(spark, state_dir, manifest, keep_epochs=keep_epochs,
                   backend=backend)
        return
    # Dead columns are masked to NULL on every input to the fold — the
    # TOAST fill then never resurrects a dropped column's stored values.
    def mask_dead(df: DataFrame) -> DataFrame:
        if not dead:
            return df
        return df.select(
            *[c for c in df.columns if c not in pin_types],
            *[
                F.lit(None).cast(pin_types[c]).alias(c) if c in dead else F.col(c)
                for c in df.columns
                if c in pin_types
            ],
        )

    all_deltas: dict = manifest.get("deltas") or {}
    # Writer-unique epoch dirs (suffixed with this merge's lock owner tag):
    # two writers can NEVER target the same data directory, so even a
    # zombie holder resuming after a lock takeover writes only an orphan —
    # its mode("overwrite") below cannot delete files a committed manifest
    # references. The manifest, not the dir name, is the epoch's identity;
    # a crashed/aborted merge leaves an unreferenced dir the next GC
    # removes. Delta appends land in a sibling `.d` dir so a delta-mode
    # merge that ALSO compacts never collides with its own base write.
    epoch_rel = os.path.join("epochs", f"e{epoch:09d}.{lock.owner[-8:]}")
    epoch_dir = os.path.join(state_dir, epoch_rel)
    delta_rel = epoch_rel + ".d"
    delta_dir = os.path.join(state_dir, delta_rel)

    if merge_mode == "delta" and not truncated:
        # MERGE-ON-READ (r9 verdict item 1): append the batch's raw events
        # for buckets under their delta budget — ZERO base reads, write
        # volume ∝ batch; compact the over-budget buckets inside the same
        # epoch (their amortized write cost is state/budget per merge).
        rewrite = sorted(
            b
            for b in affected
            if len(all_deltas.get(str(b), ())) >= max(int(compact_deltas), 1)
        )
        append = sorted(set(affected) - set(rewrite))
    elif truncated:
        # TRUNCATE: all stored state (base AND delta debt) dies wholesale;
        # survivors fold fresh — always the full-rewrite path.
        rewrite, append = affected, []
    else:
        rewrite, append = affected, []

    if append:
        (
            incoming.filter(F.col("pb").isin([int(b) for b in append]))
            .select("pk", "lsn", "op", "txn_seq", *value_cols, "pb")
            .repartition(max(len(append), 1), "pb")
            .write.mode("overwrite")
            .partitionBy("pb")
            .parquet(delta_dir)
        )
        deltas = manifest.setdefault("deltas", {})
        appended = {
            int(d.split("=", 1)[1])
            for d in _fs_list_names(spark, delta_dir)
            if d.startswith("pb=")
        }
        for b in append:
            if b in appended:
                deltas.setdefault(str(b), []).append(
                    os.path.join(delta_rel, f"pb={b}")
                )
    if rewrite:
        if truncated:
            base_paths: list[str] = []  # stored state dies — never read back
            delta_paths: list[str] = []
        else:
            base_paths = [
                os.path.join(state_dir, manifest["buckets"][str(b)])
                for b in rewrite
                if str(b) in manifest["buckets"]
            ]
            # pending merge-on-read debt folds in and clears (COW over a
            # delta'd mirror, or a delta-mode compaction — same path)
            delta_paths = [
                os.path.join(state_dir, rel)
                for b in rewrite
                for rel in all_deltas.get(str(b), ())
            ]
        parts = [
            incoming.filter(F.col("pb").isin([int(b) for b in rewrite])).drop("pb")
        ]
        if base_paths:
            # Stored rows are consolidated post-transaction state: give
            # them a txn_seq ABOVE any event's so a stored 'R' row wins
            # the fill/winner ordering against replayed events of the same
            # commit (bucket files stay (pk, lsn, op, values) — no on-disk
            # change). Explicit (possibly just-widened) schema: buckets
            # written before a schema evolution lack the new columns and
            # read as NULL.
            parts.append(
                spark.read.schema(_mirror_struct(spark, manifest["value_schema"]))
                .parquet(*base_paths)
                .select("pk", "lsn", "op", *value_cols)
                .withColumn("txn_seq", F.lit(STORED_ROW_SEQ).cast("long"))
            )
        if delta_paths:
            parts.append(
                spark.read.schema(_delta_struct(spark, manifest["value_schema"]))
                .parquet(*delta_paths)
                .select("pk", "lsn", "op", "txn_seq", *value_cols)
            )
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        # One explicit shuffle on pk up front: hash(pk) satisfies the
        # clustering requirement of ALL the fold's windows (incl. the
        # (pk,lsn,txn_seq) dedup — subset rule), so the merge body runs on
        # a single exchange.
        par = spark.sparkContext.defaultParallelism
        merged = merged.repartition(min(par, max(len(rewrite), 1)), F.col("pk"))
        state = _fold_events(mask_dead(merged), value_cols).withColumn(
            "pb", _bucket_col(n_buckets=n_buckets)
        )
        # ~1 writer task per bucket -> ~1 file per bucket dir (not
        # tasks*buckets)
        (
            # pk-sorted within each bucket file: parquet row-group min/max
            # stats on pk become selective, so bucket-pruned point lookups
            # (lookup_mirror) skip row groups INSIDE the bucket too — free
            # at write time (the sort is per rewrite unit), pays on every
            # read once buckets outgrow one row group
            state.repartition(len(rewrite), "pb")
            .sortWithinPartitions("pb", "pk")
            .write.mode("overwrite")
            .partitionBy("pb")
            .parquet(epoch_dir)
        )
        written = {
            int(d.split("=", 1)[1])
            for d in _fs_list_names(spark, epoch_dir)
            if d.startswith("pb=")
        }
        for b in rewrite:
            if b in written:
                manifest["buckets"][str(b)] = os.path.join(epoch_rel, f"pb={b}")
            else:
                # every key in the bucket was deleted
                manifest["buckets"].pop(str(b), None)
        if truncated:
            manifest.pop("deltas", None)  # all delta debt died with the state
        elif all_deltas:
            for b in rewrite:
                all_deltas.pop(str(b), None)  # folded in — debt cleared
    manifest["epoch"] = epoch
    # Commit: fence (a zombie holder must abort HERE — its epoch dirs are
    # unreferenced orphans the next GC removes), snapshot BEFORE the live
    # swap (every epoch the retention window keeps is readable the moment
    # the swap lands), then the etag-conditional live swap.
    commit_manifest()
    # refresh registered SQL views BEFORE GC deletes the bucket dirs their
    # old plans reference (register_mirror_view / ADVICE r4)
    for view_name in _MIRROR_VIEWS.get(_views_key(state_dir), ()):
        read_mirror(
            batch_df.sparkSession, state_dir, backend
        ).createOrReplaceTempView(view_name)
    _gc_epochs(spark, state_dir, manifest, keep_epochs=keep_epochs,
               backend=backend)


def compact_mirror(
    spark: SparkSession,
    state_dir: str,
    min_deltas: int = 1,
    keep_epochs: int | None = None,
    lock_ttl_s: float = _MERGE_LOCK_TTL_S,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> int:
    """Explicit delta-debt compaction — the maintenance half of the
    merge-on-read arm (budget-driven compaction inside `merge_mirror_batch`
    is the inline half): fold base+deltas for every bucket owing at least
    `min_deltas` pending delta files and rewrite those buckets, clearing
    their debt, WITHOUT waiting for a batch to touch them. Run it from a
    scheduled maintenance job when read latency matters more than write
    amplification (the Delta OPTIMIZE / Iceberg rewrite_data_files
    idiom). Same lock/CAS/snapshot/GC protocol as a merge — concurrent
    merges queue, a zombie loses the manifest CAS, time travel keeps
    working. Returns the number of buckets compacted (0 = nothing owed).

    Scale shape: reads ONLY the indebted buckets' base+delta files, one
    pk shuffle for the fold, writes ~1 file per compacted bucket."""
    backend.ensure_dir(state_dir)
    lock = _MergeLock(state_dir, ttl_s=lock_ttl_s, backend=backend)
    lock.acquire()
    try:
        manifest, manifest_etag = _read_manifest_versioned(state_dir, backend)
        deltas = manifest.get("deltas") or {}
        owed = sorted(
            int(b)
            for b, rels in deltas.items()
            if len(rels) >= max(int(min_deltas), 1)
        )
        if not owed:
            return 0
        epoch = manifest["epoch"] + 1
        if keep_epochs is None:
            keep_epochs = int(manifest.get("keep_epochs", 1))
        manifest["keep_epochs"] = int(keep_epochs)
        n_buckets = int(manifest.get("n_buckets") or MIRROR_BUCKETS)
        value_schema = manifest.get("value_schema", "after_val double")
        struct = _mirror_struct(spark, value_schema)
        value_cols = tuple(f.name for f in struct.fields[3:])
        dead = set(manifest.get("dropped", {}))
        ev = (
            spark.read.schema(_delta_struct(spark, value_schema))
            .parquet(
                *[
                    os.path.join(state_dir, rel)
                    for b in owed
                    for rel in deltas[str(b)]
                ]
            )
            .select("pk", "lsn", "op", "txn_seq", *value_cols)
        )
        base_paths = [
            os.path.join(state_dir, manifest["buckets"][str(b)])
            for b in owed
            if str(b) in manifest["buckets"]
        ]
        if base_paths:
            ev = ev.unionByName(
                spark.read.schema(struct)
                .parquet(*base_paths)
                .select("pk", "lsn", "op", *value_cols)
                .withColumn("txn_seq", F.lit(STORED_ROW_SEQ).cast("long"))
            )
        if dead:
            ev = ev.select(
                "pk",
                "lsn",
                "op",
                "txn_seq",
                *[
                    F.lit(None).cast(struct[c].dataType).alias(c)
                    if c in dead
                    else F.col(c)
                    for c in value_cols
                ],
            )
        par = spark.sparkContext.defaultParallelism
        ev = ev.repartition(min(par, max(len(owed), 1)), F.col("pk"))
        state = _fold_events(ev, value_cols).withColumn(
            "pb", _bucket_col(n_buckets=n_buckets)
        )
        epoch_rel = os.path.join("epochs", f"e{epoch:09d}.{lock.owner[-8:]}")
        epoch_dir = os.path.join(state_dir, epoch_rel)
        (
            state.repartition(len(owed), "pb")
            .sortWithinPartitions("pb", "pk")  # row-group pruning, see merge
            .write.mode("overwrite")
            .partitionBy("pb")
            .parquet(epoch_dir)
        )
        written = {
            int(d.split("=", 1)[1])
            for d in _fs_list_names(spark, epoch_dir)
            if d.startswith("pb=")
        }
        for b in owed:
            if b in written:
                manifest["buckets"][str(b)] = os.path.join(epoch_rel, f"pb={b}")
            else:
                manifest["buckets"].pop(str(b), None)  # all keys deleted
            deltas.pop(str(b), None)
        manifest["epoch"] = epoch
        _commit_manifest(state_dir, manifest, manifest_etag, lock, backend)
        for view_name in _MIRROR_VIEWS.get(_views_key(state_dir), ()):
            read_mirror(spark, state_dir, backend).createOrReplaceTempView(
                view_name
            )
        _gc_epochs(spark, state_dir, manifest, keep_epochs=keep_epochs,
                   backend=backend)
        return len(owed)
    finally:
        lock.release()


def mirror_changes_between(
    spark: SparkSession,
    state_dir: str,
    epoch_a: int,
    epoch_b: int,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> DataFrame:
    """Net-change feed between two RETAINED mirror epochs — the
    mirror-level `table_changes(a, b)` (the log-level twin is
    `operators.cdc.changes_between`): the minimal I/U/D row set taking a
    consumer from epoch A's state to epoch B's. Reads the two immutable
    epoch snapshots (merge-on-read deltas fold per epoch as recorded),
    full-outer diffs on pk with null-safe value comparison, and emits
    one row per net-changed key: (pk, change_op, before_<col>...,
    after_<col>...) over epoch B's (possibly evolution-widened) column
    pin — columns epoch A predates read NULL on the before side.

    Both epochs must still be retained (`keep_epochs`); a GC'd epoch
    raises (read_mirror_as_of's contract). Scale shape: two
    bucket-pruned snapshot reads and one pk equi-join — no log replay,
    cost ∝ the two states, not history length."""
    if epoch_a > epoch_b:
        raise ValueError(f"epochs out of order: {epoch_a} > {epoch_b}")
    mb, _ = backend.read(_snapshot_manifest_path(state_dir, epoch_b))
    if mb is None:
        raise ValueError(
            f"mirror epoch {epoch_b} is not retained at {state_dir}"
        )
    struct_b = _mirror_struct(spark, mb.get("value_schema", "after_val double"))
    value_fields = struct_b.fields[3:]

    def side(epoch: int, tag: str) -> DataFrame:
        df = read_mirror_as_of(spark, state_dir, epoch, backend)
        cols = [
            F.col(f.name).cast(f.dataType).alias(f"{tag}_{f.name}")
            if f.name in df.columns
            else F.lit(None).cast(f.dataType).alias(f"{tag}_{f.name}")
            for f in value_fields
        ]
        return df.select("pk", F.lit(True).alias(f"in_{tag}"), *cols)

    j = side(epoch_a, "before").join(side(epoch_b, "after"), "pk", "full_outer")
    va = F.struct(*[F.col(f"before_{f.name}") for f in value_fields])
    vb = F.struct(*[F.col(f"after_{f.name}") for f in value_fields])
    present_a = F.coalesce(F.col("in_before"), F.lit(False))
    present_b = F.coalesce(F.col("in_after"), F.lit(False))
    change = (
        F.when(~present_a & present_b, "I")
        .when(present_a & ~present_b, "D")
        .when(present_a & present_b & ~va.eqNullSafe(vb), "U")
    )
    return (
        j.withColumn("change_op", change)
        .filter(F.col("change_op").isNotNull())
        .select(
            "pk",
            "change_op",
            *[F.col(f"before_{f.name}") for f in value_fields],
            *[F.col(f"after_{f.name}") for f in value_fields],
        )
    )


def mirror_stats(
    spark: SparkSession,
    state_dir: str,
    backend: ClaimBackend = DEFAULT_BACKEND,
    target_rewrite_bytes: int = 512 << 20,
) -> dict:
    """Operational sizing/debt report for a mirror — the input side of
    the sizing loop (`mirror_stats` -> `suggest_mirror_buckets` ->
    `rebucket_mirror`):

      epoch, n_buckets, value_schema, keep_epochs — the manifest pins;
      base_bytes / base_files         — manifest-referenced bucket dirs;
      delta_bytes / delta_files       — pending merge-on-read debt;
      delta_debt                      — {bucket: pending delta count}
                                        (empty = fully compacted);
      suggested_buckets               — `suggest_mirror_buckets` on the
                                        live byte size: when this exceeds
                                        n_buckets, run rebucket_mirror.

    Reads ONLY manifest-referenced paths through Spark's Hadoop FS (any
    scheme the session resolves) — no Spark jobs, no full-state scan; at
    100 TB this is a listing of n_buckets directories, not a read."""
    manifest = _read_manifest(state_dir, backend)

    def du(rel_paths: list[str]) -> tuple[int, int]:
        total, files = 0, 0
        for rel in rel_paths:
            fs, jpath = _hadoop_fs(spark, os.path.join(state_dir, rel))
            if not fs.exists(jpath):
                continue
            for st in fs.listStatus(jpath):
                if st.isFile():
                    total += st.getLen()
                    files += 1
        return total, files

    deltas = {
        b: rels for b, rels in (manifest.get("deltas") or {}).items() if rels
    }
    base_bytes, base_files = du(list(manifest["buckets"].values()))
    delta_bytes, delta_files = du([r for rels in deltas.values() for r in rels])
    n = int(manifest.get("n_buckets") or MIRROR_BUCKETS)
    return {
        "epoch": manifest.get("epoch", -1),
        "n_buckets": n,
        "value_schema": manifest.get("value_schema", "after_val double"),
        "keep_epochs": int(manifest.get("keep_epochs", 1)),
        "base_bytes": base_bytes,
        "base_files": base_files,
        "delta_bytes": delta_bytes,
        "delta_files": delta_files,
        "delta_debt": {b: len(rels) for b, rels in deltas.items()},
        "suggested_buckets": suggest_mirror_buckets(
            base_bytes + delta_bytes, target_rewrite_bytes
        ),
    }


def rebucket_mirror(
    spark: SparkSession,
    state_dir: str,
    factor: int = 2,
    keep_epochs: int | None = None,
    lock_ttl_s: float = _MERGE_LOCK_TTL_S,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> int:
    """ONLINE bucket-count migration, N -> N*factor (r9 verdict item 6):
    a mirror sized for today's state needs more buckets after 100x
    growth (`suggest_mirror_buckets`), and the count is otherwise fixed
    at creation. This rewrites the whole mirror ONCE — epochs-atomically
    under the same merge lock, manifest CAS, and time-travel snapshot
    protocol as a merge, so:

      * readers never see mixed bucket counts — the manifest swap is the
        single visibility point, and any crash before it leaves only an
        unreferenced orphan dir the next GC removes;
      * a rebucket RACING a merge serializes on the merge lock; a zombie
        that slips the fence loses the etag CAS (loses cleanly — the
        mirror is untouched by it);
      * time travel ACROSS the rebucket epoch works: pre-rebucket
        snapshot manifests pin the old bucket dirs (and old n_buckets),
        post-rebucket ones the new — `read_mirror_as_of` reads either;
      * pending merge-on-read delta debt folds in (the rebucket is also
        a full compaction).

    `factor` must be a power of two: `pmod(xxhash64(pk), N)` is stable
    under power-of-two doubling — a key in old bucket b lands in b or
    b + N*2^i, never crossing other old buckets, which keeps
    `lookup_mirror`'s pruning exact at every point in history. Returns
    the new bucket count. The write is one full-state shuffle — size it
    like any table rewrite; the point is that it is ONLINE (concurrent
    merges queue on the lock, readers stay consistent), not free."""
    if factor < 2 or factor & (factor - 1):
        raise ValueError(f"rebucket factor must be a power of two, got {factor}")
    backend.ensure_dir(state_dir)
    lock = _MergeLock(state_dir, ttl_s=lock_ttl_s, backend=backend)
    lock.acquire()
    try:
        manifest, manifest_etag = _read_manifest_versioned(state_dir, backend)
        old_n = int(manifest.get("n_buckets") or MIRROR_BUCKETS)
        new_n = old_n * factor
        epoch = manifest["epoch"] + 1
        if keep_epochs is None:
            keep_epochs = int(manifest.get("keep_epochs", 1))
        manifest["keep_epochs"] = int(keep_epochs)
        # consolidated current state (folds any delta debt) re-hashed to
        # the new bucket count
        state = _manifest_df(spark, state_dir, manifest).withColumn(
            "pb", _bucket_col(n_buckets=new_n)
        )
        epoch_rel = os.path.join("epochs", f"e{epoch:09d}.{lock.owner[-8:]}")
        epoch_dir = os.path.join(state_dir, epoch_rel)
        (
            state.repartition(new_n, "pb")
            .sortWithinPartitions("pb", "pk")  # row-group pruning, see merge
            .write.mode("overwrite")
            .partitionBy("pb")
            .parquet(epoch_dir)
        )
        written = {
            int(d.split("=", 1)[1])
            for d in _fs_list_names(spark, epoch_dir)
            if d.startswith("pb=")
        }
        manifest["buckets"] = {
            str(b): os.path.join(epoch_rel, f"pb={b}") for b in sorted(written)
        }
        manifest.pop("deltas", None)  # folded into the rewrite
        manifest["n_buckets"] = new_n
        manifest["epoch"] = epoch
        _commit_manifest(state_dir, manifest, manifest_etag, lock, backend)
        for view_name in _MIRROR_VIEWS.get(_views_key(state_dir), ()):
            read_mirror(spark, state_dir, backend).createOrReplaceTempView(
                view_name
            )
        _gc_epochs(spark, state_dir, manifest, keep_epochs=keep_epochs,
                   backend=backend)
        return new_n
    finally:
        lock.release()


def mirror_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    n_buckets: int | None = None,
    value_cols: tuple[str, ...] | None = ("after_val",),
    keep_epochs: int | None = None,
    transform=None,
    evolve_schema: bool = False,
    backend: ClaimBackend = DEFAULT_BACKEND,
    dropped_cols=None,
    merge_mode: str = "cow",
    compact_deltas: int = 8,
    view_state_dir: str | None = None,
    view_groups: int = 8,
    view_value_col: str = "after_val",
    view_minmax: bool = False,
    maintain_every: int | None = None,
    maintain_min_deltas: int = 4,
    maintain_target_rewrite_bytes: int = 512 << 20,
    maintain_auto_rebucket: bool = False,
    on_maintenance=None,
):
    """Attach the mirror-maintenance sink to a change stream. Returns the
    StreamingQuery; call processAllAvailable() to drain in tests.
    `n_buckets` sizes a FRESH mirror (see sizing rule at MIRROR_BUCKETS /
    `suggest_mirror_buckets`); an existing mirror keeps its manifest-pinned
    count. `keep_epochs` > 1 retains that many epoch snapshots for
    `read_mirror_as_of` time travel. `merge_mode="delta"` /
    `compact_deltas` select the merge-on-read arm per micro-batch (write
    ∝ batch at state≫batch — see merge_mirror_batch).

    `transform(batch_df) -> DataFrame`, when given, runs INSIDE each
    foreachBatch on the micro-batch (batch semantics — aggregates and
    joins that Structured Streaming would reject pre-sink are legal
    here): the stream carries raw transport rows and the decode/typing
    happens per batch. Used by the test_decoding transport, whose
    commit-ts stamp is a per-xid aggregate+join.

    Epoch numbering comes from the MIRROR's manifest counter, NOT from
    Spark's foreachBatch batch id: the two counters live in different
    namespaces (the engine's snapshot seed already consumed mirror epoch
    0 before the stream's batch 0 arrives), and a collision is data loss
    — the colliding batch's `mode("overwrite")` epoch-dir write wipes
    every seeded bucket it doesn't itself touch while the manifest still
    references them (found by the live-PostgreSQL engine lifecycle
    test). A checkpoint REPLAY of a batch re-merges idempotently into a
    fresh epoch instead of overwriting (events dedupe against stored
    rows on (pk, lsn, txn_seq)); a pre-swap crash leaves only
    unreferenced orphan dirs, which the next GC removes.

    `view_state_dir` co-maintains an incremental aggregate view
    (`streaming.agg_view_stream`) from the SAME micro-batches: before
    images come from the mirror (bucket-pruned `mirror_befores_for`,
    read BEFORE the merge; staged deltas make checkpoint replay safe —
    see `update_agg_view_from_log`), and with `view_minmax=True` the
    min/max dirty-repair reads the post-merge mirror — the authoritative
    source the same batch just finished writing. View versions are keyed
    by Spark's foreachBatch id (its own namespace; the mirror-epoch
    collision caveat above concerns mirror epochs only) — which couples
    the view state dir's lifetime to the STREAMING CHECKPOINT's: deleting
    the checkpoint while keeping view_state_dir restarts batch ids at 0,
    and readers (who pick the highest committed version) would shadow the
    restarted stream's folds with stale higher versions. The fold detects
    this and fails fast (`agg_view_stream._check_not_shadowed`); treat
    checkpoint_dir + view_state_dir as one unit — delete or restore them
    together.

    View maintenance assumes THIS stream is the mirror's only writer
    while it runs (the same assumption the stream itself makes — two
    sinks feeding one mirror would double-apply events before any view
    enters the picture): a foreign merge landing between the before-read
    and this batch's merge would invalidate the staged deltas. The
    mirror's merge lock/CAS protects mirror INTEGRITY across processes,
    not view delta freshness.

    `maintain_every=N` (opt-in; r10 verdict item 6) runs the maintenance
    POLICY every N micro-batches, after the merge: consult `mirror_stats`
    (a manifest read + bucket-dir listing — no Spark job, no state scan);
    if any bucket owes >= `maintain_min_deltas` pending delta files, run
    `compact_mirror` at that threshold (driving lingering merge-on-read
    debt back under budget even for buckets no batch touches anymore);
    and when `suggest_mirror_buckets` (under
    `maintain_target_rewrite_bytes`) exceeds the pinned bucket count,
    SURFACE a rebucket recommendation — by default never auto-run it: a
    rebucket is a full-state rewrite whose scheduling belongs to an
    operator (`rebucket_mirror` is online but not free).
    `maintain_auto_rebucket=True` opts in to running the rebucket inside
    the policy tick (see `run_mirror_maintenance`). The post-policy
    stats dict — plus `rebucket_recommended` — goes to `on_maintenance`
    (wire `observability.CdcMetricsListener.record_mirror` to see it in
    /status)."""
    batch_counter = {"n": 0}

    def apply(batch_df: DataFrame, _spark_epoch: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        spark = batch_df.sparkSession
        if view_state_dir is not None:
            from .agg_view_stream import (
                fold_staged_view_deltas,
                stage_view_deltas,
            )

            # view version = spark batch id + 1: version 0 is reserved
            # for the engine's snapshot-seed initialization
            # (seed_agg_view_from_state)
            # thunk, not value: on a checkpoint replay the staged delta
            # dir already exists and stage_view_deltas short-circuits —
            # the manifest read + touched-bucket collect inside
            # mirror_befores_for must not run eagerly just to be thrown
            # away (r10 advisor)
            stage_view_deltas(
                batch_df,
                _spark_epoch + 1,
                view_state_dir,
                before_df=lambda: mirror_befores_for(
                    spark, state_dir, batch_df, view_value_col, backend
                ),
                n_groups=view_groups,
                value_col=view_value_col,
            )
        # dropped_cols may be a callable re-evaluated PER BATCH (the
        # engine's Relation-sidecar drop detection — a mid-stream DROP
        # COLUMN changes the answer between batches) or a static tuple
        dc = dropped_cols() if callable(dropped_cols) else dropped_cols
        merge_mirror_batch(
            batch_df, state_dir, epoch=None, n_buckets=n_buckets,
            value_cols=value_cols, keep_epochs=keep_epochs,
            evolve_schema=evolve_schema, backend=backend,
            dropped_cols=dc, merge_mode=merge_mode,
            compact_deltas=compact_deltas,
        )
        if view_state_dir is not None:
            authoritative = None
            if view_minmax:
                from ..operators.cdc import value_group

                dec = F.col(view_value_col).cast("decimal(18,2)")

                def authoritative():
                    # grp MUST come from the same value_group the staged
                    # deltas used — a second inline definition could
                    # silently repair the wrong groups (r10 review)
                    return read_mirror(spark, state_dir, backend).select(
                        value_group(view_groups)(dec).alias("grp"),
                        (dec * 100).cast("long").alias("v_cents"),
                    )

            fold_staged_view_deltas(
                spark,
                _spark_epoch + 1,
                view_state_dir,
                n_groups=view_groups,
                authoritative=authoritative,
                backend=backend,
            )
        batch_counter["n"] += 1
        if maintain_every and batch_counter["n"] % maintain_every == 0:
            # best-effort: the batch's MERGE already committed — failing
            # the foreachBatch here would force a (harmless but wasted)
            # idempotent replay just because maintenance lost a lock
            # race or a stats listing hiccuped; debt compaction retries
            # naturally at the next policy tick
            try:
                run_mirror_maintenance(
                    spark,
                    state_dir,
                    min_deltas=maintain_min_deltas,
                    target_rewrite_bytes=maintain_target_rewrite_bytes,
                    backend=backend,
                    on_maintenance=on_maintenance,
                    auto_rebucket=maintain_auto_rebucket,
                )
            except Exception:
                import logging

                logging.getLogger(__name__).warning(
                    "mirror maintenance pass failed (will retry in "
                    "%d batches)", maintain_every, exc_info=True,
                )

    return (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply)
        .start()
    )


def run_mirror_maintenance(
    spark: SparkSession,
    state_dir: str,
    min_deltas: int = 4,
    target_rewrite_bytes: int = 512 << 20,
    backend: ClaimBackend = DEFAULT_BACKEND,
    on_maintenance=None,
    auto_rebucket: bool = False,
) -> dict:
    """One maintenance-policy pass (see mirror_sink's `maintain_every`):
    compact past the debt threshold, then report post-policy stats with a
    `rebucket_recommended` flag. Also callable directly from a scheduled
    maintenance job against a quiescent or live mirror — it takes the
    same merge lock as any merge.

    `auto_rebucket` (OFF by default — r11 verdict item 8): when the
    recommendation fires, run `rebucket_mirror` right here with the
    smallest power-of-two factor that reaches `suggested_buckets`. The
    rebucket serializes on the merge lock and swaps epochs atomically
    like any merge, so readers and concurrent merges stay consistent —
    but it IS a full-state rewrite, which is why the default only
    surfaces the recommendation and leaves scheduling to an operator.
    Opt in when the mirror is small enough that an unscheduled rewrite
    inside a maintenance tick is acceptable. The report then carries
    `rebucket_performed` (the new bucket count) and re-read stats."""
    def read_stats() -> dict:
        s = mirror_stats(
            spark, state_dir, backend,
            target_rewrite_bytes=target_rewrite_bytes,
        )
        s["rebucket_recommended"] = s["suggested_buckets"] > s["n_buckets"]
        return s

    stats = read_stats()
    debt = stats["delta_debt"]
    if debt and max(debt.values()) >= min_deltas:
        compact_mirror(spark, state_dir, min_deltas=min_deltas, backend=backend)
        stats = read_stats()
    if auto_rebucket and stats["rebucket_recommended"]:
        factor = 2
        while stats["n_buckets"] * factor < stats["suggested_buckets"]:
            factor *= 2
        new_n = rebucket_mirror(
            spark, state_dir, factor=factor, backend=backend
        )
        stats = read_stats()
        stats["rebucket_performed"] = new_n
    if on_maintenance is not None:
        on_maintenance(stats)
    return stats


def multi_mirror_sink(
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    table_col: str = "tbl",
    n_buckets: int | None = None,
    keep_epochs: int | None = None,
    backend: ClaimBackend = DEFAULT_BACKEND,
    merge_mode: str = "cow",
    compact_deltas: int = 8,
):
    """O17 fan-out apply: one slot carries every published table's events;
    each micro-batch is split by table and merged into that table's mirror.
    The per-table loop is driver-side control flow only — each merge is a
    distributed job (tables per batch are few; rows are many)."""

    def apply(batch_df: DataFrame, _spark_epoch: int) -> None:
        tables = [r[0] for r in batch_df.select(table_col).distinct().collect()]
        for t in tables:
            # epoch=None: each table's mirror numbers its own epochs from
            # its manifest counter — Spark's batch id collides with epochs
            # an engine seed already wrote (see mirror_sink)
            merge_mirror_batch(
                batch_df.filter(F.col(table_col) == t).drop(table_col),
                os.path.join(state_root, t.replace(".", "__")),
                epoch=None,
                n_buckets=n_buckets,
                keep_epochs=keep_epochs,
                backend=backend,
                merge_mode=merge_mode,
                compact_deltas=compact_deltas,
            )

    return (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply)
        .start()
    )
