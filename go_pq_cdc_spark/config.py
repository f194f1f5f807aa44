"""Engine configuration + validation (reference O34, `config/config.go`).

Mirrors the reference's defaulting and cross-validation rules
(config/config.go:69-129 defaults, :146-277 validation, :306-378
per-table precedence):
  * snapshot chunk size default 8000 (config.go:113-114)
  * pgoutput protocol version default 2, allowed {1, 2}
  * default schema 'public'
  * snapshot tables must be a subset of publication tables
  * heartbeat table must be inside the publication (config.go:206-228)
  * REPLICA IDENTITY FULL is incompatible with a column list
    (publication/table.go:57-59)
  * queryCondition keyword blocklist (publication/query_condition.go:9-33)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DEFAULT_CHUNK_SIZE = 8000
DEFAULT_SCHEMA = "public"
DEFAULT_PROTO_VERSION = 2

SNAPSHOT_MODES = ("initial", "never", "snapshot_only")
SNAPSHOT_STRATEGIES = ("auto", "integer_range", "ctid_block", "offset")
REPLICA_IDENTITIES = ("DEFAULT", "FULL", "NOTHING", "INDEX")

# The reference blocks obviously-dangerous constructs in user row filters
# (query_condition.go:9-33). We additionally parse-check at plan time.
_FORBIDDEN_CONDITION = re.compile(
    r"(;|--|\b(insert|update|delete|drop|alter|create|grant|truncate)\b)", re.IGNORECASE
)


class ConfigError(ValueError):
    pass


@dataclass
class TableConfig:
    """Per-table capture config (`pq/publication/table.go:33-46`)."""

    name: str
    schema: str = DEFAULT_SCHEMA
    columns: list[str] | None = None  # None = all columns (O15)
    query_condition: str | None = None  # snapshot row filter (O16)
    replica_identity: str = "DEFAULT"
    replica_identity_index: str | None = None  # required iff identity INDEX
    snapshot_strategy: str = "auto"  # O13 override
    partitioned: bool = False  # publish_via_partition_root (O32)

    def __post_init__(self) -> None:
        # the reference spells the option "USING INDEX"
        # (publication/replica_identity.go:19); accept either spelling and
        # store the canonical short form
        if self.replica_identity == "USING INDEX":
            self.replica_identity = "INDEX"

    @property
    def qualified(self) -> str:
        return f"{self.schema}.{self.name}"

    def validate(self) -> None:
        if not self.name:
            raise ConfigError("table name required")
        if self.replica_identity not in REPLICA_IDENTITIES:
            raise ConfigError(
                f"{self.qualified}: replica identity {self.replica_identity!r} "
                f"not in {REPLICA_IDENTITIES}"
            )
        if self.replica_identity == "FULL" and self.columns:
            # reference: column list forbidden with FULL (table.go:57-59)
            raise ConfigError(
                f"{self.qualified}: column list cannot be combined with REPLICA IDENTITY FULL"
            )
        if self.replica_identity == "INDEX":
            # reference: index name required with USING INDEX (table.go:62-66)
            if not (self.replica_identity_index or "").strip():
                raise ConfigError(
                    f"{self.qualified}: replica_identity_index is required "
                    "when replica identity is INDEX"
                )
        elif (self.replica_identity_index or "").strip():
            # reference: index name forbidden otherwise (table.go:67-69)
            raise ConfigError(
                f"{self.qualified}: replica_identity_index can only be set "
                "when replica identity is INDEX"
            )
        if self.snapshot_strategy not in SNAPSHOT_STRATEGIES:
            raise ConfigError(
                f"{self.qualified}: snapshot strategy {self.snapshot_strategy!r} "
                f"not in {SNAPSHOT_STRATEGIES}"
            )
        if self.query_condition:
            validate_query_condition(self.query_condition)


def validate_query_condition(cond: str) -> None:
    """queryCondition blocklist (`publication/query_condition.go:9-33`)."""
    m = _FORBIDDEN_CONDITION.search(cond)
    if m:
        raise ConfigError(f"forbidden token {m.group(0)!r} in query condition {cond!r}")


@dataclass
class EngineConfig:
    """Top-level engine config (`config/config.go:19-33`)."""

    publication_name: str = "cdc_publication"
    slot_name: str = "cdc_slot"
    tables: list[TableConfig] = field(default_factory=list)
    all_tables: bool = False  # FOR ALL TABLES (publication/config.go:16)
    publish_ops: tuple[str, ...] = ("insert", "update", "delete", "truncate")
    proto_version: int = DEFAULT_PROTO_VERSION
    snapshot_mode: str = "initial"
    snapshot_tables: list[str] | None = None  # None = all published tables
    chunk_size: int = DEFAULT_CHUNK_SIZE
    heartbeat_enabled: bool = True
    heartbeat_table: str = "cdc_heartbeat"
    heartbeat_schema: str = DEFAULT_SCHEMA
    heartbeat_interval_s: float = 10.0  # HeartbeatConfig.Interval (config.go:48-51)
    slot_create_if_not_exists: bool = True  # slot.Config (slot/config.go:16)
    # Logical decoding plugin the slot is created with: "pgoutput" for the
    # socket transport (binary, START_REPLICATION only), "wal2json" /
    # "test_decoding" for the polling transport (text-mode get/peek).
    # test_decoding is the contrib plugin compiled with every PostgreSQL
    # build — the no-extra-extension poll arm (sources/test_decoding.py).
    slot_plugin: str = "pgoutput"
    slot_activity_checker_interval_s: float = 1.0  # slot/config.go:11
    enable_timescaledb: bool = False  # ExtensionSupport (config.go:44-46)
    # Force a fresh snapshot: clear the completed-job marker so the seed
    # reprocesses ALL data (reference config.go:328 `Resnapshot`;
    # integration_test/snapshot_force_resnapshot_test.go)
    resnapshot: bool = False
    global_query_condition: str | None = None

    def table_query_condition(self, table: TableConfig) -> str | None:
        """Per-table condition wins over global (config.go:193-199)."""
        return table.query_condition or self.global_query_condition

    def validate(self) -> None:
        if not self.publication_name or not self.slot_name:
            raise ConfigError("publication_name and slot_name are required")
        if self.proto_version not in (1, 2):
            raise ConfigError(f"proto_version must be 1 or 2, got {self.proto_version}")
        if self.snapshot_mode not in SNAPSHOT_MODES:
            raise ConfigError(
                f"snapshot_mode {self.snapshot_mode!r} not in {SNAPSHOT_MODES}"
            )
        if self.chunk_size < 1:
            raise ConfigError("chunk_size must be positive")
        if self.slot_plugin not in ("pgoutput", "wal2json", "test_decoding"):
            raise ConfigError(
                f"slot_plugin {self.slot_plugin!r} not in "
                "('pgoutput', 'wal2json', 'test_decoding')"
            )
        bad_ops = set(self.publish_ops) - {"insert", "update", "delete", "truncate"}
        if bad_ops:
            raise ConfigError(f"unknown publish ops: {sorted(bad_ops)}")
        if self.heartbeat_interval_s <= 0:
            raise ConfigError("heartbeat_interval_s must be positive")
        if self.slot_activity_checker_interval_s <= 0:
            raise ConfigError("slot_activity_checker_interval_s must be positive")
        for t in self.tables:
            t.validate()
        if self.all_tables:
            # FOR ALL TABLES publishes every table with every column; a
            # per-table column list is a FOR TABLE-only feature and would be
            # silently ignored — reject it loudly instead.
            with_cols = [t.qualified for t in self.tables if t.columns]
            if with_cols:
                raise ConfigError(
                    "per-table column lists cannot be combined with "
                    f"all_tables (FOR ALL TABLES): {with_cols}"
                )
        published = {t.qualified for t in self.tables}
        if self.snapshot_tables is not None and not self.all_tables:
            missing = set(self.snapshot_tables) - published
            if missing:
                # reference: snapshot tables must be published (config.go)
                raise ConfigError(
                    f"snapshot tables not in publication: {sorted(missing)}"
                )
        if self.heartbeat_enabled and self.tables and not self.all_tables:
            hb = f"{self.heartbeat_schema}.{self.heartbeat_table}"
            if hb not in published:
                # reference: heartbeat must be captured or its events can't
                # advance the confirmed LSN (config.go:206-228)
                raise ConfigError(
                    f"heartbeat table {hb} must be included in the publication"
                )
        if self.global_query_condition:
            validate_query_condition(self.global_query_condition)
