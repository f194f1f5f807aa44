"""go_pq_cdc_spark — a PySpark-native engine with the capabilities of
Trendyol/go-pq-cdc (PostgreSQL CDC: chunked parallel snapshots + logical
replication streaming), re-expressed Spark-first, plus the relational and
LLM-data-pipeline surface a 100 TB training-data platform needs.

Layout (mirrors SURVEY.md §7 build plan):
  envelope    — normalized change-event schema + PG→Spark type mapping (M0)
  config      — engine config dataclasses + validations (M0, ref config/config.go)
  snapshot    — chunk planners: integer-range / ctid-block / offset (M1, ref pq/snapshot)
  sources     — parquet/JDBC table sources + synthetic changelog source (M1/M2)
  operators   — CDC merge/TOAST/txn-assembly + dedup/similarity/text ops (M3/M5)
  streaming   — Structured Streaming wrappers: changelog stream, stateful txn buffer (M2)
  plans       — query registry: every entry has a Spark plan + a DuckDB oracle SQL
"""

__version__ = "0.1.0"
