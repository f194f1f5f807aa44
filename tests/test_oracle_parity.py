"""Mirror of the driver's t2 gate: every REGISTRY entry with an oracle must
hash-match DuckDB on the same parquet tables (run locally at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from go_pq_cdc_spark import plans

from .conftest import SF_DIR, assert_frames_match, register_duckdb_views

# slow tier (r13 verdict item 1): excluded from the default pytest run
# so the driver's gate finishes inside its window; run with
# `pytest -m "slow or not slow"` (full) or `-m slow` (this tier only).
pytestmark = pytest.mark.slow

SPECS = sorted(plans.REGISTRY.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle], ids=lambda s: s.name)
def test_oracle_parity(spark, ddb, spec):
    register_duckdb_views(ddb, SF_DIR)
    df = spec.spark_fn(spark, SF_DIR)
    assert_frames_match(df, ddb, spec.oracle, name=spec.name)


@pytest.mark.parametrize("spec", [s for s in SPECS if not s.oracle], ids=lambda s: s.name)
def test_rows_only(spark, spec):
    df = spec.spark_fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
