"""The catalog schema cache (optimization r13): `load_table` infers each
parquet table's schema ONCE per (path, mtime) and declares it on every
later read — a bare `spark.read.parquet(path)` runs a footer-read
schema-inference JOB per call, which a 6-table query build paid 6 times
at every plan build. Contents are still read per execution; only
plan-time metadata is cached, and an mtime change invalidates."""

from __future__ import annotations

import os
import shutil

from go_pq_cdc_spark import catalog
from go_pq_cdc_spark.catalog import _SCHEMA_CACHE, load_table, table_path

from .conftest import SF_DIR


def test_second_load_serves_schema_from_cache(spark):
    _SCHEMA_CACHE.clear()
    df1 = load_table(spark, SF_DIR, "lineitem")
    key = (
        table_path(SF_DIR, "lineitem"),
        os.path.getmtime(table_path(SF_DIR, "lineitem")),
    )
    assert key in _SCHEMA_CACHE
    df2 = load_table(spark, SF_DIR, "lineitem")
    # identical declared schema, identical contents
    assert df1.schema == df2.schema
    assert df2.count() == df1.count()


def test_cached_schema_matches_inference(spark):
    _SCHEMA_CACHE.clear()
    for name in ("orders", "documents", "events"):
        # the raw cached read (load_table post-casts events.ts by design)
        cached = catalog._read_with_cached_schema(
            spark, table_path(SF_DIR, name)
        ).schema
        bare = spark.read.parquet(table_path(SF_DIR, name)).schema
        assert cached == bare, name


def test_mtime_change_invalidates(spark, tmp_path):
    src = table_path(SF_DIR, "region")
    dst = str(tmp_path / "region.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)
    df = catalog._read_with_cached_schema(spark, dst)
    n_keys = len(_SCHEMA_CACHE)
    assert df.count() > 0
    # bump mtime: the old cache entry no longer matches -> fresh inference
    os.utime(dst, (os.path.getmtime(dst) + 10, os.path.getmtime(dst) + 10))
    df2 = catalog._read_with_cached_schema(spark, dst)
    assert df2.schema == df.schema
    assert len(_SCHEMA_CACHE) == n_keys + 1
