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
    key = catalog._schema_cache_key(table_path(SF_DIR, "lineitem"))
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


def test_in_place_part_file_rewrite_invalidates(spark, tmp_path):
    """ADVICE r13: a part file overwritten IN PLACE (same filename, same
    directory mtime restored) must still invalidate — the key folds the
    child listing (count, max mtime, bytes) in, so a size or timestamp
    change on any part file re-infers instead of serving a stale schema
    as silent NULLs."""
    src = table_path(SF_DIR, "region")
    dst = str(tmp_path / "t.parquet")
    copy = shutil.copytree if os.path.isdir(src) else shutil.copyfile
    copy(src, dst)
    _SCHEMA_CACHE.clear()
    before = catalog._read_with_cached_schema(spark, dst).schema
    assert len(_SCHEMA_CACHE) == 1
    # overwrite IN PLACE with a table of a DIFFERENT schema (same path;
    # for a directory table the part filenames change too, which the
    # child listing in the key also covers), pinning the parent mtime
    # back so only child metadata differs
    other = table_path(SF_DIR, "nation")
    if os.path.isdir(dst):
        dir_times = (os.path.getatime(dst), os.path.getmtime(dst))
        shutil.rmtree(dst)
        copy(other, dst)
        os.utime(dst, dir_times)
    else:
        times = (os.path.getatime(dst), os.path.getmtime(dst))
        shutil.copyfile(other, dst)
        os.utime(dst, times)  # same path mtime; size/listing differ
    after = catalog._read_with_cached_schema(spark, dst).schema
    assert len(_SCHEMA_CACHE) == 2  # fresh key -> fresh inference entry
    assert after != before  # and the NEW schema is served, not the stale one
