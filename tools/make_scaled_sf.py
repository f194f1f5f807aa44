"""Synthesize a larger scale factor from an existing one, for SCALE
SWEEPS only (r7 verdict item 4: catch AQE/broadcast-threshold plan drift
the sf0.1 bench can't see).

Replicates each fact table K times with key-space offsets so join
multiplicities stay TPC-H-shaped (each copy's orders point at that
copy's customers, etc.); dimension tables (region, nation) keep their
fixed cardinality, exactly like real TPC-H scale factors. Text/embedding
payloads repeat verbatim — fine for timing and for the Spark-vs-DuckDB
contract (both engines read the SAME files), but dedup-family result
SIZES are dominated by the replication (every doc gains K-1 exact
twins), which is itself a useful worst-case for the dedup operators.

Usage: python tools/make_scaled_sf.py [src_dir] [dst_dir] [k]
       defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table key columns to offset per replica: {table: {col: stride_of}}
# stride_of names the table whose key space the column indexes (its own
# max key defines the offset stride), so foreign keys stay consistent.
KEYMAP: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    # region / nation: fixed-cardinality dimensions — copied once
}

KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def scale(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = {
        n.removesuffix(".parquet"): pq.read_table(os.path.join(src, n))
        for n in sorted(os.listdir(src))
        if n.endswith(".parquet")
    }
    stride = {
        t: int(pc.max(tables[t][col]).as_py()) + 1 for t, col in KEY_OF.items()
    }
    for name, tbl in tables.items():
        out = os.path.join(dst, f"{name}.parquet")
        if name not in KEYMAP:
            pq.write_table(tbl, out)
            print(f"{name}: {tbl.num_rows} rows (dimension, copied once)")
            continue
        copies = []
        for i in range(k):
            c = tbl
            for col, of in KEYMAP[name].items():
                idx = c.schema.get_field_index(col)
                shifted = pc.add(c[col], i * stride[of])
                c = c.set_column(idx, c.schema.field(idx), shifted)
            copies.append(c)
        big = pa.concat_tables(copies)
        pq.write_table(big, out)
        print(f"{name}: {tbl.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, k)
