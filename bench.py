"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is materialized via count() (full plan execution, no driver
collect overhead). The first query pays JVM/session warmup; a warmup scan
is run first so per-query times reflect plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_pq_cdc_spark import plans  # noqa: E402
from go_pq_cdc_spark.catalog import TABLES, load_table  # noqa: E402
from go_pq_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("go-pq-cdc-spark-bench")

    # Warm up the JVM + file listing so query timings measure execution.
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    bench_specs = [s for s in plans.REGISTRY.values() if s.bench]
    times: dict[str, float] = {}
    for spec in sorted(bench_specs, key=lambda s: s.name):
        t0 = time.perf_counter()
        spec.spark_fn(spark, sf_dir).count()
        times[spec.name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
