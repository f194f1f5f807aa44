"""A/B timing harness for individual registry queries (optimization rounds).

Usage:
    python tools/time_queries.py [--reps N] [--noop] query [query ...]

Times each query's full plan execution `--reps` times (default 5) in one
session and prints min/median. Default action is `.count()` — the bench
contract's timed action — pass `--noop` to time via the no-op sink
(guide §1.4: materializes every column) for diagnosis.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_pq_cdc_spark import plans  # noqa: E402
from go_pq_cdc_spark.catalog import TABLES, load_table  # noqa: E402
from go_pq_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    noop = False
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--noop" in args:
        args.remove("--noop")
        noop = True
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    for name in args:
        spec = plans.REGISTRY[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name:34s} min={min(times):.3f} med={statistics.median(times):.3f} "
            f"all={[round(x, 3) for x in times]}"
        )


if __name__ == "__main__":
    main()
