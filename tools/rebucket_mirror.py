#!/usr/bin/env python
"""Online mirror rebucketing CLI (r9 verdict item 6).

    python tools/rebucket_mirror.py <state_dir> [--factor 2]

Doubles (or 2^k-multiplies) the mirror's bucket count in ONE
epochs-atomic rewrite under the merge lock: concurrent merges queue on
the lock, readers stay on the old manifest until the single commit-point
swap, time travel across the rebucket epoch keeps working, and any
pending merge-on-read delta debt folds in. See
`go_pq_cdc_spark.streaming.changelog_stream.rebucket_mirror` for the
full protocol. Size guidance: `suggest_mirror_buckets(state_bytes)`.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("state_dir", help="mirror state directory (path or URI)")
    ap.add_argument(
        "--factor", type=int, default=2,
        help="bucket multiplier, power of two (default 2)",
    )
    ap.add_argument(
        "--keep-epochs", type=int, default=None,
        help="override the mirror's pinned time-travel retention",
    )
    ap.add_argument(
        "--stats", action="store_true",
        help="print the mirror's sizing/debt report (mirror_stats) and "
        "exit without rewriting anything",
    )
    args = ap.parse_args()

    import json

    from go_pq_cdc_spark.session import get_spark
    from go_pq_cdc_spark.streaming.changelog_stream import (
        mirror_stats,
        rebucket_mirror,
    )

    spark = get_spark("rebucket-mirror")
    if args.stats:
        print(json.dumps(mirror_stats(spark, args.state_dir), indent=2))
        return
    new_n = rebucket_mirror(
        spark, args.state_dir, factor=args.factor, keep_epochs=args.keep_epochs
    )
    print(f"rebucketed {args.state_dir} -> n_buckets={new_n}")


if __name__ == "__main__":
    main()
