#!/bin/sh
# Scale sweep: synthesize a 10x SF dir (if absent) and run the
# driver-faithful full-registry verify against it on most of the box.
#
# Usage:  sh tools/run_sf_sweep.sh [sf1_dir]
#
# Why this exists (r8): the per-round driver gate runs at sf0.01 and the
# bench at sf0.1 — neither sees plan pathologies that only appear at 10x
# (r6's prefix-sum literal-bounds bug; r8's blocked-self-join funnel and
# AQE input-sized coalescing of output-explosive joins). The sweep is
# the net for what the static plan lint cannot express.
#
# Four queries are excluded for their DUCKDB ORACLES (not their Spark
# plans): dedup_ngram_jaccard's blocked all-pairs SQL Jaccard is hours
# of DuckDB at sf1, dedup_cluster_assign's recursive-CTE closure takes
# ~40 min (it DID match at sf1 in a one-off run, r8), and
# dedup_semantic's within-cell pair SQL is the same quadratic class
# (~20M 64-dim list-dot pairs per cell at sf1) — as is
# emb_semdedup_stream_pairs (r12), which shares that oracle's pair join.
# All Spark sides run fine at sf1; all four oracles hash-MATCH at
# sf0.01.
set -e
cd "$(dirname "$0")/.."
SF1_DIR="${1:-/tmp/sf1}"
if [ ! -f "$SF1_DIR/lineitem.parquet" ]; then
    echo "synthesizing $SF1_DIR from /root/testdata/sf0.1 (10x)..."
    python tools/make_scaled_sf.py /root/testdata/sf0.1 "$SF1_DIR" 10
fi
NAMES=$(python - <<'EOF'
import sys
sys.path.insert(0, ".")
from go_pq_cdc_spark import plans
skip = {
    "dedup_ngram_jaccard",
    "dedup_cluster_assign",
    "dedup_semantic",
    "emb_semdedup_stream_pairs",
}
print(" ".join(n for n in sorted(plans.REGISTRY) if n not in skip))
EOF
)
CPUS=$(($(nproc) - 4))
[ "$CPUS" -lt 4 ] && CPUS=4
echo "sweeping $(echo "$NAMES" | wc -w) queries at $SF1_DIR on local[$CPUS]..."
SPARK_GRAFT_VERIFY_CPUS=$CPUS exec python -u tools/verify_driver_contract.py "$SF1_DIR" $NAMES
