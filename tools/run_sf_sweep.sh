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
# No oracle exclusions (r12 verdict item 6 closed the last four in r13):
# the formerly-excluded quadratic DuckDB formulations were rewritten to
# mirror the Spark sides' blocking — dedup_ngram_jaccard via the
# inverted-index join (hours -> ~190s at sf1), dedup_cluster_assign via
# MATERIALIZED pair/edge CTEs (DuckDB re-evaluated the full LSH SQL
# inside the recursive closure; ~40 min -> ~365s), and the two SemDeDup
# oracles via a conservatively-margined native list_dot_product
# prefilter + once-per-vector fixed-point scaling + MATERIALIZED CTEs
# (~20-30 min each -> ~20s) — every rewrite provably result-identical,
# re-MATCHed at sf0.01.
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
print(" ".join(sorted(plans.REGISTRY)))
EOF
)
CPUS=$(($(nproc) - 4))
[ "$CPUS" -lt 4 ] && CPUS=4
echo "sweeping $(echo "$NAMES" | wc -w) queries at $SF1_DIR on local[$CPUS]..."
SPARK_GRAFT_VERIFY_CPUS=$CPUS exec python -u tools/verify_driver_contract.py "$SF1_DIR" $NAMES
