"""Registry-wide physical-plan lint: no UNJUSTIFIED scale funnels.

Every query in the registry is planned and scanned for the two
scale-killer shapes:

  * `Exchange SinglePartition` — everything funnels through ONE reducer
    task. Justified only when the input at that point is BOUNDED by the
    query, not by the data: a global scalar aggregate's final fold over
    per-partition partials, a broadcast-fold of k centroids/codebooks to
    one row, an ordered window over a literal time spine
    (range/granularity rows), or the final merge of a two-level
    reduction (<= salts*k rows).
  * `CartesianProduct` / `BroadcastNestedLoopJoin` — justified only for
    a 1-row broadcast scalar (threshold crossJoin) or a small broadcast
    side under a non-equi predicate (ANN query sets).

  * `Window` PARTITIONED BY a raw text-derived key (token / shingle /
    gram column) — token and shingle frequency is Zipfian; at crawl
    scale one stopword or boilerplate shingle is percents of the whole
    stream, and WindowExec sends every row of a partition through ONE
    task that AQE cannot split (unlike a skewed join). The fix is always
    the same: partial-aggregable `groupBy(key).agg(...)` (map-side
    combine collapses each task's hot key to one row) joined back to
    the stream (AQE skew-split handles the probe side) — the r12
    `token_rarity`/`ngram_novelty` rewrite. ORDER keys are exempt
    (a top-k tie-break on `token` orders within an already-bounded
    partition).

The allowlist below names every query that legitimately carries one of
these shapes and WHY. A new registry entry that introduces either shape
fails this test until it is either reshaped or added here with a
justification — silent single-reducer funnels are how 100 TB jobs die.
"""

from __future__ import annotations

import re

from go_pq_cdc_spark import plans

from .conftest import SF_DIR

# query name -> justification for the bounded funnel / nested-loop join
ALLOWED = {
    # global scalar aggregates: final fold over per-partition partials
    # (fan-in = number of map partitions, never data-proportional)
    "q6_revenue_forecast": "single-row global aggregate",
    "q14_promo_revenue": "single-row global aggregate",
    "q15_top_supplier": "global MAX scalar for the top-supplier filter",
    "q17_small_quantity_revenue": "single-row global aggregate",
    "q19_bracketed_revenue": "single-row global aggregate",
    "q22_idle_rich_customers": "global AVG scalar threshold (broadcast)",
    "q11_important_stock": "global SUM scalar threshold (broadcast)",
    "q_funnel_steps": "single-row funnel conversion summary",
    # literal time spine: cardinality = range/granularity, a property of
    # the QUERY (documented in plans/timeseries.py)
    "q_time_bucket_gapfill": "ordered fill window over the 720-bucket spine",
    "q_gapfill_interpolate": "ordered fill windows over the 720-bucket spine",
    # two-level distributed prefix sum: final offsets fold is bounded by
    # the partition count (documented in operators/training.py)
    "pack_token_sequences": "prefix-sum partition-offsets fold",
    "train_epoch_order": "prefix-sum partition-offsets fold",
    # broadcast folds of k centroids / codebooks to ONE row + non-equi
    # broadcast of the small query set (ANN family)
    "sim_ivf_topk": "centroid fold to one broadcast row; qset BNLJ",
    "sim_ivfpq_topk": "centroid+codebook folds; qset BNLJ",
    "sim_cosine_topk": "broadcast query set under non-equi predicate",
    "sim_pq_adc_topk": "broadcast query set under non-equi predicate",
    # per-cluster rate map derived from k IVF cells
    "sample_cluster_balanced": "k-cell rate fold to one broadcast row",
    # r10 mining family: 1-row scalar folds broadcast back (BNLJ with a
    # single-row build side); final top-k merge bounded by salts*k
    "text_heavy_hitters": "total-count scalar fold; 1-row threshold crossJoin",
    "text_bm25_topk": "corpus-stats scalar fold; 1-row crossJoin; salted top-k merge",
    # optimization r13: the corpus token total moved from a separate
    # collect() job into the SAME plan as a 1-row global aggregate
    # broadcast-crossJoined back (the text_heavy_hitters shape) — the
    # SinglePartition fold's fan-in is the map-partition count and the
    # BNLJ build side is exactly one row
    "text_rarity_score": "corpus-total scalar fold; 1-row crossJoin",
    "text_rarity_skew": "corpus-total scalar fold; 1-row crossJoin",
    # optimization r13 change 12: n_docs moved from a plan-time count()
    # JOB into the same 1-row scalar-fold + crossJoin shape as above
    "text_keywords": "n_docs scalar fold; 1-row crossJoin",
    "dedup_semantic": "centroid fold to one broadcast row (ivf_assign)",
    # optimization r14: the Bloom build moved from two plan-time driver
    # jobs (dim count + state collect) INTO the plan — the dense-state
    # fold is a 1-row aggregate whose input is bounded by words + dim
    # cells (never fact-proportional), crossJoin-broadcast onto the fact
    # scan exactly like the text_heavy_hitters scalar folds
    "q_bloom_join_prune": "bloom-state fold to one broadcast row; 1-row crossJoin",
}

# Window PARTITION keys that are Zipfian raw text-derived values — a
# window partitioned on one funnels the hot key through a single task.
# Matched against the base column name (case-insensitive, trailing
# Catalyst #id stripped).
BANNED_WINDOW_KEYS = {"token", "sh", "shingle", "gram", "g", "word"}

# query -> justification for a window partitioned on a banned-name key
ALLOWED_WINDOW_KEYS = {
    # `g` here is a gram-group key whose partitions are capped at 2..20
    # docs BY CONSTRUCTION upstream (operators/text.py substring dedup
    # keeps only gram groups of 2..20 docs before the window) — bounded
    # fan-in, not a Zipfian funnel. (text_substring_dedup itself rolls
    # up without a window; only the _apply arm windows on `g`.)
    "text_substring_dedup_apply": "gram groups capped at 2..20 docs upstream",
}


def _window_partition_keys(plan: str) -> set[str]:
    """Base column names of every Window PARTITION BY key in a physical
    plan string. windowspecdefinition args are: partition cols, then
    order cols (carrying ASC/DESC), then the frame spec — partition keys
    are the leading args with no sort direction."""
    keys: set[str] = set()
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        for arg in m.group(1).split(","):
            arg = arg.strip()
            if " ASC" in arg or " DESC" in arg or "windowframe" in arg:
                break
            col = re.match(r"(\w+)#\d+", arg)
            if col:
                keys.add(col.group(1).lower())
    return keys


def _lint_one(spark, spec) -> tuple[str | None, frozenset[str]]:
    df = spec.spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    marks = []
    if "Exchange SinglePartition" in plan:
        marks.append("SinglePartition")
    if "CartesianProduct" in plan:
        marks.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        marks.append("BroadcastNestedLoopJoin")
    banned = frozenset(_window_partition_keys(plan) & BANNED_WINDOW_KEYS)
    return (", ".join(marks) if marks else None), banned


def test_no_unjustified_scale_funnels(spark):
    # Planning is JVM-side analysis; py4j releases the GIL, so a thread
    # pool gets real parallelism. Some plan builders collect plan-time
    # scalars (MIN/MAX bounds, centroids) — those Spark jobs are
    # thread-safe and schedule concurrently under local[*]. This was the
    # suite's single dominant test (410s serial); threads cut it ~4-6x.
    #
    # Each worker plans through its OWN spark.newSession() (shared
    # SparkContext, isolated SQLConf + temp-view catalog): registry plan
    # builders are REQUIRED to be session-state-pure (no conf mutation,
    # no temp views left behind — the driver runs them back-to-back in
    # one session), but a violation under a shared session here would
    # surface as cross-thread flakiness instead of a clean failure; the
    # isolation makes any such bug deterministic per-query (r10 advisor).
    from concurrent.futures import ThreadPoolExecutor

    items = sorted(plans.REGISTRY.items())
    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(
            ex.map(lambda kv: (kv[0], _lint_one(spark.newSession(), kv[1])), items)
        )
    flagged = {name: marks for name, (marks, _) in results if marks}
    unjustified = {n: m for n, m in flagged.items() if n not in ALLOWED}
    assert not unjustified, (
        "queries with UNJUSTIFIED single-reducer funnels or nested-loop "
        f"joins (reshape, or allowlist with a reason): {unjustified}"
    )
    # the allowlist must not rot: every entry still exhibits its shape
    stale = sorted(set(ALLOWED) - set(flagged))
    assert not stale, f"allowlist entries no longer flagged (remove): {stale}"

    # Zipfian raw-key windows: WindowExec partitioned on a raw token /
    # shingle / gram column — rewrite as groupBy + join-back (see module
    # docstring), or allowlist with a bounded-fan-in justification.
    win_flagged = {name: sorted(keys) for name, (_, keys) in results if keys}
    win_unjustified = {
        n: k for n, k in win_flagged.items() if n not in ALLOWED_WINDOW_KEYS
    }
    assert not win_unjustified, (
        "queries with a Window PARTITIONED on a raw Zipfian text key "
        f"(rewrite as partial-agg + join-back): {win_unjustified}"
    )
    win_stale = sorted(set(ALLOWED_WINDOW_KEYS) - set(win_flagged))
    assert not win_stale, (
        f"window-key allowlist entries no longer flagged (remove): {win_stale}"
    )
