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

The allowlist below names every query that legitimately carries one of
these shapes and WHY. A new registry entry that introduces either shape
fails this test until it is either reshaped or added here with a
justification — silent single-reducer funnels are how 100 TB jobs die.
"""

from __future__ import annotations

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
    "dedup_semantic": "centroid fold to one broadcast row (ivf_assign)",
}


def _lint_one(spark, spec) -> str | None:
    df = spec.spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    marks = []
    if "Exchange SinglePartition" in plan:
        marks.append("SinglePartition")
    if "CartesianProduct" in plan:
        marks.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        marks.append("BroadcastNestedLoopJoin")
    return ", ".join(marks) if marks else None


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
    flagged = {name: marks for name, marks in results if marks}
    unjustified = {n: m for n, m in flagged.items() if n not in ALLOWED}
    assert not unjustified, (
        "queries with UNJUSTIFIED single-reducer funnels or nested-loop "
        f"joins (reshape, or allowlist with a reason): {unjustified}"
    )
    # the allowlist must not rot: every entry still exhibits its shape
    stale = sorted(set(ALLOWED) - set(flagged))
    assert not stale, f"allowlist entries no longer flagged (remove): {stale}"
