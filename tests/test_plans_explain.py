"""Physical-plan quality gates: the properties that matter at 100 TB.

These assert on the formatted plan text, so a regression that silently
drops a pushdown or broadcasts the wrong side fails CI, not the cluster."""

from __future__ import annotations

import contextlib
import io

from go_pq_cdc_spark import plans
from go_pq_cdc_spark.catalog import load_table

from .conftest import SF_DIR


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _plan(spark, name: str) -> str:
    return _explain(plans.REGISTRY[name].spark_fn(spark, SF_DIR))


def test_q6_filter_pushdown(spark):
    """Q6's filters must reach the parquet scan as PushedFilters, and the
    scan must read only the 4 referenced columns."""
    plan = _plan(spark, "q6_revenue_forecast")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "l_comment" not in read_schema
    assert all(c in read_schema for c in ("l_extendedprice", "l_discount", "l_quantity"))


def test_q1_partial_aggregation(spark):
    """Q1 must plan partial (map-side) + final hash aggregation."""
    plan = _plan(spark, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "Partial" in plan


def test_q5_broadcasts_dimensions(spark):
    """nation/region (and supplier at test scale) must broadcast — never
    shuffle a 25-row dim at any SF."""
    plan = _plan(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastExchange" in plan


def test_q1_wholestage_codegen(spark):
    """The aggregate pipeline must be inside WholeStageCodegen (codegen
    explain can't descend into AdaptiveSparkPlan, so plan with AQE off)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = plans.REGISTRY["q1_pricing_summary"].spark_fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
        out = buf.getvalue()
        n = int(out.split("Found ")[1].split(" WholeStageCodegen")[0])
        assert n >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in _plan(spark, "q_order_priority_count")
    assert "LeftAnti" in _plan(spark, "q_parts_not_shipped_1995")
    # Q21's correlated EXISTS / NOT EXISTS must BOTH plan as equi-joins on
    # l_orderkey — never a nested-loop subquery per row
    q21 = _plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in q21 and "LeftAnti" in q21
    assert "NestedLoop" not in q21 and "Cartesian" not in q21


def test_topk_no_global_sort_before_limit(spark):
    """q3's top-10 must use TakeOrderedAndProject (per-partition top-k +
    merge), not a full global Sort+Limit."""
    plan = _plan(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_pipeline_queries_have_no_python_udfs(spark):
    """Dedup/similarity/text operators must stay JVM-side (no BatchEvalPython
    / ArrowEvalPython stages) — Python appears only in explicitly-stubbed
    multimodal kernels."""
    for name in (
        "dedup_minhash_lsh",
        "sim_cosine_topk",
        "text_profile",
        "text_token_stats",
        "dedup_ngram_jaccard",
    ):
        plan = _plan(spark, name)
        assert "EvalPython" not in plan, f"{name} fell off the JVM fast path"


def test_cdc_latest_state_single_shuffle_per_window_key(spark):
    """latest_state partitions by pk for both the fill and the rank — the
    planner must reuse one Exchange on pk, not shuffle twice."""
    plan = _plan(spark, "cdc_latest_state")
    # fill window shuffles on pk; rank window must reuse that partitioning
    assert plan.count("Exchange hashpartitioning(pk") <= 1


def test_projection_prunes_unused_columns(spark):
    """Column pruning: reading 2 cols of lineitem scans only those."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plan = _explain(li)
    rs = plan.split("ReadSchema")[1]
    assert "l_extendedprice" not in rs and "l_orderkey" in rs


def test_top_tokens_uses_take_ordered(spark):
    """r2 verdict scale-killer #2: the vocabulary top-20 must plan as
    TakeOrderedAndProject (per-partition top-k + merge), never a global
    unpartitioned window over the whole vocabulary."""
    plan = _plan(spark, "text_top_tokens")
    assert "TakeOrderedAndProject" in plan


def test_emb_near_dup_lsh_is_equi_join(spark):
    """The LSH-blocked near-dup must join on the bucket key (shuffle or
    broadcast HASH join) — never a nested-loop/cartesian candidate scan."""
    from go_pq_cdc_spark.plans.registry import REGISTRY

    df = REGISTRY["emb_near_dup_lsh"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # an actual equi-join on the bucket


def test_ivf_assign_zero_shuffle_on_wide_input(spark):
    """r5 gate (r4 verdict item 1): ivf_assign must be a pure expression
    argmax over a broadcast centroid array — the r4 shape (broadcast join
    fan-out ×k + row_number window) shuffled corpus×k rows, which at 100 TB
    is the whole job. On a corpus already at session parallelism the plan
    must contain NO Window and NO corpus-side hash-partition Exchange: the
    only allowed exchanges are the test's own input widening, the k-row
    centroid fold (single partition) and its broadcast."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators import similarity as S

    emb = load_table(spark, SF_DIR, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    df = S.ivf_assign(emb, emb.filter(F.col("vec_id") < 8))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "ivf_assign regressed to the window-argmax shape"
    # the test's explicit repartition appears once per side it feeds
    # (corpus + centroid fold); spread_small_input must add NOTHING
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges <= 2, f"unexpected shuffle in ivf_assign:\n{plan}"


def test_similarity_topk_two_level_salted(spark):
    """r6 verdict item 2: the per-query top-k of the two FULL-CORPUS
    scorers (brute-force cosine, PQ-ADC) must be the two-level salted
    shape — a partial top-k windowed on (q_id, _salt) so S reducers share
    each query's candidates, then a final rank over at most S*k rows —
    never a single Window.partitionBy(q_id) that funnels every scored
    corpus row for a query through ONE reducer task (at 100 TB that task
    is the job). Same pattern as sketch._bottom_k."""
    for name in ("sim_cosine_topk", "sim_pq_adc_topk"):
        df = plans.REGISTRY[name].spark_fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan, f"{name} lost the salted partial top-k"
        assert plan.count("Window") >= 2, (
            f"{name} regressed to a one-level per-query window:\n{plan}"
        )


def test_pack_sequences_distributed_prefix_sum(spark):
    """The packing prefix sum must be the two-level distributed shape: the
    corpus cumsum windows PARTITIONED by spark_partition_id (a key-spread
    hashpartitioning exchange), and the ONLY single-partition exchange is
    the #partitions-row subtotal frame — never the whole corpus through
    one task (the global-ordered-window scale-killer)."""
    df = plans.REGISTRY["pack_token_sequences"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_pid" in plan, "corpus window lost its partition key"
    assert plan.count("Exchange SinglePartition") <= 1, (
        "corpus-side single-partition exchange:\n" + plan
    )


def test_stratified_sample_is_narrow_filter(spark):
    """Stratified sampling must stay a pure filter over the scan — the
    strata map inlines as CASE, so no join/shuffle before the count's
    partial aggregation."""
    plan = _plan(spark, "sample_stratified_mix")
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final count only


def test_lsh_bucket_not_reevaluated_by_null_filters(spark):
    """r4 perf fix gate: the HOF bucket expression is CodegenFallback (no
    common-subexpression elimination), so a join-inferred isnotnull(bucket)
    would silently RE-EVALUATE the whole planes×dims aggregate per row on
    both join sides. The bucket is coalesced non-nullable precisely so no
    such filter is inferred — assert no Filter node contains the aggregate."""
    import re

    from go_pq_cdc_spark.plans.registry import REGISTRY

    for name in ("sim_ann_lsh_topk", "emb_near_dup_lsh"):
        plan = (
            REGISTRY[name].spark_fn(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString()
        )
        for m in re.finditer(r"\+- Filter (.*)", plan):
            assert "aggregate(transform(" not in m.group(1), (
                f"{name}: a Filter re-evaluates the LSH bucket aggregate"
            )
        # and the candidate join is still the hash equi-join on the bucket
        assert "HashJoin" in plan


def test_window_gauntlet_single_exchange(spark):
    """All analytic specs in q_window_gauntlet key on user_id — the
    planner must serve every ordered frame (including the time-RANGE one,
    which orders by ts only) off ONE hashpartitioning Exchange."""
    plan = (
        plans.REGISTRY["q_window_gauntlet"]
        .spark_fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Exchange") == 1


def test_pack_sequences_no_sampled_range_exchange(spark):
    """Correctness gate: the prefix sum must contain NO sampled
    rangepartitioning exchange at all. r5 relied on AQE physically
    reusing the range exchange between the cumsum and subtotal consumers
    — but reuse is opportunistic, and when it didn't fire (observed at
    sf0.1 in r6) the two executions sampled DIFFERENT boundaries and
    misaligned cumsums with offsets. Bucketing now uses deterministic
    literal cut points (plan-build percentiles), so both subtrees are
    bit-identical whether or not the exchange is reused."""
    df = plans.REGISTRY["pack_token_sequences"].spark_fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "Exchange rangepartitioning" not in plan, (
        "sampled range exchange reappeared in the prefix sum:\n" + plan[:800]
    )


def test_pure_map_operators_have_zero_exchanges(spark):
    """PII scrubbing and embedding quantization are elementwise by design
    — their plans must contain NO Exchange at all (a shuffle appearing
    here means someone broke the narrow-pass contract)."""
    for name in ("text_pii_scrub", "emb_quantize", "text_cleanup"):
        plan = (
            plans.REGISTRY[name]
            .spark_fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, f"{name} gained a shuffle:\n{plan[:500]}"
        assert "EvalPython" not in plan


def test_pq_encode_zero_shuffle_on_wide_input(spark):
    """PQ encode must be the same zero-shuffle shape as ivf_assign: a pure
    per-subspace argmin expression over one broadcast codebook row. On a
    corpus already at session parallelism: no Window, and the only
    exchanges are the test's own widening plus the tiny codebook fold
    (m*ksub rows) and its broadcast — never a corpus-side shuffle."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators import similarity as S

    emb = load_table(spark, SF_DIR, "embeddings")
    cb = S.pq_codebook_sample(emb)
    wide = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    df = S.pq_encode(wide, cb, dsub=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the ONLY Window allowed is the codebook sample's ksub-row rank (it
    # sits under the broadcast side); the corpus itself must never window
    assert plan.count("Window") <= 1, f"corpus-side window in pq_encode:\n{plan}"
    # corpus side: the test's own repartition only; codebook side: the
    # sample's tiny rank window + fold are bounded by ksub rows
    corpus_hash = plan.count("Exchange hashpartitioning(vec_id")
    assert corpus_hash <= 1, f"unexpected corpus shuffle in pq_encode:\n{plan}"


def test_ivfpq_corpus_zero_shuffle_on_wide_input(spark):
    """IVF-PQ's corpus side must compute cell AND codes in one narrow pass
    — broadcast folds only, no corpus hash Exchange beyond the test's own
    widening, and the only Windows are the ksub-row codebook rank and the
    per-query top-k."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators import similarity as S

    emb = load_table(spark, SF_DIR, "embeddings")
    wide = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    df = S.ivf_pq_topk(
        wide,
        emb.filter(F.col("vec_id") < 8),
        S.pq_codebook_sample(emb),
        emb.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 24)),
        dsub=16,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    corpus_hash = plan.count("Exchange hashpartitioning(vec_id")
    assert corpus_hash <= 1, f"unexpected corpus shuffle in ivf_pq_topk:\n{plan[:800]}"


def test_epoch_order_distributed_prefix_sum(spark):
    """Epoch shuffling must keep the two-level shape: corpus windows
    partitioned by spark_partition_id; the only single-partition exchange
    is the #partitions-row subtotal frame — never a global ROW_NUMBER
    window over the corpus."""
    df = plans.REGISTRY["train_epoch_order"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_pid" in plan, "corpus window lost its partition key"
    assert plan.count("Exchange SinglePartition") <= 1, (
        "corpus-side single-partition exchange:\n" + plan
    )


def test_funnel_single_user_exchange(spark):
    """The 3-step funnel must chain its conditional-min windows over ONE
    hashpartitioning(user_id) exchange — never one shuffle per step (the
    oracle's three self-joins are the shape we're avoiding)."""
    df = plans.REGISTRY["q_funnel_steps"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") <= 1, plan[:800]


def test_url_dedup_single_exchange(spark):
    """URL dedup is one narrow canonicalization map + ONE shuffle on the
    normalized key — no joins, no extra exchanges."""
    df = plans.REGISTRY["text_url_dedup"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan[:600]
    assert "Join" not in plan


def test_bag_dedup_single_exchange(spark):
    """Bag-fingerprint dedup: fingerprint map + one shuffle on it."""
    df = plans.REGISTRY["text_bag_dedup"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan[:600]
    assert "Join" not in plan


def test_cluster_balanced_sample_no_join_no_window(spark):
    """Cluster-balanced sampling must stay the zero-shuffle expression
    shape: broadcast centroid fold + narrow filter, then only the final
    count aggregate's exchange — no corpus join, no window."""
    df = plans.REGISTRY["sample_cluster_balanced"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Join cent" not in plan and "SortMergeJoin" not in plan
    # the adaptive widening of the NARROW test input (spread_small_input,
    # absent at scale) + the final groupBy count — nothing else
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= 2, plan[:800]


def test_gapfill_spine_is_broadcast_bounded(spark):
    """The gapfill family's scale contract: the hourly aggregate is ONE
    hash exchange (map-side partial) and the literal bucket spine joins
    via BROADCAST — the fill windows run over the query-bounded spine,
    never a data-proportional exchange."""
    for name in ("q_time_bucket_gapfill", "q_gapfill_interpolate"):
        df = plans.REGISTRY[name].spark_fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
            f"{name}: spine join is not broadcast:\n{plan}"
        )
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex <= 1, f"{name}: expected <=1 hash exchange, saw {n_ex}:\n{plan}"


def test_grid_self_join_repartitions_explicitly(spark):
    """The grid-partitioned all-pairs self-joins must carry a
    USER-NUMBERED repartition on the full join key: AQE sizes shuffle
    coalescing by join INPUT bytes, blind to the pair explosion — left
    alone it collapses the whole join into 1-2 tasks (r8 sf1 finding:
    1.3 of 28 cores busy). REPARTITION_BY_NUM is exempt from coalescing
    and the sort-merge join reuses the exchange."""
    for name in ("dedup_ngram_jaccard", "emb_near_dup"):
        plan = _plan(spark, name)
        assert "_ga" in plan and "_gb" in plan, name
        assert "REPARTITION_BY_NUM" in plan, (
            f"{name}: grid join lost its AQE-exempt user repartition"
        )
