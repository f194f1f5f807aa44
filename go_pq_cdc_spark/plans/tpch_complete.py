"""The six remaining TPC-H query shapes (Q2/Q4/Q9/Q11/Q16/Q20), adapted
to the TESTDATA schema, completing the 22-query suite.

TESTDATA has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``ps_supplycost`` columns, so each
query keeps its ORIGINAL operator shape (that is what the suite
exercises) over adapted inputs:

  * the part-supplier "supply" relation is DERIVED from lineitem —
    DISTINCT (l_partkey, l_suppkey) with MIN(l_extendedprice /
    l_quantity) as the unit supply cost — one narrow aggregation that
    every consumer reuses;
  * "commit vs receipt lateness" (Q4) becomes l_shipdate >
    o_orderdate + INTERVAL (the same adaptation q12/q21 use);
  * "supplier complaints" (Q16) becomes s_acctbal < 0;
  * ps_availqty thresholds (Q20) become shipped-quantity dominance.

All six follow the registry determinism rules: decimal-exact sums,
identical aliases on both engines, rank ties broken by unique keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


def _supplycost_min():
    """The ONE Spark-side spelling of the supply-cost derivation —
    minimum observed unit price per (l_partkey, l_suppkey) group. Shared
    by ``_supply()`` and q2's inlined repartitioned arm so the formula
    cannot drift between them; ``_SUPPLY_SQL`` mirrors it for the
    cross-engine oracle and is pinned to both by the oracle gate."""
    return F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived part-supplier supply relation: one row per observed
    (l_partkey, l_suppkey) pair with the minimum observed unit price as
    the supply cost. MIN over IEEE doubles is order-independent, so the
    derivation is deterministic without a decimal cast.

    Scale shape: ONE shuffle on (partkey, suppkey) with a map-side
    partial MIN; the output is |parts|x|supps per part| — the same
    cardinality class as the reference's partsupp table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    return li.groupBy("l_partkey", "l_suppkey").agg(_supplycost_min())


_SUPPLY_SQL = """
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS supplycost
    FROM lineitem GROUP BY l_partkey, l_suppkey
"""


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    region_supply AS (
        SELECT l_partkey, l_suppkey, supplycost,
               s_acctbal, s_name, n_name
        FROM supply
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    ),
    min_cost AS (
        SELECT l_partkey, MIN(supplycost) AS min_supplycost
        FROM region_supply GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           rs.supplycost AS supplycost
    FROM part
    JOIN region_supply rs ON p_partkey = rs.l_partkey
    JOIN min_cost mc ON rs.l_partkey = mc.l_partkey
                    AND rs.supplycost = mc.min_supplycost
    WHERE p_type = 'LARGE' AND p_size < 20
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
    tags=("relational", "join", "correlated_subquery"),
    bench=True,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the ASIA-region supplier(s) whose derived supply cost equals the
    part's regional minimum — the classic correlated-MIN subquery,
    decorrelated into a per-part MIN aggregate joined back on
    (partkey, cost). Top 100 by account balance, ties broken by
    (s_name, p_partkey).

    Scale shape: ONE pass over the supply relation — the per-part minimum
    is a MIN window over l_partkey (fan-in = suppliers-per-part, a small
    bounded group) instead of a separate aggregate joined back, which
    would re-derive supply from lineitem a second time (two fact passes);
    region/nation are broadcast; the final top-100 is
    TakeOrderedAndProject (per-partition partial top-k, no global
    sort).

    ONE exchange end-to-end (optimization r13, guide §2.4): the fact
    rows are hash-repartitioned by `l_partkey` BEFORE the supply
    groupBy — partitioning on a SUBSET of the (l_partkey, l_suppkey)
    group keys satisfies the aggregate's clustering requirement, and
    the same partitioning then satisfies the window's
    `PARTITION BY l_partkey`, so neither plans its own shuffle
    (measured: 2 Exchange -> 1, 1.64 s -> 1.18 s median at sf0.1,
    outputs equal). The removed second exchange was the expensive one
    at scale — it carried s_name/n_name strings through the shuffle,
    while the surviving one moves four narrow numeric fact columns.
    Cost accepted: the pre-agg exchange forgoes map-side partial MIN,
    which buys ~nothing here because (l_partkey, l_suppkey) pairs
    rarely repeat within a map partition. The numbered keyed
    repartition is AQE-exempt, which also keeps the window stage at
    full parallelism instead of the 3-task coalesced stage that made
    this row bimodal (straggler) under the bench's repeat discipline.

    KNOWN-FLAT-KEY caveat (r13 verdict): AQE-exempt also means AQE's
    skew-split cannot rescue a hot l_partkey. That is safe HERE because
    TPC-H part keys are uniform by construction; do not copy this
    pattern onto a key that can be Zipfian — the explosive-join guards
    (`explosive_join_parts` call sites) carry the same caveat."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    n = spark.sparkContext.defaultParallelism
    supply = (
        li.repartition(n, "l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(_supplycost_min())
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    region_supply = (
        supply.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "l_suppkey", "supplycost", "s_acctbal", "s_name", "n_name")
    )
    cheapest = region_supply.withColumn(
        "min_supplycost", F.min("supplycost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("supplycost") == F.col("min_supplycost"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 20)
    )
    return (
        part.join(cheapest, F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost")
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 45 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("relational", "semi_join"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders from one quarter
    that have AT LEAST ONE late line (shipped > 45 days after the order
    date — the schema's stand-in for commitdate < receiptdate), counted
    by priority. The EXISTS is a LEFT SEMI join, so multi-line orders
    count once without a DISTINCT.

    Scale shape: the quarter filter pushes to the orders scan (orders is
    the SMALL side here); the semi-join hashes on l_orderkey with the
    non-equi lateness predicate evaluated post-probe; the 5-group
    aggregate is map-side partial."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, CAST(CAST(SUM(amount) AS VARCHAR) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount)
                    - p_retailprice * 0.5 * l_quantity AS DECIMAL(25,6)) AS amount
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("relational", "join", "aggregation"),
    bench=True,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier-nation,
    per order-year profit on 'widget' parts, where profit substitutes
    half the part's retail price times quantity for the missing
    ps_supplycost. Decimal-exact: the per-row double expression is cast
    to DECIMAL(25,6) before the SUM (order-independent), final sum cast
    to DOUBLE.

    Scale shape: the p_name filter prunes parts BEFORE the fact join
    (with the part join first, lineitem rows drop early); nation is
    broadcast; two fact-side shuffles (part/supplier keys, then
    orderkey) that AQE sizes; the 25x~7-group aggregate is map-side
    partial."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.5) * F.col("l_quantity")
    ).cast("decimal(25,6)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.expr("CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH nation_value AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS part_value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM nation_value
    WHERE CAST(part_value AS DOUBLE) >
          (SELECT CAST(CAST(SUM(part_value) AS VARCHAR) AS DOUBLE) / COUNT(*) * 2.0
           FROM nation_value)
    """,
    tags=("relational", "scalar_subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part shipped value from a
    nation group, keeping parts worth more than TWICE the mean part
    value — the scalar-aggregate-subquery HAVING. (The reference's
    fixed fraction of the total is SF-scaled for the same reason: a
    constant fraction empties as |parts| grows; the mean-relative
    threshold is scale-free.) Decimal-exact sums; the threshold is one
    IEEE divide + multiply computed identically on both engines.

    Scale shape: one shuffle on l_partkey for the per-part sums; the
    grand total re-aggregates THOSE sums (tiny input, not a second fact
    pass) and joins back as a broadcast scalar — no driver collect, no
    second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    nation_value = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).alias("pv"))
    )
    total = nation_value.agg(
        (F.sum("pv").cast("double") / F.count(F.lit(1)) * F.lit(2.0)).alias(
            "threshold"
        )
    )
    return (
        nation_value.crossJoin(F.broadcast(total))
        .filter(F.col("pv").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("pv").cast("double").alias("part_value"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM supply
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("relational", "anti_join", "distinct_agg"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers can supply each qualifying (brand, type, size) combo,
    excluding blacklisted suppliers (negative account balance standing in
    for the reference's '%Customer%Complaints%'). NOT IN over a non-null
    key = LEFT ANTI join.

    Scale shape: the supply derivation is one shuffle; the blacklist is
    a broadcast anti-join (supplier is the small side); part filters
    push to its scan; COUNT(DISTINCT) expands on the already-bucketed
    (brand,type,size) grouping — bounded fan-in, no global distinct."""
    supply = _supply(spark, sf_dir).select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    blacklist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        supply.join(
            F.broadcast(blacklist), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(25,6))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
        SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT s_name, n_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM shipped JOIN part_total USING (l_partkey)
          WHERE CAST(qty AS DOUBLE) > CAST(total_qty AS DOUBLE) * 0.3
      )
    """,
    tags=("relational", "semi_join", "nested_subquery"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): ASIA suppliers that
    DOMINATE some 'red' part's 1997 shipments (their shipped quantity
    exceeds 30% of the part's total — the stand-in for ps_availqty >
    half the year's demand). Nested IN subqueries = two chained semi
    joins. Decimal-exact quantity sums.

    Scale shape: the date filter and the part-name IN (broadcast semi
    join) prune lineitem BEFORE its one shuffle on (partkey, suppkey);
    the part totals re-aggregate those sums shuffled on partkey only and
    join back co-partitioned; the supplier-side IN is a semi join against
    the (tiny) dominant-supplier set; nation/region broadcast."""
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty"))
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        shipped.join(part_total, F.col("l_partkey") == F.col("pt_partkey"))
        .filter(F.col("qty").cast("double") > F.col("total_qty").cast("double") * 0.3)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        supp.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "n_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )
