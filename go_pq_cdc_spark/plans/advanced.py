"""Coverage for the remaining SURVEY §2.2 relational categories: set ops,
scalar/JSON functions, rollup, sessionization, as-of join, pivot, exact
distinct, percentile — plus two further CDC semantics (before-image
derivation, TRUNCATE) over the synthetic changelog."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..sources.changelog import (
    DUCKDB_CHANGELOG_CTE,
    changelog_frontier,
    committed_changelog,
)
from .registry import register

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _active_custs(spark, sf_dir, y0, y1):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{y0}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{y1}-01-01").cast("timestamp"))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .select("c_custkey")
        .distinct()
    )


@register(
    "q_set_ops",
    oracle="""
    WITH y96 AS (
        SELECT DISTINCT c_custkey FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    ),
    y97 AS (
        SELECT DISTINCT c_custkey FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    ),
    tagged AS (
        SELECT 'intersect' AS setop, c_custkey FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
        UNION ALL
        SELECT 'except' AS setop, c_custkey FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
    )
    SELECT setop, n_name, COUNT(*) AS n_cust
    FROM tagged
    JOIN customer USING (c_custkey)
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY setop, n_name
    """,
    tags=("relational", "setops"),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT in one gate row (folds the former q_set_intersect /
    q_set_except): customers active in both 1996 and 1997 vs churned after
    1996, counted by nation, tagged by set operation."""
    y96 = _active_custs(spark, sf_dir, 1996, 1997)
    y97 = _active_custs(spark, sf_dir, 1997, 1998)
    tagged = (
        y96.intersect(y97)
        .withColumn("setop", F.lit("intersect"))
        .unionByName(y96.subtract(y97).withColumn("setop", F.lit("except")))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        tagged.join(cust, "c_custkey")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("setop", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("relational", "json", "scalar_fn"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the events props payload (§1.3 json maps
    to string + from_json/get_json_object on demand)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_rollup_cube",
    oracle="""
    SELECT 'rollup' AS gset, l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS gset, l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("relational", "rollup", "cube"),
)
def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE grouping sets in one gate row (folds the former
    q_rollup_pricing / q_cube_pricing): subtotals, grand totals, and all
    grouping combinations with NULL markers, tagged by flavor."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ]
    rollup = (
        li.rollup("l_returnflag", "l_linestatus").agg(*aggs).withColumn("gset", F.lit("rollup"))
    )
    cube = li.cube("l_returnflag", "l_linestatus").agg(*aggs).withColumn("gset", F.lit("cube"))
    return rollup.unionByName(cube).select("gset", "l_returnflag", "l_linestatus", "sum_qty", "n")


@register(
    "q_sessionize",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN prev_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM e GROUP BY user_id
    """,
    tags=("relational", "sessionize", "window"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 1h starts a new session (lag + conditional
    count — the batch twin of streaming session_window)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 3_600_000_000),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_sess").cast("long").alias("n_sessions"))
    )


@register(
    "q_window_gauntlet",
    oracle="""
    SELECT event_id, user_id,
           lead(event_type) OVER w AS next_type,
           lag(value) OVER w AS prev_val,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           nth_value(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_type,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS run3,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS VARCHAR) AS DOUBLE) AS run1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("relational", "window"),
)
def q_window_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window coverage sweep in one pass: lead/lag, ntile,
    percent_rank, cume_dist, nth_value over an unbounded frame, a
    3-row-frame running sum, and a time-RANGE (1 hour trailing) frame.
    The window key is unique (ts, event_id) so ranking functions are
    deterministic; frame sums run in exact DECIMAL and only the final
    value casts to double.

    Scale shape: ONE shuffle on user_id serves every ordered spec; the
    RANGE-interval spec shares the same partitioning (Catalyst groups the
    specs into sibling Window operators over one Exchange)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w3 = w.rowsBetween(-2, Window.currentRow)
    dec_val = F.col("value").cast("decimal(18,6)")
    return ev.select(
        "event_id",
        "user_id",
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("value").over(w).alias("prev_val"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("event_type", 2).over(wfull).alias("second_type"),
        F.sum(dec_val).over(w3).cast("double").alias("run3"),
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER ("
            "PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE)"
        ).alias("run1h"),
    )


@register(
    "q_asof_last_click",
    oracle="""
    SELECT event_id, user_id, value AS purchase_val, last_click_val
    FROM (
        SELECT event_id, user_id, event_type, value,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_val
        FROM events
    ) WHERE event_type = 'purchase'
    """,
    tags=("relational", "asof"),
)
def q_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): each purchase joined to the
    user's most recent prior click via ignore-nulls last over a trailing
    window — the composition-of-built-ins strategy (guide §'As-of')."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.withColumn(
            "last_click_val",
            F.last(
                F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", F.col("value").alias("purchase_val"), "last_click_val"
        )
    )


@register(
    "q_pivot_event_counts",
    oracle=f"""
    SELECT user_id % 10 AS cohort,
           {', '.join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id % 10
    """,
    tags=("relational", "pivot"),
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-cohort event-type counts as columns."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
    )
    return out


@register(
    "q_distinct_custs",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("relational", "distinct"),
)
def q_distinct_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (two-phase partial agg under the hood)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "percentile"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use the same linear
    interpolation on sorted values)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5D)").alias("p50_qty"),
        F.expr("percentile(l_quantity, 0.9D)").alias("p90_qty"),
    )


_BASE = f"WITH {DUCKDB_CHANGELOG_CTE}"


@register(
    "cdc_before_image",
    oracle=f"""
    {_BASE},
    base AS (SELECT * FROM committed WHERE tbl <> 'cdc_heartbeat'),
    epoched AS (
        SELECT *,
               CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY pk ORDER BY lsn) AS BIGINT) AS del_epoch
        FROM base
    ),
    with_before AS (
        -- window BEFORE the op filter: the old image comes from any prior
        -- event, not just prior UPDATEs
        SELECT lsn, pk, op,
               LAST_VALUE(CASE WHEN op = 'D' THEN NULL ELSE after_val END IGNORE NULLS)
                   OVER (PARTITION BY pk, del_epoch ORDER BY lsn
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before_val
        FROM epoched
    )
    SELECT lsn, pk, before_val FROM with_before WHERE op = 'U'
    """,
    tags=("cdc", "before_image"),
)
def cdc_before_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5/O6: reconstruct each UPDATE's old image (REPLICA IDENTITY FULL
    analogue) — last non-null value strictly before the event, not crossing
    a DELETE."""
    from ..operators.cdc import before_image, filter_heartbeat

    df = filter_heartbeat(committed_changelog(spark, sf_dir))
    return (
        before_image(df)
        .filter(F.col("op") == "U")
        .select("lsn", "pk", "before_val")
    )


@register(
    "cdc_truncate_state",
    oracle=f"""
    {_BASE},
    base AS (SELECT * FROM committed WHERE tbl <> 'cdc_heartbeat'),
    -- truncate position derived from the transport frontier (max WAL pos),
    -- mirroring the Spark side's footer-stats read — not a data scan
    trunc AS (
        SELECT CAST((SELECT MAX(event_id) FROM events)
                    - ((SELECT MAX(event_id) FROM events) % 977) AS BIGINT) AS t_lsn
    ),
    survivors AS (
        SELECT pk, lsn, op,
               ROW_NUMBER() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
        FROM base WHERE lsn > (SELECT t_lsn FROM trunc)
    )
    SELECT pk, lsn AS last_lsn FROM survivors WHERE rn = 1 AND op <> 'D'
    """,
    tags=("cdc", "truncate"),
)
def cdc_truncate_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 TRUNCATE semantics: a table-wide clear at the truncate LSN —
    current state is rebuilt only from events after the last truncate
    (batch mirror: overwrite, SURVEY §1.1). The truncate position is a
    plan-time scalar the transport knows from the 'T' message's WAL
    position — derived here from the segment frontier (parquet footer
    stats), NOT recomputed by scanning the changelog (r3 verdict
    What's-wrong #4)."""
    from ..operators.cdc import filter_heartbeat

    df = filter_heartbeat(committed_changelog(spark, sf_dir))
    frontier = changelog_frontier(sf_dir)
    t_lsn = frontier - (frontier % 977)
    w = Window.partitionBy("pk").orderBy(F.desc("lsn"))
    return (
        df.filter(F.col("lsn") > t_lsn)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("pk", F.col("lsn").alias("last_lsn"))
    )


@register(
    "cdc_scd2_intervals",
    oracle=f"""
    {_BASE},
    base AS (SELECT * FROM committed WHERE tbl <> 'cdc_heartbeat'),
    epoched AS (
        SELECT *,
               CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY pk ORDER BY lsn) AS BIGINT) AS del_epoch
        FROM base
    ),
    filled AS (
        SELECT *,
               LAST_VALUE(CASE WHEN op = 'D' THEN NULL ELSE after_val END IGNORE NULLS)
                   OVER (PARTITION BY pk, del_epoch ORDER BY lsn) AS filled_val
        FROM epoched
    ),
    versions AS (
        SELECT pk, lsn AS valid_from_lsn, op, filled_val,
               LEAD(lsn) OVER (PARTITION BY pk ORDER BY lsn) AS valid_to_lsn
        FROM filled
    )
    SELECT pk, valid_from_lsn, valid_to_lsn, filled_val AS val
    FROM versions WHERE op <> 'D'
    """,
    tags=("cdc", "scd2"),
)
def cdc_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history materialization: every non-delete event opens a version
    valid [its LSN, next event's LSN); NULL valid_to = current version.
    The 'emulate MERGE with window' idiom from the guide, as a product
    surface (queryable full history instead of just latest state)."""
    from ..operators.cdc import filter_heartbeat, toast_fill

    df = toast_fill(filter_heartbeat(committed_changelog(spark, sf_dir)))
    w = Window.partitionBy("pk").orderBy("lsn")
    return (
        df.withColumn("valid_to_lsn", F.lead("lsn").over(w))
        .filter(F.col("op") != "D")
        .select(
            "pk",
            F.col("lsn").alias("valid_from_lsn"),
            "valid_to_lsn",
            F.col("filled_val").alias("val"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("relational", "correlated_subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — Catalyst decorrelates
    it into an aggregate+join (l_quantity is integral-valued, so AVG is
    exact on both engines)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
              SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
        """
    )


_SCALAR_GAUNTLET_SQL = """
    SELECT o_orderkey,
           upper(o_orderpriority)                                   AS up,
           lower(o_orderstatus)                                     AS lo,
           substr(o_orderpriority, 1, 1)                            AS pri_code,
           lpad(CAST(o_orderkey AS VARCHAR(20)), 12, '0')           AS padded_key,
           concat(o_orderstatus, '-', o_orderpriority)              AS tag,
           CAST(length(o_orderpriority) AS BIGINT)                  AS pri_len,
           replace(o_orderpriority, '-', '_')                       AS pri_u,
           reverse(o_orderstatus)                                   AS rev_status,
           CAST(date_trunc('month', o_orderdate) AS DATE)           AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)           AS y,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)          AS m,
           CAST(EXTRACT(day FROM o_orderdate) AS BIGINT)            AS d,
           CAST(abs(o_totalprice - 100000.0) AS DOUBLE)             AS dist_100k,
           CAST(floor(o_totalprice) AS BIGINT)                      AS price_floor,
           CAST(ceil(o_totalprice) AS BIGINT)                       AS price_ceil,
           CAST(sqrt(CAST(o_totalprice AS DOUBLE)) AS DOUBLE)       AS price_sqrt,
           CAST(power(2.0, CAST(o_orderkey % 10 AS DOUBLE)) AS DOUBLE) AS pow2,
           greatest(o_orderkey % 7, o_orderkey % 5)                 AS g,
           least(o_orderkey % 7, o_orderkey % 5)                    AS l,
           coalesce(nullif(o_orderstatus, 'O'), 'open')             AS status_or_open
    FROM orders
"""


@register(
    "q_scalar_gauntlet",
    oracle=_SCALAR_GAUNTLET_SQL,
    tags=("relational", "scalar_fn"),
)
def q_scalar_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface parity in one pass: string (upper/lower/
    substr/lpad/concat/length/replace/reverse), date (date_trunc/extract),
    math (abs/floor/ceil/sqrt/power), conditional (greatest/least/
    coalesce/nullif) — identical ANSI text on both engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_GAUNTLET_SQL)


@register(
    "q_range_join_bursts",
    oracle="""
    SELECT a.user_id,
           COUNT(*) AS n_burst_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.event_id <> a.event_id
     AND b.ts >= a.ts
     AND b.ts < a.ts + INTERVAL 5 MINUTE
     AND (b.ts > a.ts OR b.event_id > a.event_id)
    GROUP BY a.user_id
    """,
    tags=("relational", "range_join"),
)
def q_range_join_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: event pairs of the same user within a 5-minute window —
    equi-join on the user key carries the shuffle; the range predicate
    filters within the block (the bucketize-then-filter strategy for range
    joins, guide §'As-of / range')."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.event_id") != F.col("a.event_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") < F.col("a.ts") + F.expr("INTERVAL 5 MINUTE"))
            & ((F.col("b.ts") > F.col("a.ts")) | (F.col("b.event_id") > F.col("a.event_id"))),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_burst_pairs"))
    )


def _kmv_oracle() -> str:
    from ..operators.sketch import kmv_oracle_sql

    return f"""
    WITH sk AS ({kmv_oracle_sql("orders", "o_orderpriority", "o_custkey")}),
    ex AS (
        SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
        FROM orders GROUP BY o_orderpriority
    )
    SELECT sk.o_orderpriority, est_distinct, n_kept, n_exact
    FROM sk JOIN ex USING (o_orderpriority)
    """


@register(
    "q_kmv_distinct",
    oracle=_kmv_oracle(),
    tags=("sketch", "distinct"),
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority two ways: a KMV cardinality
    sketch (k=64 minimum md5 hashes — deterministic, so the ESTIMATE
    itself is oracle-verified bit-for-bit, unlike engine-internal HLL)
    next to the exact count. The sketch's partial state is associative
    (k smallest of a union), i.e. the same partial/final split Spark's
    distributed aggregation needs."""
    from ..operators.sketch import kmv_distinct

    orders = load_table(spark, sf_dir, "orders")
    sk = kmv_distinct(orders, "o_orderpriority", "o_custkey")
    ex = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact")
    )
    return sk.join(ex, "o_orderpriority")


def _hll_oracle() -> str:
    from ..operators.sketch import hll_oracle_sql

    return f"""
    WITH sk AS ({hll_oracle_sql("orders", "o_orderpriority", "o_custkey")}),
    ex AS (
        SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
        FROM orders GROUP BY o_orderpriority
    )
    SELECT sk.o_orderpriority, est_distinct, n_buckets, n_exact
    FROM sk JOIN ex USING (o_orderpriority)
    """


@register(
    "q_hll_distinct",
    oracle=_hll_oracle(),
    tags=("sketch", "distinct", "hll"),
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority via a HyperLogLog sketch —
    the FOURTH mergeable sketch family, and q_kmv_distinct's direct
    sibling so the two classic cardinality sketches are comparable on
    the same question. Unlike KMV's distinct-shuffle + bottom-k, HLL is
    ONE partial-aggregable pass to 64 fixed registers per group
    (Zipf-safe by construction: a hot value collapses map-side to one
    (group, bucket, rho) row). The indicator sum is scaled into int64 so
    the raw estimate is a single division of two exactly-summed values —
    bit-identical in DuckDB (engine-internal approx_count_distinct never
    is). Exact counts ride along for context."""
    from ..operators.sketch import hll_estimate, hll_registers

    orders = load_table(spark, sf_dir, "orders")
    regs = hll_registers(orders, ["o_orderpriority"], "o_custkey")
    est = hll_estimate(regs, ["o_orderpriority"])
    ex = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact")
    )
    return est.join(ex, "o_orderpriority")


def _hll_merge_oracle() -> str:
    from ..operators.sketch import hll_oracle_sql

    return hll_oracle_sql("documents", "lang", "text")


@register(
    "q_hll_merge",
    oracle=_hll_merge_oracle(),
    tags=("sketch", "distinct", "hll", "merge"),
)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register MERGEABILITY, proven cross-engine (the q_kmv_merge /
    q_cms_merge design): Spark sketches distinct texts at the FINE
    (lang, source) granularity and merges register states up to lang by
    per-bucket MAX — associative, commutative, idempotent, so ANY merge
    tree equals sketching lang directly, which is what the DuckDB oracle
    computes from the raw rows. Bit-identical estimates == a 100 TB
    corpus can keep 64-register states per partition/day and answer
    global distinct questions by folding registers, never rescanning."""
    from ..operators.sketch import (
        hll_estimate,
        hll_merge_registers,
        hll_registers,
    )

    docs = load_table(spark, sf_dir, "documents")
    fine = hll_registers(docs, ["lang", "source"], "text")
    merged = hll_merge_registers(fine, ["lang"])
    return hll_estimate(merged, ["lang"])


from ..operators.sketch import kmv_oracle_sql as _kmv_oracle_sql  # noqa: E402


@register(
    "q_kmv_merge",
    oracle=_kmv_oracle_sql("documents", "lang", "text"),
    tags=("sketch", "distinct", "merge"),
)
def q_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch MERGEABILITY, proven cross-engine: Spark sketches
    distinct texts at the FINE granularity (lang, source), persists only
    the k-minimum-hash arrays, and merges them up to lang; the DuckDB
    oracle sketches lang DIRECTLY from the raw rows. Bit-identical
    estimates == the partial state is associative — the property that
    lets a 100 TB pipeline sketch each ingest batch once and answer
    coarser distinct questions later without rescanning anything."""
    from ..operators.sketch import kmv_merge_estimate, kmv_sketch

    docs = load_table(spark, sf_dir, "documents")
    fine = kmv_sketch(docs, ["lang", "source"], "text")
    return kmv_merge_estimate(fine, ["lang"])


_KMV_ERA_SPLIT = "1998-01-01"  # orders span 1995..2001 in the testdata


def _kmv_intersect_oracle() -> str:
    from ..operators.sketch import kmv_intersect_oracle_sql

    a = (
        "SELECT o_orderpriority, o_custkey FROM orders "
        f"WHERE o_orderdate < TIMESTAMP '{_KMV_ERA_SPLIT}'"
    )
    b = (
        "SELECT o_orderpriority, o_custkey FROM orders "
        f"WHERE o_orderdate >= TIMESTAMP '{_KMV_ERA_SPLIT}'"
    )
    return f"""
    WITH sk AS ({kmv_intersect_oracle_sql(a, b, "o_orderpriority", "o_custkey")}),
    e AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM (
            SELECT DISTINCT o_orderpriority, o_custkey FROM orders
            WHERE o_orderdate < TIMESTAMP '{_KMV_ERA_SPLIT}'
            INTERSECT
            SELECT DISTINCT o_orderpriority, o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '{_KMV_ERA_SPLIT}'
        ) GROUP BY o_orderpriority
    )
    SELECT sk.o_orderpriority, est_jaccard, est_intersection, n_kept,
           COALESCE(e.n_exact, 0) AS n_exact
    FROM sk LEFT JOIN e ON e.o_orderpriority = sk.o_orderpriority
    """


@register(
    "q_kmv_intersect",
    oracle=_kmv_intersect_oracle(),
    tags=("sketch", "distinct", "intersection", "jaccard"),
)
def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV SET ALGEBRA (Beyer et al., SIGMOD'07) — the sketches don't
    just merge for union cardinality: the union's bottom-k is a
    coordinated sample, so the fraction present in BOTH input sketches
    estimates Jaccard, and jaccard x union estimates the INTERSECTION.
    Here: how many customers kept ordering across the 1995 era split,
    per order priority — answered from two 64-int64 states per group,
    no rescan (the cross-partition overlap question a 100 TB ingest
    ledger asks constantly). Estimates are integer compare/count up to
    two final divisions — bit-identical in DuckDB; the exact
    intersection rides along for context."""
    from ..operators.sketch import kmv_intersect, kmv_sketch

    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(_KMV_ERA_SPLIT).cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < split)
    late = orders.filter(F.col("o_orderdate") >= split)
    est = kmv_intersect(
        kmv_sketch(early, ["o_orderpriority"], "o_custkey"),
        kmv_sketch(late, ["o_orderpriority"], "o_custkey"),
        ["o_orderpriority"],
    )
    exact = (
        early.select("o_orderpriority", "o_custkey")
        .distinct()
        .join(
            late.select("o_orderpriority", "o_custkey").distinct(),
            ["o_orderpriority", "o_custkey"],
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    return (
        est.join(exact, "o_orderpriority", "left")
        .withColumn(
            "n_exact", F.coalesce(F.col("n_exact"), F.lit(0)).cast("long")
        )
    )


@register(
    "q_funnel_steps",
    oracle="""
    WITH t1 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1
        FROM events GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id,
               MIN(CASE WHEN e.event_type = 'click' AND e.ts > t1.t1
                        THEN e.ts END) AS t2
        FROM events e JOIN t1 USING (user_id)
        GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > t2.t2
                        THEN e.ts END) AS t3
        FROM events e JOIN t2 USING (user_id)
        GROUP BY e.user_id
    ),
    flags AS (
        SELECT t1.user_id, t1.t1, t2.t2, t3.t3
        FROM t1 JOIN t2 USING (user_id) JOIN t3 USING (user_id)
    )
    SELECT CAST(COUNT(t1) AS BIGINT) AS n_signup,
           CAST(COUNT(t2) AS BIGINT) AS n_click_after,
           CAST(COUNT(t3) AS BIGINT) AS n_purchase_after,
           CASE WHEN COUNT(t1) = 0 THEN NULL
                ELSE CAST(COUNT(t3) AS DOUBLE) / COUNT(t1) END AS conversion
    FROM flags
    """,
    tags=("events", "funnel", "window"),
    bench=True,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup -> later click -> later purchase): each
    step's timestamp is a conditional MIN over the user's events
    REQUIRING strict ordering after the previous step. The Spark plan
    chains three window aggregates over ONE hashpartitioning(user_id)
    exchange (plan-gated) — at 100 TB the funnel costs a single shuffle
    of the events, vs the oracle's three self-join aggregations."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    stepped = (
        ev.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = stepped.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    # explicit zero guard: Spark's double division by zero yields NULL
    # while DuckDB follows IEEE — a degenerate no-signups slice must agree
    return per_user.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_click_after"),
        F.count("t3").alias("n_purchase_after"),
        F.when(
            F.count("t1") > 0, F.count("t3").cast("double") / F.count("t1")
        ).alias("conversion"),
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH s AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_wk
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    j AS (
        SELECT s.user_id, epoch(s.cohort_wk) AS cohort_epoch,
               CAST((epoch(a.wk) - epoch(s.cohort_wk)) / 604800 AS BIGINT) AS week_offset
        FROM a JOIN s USING (user_id)
        WHERE a.wk >= s.cohort_wk
    )
    SELECT CAST(cohort_epoch AS BIGINT) AS cohort_epoch, week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM j GROUP BY cohort_epoch, week_offset
    """,
    tags=("events", "cohort", "retention"),
    bench=True,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by signup week, counted as
    active in each subsequent week they produced ANY event. Cohort weeks
    leave as epoch seconds (timestamps never cross the oracle boundary
    engine-formatted). Shuffle profile: user-keyed aggregate + distinct +
    user-keyed join (AQE-coalesced, same key) + the final small cohort
    grid aggregate."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_wk"))
    )
    a = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk")).distinct()
    j = (
        a.join(s, "user_id")
        .filter(F.col("wk") >= F.col("cohort_wk"))
        .select(
            "user_id",
            F.unix_timestamp("cohort_wk").alias("cohort_epoch"),
            (
                (F.unix_timestamp("wk") - F.unix_timestamp("cohort_wk")) / 604800
            ).cast("long").alias("week_offset"),
        )
    )
    return j.groupBy("cohort_epoch", "week_offset").agg(
        F.countDistinct("user_id").cast("long").alias("n_active")
    )


@register(
    "q_histogram",
    oracle="""
    SELECT CAST(LEAST(FLOOR(o_totalprice / 30000), 19) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1
    """,
    tags=("relational", "histogram"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width value histogram (20 buckets of 30k, top-clamped) over
    order totals — the distribution profile every data audit starts with.
    One narrow bucket expression + one tiny aggregate; decimal-exact sums
    per the registry's float rules."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bucket",
            F.least(F.floor(F.col("o_totalprice") / 30000), F.lit(19)).cast("long"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )
