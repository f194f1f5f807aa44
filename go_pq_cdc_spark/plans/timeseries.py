"""Timescale-style time-series queries over the events stream table.

The reference is TimescaleDB-aware (O31, `pq/timescaledb/`): hypertable
chunk events remap to the root table, and downstream users run
continuous-aggregate-style rollups. These queries express that idiom the
Spark-first way: `time_bucket` = date_trunc on a literal granularity,
`time_bucket_gapfill` = a LITERAL bucket spine (explode of a sequence
between constant bounds — zero plan-build jobs, no data-dependent
boundaries) LEFT-JOINed to the bucketed aggregate, `locf()` = last
non-null over the spine order.

Scale shape: the aggregate is one map-side-partial shuffle on the bucket
key; the spine's cardinality is range/granularity — a property of the
QUERY, independent of data volume — so the spine join and the ordered
LOCF window over it are bounded no matter how many TB the events table
is. The LOCF window is deliberately global over the spine: partitioning
it would break carry-forward across partition edges, and its input is
the bounded spine, never the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .registry import register

_START = "2024-01-01 00:00:00"
_END = "2024-01-30 23:00:00"  # inclusive spine end, 720 hourly buckets



def _hourly_spine(spark: SparkSession) -> DataFrame:
    """The literal 720-bucket hourly spine (one row explodes the
    constant-bounds sequence — zero plan-build jobs)."""
    return spark.range(1).select(
        F.explode(
            F.expr(
                f"sequence(to_timestamp('{_START}'), to_timestamp('{_END}'), "
                "interval 1 hour)"
            )
        ).alias("b")
    )


def _cohort_events(
    spark: SparkSession, sf_dir: str, event_type: str, cohort_mod: int
) -> DataFrame:
    """January events of one type for one user cohort — the shared input
    of the gapfill family."""
    return load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == event_type)
        & (F.col("user_id") % 10 == cohort_mod)
        & (F.col("ts") >= F.lit(_START).cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-31").cast("timestamp"))
    )


@register(
    "q_time_bucket_gapfill",
    oracle=f"""
    WITH agg AS (
        SELECT date_trunc('hour', ts) AS b,
               SUM(CAST(value AS DECIMAL(25,6))) AS s,
               COUNT(*) AS n
        FROM events
        WHERE event_type = 'error' AND user_id % 10 = 3
          AND ts >= TIMESTAMP '{_START}' AND ts < TIMESTAMP '2024-01-31'
        GROUP BY date_trunc('hour', ts)
    ),
    spine AS (
        SELECT unnest(generate_series(
            TIMESTAMP '{_START}', TIMESTAMP '{_END}', INTERVAL 1 HOUR
        )) AS b
    )
    SELECT epoch_us(spine.b) AS bucket_us,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           LAST_VALUE(CAST(s AS DOUBLE) / n IGNORE NULLS) OVER (
               ORDER BY spine.b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_locf,
           CAST(n IS NULL AS INT) AS is_gap
    FROM spine LEFT JOIN agg ON spine.b = agg.b
    """,
    tags=("events", "timescale", "gapfill", "window"),
    bench=True,
)
def q_time_bucket_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB `time_bucket_gapfill` + `locf()` idiom: hourly error-
    value averages for a user cohort over January, with EVERY bucket
    present (gaps carry a zero count and the last observed average
    forward; buckets before the first observation stay NULL — exactly
    locf()'s semantics).

    Scale shape: one shuffle for the hourly aggregate (map-side
    partial); the 720-bucket literal spine explodes from one row and
    joins broadcast-small; the LOCF window runs over the spine only
    (range/granularity rows — query-bounded, not data-bounded)."""
    ev = _cohort_events(spark, sf_dir, "error", 3)
    agg = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("b")).agg(
        F.sum(F.col("value").cast("decimal(25,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = _hourly_spine(spark).join(F.broadcast(agg), "b", "left")
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    avg_col = F.col("s").cast("double") / F.col("n")
    return joined.select(
        F.unix_micros(F.col("b")).alias("bucket_us"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.last(avg_col, ignorenulls=True).over(w).alias("avg_value_locf"),
        F.col("n").isNull().cast("int").alias("is_gap"),
    )


@register(
    "q_gapfill_interpolate",
    oracle=f"""
    WITH agg AS (
        SELECT date_trunc('hour', ts) AS b,
               CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS v
        FROM events
        WHERE event_type = 'purchase' AND user_id % 10 = 7
          AND ts >= TIMESTAMP '{_START}' AND ts < TIMESTAMP '2024-01-31'
        GROUP BY date_trunc('hour', ts)
    ),
    spine AS (
        SELECT unnest(generate_series(
            TIMESTAMP '{_START}', TIMESTAMP '{_END}', INTERVAL 1 HOUR
        )) AS b
    ),
    ctx AS (
        SELECT spine.b, v,
               LAST_VALUE(v IGNORE NULLS) OVER w_back AS pv,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN epoch_us(spine.b) END
                          IGNORE NULLS) OVER w_back AS pt,
               FIRST_VALUE(v IGNORE NULLS) OVER w_fwd AS nv,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN epoch_us(spine.b) END
                           IGNORE NULLS) OVER w_fwd AS nt
        FROM spine LEFT JOIN agg ON spine.b = agg.b
        WINDOW
          w_back AS (ORDER BY spine.b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_fwd AS (ORDER BY spine.b
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT epoch_us(b) AS bucket_us,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
               THEN pv + (nv - pv) * (CAST(epoch_us(b) - pt AS DOUBLE)
                                      / CAST(nt - pt AS DOUBLE))
           END AS value_interp,
           CAST(v IS NULL AS INT) AS is_gap
    FROM ctx
    """,
    tags=("events", "timescale", "gapfill", "window"),
)
def q_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB `interpolate()` idiom: gaps in the hourly series get
    the LINEAR interpolation between the surrounding observations
    (edges with no neighbor on one side stay NULL). Same bounded-spine
    shape as `q_time_bucket_gapfill`; the back/forward context windows
    run over the spine only."""
    ev = _cohort_events(spark, sf_dir, "purchase", 7)
    agg = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("b")).agg(
        (
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    joined = _hourly_spine(spark).join(F.broadcast(agg), "b", "left")
    t_us = F.unix_micros(F.col("b"))
    obs_t = F.when(F.col("v").isNotNull(), t_us)
    w_back = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.orderBy("b").rowsBetween(0, Window.unboundedFollowing)
    ctx = joined.select(
        F.col("b"),
        F.col("v"),
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(w_back).alias("pt"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_t, ignorenulls=True).over(w_fwd).alias("nt"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.unix_micros(F.col("b")) - F.col("pt")).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    return ctx.select(
        F.unix_micros(F.col("b")).alias("bucket_us"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("nt") > F.col("pt")),
            interp,
        )
        .alias("value_interp"),
        F.col("v").isNull().cast("int").alias("is_gap"),
    )


@register(
    "q_counter_increase",
    oracle="""
    WITH samples AS (
        SELECT user_id, ts, event_id, value,
               LAG(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events WHERE event_type = 'view'
    )
    SELECT user_id % 10 AS cohort,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(CAST(SUM(CAST(
               CASE WHEN prev IS NULL THEN 0
                    WHEN value >= prev THEN value - prev
                    ELSE value END AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS increase,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND value < prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
    FROM samples
    GROUP BY user_id % 10, CAST(date_trunc('day', ts) AS DATE)
    """,
    tags=("events", "timescale", "counter", "window"),
)
def q_counter_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB `counter_agg`/Prometheus `increase` idiom: per-series
    (user) counter samples in time order, where a sample LOWER than its
    predecessor means the counter RESET — the increase is then the new
    value itself, never a negative delta. Aggregated to cohort-day with
    a reset count. Exact: each per-sample increase is decimal-cast
    before the order-independent SUM.

    Scale shape: one shuffle on user_id for the lag window (per-series
    fan-in only), then a map-side-partial aggregate to (cohort, day) —
    the same two-exchange shape regardless of data volume."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    samples = ev.withColumn("prev", F.lag("value").over(w))
    inc = (
        F.when(F.col("prev").isNull(), F.lit(0.0))
        .when(F.col("value") >= F.col("prev"), F.col("value") - F.col("prev"))
        .otherwise(F.col("value"))
    )
    reset = (
        F.col("prev").isNotNull() & (F.col("value") < F.col("prev"))
    ).cast("int")
    return (
        samples.groupBy(
            (F.col("user_id") % 10).alias("cohort"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(
            F.sum(inc.cast("decimal(25,6)")).cast("double").alias("increase"),
            F.sum(reset).cast("long").alias("n_resets"),
        )
    )
