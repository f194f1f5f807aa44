"""Cardinality sketches for 100 TB group-by-distinct questions.

KMV (k-minimum-values, Beyer et al., SIGMOD'07): keep the k smallest
hashes of the values seen; the kth smallest hash U(k), normalized to
(0, 1), gives the unbiased estimate (k-1)/U(k). The partial state ("k
smallest") is associative — per-partition partials merge by taking the k
smallest of the union — which is exactly the two-level (partial + final)
aggregation Spark distributes.

Why KMV next to Spark's built-in HLL (`approx_count_distinct`): the HLL
estimate depends on engine-internal hashing and register layout, so it can
never be verified against another engine. KMV over the portable md5 hash
is DETERMINISTIC — DuckDB computes the bit-identical estimate — so the
sketch itself sits under the repo's exact cross-engine oracle gate. At
production scale use whichever fits: HLL is one narrow pass; KMV as built
here pays one distinct shuffle but stays verifiable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import portable as P


_KMV_SALTS = 32


def _bottom_k(pairs: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """The k smallest `h` per group — TWO-LEVEL: a salted partial top-k
    (window over (group, pmod(h, S)) — S reducers share each group's
    distinct hashes) followed by the final top-k over at most S*k rows
    per group. A single `Window.partitionBy(group)` would funnel EVERY
    distinct hash of a group through one reducer — with few groups at
    100 TB that one task is the whole job. Result identical (the global
    bottom-k is contained in the union of per-salt bottom-ks), so the
    DuckDB oracle keeps its one-level window."""
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy("h")
    pre = (
        pairs.withColumn("_salt", F.pmod(F.col("h"), F.lit(_KMV_SALTS)).cast("int"))
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_salt", "_rn1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        pre.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _kmv_estimate(n_kept_col: str, kth_col: str, k: int) -> F.Column:
    """The shared KMV estimator: exact n_kept when the sketch saw fewer
    than k distinct hashes, else (k-1) * M / kth. ONE definition for
    kmv_distinct / kmv_merge_estimate / kmv_intersect so a future bias
    correction cannot be applied to one spelling and not the others
    (review find)."""
    return F.when(
        F.col(n_kept_col) < k, F.col(n_kept_col).cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(P.MERSENNE31))
        / F.col(kth_col).cast("double")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate via a k-minimum-values sketch.

    Plan: hash values with the portable md5 hash (range [0, 2^31-1)),
    distinct (group, hash) — the cardinality-reducing shuffle — then keep
    each group's k smallest hashes with a ranked window and fold them to
    (kth smallest, kept count). Groups with fewer than k distinct hashes
    are EXACT (the sketch saw everything); otherwise the estimate is
    (k-1) * M / kth, M = the hash range. Returns
    (group, est_distinct double, n_kept bigint).

    Expected relative error ~ 1/sqrt(k-2) (~12.6% at k=64); raise k for
    tighter bounds — state is k int64s per group either way."""
    h = P.md5_hash_m31(f"CAST({value_col} AS STRING)")["spark"]
    pairs = df.select(
        F.col(group_col).alias("grp"), F.expr(h).alias("h")
    ).distinct()
    kept = (
        _bottom_k(pairs, ["grp"], k)
        .groupBy("grp")
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).cast("long").alias("n_kept"))
    )
    return kept.select(
        F.col("grp").alias(group_col),
        _kmv_estimate("n_kept", "kth", k).alias("est_distinct"),
        "n_kept",
    )


def kmv_oracle_sql(
    source: str, group_col: str, value_col: str, k: int = 64
) -> str:
    """DuckDB twin of `kmv_distinct` — same hash, same window, same
    estimator arithmetic (used by the registry oracle)."""
    h = P.md5_hash_m31(f"CAST({value_col} AS VARCHAR)")["duck"]
    return f"""
    WITH pairs AS (
        SELECT DISTINCT {group_col} AS grp, {h} AS h FROM {source}
    ),
    ranked AS (
        SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM pairs
    ),
    sk AS (
        SELECT grp, MAX(h) AS kth, COUNT(*) AS n_kept
        FROM ranked WHERE rn <= {k} GROUP BY grp
    )
    SELECT grp AS {group_col},
           CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                ELSE CAST({k - 1} AS DOUBLE) * {float(P.MERSENNE31)} / CAST(kth AS DOUBLE)
           END AS est_distinct,
           CAST(n_kept AS BIGINT) AS n_kept
    FROM sk
    """


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Materialize the KMV PARTIAL STATE per group: the sorted array of
    the k smallest distinct hashes. This is the mergeable form — the 100 TB
    pattern is to sketch at fine granularity once (per partition / day /
    source), persist the tiny arrays, and answer coarser distinct-count
    questions later by MERGING sketches instead of rescanning data.
    Returns (*group_cols, sketch array<bigint>)."""
    h = P.md5_hash_m31(f"CAST({value_col} AS STRING)")["spark"]
    pairs = df.select(
        *[F.col(c) for c in group_cols], F.expr(h).alias("h")
    ).distinct()
    return (
        _bottom_k(pairs, list(group_cols), k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("h")).alias("sketch"))
    )


def kmv_merge_estimate(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Merge KMV sketches up to a coarser grouping and estimate: union the
    hash arrays, distinct, keep the k smallest (valid because any hash in
    the global bottom-k is necessarily in its source sketch's bottom-k),
    then the same (k-1)*M/kth estimator as `kmv_distinct`. The merge is a
    pure array expression over collect_list — each group's state is at
    most (#sub-sketches * k) int64s, driver-free and shuffle-light.
    Cross-engine contract: merging per-(g, extra) sketches to g yields
    BIT-IDENTICAL estimates to sketching g directly (the registry oracle
    computes the direct form in DuckDB)."""
    merged = sketches.groupBy(*group_cols).agg(
        F.flatten(F.collect_list("sketch")).alias("all_h")
    )
    sk = F.expr(f"slice(array_sort(array_distinct(all_h)), 1, {k})")
    merged = merged.withColumn("sk", sk).select(
        *group_cols,
        F.size("sk").cast("long").alias("n_kept"),
        F.expr("element_at(sk, size(sk))").alias("kth"),
    )
    return merged.select(
        *group_cols,
        _kmv_estimate("n_kept", "kth", k).alias("est_distinct"),
        "n_kept",
    )


def mg_partition_summaries(
    df: DataFrame,
    value_col: str = "item",
    capacity: int = 128,
    *,
    emit_task_rows: bool = False,
) -> DataFrame:
    """Per-partition Misra-Gries frequency summary (Misra & Gries 1982;
    mergeable-summaries form of Agarwal et al., PODS'12): each task folds
    its items into at most `capacity` counters, decrementing all counters
    together whenever a new item would exceed the budget. The classic
    bound holds for the batched decrement used here (subtract the
    (capacity+1)-th largest count d from everyone, drop <= 0): each such
    step destroys >= d*(capacity+1) total mass, so any item's retained
    count is under-counted by at most n_partition/(capacity+1).

    This is the legitimately imperative per-partition kernel (bounded
    state, single pass) — Arrow-batched `mapInPandas`, with the per-batch
    pre-aggregation done by vectorized `value_counts`, never per-row
    Python. Output: at most `capacity` (item, cnt) rows PER TASK —
    O(tasks * capacity) total regardless of input size or key cardinality.

    `emit_task_rows=True` (optimization r13, guide §1.2-1) additionally
    yields ONE sentinel row per task — (NULL item, rows-seen) — so a
    caller that also needs the exact batch row count (the streaming MG
    fold's `n_total` bookkeeping) reads it from the SAME pass instead of
    running a second full scan of the batch. Unambiguous: NULL items
    never appear as counter rows (`value_counts` drops them) but ARE
    included in the sentinel count, exactly matching `df.count()`."""
    col = value_col

    def summarize(it):
        import pandas as pd

        counts: dict = {}
        n_rows = 0
        for pdf in it:
            n_rows += len(pdf)
            for item, c in pdf[col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > capacity:
                vals = sorted(counts.values(), reverse=True)
                d = vals[capacity]  # (capacity+1)-th largest
                counts = {i: c - d for i, c in counts.items() if c > d}
        items_out = list(counts.keys())
        cnts_out = list(counts.values())
        if emit_task_rows:
            items_out.append(None)
            cnts_out.append(n_rows)
        yield pd.DataFrame({col: items_out, "cnt": cnts_out}).astype(
            {"cnt": "int64"}
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, schema=f"{col} string, cnt long"
    )


def heavy_hitters_exact(
    df: DataFrame,
    value_col: str,
    phi: float,
    capacity: int = 128,
) -> DataFrame:
    """EXACT phi-heavy hitters (items with frequency > phi * N) via the
    two-pass candidate/verify pattern — the shape that survives 100 TB:

      1. candidates: per-partition Misra-Gries summaries
         (`mg_partition_summaries`) distinct'd — O(tasks * capacity) rows.
         Guarantee: with capacity + 1 > 1/phi, every true heavy hitter
         appears in at least one summary (sum over partitions of
         (f_p(x) - n_p/(capacity+1)) >= f(x) - N/(capacity+1) > 0), so the
         candidate set has NO false negatives; false positives die in 2.
      2. verify: broadcast the candidate set and run ONE counting pass
         that serves double duty — candidate rows group under their own
         key, every non-candidate row folds into a single NULL-key group
         (map-side partial aggregation collapses it to one row per task
         before the shuffle, so the NULL group is a partition-count fold,
         not a data funnel), and the total N is the sum of the bounded
         aggregate. The shuffle carries at most tasks*(capacity+1) rows —
         never the full key cardinality a plain groupBy(key).count()
         would move at web-vocabulary scale — and the input is scanned
         exactly TWICE overall (sketch pass + verify pass).

    The final output is exact (oracle: GROUP BY ... HAVING), independent
    of sketch error. Returns (value_col, cnt bigint, freq double)."""
    if capacity + 1 <= 1.0 / phi:
        raise ValueError(
            f"capacity {capacity} cannot guarantee phi={phi}: need capacity+1 > 1/phi"
        )
    items = df.select(F.col(value_col).cast("string").alias(value_col))
    # Both bounded intermediates are CACHED: each feeds two consumers, and
    # leaving the dedup to physical-plan exchange reuse is not reliable
    # across the broadcast-job boundaries here (measured: 4 scans without
    # the caches, 2 with). The cached sets are sketch-sized by
    # construction — tasks*capacity candidate rows, candidates+1 count
    # rows — the same bounded-fold class as the centroid caches.
    cands = (
        mg_partition_summaries(items, value_col, capacity)
        .select(value_col)
        .distinct()
        .withColumn("_is_cand", F.lit(True))
        .cache()
    )
    # NULL input values never equi-join, so they land in the NULL group
    # with the other non-candidates — correct either way (NULL cannot be
    # a reported heavy hitter, but its rows must count toward N).
    counts = (
        items.join(F.broadcast(cands), value_col, "left")
        .groupBy(
            F.when(F.col("_is_cand"), F.col(value_col)).alias(value_col)
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .cache()
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("n"))  # bounded rows
    return (
        counts.filter(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt").cast("double") > F.lit(float(phi)) * F.col("n").cast("double")
        )
        .select(
            value_col,
            "cnt",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("freq"),
        )
    )


def _cms_bucket_exprs(d: int, w: int) -> list[dict[str, str]]:
    """Engine-portable bucket expressions over a column named `hv` (the
    md5-m31 hash of the value): row j's bucket is the j-th MinHash
    permutation of hv reduced mod w — the same public 2-universal family
    the MinHash fragments inline, so both engines compute identical
    cells from literals."""
    out = []
    for j in range(d):
        a, b = P.minhash_coeffs(j)
        frag = f"((({a} * hv + {b}) % {P.MERSENNE31}) % {w})"
        out.append({"spark": frag, "duck": frag})
    return out


def cms_counters(
    df: DataFrame, value_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """Count-Min sketch counters — the MERGEABLE frequency-estimate state
    that completes the sketch family (KMV: distinct counts; Misra-Gries:
    heavy hitters; CMS: point frequency estimates for EVERY item, not
    just frequent ones). Output (j, bucket, cnt), at most d x w rows:
    merging two sketches (same d, w) is counter ADDITION, so the 100 TB
    pattern is sketch-per-partition/day once, merge later — never rescan.

    Guarantee: est(x) = min_j cnt[j][bucket_j(x)] NEVER undercounts
    (every occurrence of x lands in x's cells), and overcounts only by
    hash collisions — E[overcount] <= N/w per row, min over d
    independent rows drives the tail down.

    One narrow map (d cells per input row, plan-time literal hash
    coefficients) + one bounded groupBy — no joins, no per-item state."""
    h = P.md5_hash_m31(f"CAST({value_col} AS STRING)")["spark"]
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                F.expr(e["spark"]).cast("long").alias("bucket"),
            )
            for j, e in enumerate(_cms_bucket_exprs(d, w))
        ]
    )
    return (
        df.select(F.expr(h).alias("hv"))
        .select(F.explode(cells).alias("c"))
        .select("c.j", "c.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_point_estimates(
    counters: DataFrame,
    probes: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Point frequency estimates for `probes[value_col]` against CMS
    `counters`: est = min over rows j of the probe's cell counter
    (0 when the cell is empty — an absent item estimates 0 unless it
    collides). Both sides are bounded: the probe set is tiny by
    definition and the counters side is <= d x w rows — the COUNTERS
    side is the one broadcast (it has the hard d*w bound; a caller may
    legitimately probe more values than that). Output
    (value_col, est_cnt)."""
    h = P.md5_hash_m31(f"CAST({value_col} AS STRING)")["spark"]
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                F.expr(e["spark"]).cast("long").alias("bucket"),
            )
            for j, e in enumerate(_cms_bucket_exprs(d, w))
        ]
    )
    pcells = (
        probes.select(F.col(value_col), F.expr(h).alias("hv"))
        .select(value_col, F.explode(cells).alias("c"))
        .select(value_col, "c.j", "c.bucket")
    )
    return (
        pcells.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_cnt"))
    )


def cms_oracle_sql(
    source_tokens_sql: str, probes: tuple[str, ...], d: int = 4, w: int = 512
) -> str:
    """DuckDB twin of cms_counters + cms_point_estimates over a token
    relation `{source_tokens_sql}` (one column `token`): identical
    literal hash coefficients, identical integer arithmetic."""
    h = P.md5_hash_m31("CAST(token AS VARCHAR)")["duck"]
    rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {e['duck']} AS bucket, hv FROM h"
        for j, e in enumerate(_cms_bucket_exprs(d, w))
    )
    # data-derived strings inlined into SQL: double the quotes so a
    # probe like "it's" can't break the VALUES parse (the training._sql_str
    # injection class — r12 advisor)
    probe_vals = ", ".join("('" + str(p).replace("'", "''") + "')" for p in probes)
    prows = " UNION ALL ".join(
        f"SELECT token, {j} AS j, {e['duck']} AS bucket FROM ph"
        for j, e in enumerate(_cms_bucket_exprs(d, w))
    )
    return f"""
    WITH tok AS ({source_tokens_sql}),
    h AS (SELECT {h} AS hv FROM tok),
    cells AS ({rows}),
    counters AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cells GROUP BY j, bucket
    ),
    probes(token) AS (VALUES {probe_vals}),
    ph AS (SELECT token, {h} AS hv FROM probes),
    pcells AS ({prows}),
    exact AS (
        SELECT p.token, CAST(COUNT(t.token) AS BIGINT) AS exact_cnt
        FROM probes p LEFT JOIN tok t ON t.token = p.token
        GROUP BY p.token
    )
    SELECT pc.token,
           CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_cnt,
           MIN(e.exact_cnt) AS exact_cnt
    FROM pcells pc
    LEFT JOIN counters c ON pc.j = c.j AND pc.bucket = c.bucket
    JOIN exact e ON e.token = pc.token
    GROUP BY pc.token
    """


# --------------------------------------------------------------------------
# HyperLogLog (Flajolet et al., 2007) — the FOURTH mergeable sketch family
# (KMV distinct / MG heavy hitters / CMS point frequencies / HLL distinct):
# fixed m=64 registers per group, register j = max over the group's items
# of rho(hash suffix) for items hashing to bucket j. Unlike KMV, the state
# is FIXED-SIZE and the update is a pure partial-aggregable MAX — the
# classic one-narrow-pass cardinality sketch. Built, like the others, on
# the portable md5 hash so the ESTIMATE ITSELF is verifiable bit-for-bit
# against DuckDB (engine-internal approx_count_distinct never is).
#
# Exactness construction: the indicator Z = sum_j 2^(-M_j) is summed in
# double by the textbook — but 2^-55 terms next to ~64.0 terms need a
# 61-bit mantissa, so cross-partition summation ORDER could flip an ulp.
# Here Z is scaled by 2^55 into INT64 (sum_j 2^(55 - M_j), empty buckets
# contribute 2^55; max 64 * 2^55 = 2^61 < int64), summed exactly in any
# order, and the estimate is ONE double division of two exact values:
# est = (alpha_64 * m^2 * 2^55) / Z' — the numerator folded to a single
# Python-evaluated literal both engines parse identically. No libm: the
# standard small-range linear-counting correction needs ln(), so this is
# the RAW HLL estimator (documented; fine at vocab-scale cardinalities,
# and cross-engine equality — the property under test — is unconditional).

HLL_M = 64  # registers (b = 6 bucket bits)
_HLL_W = 54  # suffix width: md5_hash is 60 bits, minus 6 bucket bits
# alpha_64 * m^2 * 2^55 — folded in Python so each engine parses ONE
# literal (0.709 is the standard alpha_m approximation for m = 64)
_HLL_NUM = 0.709 * HLL_M * HLL_M * float(1 << (_HLL_W + 1))


def _hll_rho_fragments(value_sql: dict[str, str]) -> dict[str, dict[str, str]]:
    """(bucket, rho) fragments for a string value: bucket = low 6 bits of
    the 60-bit md5 hash, rho = 1 + leading zeros of the remaining 54-bit
    suffix (suffix 0 -> rho = 55). Leading zeros via integer bit length
    (length(bin(w)) — minimal binary string on BOTH engines), no libm."""
    h = P.md5_hash(value_sql)
    out = {}
    for eng, div in (("spark", "div"), ("duck", "//")):
        hx = h[eng]
        w = f"({hx} {div} {HLL_M})"
        out[eng] = {
            "bucket": f"({hx} % {HLL_M})",
            "rho": (
                f"CASE WHEN {w} = 0 THEN {_HLL_W + 1} "
                f"ELSE {_HLL_W + 1} - length(bin({w})) END"
            ),
        }
    return out


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Materialize HLL register state per group: (*group_cols, bucket,
    m) with m = MAX(rho) — at most HLL_M rows per group. The aggregate
    is partial-aggregable (map-side combine collapses each task's
    repeats of a hot value to one row — Zipf-safe, unlike any
    raw-value-keyed window), and the state MERGES by the same MAX."""
    fr = _hll_rho_fragments(
        {
            "spark": f"CAST({value_col} AS STRING)",
            "duck": f"CAST({value_col} AS VARCHAR)",
        }
    )["spark"]
    return (
        df.select(
            *[F.col(c) for c in group_cols],
            F.expr(fr["bucket"]).cast("int").alias("bucket"),
            F.expr(fr["rho"]).cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_merge_registers(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge register states to a coarser grouping: per-bucket MAX —
    associative/commutative/idempotent, so any merge tree yields the
    register set of sketching the coarser group directly (the property
    the q_hll_merge oracle pins cross-engine)."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("m").alias("m")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate from register state: Z' = sum_j 2^(55 - M_j)
    (empty buckets contribute 2^55) summed EXACTLY in int64, then one
    double division. Returns (*group_cols, est_distinct double,
    n_buckets bigint)."""
    z = registers.groupBy(*group_cols).agg(
        (
            F.sum(F.expr(f"shiftleft(1L, {_HLL_W + 1} - m)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << (_HLL_W + 1)).cast("long")
        ).alias("z"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    return z.select(
        *group_cols,
        (F.lit(_HLL_NUM) / F.col("z").cast("double")).alias("est_distinct"),
        "n_buckets",
    )


def hll_oracle_sql(source: str, group_col: str, value_expr: str) -> str:
    """DuckDB twin of hll_registers + hll_estimate over
    `SELECT {group_col}, {value_expr} AS v FROM {source}` — identical
    hash, identical integer register arithmetic, identical single
    division (used by the registry oracles)."""
    fr = _hll_rho_fragments({"spark": "v", "duck": "v"})["duck"]
    return f"""
    WITH vals AS (
        SELECT {group_col} AS grp, CAST({value_expr} AS VARCHAR) AS v
        FROM {source}
    ),
    regs AS (
        SELECT grp, {fr['bucket']} AS bucket, MAX({fr['rho']}) AS m
        FROM vals GROUP BY grp, bucket
    ),
    z AS (
        SELECT grp,
               CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_W + 1} - m)) AS BIGINT)
               + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {_HLL_W + 1})
                   AS zsum,
               CAST(COUNT(*) AS BIGINT) AS n_buckets
        FROM regs GROUP BY grp
    )
    SELECT grp AS {group_col},
           {_HLL_NUM!r} / CAST(zsum AS DOUBLE) AS est_distinct,
           n_buckets
    FROM z
    """


# --------------------------------------------------------------------------
# Bloom filter (Bloom, 1970) — the FIFTH mergeable sketch family (KMV
# distinct / MG heavy hitters / CMS frequencies / HLL distinct / Bloom
# MEMBERSHIP): fixed m-bit state per group answering "was value x ever
# seen in this group?" with NO false negatives and a bounded
# false-positive rate. The state is int64 word-lanes aggregated by
# bit_or — associative, commutative, IDEMPOTENT (like HLL's MAX, unlike
# CMS's addition, re-delivery cannot corrupt it), so merging any tree of
# partial states equals building the coarse state directly.
#
# Portability: positions come from the same public 2-universal family the
# CMS buckets use (MinHash permutations of the md5-m31 hash — plan-time
# literal coefficients, pure int64 arithmetic). Lanes are 32 BITS wide so
# every mask is a small positive int64 on both engines — no sign-bit /
# shift-overflow portability edge at bit 63. All state ops (bit_or,
# bit_count, &) are exact integer ops both engines share: the whole
# family is verifiable bit-for-bit against DuckDB, like the other four.
#
# Scale: building is one narrow map (k cells per input row) + one
# groupBy bounded at BLOOM_WORDS rows per group — map-side combine
# collapses a hot value to one row per task (the Zipf-safety property
# every sketch in this module is built around). A 100 TB corpus keeps a
# 4 KiB filter per partition/day and answers "have we ingested this id /
# url / content-hash?" by OR-folding states, never rescanning.

BLOOM_BITS = 1024  # m: filter width in bits
BLOOM_LANE = 32  # bits per int64 word-lane (masks stay positive)
BLOOM_WORDS = BLOOM_BITS // BLOOM_LANE
BLOOM_K = 4  # hash functions


def _bloom_pos_exprs(
    k: int, bits: int, hv: str = "hv"
) -> list[dict[str, str]]:
    """Engine-portable bit-position expressions over the hash expression
    `hv` (default: a column named hv holding the md5-m31 hash of the
    value): position j is the j-th MinHash permutation of hv reduced mod
    `bits` — the same literal-coefficient family the CMS buckets
    inline."""
    out = []
    for j in range(k):
        a, b = P.minhash_coeffs(j)
        frag = f"((({a} * {hv} + {b}) % {P.MERSENNE31}) % {bits})"
        out.append({"spark": frag, "duck": frag})
    return out


def _bloom_cell_cols(engine_div: str, lane: int) -> dict[str, str]:
    """(word, mask) fragments over a column named `pos` for one engine
    (`engine_div` is 'div' for Spark, '//' for DuckDB)."""
    return {
        "word": f"CAST(pos {engine_div} {lane} AS INT)",
        "mask": (
            f"shiftleft(1L, CAST(pos % {lane} AS INT))"
            if engine_div == "div"
            else f"(CAST(1 AS BIGINT) << CAST(pos % {lane} AS INT))"
        ),
    }


def bloom_cells(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = BLOOM_K,
    bits: int = BLOOM_BITS,
    *,
    portable: bool = True,
) -> DataFrame:
    """Materialize Bloom filter state per group: (*group_cols, word,
    bits) with bits = bit_or of the masks landing in that 32-bit lane —
    at most BLOOM_WORDS rows per group. One narrow map (k positions per
    input row from plan-time literal coefficients) + one bounded
    groupBy; partial bit_or collapses hot values map-side.

    portable=False is the PRODUCTION/runtime-filter arm (optimization
    r13, same stance as `minhash_lsh_pairs(portable=)`): the value hash
    switches from the cross-engine md5 chain to the xxhash64 intrinsic
    folded into the same [0, 2^31) domain — whole-stage codegen, ~the
    per-value hashing cost removed. Use it whenever the STATE itself is
    never compared against a DuckDB oracle — e.g. a join-prune filter
    whose false positives die in an exact join, where any consistent
    build/probe family yields IDENTICAL query results. The oracle-pinned
    membership/merge/stream rows keep portable=True."""
    if portable:
        h = P.md5_hash_m31(
            {
                "spark": f"CAST({value_col} AS STRING)",
                "duck": f"CAST({value_col} AS VARCHAR)",
            }
        )["spark"]
    else:
        # no string cast (optimization r13 second pass): xxhash64 hashes
        # any input type natively, and CAST(numeric AS STRING) allocated
        # a UTF8String per evaluation — measured ~half the per-row cost
        # of the join-prune fact filter. Build and probe share this
        # spelling (bloom_prune_predicate), which is all the
        # no-false-negative property needs.
        h = f"pmod(xxhash64({value_col}), {P.MERSENNE31})"
    cell = _bloom_cell_cols("div", BLOOM_LANE)
    poss = F.array(
        *[F.expr(e["spark"]).cast("long") for e in _bloom_pos_exprs(k, bits)]
    )
    return (
        df.select(*[F.col(c) for c in group_cols], F.expr(h).alias("hv"))
        .select(*group_cols, F.explode(poss).alias("pos"))
        .select(
            *group_cols,
            F.expr(cell["word"]).alias("word"),
            F.expr(cell["mask"]).alias("mask"),
        )
        .groupBy(*group_cols, "word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_merge_cells(cells: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge Bloom states to a coarser grouping: per-word bit_or —
    associative, commutative, idempotent, so any merge tree equals
    building the coarse filter directly (the property q_bloom_merge pins
    cross-engine)."""
    return cells.groupBy(*group_cols, "word").agg(
        F.expr("bit_or(bits)").alias("bits")
    )


def bloom_probe_cells(
    probes: DataFrame,
    value_col: str,
    k: int = BLOOM_K,
    bits: int = BLOOM_BITS,
) -> DataFrame:
    """Required-bit cells for a probe set: (value_col, word, req) — a
    probe is a member iff EVERY one of its cells is fully present in the
    filter state. Two positions sharing a lane collapse here (bit_or), so
    the membership test is per-(probe, word) exact. Delegates to
    `bloom_cells` with the probe value as its own group, so build and
    probe can never drift apart on the position/cell derivation (a
    drift would silently void the no-false-negative guarantee)."""
    return bloom_cells(
        probes.select(value_col), [value_col], value_col, k=k, bits=bits
    ).withColumnRenamed("bits", "req")


def bloom_members(
    cells: DataFrame, group_cols: list[str], probe_cells: DataFrame, value_col: str
) -> DataFrame:
    """(group, probe) pairs the Bloom state claims as members: broadcast
    the bounded probe cells against the state cells on the word lane
    (equi-join — never a cross join), keep rows whose required bits are
    all set, and demand every probe word satisfied. A probe word missing
    from the group's state simply produces no row — correctly
    non-member; no false negatives by construction."""
    nw = probe_cells.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words")
    )
    ok = (
        F.broadcast(probe_cells)
        .join(cells, "word")
        .filter(F.col("bits").bitwiseAND(F.col("req")) == F.col("req"))
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("ok"))
    )
    return (
        ok.join(F.broadcast(nw), value_col)
        .filter(F.col("ok") == F.col("n_words"))
        .select(*group_cols, value_col)
    )


def bloom_oracle_ctes(
    source: str,
    group_col: str,
    value_expr: str,
    k: int = BLOOM_K,
    bits: int = BLOOM_BITS,
) -> str:
    """DuckDB CTE fragment building the identical Bloom state over
    `SELECT {group_col}, {value_expr} FROM {source}`: exposes `cells`
    (grp, word, bits). Callers append their own probe / report SQL."""
    h = P.md5_hash_m31("v")["duck"]
    cell = _bloom_cell_cols("//", BLOOM_LANE)
    pos_list = ", ".join(e["duck"] for e in _bloom_pos_exprs(k, bits))
    return f"""
    vals AS (
        SELECT {group_col} AS grp, CAST({value_expr} AS VARCHAR) AS v
        FROM {source}
    ),
    hv AS (SELECT grp, {h} AS hv FROM vals),
    pos AS (SELECT grp, unnest([{pos_list}]) AS pos FROM hv),
    cells AS (
        SELECT grp, {cell['word']} AS word, bit_or({cell['mask']}) AS bits
        FROM pos GROUP BY grp, word
    )"""


def bloom_prune_predicate(
    cells_rows: list[tuple[int, int]],
    value_sql: str,
    k: int = BLOOM_K,
    bits: int = BLOOM_BITS,
    *,
    portable: bool = True,
):
    """Literal-Bloom membership predicate — the runtime-filter / join-
    pruning pattern: the filter state (a BOUNDED <= BLOOM_WORDS-row
    collect of (word, bits) — 32 int64s, the same plan-time-literal
    class as the salted-top-k MIN/MAX probes) is inlined as an array
    literal, so testing a fact row is a PURE EXPRESSION: k position
    computations + element_at + bitwise AND, inside whole-stage codegen.
    ZERO joins, zero shuffles, zero bytes of the fact table moved — the
    100 TB semi-join shape: prune the scan with 4 KiB of state, then
    let the exact (broadcast) join kill the residual false positives.
    No false negatives, so prune + exact join == exact join, which is
    what lets the oracle stay the plain semi-join SQL.

    The row's md5 hash is bound ONCE through a higher-order-function
    lambda (`forall(array(hash), hv -> ...)`): FilterExec codegen does
    not subexpression-eliminate across split conjuncts, so inlining the
    hash into each of the k x 2 fragments would evaluate md5 8x per
    fact row — 8x the dominant per-row cost of the prune.

    portable=False (optimization r13) is the arm join-prune callers
    should use: the probe hash is the xxhash64 intrinsic over the RAW
    value — no string cast; must match a
    `bloom_cells(..., portable=False)` build — the no-false-negative
    property only needs build/probe consistency — and because the hash
    is cheap it is INLINED per conjunct instead of lambda-bound, so the
    whole predicate stays inside whole-stage codegen (the forall lambda
    is itself a CodegenFallback HOF that forced the md5 arm's filter
    into interpreted evaluation; measured ~2s of the sf0.1 bench row,
    and the per-conjunct CAST-to-STRING another ~0.4s of it).

    The state array is inlined as ONE `from_json('[...]',
    'array<bigint>')` string literal that constant-folds to a single
    array Literal (optimization r13 second pass). The two rejected
    spellings, both measured: an `array(v0, ..., vN)` SQL string per
    conjunct costs plan PARSING (N expression nodes per conjunct), and
    `F.lit(list)` costs plan CONSTRUCTION (PySpark lowers it to
    CreateArray via one py4j call per element — at the scale-adaptive
    4096-word state that alone regressed the sf0.1 bench row 0.68s ->
    2.7s). from_json is one string token per conjunct, parsed in O(1)
    expression nodes and folded once; A/B at 2^17 bits: 0.61s — at par
    with the saturated fixed-1024 state while actually pruning
    (70k/600k fact rows pass vs 600k/600k)."""
    arr = [0] * (bits // BLOOM_LANE)
    for w, b in cells_rows:
        arr[int(w)] = int(b)
    if portable:
        # bind hv once through the lambda (md5 is the dominant cost)
        lit_sql = "array(" + ", ".join(f"{v}L" for v in arr) + ")"
        hv = P.md5_hash_m31(f"CAST({value_sql} AS STRING)")["spark"]
        conds = []
        for e in _bloom_pos_exprs(k, bits):  # fragments reference `hv`
            pos = f"({e['spark']})"
            word = f"CAST({pos} div {BLOOM_LANE} AS INT)"
            mask = f"shiftleft(1L, CAST({pos} % {BLOOM_LANE} AS INT))"
            conds.append(f"((element_at({lit_sql}, {word} + 1) & {mask}) = {mask})")
        return F.expr(
            f"forall(array({hv}), hv -> " + " AND ".join(conds) + ")"
        )
    import json

    lit = (
        f"from_json('{json.dumps(arr, separators=(',', ':'))}', "
        f"'array<bigint>')"
    )
    hv = f"pmod(xxhash64({value_sql}), {P.MERSENNE31})"
    conds = []
    for e in _bloom_pos_exprs(k, bits):  # fragments reference `hv`
        pos = f"({e['spark'].replace('hv', hv)})"
        word = f"CAST({pos} div {BLOOM_LANE} AS INT)"
        mask = f"shiftleft(1L, CAST({pos} % {BLOOM_LANE} AS INT))"
        conds.append(f"((element_at({lit}, {word} + 1) & {mask}) = {mask})")
    return F.expr(" AND ".join(conds))


def bloom_state_array(
    df: DataFrame,
    value_col: str,
    k: int = BLOOM_K,
    bits: int = BLOOM_BITS,
    *,
    portable: bool = True,
    state_col: str = "bloom_state",
) -> DataFrame:
    """ONE-ROW dense Bloom state (`state_col: array<bigint>`, word i at
    position i+1) built entirely IN-PLAN — the runtime-filter build shape
    (optimization r14, guide §3.2): no driver `collect()` and no
    plan-time job; the state rides the query as a
    `crossJoin(broadcast(...))` scalar exactly like Spark's own injected
    `bloom_filter_agg` scalar subquery, so every execution (re)builds it
    distributed and the driver never touches filter bytes.

    Construction: the per-key cells are zero-filled with a
    `range(words)` union BEFORE the single bit_or groupBy (so every word
    index is present exactly once and the zero-fill rides the same
    exchange — one shuffle, not two), then one global aggregate sorts
    the (word, bits) structs and projects the bits — a dense array whose
    position IS the word index, so the probe is one O(1) `element_at`
    per hash function. Build cost is O(keys·k + words) rows through two
    bounded aggregates; the broadcast is words×8 bytes (≤ 1 MiB at the
    2^22-bit cap). Cell derivation is inlined from `bloom_cells`'
    fragments (same `_bloom_pos_exprs`/`_bloom_cell_cols`, so build and
    probe can never drift) rather than calling it, because its groupBy
    output would force a second exchange under the union."""
    if portable:
        h = P.md5_hash_m31(
            {
                "spark": f"CAST({value_col} AS STRING)",
                "duck": f"CAST({value_col} AS VARCHAR)",
            }
        )["spark"]
    else:
        h = f"pmod(xxhash64({value_col}), {P.MERSENNE31})"
    cell = _bloom_cell_cols("div", BLOOM_LANE)
    poss = F.array(
        *[F.expr(e["spark"]).cast("long") for e in _bloom_pos_exprs(k, bits)]
    )
    cells = (
        df.select(F.expr(h).alias("hv"))
        .select(F.explode(poss).alias("pos"))
        .select(
            F.expr(cell["word"]).alias("word"),
            F.expr(cell["mask"]).alias("bits"),
        )
    )
    words = bits // BLOOM_LANE
    zeros = df.sparkSession.range(words).select(
        F.col("id").cast("int").alias("word"),
        F.lit(0).cast("long").alias("bits"),
    )
    dense = (
        cells.unionByName(zeros)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word", "bits"))),
            lambda s: s["bits"],
        ).alias(state_col)
    )


def bloom_state_probe_predicate(
    value_sql: str,
    k: int = BLOOM_K,
    bits: int = BLOOM_BITS,
    *,
    portable: bool = True,
    state_col: str = "bloom_state",
):
    """Membership predicate against a `bloom_state_array` column attached
    to the probed side (via `crossJoin(broadcast(state))`): identical
    position/cell derivation to `bloom_prune_predicate`, but the state is
    a COLUMN reference instead of a plan literal — still k positions +
    O(1) `element_at` + bitwise AND per row inside whole-stage codegen,
    with nothing state-sized in the plan text. Same build/probe
    consistency contract: `portable` and `bits` must match the build."""
    if portable:
        hv = P.md5_hash_m31(f"CAST({value_sql} AS STRING)")["spark"]
        conds = []
        for e in _bloom_pos_exprs(k, bits):  # fragments reference `hv`
            pos = f"({e['spark']})"
            word = f"CAST({pos} div {BLOOM_LANE} AS INT)"
            mask = f"shiftleft(1L, CAST({pos} % {BLOOM_LANE} AS INT))"
            conds.append(
                f"((element_at({state_col}, {word} + 1) & {mask}) = {mask})"
            )
        return F.expr(
            f"forall(array({hv}), hv -> " + " AND ".join(conds) + ")"
        )
    hv = f"pmod(xxhash64({value_sql}), {P.MERSENNE31})"
    conds = []
    for e in _bloom_pos_exprs(k, bits):  # fragments reference `hv`
        pos = f"({e['spark'].replace('hv', hv)})"
        word = f"CAST({pos} div {BLOOM_LANE} AS INT)"
        mask = f"shiftleft(1L, CAST({pos} % {BLOOM_LANE} AS INT))"
        conds.append(
            f"((element_at({state_col}, {word} + 1) & {mask}) = {mask})"
        )
    return F.expr(" AND ".join(conds))


# --------------------------------------------------------------------------
# KMV set algebra (Beyer et al., SIGMOD 2007): the k-min-values sketches
# kmv_sketch materializes don't just merge for UNION cardinality — the
# union's bottom-k is an unbiased coordinated sample of the union, so the
# fraction of it present in BOTH input sketches estimates the Jaccard
# similarity, and jaccard x union estimates the INTERSECTION cardinality.
# Everything up to the two final divisions is integer compare/count, so
# the estimates are bit-identical cross-engine like the rest of the family.


def kmv_intersect(
    sk_a: DataFrame,
    sk_b: DataFrame,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Intersection / Jaccard estimates from two per-group KMV sketches
    (`kmv_sketch` outputs joined on *group_cols): union the arrays,
    keep the k smallest (the union's own KMV sketch — valid because any
    global bottom-k hash is in its source's bottom-k), count how many of
    those appear in BOTH inputs, then

        est_jaccard      = |bottom-k(U) ∩ A ∩ B| / n_kept
        est_union        = (k-1) * M / kth   (exact n_kept when < k)
        est_intersection = est_jaccard * est_union

    Pure array expressions per group row — the sketches are the only
    input, so a 100 TB corpus answers "how many ids do partitions X and
    Y share?" from two k-int64 states without touching data. When the
    union carries fewer than k distinct hashes the sketch IS the union
    and both estimates are exact. Groups present in only ONE input join
    FULL OUTER with an empty-array stand-in and estimate jaccard 0 —
    the same rows the oracle's `ka UNION kb` path emits (review find:
    an inner join here silently dropped one-sided groups while the
    oracle reported them). Output: (*group_cols, est_jaccard,
    est_intersection, n_kept)."""
    empty = "CAST(array() AS ARRAY<BIGINT>)"
    a = sk_a.select(*group_cols, F.col("sketch").alias("_ska"))
    b = sk_b.select(*group_cols, F.col("sketch").alias("_skb"))
    j = (
        a.join(b, list(group_cols), "full_outer")
        .withColumn("_ska", F.coalesce(F.col("_ska"), F.expr(empty)))
        .withColumn("_skb", F.coalesce(F.col("_skb"), F.expr(empty)))
    )
    union_k = F.expr(
        f"slice(array_sort(array_distinct(concat(_ska, _skb))), 1, {k})"
    )
    j = j.withColumn("_u", union_k).select(
        *group_cols,
        F.size("_u").cast("long").alias("n_kept"),
        F.expr("element_at(_u, size(_u))").alias("_kth"),
        F.expr("size(array_intersect(array_intersect(_u, _ska), _skb))")
        .cast("long")
        .alias("_kint"),
    )
    jac = F.col("_kint").cast("double") / F.col("n_kept").cast("double")
    return j.select(
        *group_cols,
        jac.alias("est_jaccard"),
        (jac * _kmv_estimate("n_kept", "_kth", k)).alias("est_intersection"),
        "n_kept",
    )


def kmv_intersect_oracle_sql(
    source_a: str,
    source_b: str,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> str:
    """DuckDB twin of kmv_sketch x2 + kmv_intersect over two relations
    `SELECT {group_col}, {value_col} FROM {source_a|b}` — same hash,
    same bottom-k windows (one-level is fine in the oracle), same
    integer counts, same two divisions."""
    h = P.md5_hash_m31(f"CAST({value_col} AS VARCHAR)")["duck"]
    bott = (
        "SELECT grp, h FROM ("
        "SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn"
        " FROM {src}) WHERE rn <= " + str(k)
    )
    return f"""
    WITH pa AS (SELECT DISTINCT {group_col} AS grp, {h} AS h FROM ({source_a})),
    pb AS (SELECT DISTINCT {group_col} AS grp, {h} AS h FROM ({source_b})),
    ka AS ({bott.format(src='pa')}),
    kb AS ({bott.format(src='pb')}),
    u AS (SELECT grp, h FROM ka UNION SELECT grp, h FROM kb),
    ru AS ({bott.format(src='u')}),
    usk AS (
        SELECT grp, MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM ru GROUP BY grp
    ),
    ki AS (
        SELECT ru.grp, CAST(COUNT(*) AS BIGINT) AS kint
        FROM ru
        JOIN ka ON ka.grp = ru.grp AND ka.h = ru.h
        JOIN kb ON kb.grp = ru.grp AND kb.h = ru.h
        GROUP BY ru.grp
    )
    SELECT usk.grp AS {group_col},
           CAST(COALESCE(ki.kint, 0) AS DOUBLE) / n_kept AS est_jaccard,
           (CAST(COALESCE(ki.kint, 0) AS DOUBLE) / n_kept)
           * (CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                   ELSE CAST({k - 1} AS DOUBLE) * {float(P.MERSENNE31)}
                        / CAST(kth AS DOUBLE) END) AS est_intersection,
           n_kept
    FROM usk LEFT JOIN ki ON ki.grp = usk.grp
    """
