"""Training-data assembly operators: GPT-style sequence packing and
deterministic (stratified) sampling.

These are the last-mile ops of an LLM data pipeline — after curation
(dedup/quality in `operators.dedup` / `operators.text`) the surviving
documents are (a) sampled into a mixture and (b) concatenated into
fixed-token-budget training sequences. Both are pure Catalyst expressions
/ window plans with exact DuckDB oracles (no RNG: sampling is hash-based,
packing is a deterministic prefix sum), so they hash-compare cross-engine
like every other operator here.

Scale notes are inline; the headline one: the packing prefix sum is a
DISTRIBUTED two-level cumsum (range partition -> per-partition window ->
broadcast partition offsets), never a single-partition global window —
the classic `Window.orderBy(...)`-without-partitionBy scale-killer is
exactly what this module exists to avoid at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions import portable as P

SAMPLE_BASIS = 10_000  # hash-sampling resolution: fractions quantize to 1e-4

# Strata-cardinality ceiling for the CASE-inlining samplers. Their whole
# design premise is that the stratum column is LOW-cardinality (languages,
# sources): per-stratum rates/cuts are collected to the driver and inlined
# as literals. A user keying on a high-cardinality column (url, doc_id)
# would hit a driver-memory + plan-size cliff — so, mirroring the view
# state machines' max_groups guard (r12), the collects are LIMIT-bounded
# BEFORE any row reaches the driver and refuse past the ceiling.
MAX_STRATA = 10_000


def _strata_refusal(op: str, stratum_col: str, max_strata: int) -> ValueError:
    return ValueError(
        f"{op}: stratum column {stratum_col!r} has more than "
        f"{max_strata} distinct values — this operator inlines one CASE "
        "branch per stratum and is designed for low-cardinality strata "
        "(languages/sources). For high-cardinality keys, derive a bounded "
        "stratum first (e.g. a hash bucket: pmod(hash(col), k)) or use the "
        "uniform `sample_deterministic` / the distributed two-level "
        "prefix-scan ops directly; raise max_strata= only if the driver "
        "and plan size can genuinely absorb it"
    )


def _id_hash(id_col: str) -> dict[str, str]:
    """Portable md5 hash fragments of the id rendered as text — the ONE
    randomness source every sampler/splitter here derives from."""
    return P.md5_hash(
        {"spark": f"CAST({id_col} AS STRING)", "duck": f"CAST({id_col} AS VARCHAR)"}
    )


def sample_fragments(id_col: str, rate_expr: str) -> dict[str, str]:
    """Keep-predicate fragments: md5-derived hash of the id, mod BASIS,
    compared against rate*BASIS. Deterministic, reproducible, and
    engine-portable — the pipeline answer to `TABLESAMPLE` (which is
    neither deterministic nor consistent across engines/runs)."""
    h = _id_hash(id_col)
    return {
        "spark": f"(({h['spark']}) % {SAMPLE_BASIS}) < CAST(round(({rate_expr}) * {SAMPLE_BASIS}) AS BIGINT)",
        "duck": f"(({h['duck']}) % {SAMPLE_BASIS}) < CAST(round(({rate_expr}) * {SAMPLE_BASIS}) AS BIGINT)",
    }


def sample_temperature(
    df: DataFrame,
    alpha: float = 0.5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    max_strata: int = MAX_STRATA,
) -> DataFrame:
    """Temperature-scaled stratum sampling — the mT5/multilingual
    alpha-sampling rule (p_i ∝ n_i^alpha): downsample each stratum at
    rate (n_min/n_i)^(1-alpha), anchored at the SMALLEST stratum (kept
    whole), which flattens the kept-count distribution to exactly
    ∝ n_i^alpha without upsampling. alpha=1 keeps everything
    (proportional), alpha→0 approaches uniform strata.

    Scale shape: the per-stratum counts collect is strata-size (the same
    class as the percentile-cut collects); the rates are inlined as an
    engine-evaluated CASE over literal counts, so the keep predicate is
    ONE narrow filter — no join, no shuffle, retry-stable hash
    thresholding (`sample_fragments`).

    Cross-engine exactness: for alpha=0.5 the rate is
    sqrt(n_min / n_i) — division and sqrt are IEEE correctly-rounded on
    both engines, so an oracle deriving the same rate in SQL lands on
    bit-identical thresholds. Other alphas go through pow(), whose
    rounding is libm-specific — fine within one engine, pin alpha=0.5
    for cross-engine oracles."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    # LIMIT-bounded strata collect: at most max_strata+1 rows ever reach
    # the driver, and one extra row proves the ceiling is breached
    rows = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .limit(max_strata + 1)
        .collect()
    )
    if len(rows) > max_strata:
        raise _strata_refusal("sample_temperature", stratum_col, max_strata)
    counts = {r[stratum_col]: r["n"] for r in rows}
    if not counts:
        return df
    n_min = min(counts.values())

    def rate_sql(n: int) -> str:
        frac = f"CAST({n_min} AS DOUBLE) / {n}"
        if alpha == 0.5:
            return f"sqrt({frac})"
        return f"power({frac}, CAST({1.0 - alpha!r} AS DOUBLE))"

    branches = " ".join(
        (
            f"WHEN {stratum_col} IS NULL THEN {rate_sql(n)}"
            if s is None
            else f"WHEN {stratum_col} = {_sql_str(s)} THEN {rate_sql(n)}"
        )
        for s, n in sorted(
            counts.items(), key=lambda kv: (kv[0] is None, kv[0])
        )
    )
    rate = f"CASE {branches} ELSE CAST(0.0 AS DOUBLE) END"
    return df.filter(F.expr(sample_fragments(id_col, rate)["spark"]))


def _sql_str(s) -> str:
    """A DATA-derived string as a SQL literal — single quotes doubled, so
    a stratum value like "it's" can't break (or inject into) the inlined
    CASE expression (r12 review)."""
    return "'" + str(s).replace("'", "''") + "'"


def sample_deterministic(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Uniform deterministic sample: a pure narrow filter (no shuffle, no
    RNG, stable across runs/retries — a recomputed task keeps the same
    rows, unlike `df.sample`, whose per-task RNG makes retried partitions
    diverge under speculative execution)."""
    return df.filter(F.expr(sample_fragments(id_col, repr(float(fraction)))["spark"]))


def sample_stratified(
    df: DataFrame,
    strata: dict[str, float],
    strata_col: str,
    id_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weights step of a
    training-data pipeline ('keep 100% of lang A, 25% of lang B…').

    The strata->rate map is driver-size by definition; it is inlined as a
    CASE expression so the plan stays a single narrow filter over the
    corpus — no join, no shuffle, and the parquet scan still prunes on any
    upstream predicates. The map is user-given, but a programmatically
    built one can still smuggle in a high-cardinality key — same plan-size
    ceiling as the data-derived samplers."""
    if len(strata) > MAX_STRATA:
        raise _strata_refusal("sample_stratified", strata_col, MAX_STRATA)
    branches = " ".join(
        f"WHEN {strata_col} = {_sql_str(k)} THEN CAST({float(v)!r} AS DOUBLE)"
        for k, v in sorted(strata.items())
    )
    rate = f"CASE {branches} ELSE CAST({float(default_fraction)!r} AS DOUBLE) END"
    return df.filter(F.expr(sample_fragments(id_col, rate)["spark"]))


def with_prefix_offsets(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    out_col: str = "cum_before",
    bounds: list | None = None,
    pid: Column | None = None,
) -> DataFrame:
    """Exclusive prefix sum of `weight_col` in `id_col` order — DISTRIBUTED
    and DETERMINISTIC.

    A naive `SUM() OVER (ORDER BY id)` plans as a single-partition window:
    every row through one task — the canonical 100 TB scale-killer. This is
    the standard two-level scan instead:

      1. bucket rows into contiguous `id_col` ranges with boundaries that
         are DETERMINISTIC LITERALS: approx percentiles of the key,
         computed ONCE at plan-build (one narrow aggregation job, a
         driver-size list — the same plan-time-action class as the chunk
         planner's MIN/MAX). Spark's own `repartitionByRange` samples its
         boundaries with a per-execution random seed, and this plan's two
         consumers (per-row cumsum + per-bucket subtotals) each execute
         the exchange subtree: two executions under sampled boundaries
         label `_pid` DIFFERENTLY and misalign cumsums with offsets —
         found as an actual sf0.1 nondeterminism in r6 (AQE exchange
         reuse, which r5 relied on, is opportunistic, not guaranteed).
         Literal boundaries make both executions bit-identical, reuse or
         not.
      2. per-bucket exclusive cumsum (window PARTITIONED by the bucket id,
         so the window shuffle is key-spread, not single-reducer);
      3. per-bucket subtotals (a #buckets-row frame) get their own
         exclusive cumsum — driver-size, the only serial step — and
         broadcast-join back as offsets on the deterministic bucket id.

    Contract: weights are NON-NEGATIVE INTEGERS (token counts). The
    subtotal derivation (max of the inclusive running sum) is exact only
    then; the contract is ENFORCED in-pass with an assert_true guard
    (a per-row expression in the same projection, no extra pass).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    # The guard is FUSED INTO the weight column itself (assert_true yields
    # NULL on success, so the `when` passes the weight through) — a
    # withColumn(...).drop(...) guard column is pruned by Catalyst along
    # with its assert and never evaluates (found dead in r6; pinned by
    # test_prefix_offsets_rejects_bad_weights).
    guard = F.assert_true(
        F.col(weight_col).isNotNull()
        & (F.col(weight_col) >= 0)
        & (F.col(weight_col).cast("long") == F.col(weight_col)),
        F.lit(f"with_prefix_offsets: {weight_col} must be a non-negative integer"),
    )
    df = df.withColumn(weight_col, F.when(guard.isNull(), F.col(weight_col)))
    # Bucket count: capped so the O(#bounds) per-row bucket lookup stays
    # cheap even on clusters with huge default parallelism — 1024 buckets
    # keep every window/subtotal stage wide enough while bounding the
    # literal array scan (r6 review).
    n_buckets = max(1, min(par, 1024))
    if bounds is None:
        # plan-build action: deterministic cut points over the key. For a
        # numeric key, approx percentiles (one narrow aggregation job);
        # otherwise an md5-rank sample (TakeOrderedAndProject — works for
        # ANY orderable type, e.g. string ids). Either way the cuts are
        # collected ONCE and inlined as literals, so both plan subtrees
        # bucket identically (see docstring).
        numeric = isinstance(
            df.schema[id_col].dataType,
            (T.LongType, T.IntegerType, T.ShortType, T.DoubleType, T.FloatType),
        )
        if numeric:
            probs = [i / n_buckets for i in range(1, n_buckets)]
            cuts = (
                df.select(
                    F.percentile_approx(
                        F.col(id_col).cast("double"), probs, 10_000
                    ).alias("c")
                ).first()["c"]
                if probs
                else None
            )
            bounds = sorted(set(cuts)) if cuts and cuts[0] is not None else []
        else:
            n_samp = n_buckets * 16
            rk = P.md5_hash("CAST(k AS STRING)")["spark"]  # over the alias
            samp = sorted(
                r["k"]
                for r in df.select(F.col(id_col).alias("k"))
                .withColumn("_rk", F.expr(rk))
                .orderBy("_rk")
                .limit(n_samp)
                .collect()
            )
            step = max(1, len(samp) // n_buckets)
            bounds = sorted(set(samp[step::step]))
    if pid is not None:
        # Caller-supplied bucket id — MUST equal the count of `bounds`
        # entries strictly below the key for every row (the caller owns
        # that proof; `epoch_order`'s equal-width bounds reduce it to one
        # integer division where the generic spelling below scans the
        # whole boundary array per row — O(#bounds) interpreted HOF work
        # that matters at the 1024-bucket cluster cap).
        if bounds is None:
            raise ValueError(
                "with_prefix_offsets: pid= requires explicit bounds= "
                "(the bucket count and the offsets join key derive from it)"
            )
        pid = pid.cast("int")
    elif bounds:
        # Column-API bucket id (no SQL-string interpolation: arbitrary
        # column names and string boundaries are safe): the count of
        # boundary literals strictly below the key.
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b < F.col(id_col))).cast("int")
    else:
        pid = F.lit(0).cast("int")
    tagged = df.withColumn("_pid", pid)
    parted = tagged.repartition(
        max(len(bounds) + 1 if bounds else 1, 1), F.col("_pid")
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = parted.withColumn(
        "_cum_in", F.coalesce(F.sum(weight_col).over(w_in), F.lit(0)).cast("long")
    )
    # Per-bucket subtotal = SUM(weight) — NOT max(_cum_in + weight) over
    # the windowed frame (equal for the contract's non-negative weights:
    # the inclusive running sum is nondecreasing, so its max is the
    # bucket total). The window spelling forced the offsets branch to
    # re-execute the per-bucket Sort+Window under the broadcast build;
    # the plain sum needs no sort.
    #
    # The `pmod(xxhash64(*all columns), 1)` term is identically ZERO
    # (xxhash64 is never NULL — absent args hash to the seed — and
    # pmod(x, 1) = 0 for every x, negatives included), so the summed
    # value is exactly `weight`. Its job is plan-shape only: it keeps
    # every input column referenced in this branch so column pruning
    # cannot shrink the projection under `parted`'s exchange, which
    # makes the two exchange subtrees canonically EQUAL and AQE serves
    # the offsets branch from a ReusedExchange — the corpus (and an
    # expensive weight expression like a tokenize) is scanned ONCE for
    # the whole operator. A bare sum(weight) prunes the id/payload
    # columns here, the exchanges stop matching, and this branch
    # re-scans the source; `w + xxhash64(id)*0` is folded away by the
    # optimizer (r14, measured). If a future Spark folds pmod-by-one
    # too, the cost is a lost reuse (this branch re-scans), never a
    # wrong value. (r14, guide §1.2-1/§2.4.)
    anchor = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(1))
    subtot = parted.groupBy("_pid").agg(
        F.sum(F.col(weight_col).cast("long") + anchor).alias("_pt")
    )
    w_p = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = subtot.withColumn(
        "_off", F.coalesce(F.sum("_pt").over(w_p), F.lit(0)).cast("long")
    ).select("_pid", "_off")
    return (
        within.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_cum_in") + F.col("_off")).cast("long"))
        .drop("_pid", "_cum_in", "_off")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in id order into a
    token stream and cut it every `budget` tokens. Each document's
    placement is fully determined by its exclusive prefix token count:

        seq_first = cum_before        // budget
        seq_last  = (cum_before + n_tok - 1) // budget   (n_tok > 0)

    so the assignment is a pure expression over the distributed prefix sum
    (`with_prefix_offsets`) — no sequential state, no driver loop, and a
    document spanning a boundary is visible as seq_last > seq_first
    (training pipelines either split it there or mask across the seam).
    Empty documents pin seq_last = seq_first. Output: one row per doc with
    (id, n_tok, cum_before, seq_first, seq_last)."""
    ntok = P.n_tokens(text_col)["spark"]
    base = df.select(
        F.col(id_col), F.expr(ntok).cast("long").alias("n_tok")
    )
    off = with_prefix_offsets(base, id_col, "n_tok")
    b = int(budget)
    # integer division (DIV), not double `/` + cast — bit-exact at any size
    return off.select(
        F.col(id_col),
        "n_tok",
        "cum_before",
        F.expr(f"cum_before DIV {b}").alias("seq_first"),
        F.expr(
            f"CASE WHEN n_tok > 0 THEN (cum_before + n_tok - 1) DIV {b} "
            f"ELSE cum_before DIV {b} END"
        ).alias("seq_last"),
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector linear quantization of float embeddings to `bits`-bit
    codes — the standard 4x (float32 -> int8) storage/IO cut for a 100 TB
    embedding corpus; dequantize is `mn + code * scale` per element.

    Pure elementwise Catalyst expressions (one narrow pass, no shuffle, no
    UDF): per-vector min/max -> scale = (mx - mn) / (2^bits - 1) -> code =
    round((x - mn) / scale). A constant vector (scale 0) quantizes to all
    zeros and reconstructs exactly as mn. NULL vectors are filtered (no
    codes to emit). Returns (id, q array<int>, mn double, scale double).

    Every output is elementwise (no float accumulation), so the result is
    oracle-exact cross-engine; reconstruction error is bounded by scale/2
    per element (asserted in tests, not shipped as a column — an MSE
    aggregate would hinge on float summation order)."""
    levels = (1 << bits) - 1
    d = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.expr(f"array_min({d})").alias("mn"),
            F.expr(f"(array_max({d}) - array_min({d})) / {levels}.0").alias("scale"),
            F.expr(d).alias("_d"),
        )
        .select(
            "id",
            F.expr(
                "CASE WHEN scale = 0 THEN transform(_d, x -> 0) "
                "ELSE transform(_d, x -> CAST(round((x - mn) / scale) AS INT)) END"
            ).alias("q"),
            "mn",
            "scale",
        )
    )


def sample_cluster_balanced(
    df: DataFrame,
    centroids: DataFrame,
    rates: dict[int, float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Diversity-aware corpus subsampling: assign each row to its nearest
    embedding-space cluster (the zero-shuffle `ivf_assign` expression
    argmax over broadcast centroids) and keep a per-CLUSTER deterministic
    fraction — the embedding-space analogue of `sample_stratified` for
    rebalancing over-represented content modes (boilerplate clusters get
    a low rate, rare clusters keep 100%). The whole plan is one narrow
    corpus pass + the hash-threshold filter: no join, no shuffle, retry-
    stable. Returns the kept rows with their `cent_id`."""
    from .similarity import ivf_assign

    # NULL vectors have no meaningful cell — without this filter they'd
    # coalesce to the sentinel distance, tie-break into cell 0 and be
    # sampled at cell 0's rate (and diverge from the oracle, which
    # excludes them)
    assigned = ivf_assign(
        df.filter(F.col(vec_col).isNotNull()), centroids, id_col, vec_col
    )
    branches = " ".join(
        f"WHEN cent_id = {int(k)} THEN CAST({float(v)!r} AS DOUBLE)"
        for k, v in sorted(rates.items())
    )
    rate = f"CASE {branches} ELSE CAST({float(default_fraction)!r} AS DOUBLE) END"
    return assigned.filter(F.expr(sample_fragments("id", rate)["spark"]))


def epoch_order(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    out_col: str = "pos",
) -> DataFrame:
    """Deterministic global training order (epoch shuffling): every row
    gets a 0-based position in a pseudo-random permutation keyed by
    `seed` — reproducible across runs/retries (no RNG) and different per
    seed, which is exactly what dataloader epoch shuffling needs at
    corpus scale.

    Plan: the shuffle key is the portable md5 hash of (seed, id) —
    unique per id in practice — and the position is the DISTRIBUTED
    two-level prefix sum over weight 1 (`with_prefix_offsets`), i.e. a
    range partition on the key + per-partition window + broadcast
    offsets. Never the single-partition `ROW_NUMBER() OVER (ORDER BY
    ...)` global window — the canonical 100 TB scale-killer the DuckDB
    oracle is allowed to use and this plan is plan-gated NOT to."""
    key = P.md5_hash(f"concat('{int(seed)}:', CAST({id_col} AS STRING))")["spark"]
    keyed = df.withColumn("_ek", F.expr(key)).withColumn("_one", F.lit(1))
    # The shuffle key is uniform in a KNOWN range ([0, 2^60): 15 hex chars
    # of md5), so equal-width literal bounds are balanced BY CONSTRUCTION —
    # no plan-build sampling job at all (r6 review: the percentile pass
    # would have evaluated the md5 keying of the whole corpus twice).
    par = df.sparkSession.sparkContext.defaultParallelism
    nb = max(1, min(par, 1024))
    width = (1 << 60) // nb
    bounds = [i * width for i in range(1, nb)]
    # Bucket id in O(1) arithmetic instead of the generic O(nb) boundary-
    # array filter (r14): with equal-width bounds b_i = i*width, the count
    # of bounds strictly below ek is min(nb-1, (ek-1) DIV width) — exact
    # for ek >= 0 incl. the ek=0 edge (Spark DIV truncates toward zero,
    # so -1 DIV width = 0). Pinned against the generic spelling by
    # test_epoch_order_arithmetic_pid_matches_boundary_count.
    pid = (
        F.least(F.lit(nb - 1), F.expr(f"(_ek - 1) DIV {width}"))
        if bounds
        else None
    )
    return (
        with_prefix_offsets(
            keyed,
            id_col="_ek",
            weight_col="_one",
            out_col=out_col,
            bounds=bounds,
            pid=pid,
        ).drop("_ek", "_one")
    )


WEIGHTED_SALTS = 32  # reducer fan-out of the salted partial top-k

# Resolution of the A-ES uniform u: 2^40 distinct values (the md5 hash
# spans [0, 2^60)). The rate-sampler's SAMPLE_BASIS (1e4) is far too
# coarse here — at 1M+ rows, a 1e-4 quantization would collapse the
# top-k into "heaviest rows of the max-u hash class" instead of
# weight-proportional draws (r7 review). 2^40 keeps u exact in a double
# ((h % B) + 0.5 needs 41 bits < 53; dividing by a power of two is
# exact), so both engines compute bit-identical keys.
WEIGHT_BASIS = 1 << 40


def weighted_sample_key(id_col: str, weight_col: str) -> dict[str, str]:
    """Efraimidis–Spirakis A-ES sampling key, engine-portable: a
    deterministic uniform u in (0,1) derived from the id's md5 hash, and
    key = ln(u)/w — the LOG form of u^(1/w), same ordering, numerically
    stable. The k LARGEST keys are a weighted sample WITHOUT replacement
    (inclusion probability proportional to weight at each draw).
    Deterministic and retry-stable like every sampler here: no RNG, the
    hash IS the randomness."""
    h = _id_hash(id_col)
    u = (
        f"((CAST(({{h}}) % {WEIGHT_BASIS} AS DOUBLE) + 0.5) / {WEIGHT_BASIS})"
    )
    return {
        "spark": f"(ln({u.format(h=h['spark'])}) / CAST({weight_col} AS DOUBLE))",
        "duck": f"(ln({u.format(h=h['duck'])}) / CAST({weight_col} AS DOUBLE))",
    }


def sample_weighted(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salts: int = WEIGHTED_SALTS,
) -> DataFrame:
    """Weighted sample WITHOUT replacement of k rows (A-ES top-k by
    `weighted_sample_key`): the mixture-weighting primitive when the
    weight is per-ROW (quality score, token count) rather than
    per-stratum — `sample_stratified` can't express it.

    Scale shape: the global top-k is the two-level salted reduction
    (partial top-k per (hash(id) % salts) group — S reducers share the
    corpus — then a final rank over <= S*k rows), the same pattern as
    the similarity top-ks and the KMV bottom-k: never a single-reducer
    global window. Rows with NULL or non-positive weight are excluded
    (ln(u)/w flips sign at w<0 and A-ES is undefined there)."""
    from .scale import salted_topk

    key = F.expr(weighted_sample_key(id_col, weight_col)["spark"])
    pos = df.filter(F.col(weight_col).cast("double") > 0).withColumn(
        "_wkey", key
    )
    return salted_topk(
        pos, [F.desc("_wkey"), F.asc(id_col)], "draw_rank", k, id_col,
        salts=salts,
    ).drop("_wkey")


def split_fragments(id_col: str, ratios: dict[str, float]) -> dict[str, str]:
    """Engine-portable CASE expression assigning each id to exactly one
    named split by cumulative hash-threshold ranges over the SAME
    uniform hash the samplers use. Ratios must sum to <= 1; any
    remainder falls into the final split (so {train:.9, val:.05,
    test:.05} is airtight against rounding)."""
    h = _id_hash(id_col)
    names = list(ratios)
    if len(names) == 1:
        # zero WHEN branches is invalid SQL ("CASE ELSE x END")
        return {eng: f"'{names[0]}'" for eng in ("spark", "duck")}
    out = {}
    for eng in ("spark", "duck"):
        u = f"(({h[eng]}) % {SAMPLE_BASIS})"
        branches, acc = [], 0.0
        for name in names[:-1]:
            acc += float(ratios[name])
            thr = int(round(acc * SAMPLE_BASIS))
            branches.append(f"WHEN {u} < {thr} THEN '{name}'")
        out[eng] = f"CASE {' '.join(branches)} ELSE '{names[-1]}' END"
    return out


def split_assign(
    df: DataFrame, id_col: str, ratios: dict[str, float], out_col: str = "split"
) -> DataFrame:
    """Deterministic train/val/test assignment: one narrow projection, no
    RNG, no shuffle — every id lands in exactly one split, stable across
    runs, retries, engines, and (critically) across PIPELINE RERUNS over
    a grown corpus: an id keeps its split forever, so no example ever
    migrates from held-out into training."""
    if not ratios or any(v < 0 for v in ratios.values()):
        raise ValueError(f"ratios must be non-negative and non-empty: {ratios}")
    if sum(ratios.values()) > 1.0 + 1e-9:
        raise ValueError(f"ratios sum to {sum(ratios.values())} > 1: {ratios}")
    return df.withColumn(
        out_col, F.expr(split_fragments(id_col, ratios)["spark"])
    )


def sample_token_budget(
    df: DataFrame,
    budget: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_cuts: int = 32,
    max_strata: int | None = None,
) -> DataFrame:
    """Per-stratum take-until-token-budget — the Dolma/RedPajama mixing
    primitive: within each stratum (language/source), keep documents in
    priority order (here: n_tok DESC, id ASC — longest-first; swap the
    key for a quality score without changing the machinery) until the
    stratum's cumulative token count reaches `budget`. A doc is kept iff
    its EXCLUSIVE prefix is still under budget, so every stratum gets at
    least its first doc and the budget is crossed at most once.

    100 TB shape — the naive formulation is a scale-killer: strata are
    LOW-cardinality (tens of languages) and huge, so
    `SUM() OVER (PARTITION BY lang ORDER BY ...)` funnels each stratum's
    billions of rows through ONE reducer. This is the per-stratum
    analogue of `with_prefix_offsets`' two-level scan:

      1. per-stratum priority-range buckets from DETERMINISTIC LITERAL
         cuts (one plan-time `groupBy(stratum).percentile_approx` pass,
         strata x n_cuts driver-size literals — same class as the chunk
         planner's MIN/MAX; literal cuts keep the two consumers of the
         exchange bit-identical, the r6 repartitionByRange lesson);
      2. within-(stratum, bucket) exclusive cumsum — the window shuffle
         key is (stratum, bucket): wide, never one-task-per-stratum;
      3. per-(stratum, bucket) subtotals (a strata x buckets frame) get
         the serial exclusive cumsum — driver-size by construction —
         and broadcast back as offsets.

    Ties are whole-bucket-stable: bucket id counts cuts STRICTLY above
    n_tok, so equal-priority rows always share a bucket and the within-
    bucket (n_tok DESC, id) window totally orders them. Output:
    (id, stratum, n_tok, cum_before) for kept docs.

    NULLs: a NULL stratum is a REAL group (the oracle's PARTITION BY
    keeps one NULL partition — null-safe handling throughout, r11
    review); a NULL/negative token count is a contract violation
    enforced in-pass (NULL text tokenizes to size()=-1 on Spark but NULL
    on other engines — ambiguity this op refuses to paper over; clean
    text upstream), same stance as with_prefix_offsets' weight guard.

    `max_strata` (default 32_000 // n_cuts — the plan inlines
    strata x n_cuts cut literals, so the ceiling scales inversely with
    n_cuts) refuses high-cardinality stratum columns before the cuts
    collect reaches the driver (see MAX_STRATA)."""
    within = _stratum_token_prefix(
        df, stratum_col, id_col, text_col, n_cuts, max_strata
    )
    return within.filter(F.col("cum_before") < int(budget)).select(
        id_col, stratum_col, "n_tok", "cum_before"
    )


def _stratum_token_prefix(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    text_col: str,
    n_cuts: int,
    max_strata: int | None = None,
) -> DataFrame:
    """(id, stratum, n_tok, cum_before) for EVERY row — the shared
    two-level per-stratum exclusive prefix sum in (n_tok DESC, id ASC)
    priority order (see sample_token_budget's docstring for the scale
    rationale and NULL semantics)."""
    ntok = F.expr(P.n_tokens(text_col)["spark"]).cast("long")
    # guard fused into the column so Catalyst cannot prune it away
    guard = F.assert_true(
        ntok.isNotNull() & (ntok >= 0),
        F.lit(
            "sample_token_budget: token count must be non-null and "
            "non-negative (NULL text?) — clean text upstream"
        ),
    )
    base = df.select(
        F.col(id_col),
        F.col(stratum_col),
        F.when(guard.isNull(), ntok).alias("n_tok"),
    )
    # plan-time per-stratum cuts (driver-size: strata x n_cuts). The
    # collect is LIMIT-bounded and refuses past the ceiling — the CASE
    # chain below inlines n_cuts literals PER STRATUM, so the default
    # ceiling scales inversely with n_cuts (32k total literal budget).
    if max_strata is None:
        max_strata = max(1, 32_000 // max(n_cuts, 1))
    probs = [i / n_cuts for i in range(1, n_cuts)]
    cut_rows = (
        base.groupBy(stratum_col)
        .agg(
            F.percentile_approx(
                F.col("n_tok").cast("double"), probs, 10_000
            ).alias("c")
        )
        .limit(max_strata + 1)
        .collect()
    )
    if len(cut_rows) > max_strata:
        raise _strata_refusal("sample_token_budget", stratum_col, max_strata)
    cuts = {
        r[stratum_col]: sorted({float(x) for x in (r["c"] or []) if x is not None})
        for r in cut_rows
    }
    # bucket id = count of this stratum's cuts strictly ABOVE n_tok
    # (bucket 0 holds the largest docs); inlined as a literal CASE chain
    # with an explicit IS NULL branch — `col == lit(None)` never matches,
    # so without it every NULL-stratum row would silently take bucket 0
    bucket = F.lit(0)
    for s, cs in cuts.items():
        if cs:
            arr = F.array(*[F.lit(c) for c in cs])
            b = F.size(F.filter(arr, lambda c: c > F.col("n_tok").cast("double")))
            cond = (
                F.col(stratum_col).isNull()
                if s is None
                else (F.col(stratum_col) == s)
            )
            bucket = F.when(cond, b).otherwise(bucket)
    parted = base.withColumn("_qb", bucket.cast("int")).repartition(
        F.col(stratum_col), F.col("_qb")
    )
    w_in = (
        Window.partitionBy(stratum_col, "_qb")
        .orderBy(F.desc("n_tok"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = parted.withColumn(
        "_cum_in", F.coalesce(F.sum("n_tok").over(w_in), F.lit(0)).cast("long")
    )
    # Per-(stratum, bucket) subtotal = SUM(n_tok), not max(_cum_in+n_tok)
    # over the windowed frame (equal: n_tok is guarded non-negative, so
    # the inclusive running sum's max is the group total) — the window
    # spelling re-executed the priority Sort+Window under the broadcast
    # build. The pmod(xxhash64(...), 1) anchor is identically zero and
    # exists only to keep every column referenced so this branch's
    # exchange projection matches the main one and AQE serves it from a
    # ReusedExchange — one scan / one tokenize for the whole operator
    # (see with_prefix_offsets for the full argument; r14, §1.2-1/§2.4).
    anchor = F.pmod(
        F.xxhash64(F.col(id_col), F.col(stratum_col), F.col("n_tok")), F.lit(1)
    )
    subtot = parted.groupBy(stratum_col, "_qb").agg(
        F.sum(F.col("n_tok") + anchor).alias("_bt")
    )
    w_b = (
        Window.partitionBy(stratum_col)
        .orderBy("_qb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = subtot.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(w_b), F.lit(0)).cast("long")
    ).select(stratum_col, "_qb", "_off")
    # null-SAFE stratum equality: a plain equi-join drops the NULL
    # stratum's rows (NULL != NULL) that every other stage kept
    off = offsets.withColumnRenamed(stratum_col, "_s").withColumnRenamed(
        "_qb", "_ob"
    )
    return (
        within.join(
            F.broadcast(off),
            F.col(stratum_col).eqNullSafe(F.col("_s"))
            & (F.col("_qb") == F.col("_ob")),
        )
        .withColumn("cum_before", (F.col("_cum_in") + F.col("_off")).cast("long"))
        .select(id_col, stratum_col, "n_tok", "cum_before")
    )


def upsample_token_budget(
    df: DataFrame,
    budget: int,
    max_epochs: int = 4,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_cuts: int = 32,
    max_strata: int | None = None,
) -> DataFrame:
    """Epoch-repetition mixing — the complement of `sample_token_budget`
    for UNDER-budget strata (the LLaMA/Dolma "repeat small high-quality
    sources up to k epochs" recipe rule): each stratum's documents cycle
    in priority order (n_tok DESC, id ASC), epoch after epoch, until the
    stratum's cumulative token count crosses `budget` or `max_epochs`
    full cycles have been emitted. A (doc, epoch) copy is kept iff its
    exclusive GLOBAL prefix (epoch-1)*stratum_total + cum_before is
    under budget — so the budget is crossed at most once per stratum
    and a stratum bigger than the budget degenerates to exactly
    `sample_token_budget`'s single partial epoch.

    Everything derives from two bounded inputs: the shared two-level
    per-stratum prefix sum (`_stratum_token_prefix` — no one-reducer-
    per-stratum window) and a per-stratum totals frame (strata rows,
    broadcast back null-safely). The epoch fan-out is a per-row
    `sequence(1, e_max)` explode where e_max <= max_epochs — pure
    narrow compute, no shuffle beyond the prefix scan's own.

    Output: (id, stratum, epoch, n_tok, cum_global) — cum_global is the
    copy's exclusive token prefix within its stratum's emitted stream."""
    pre = _stratum_token_prefix(
        df, stratum_col, id_col, text_col, n_cuts, max_strata
    )
    return _epoch_fanout(pre, budget, max_epochs, stratum_col, id_col)


def _epoch_fanout(
    pre: DataFrame,
    budget: int,
    max_epochs: int,
    stratum_col: str,
    id_col: str,
) -> DataFrame:
    """Epoch fan-out over a prepared per-stratum prefix frame (id,
    stratum, n_tok, cum_before) — split from `upsample_token_budget` so
    the zero-total-stratum clamp is unit-testable: whitespace
    tokenization counts every doc >= 1 token, so the degenerate stratum
    is unreachable through the text path but must still behave (r11
    verdict item 5)."""
    totals = pre.groupBy(stratum_col).agg(F.sum("n_tok").alias("_tot"))
    tot = totals.withColumnRenamed(stratum_col, "_s")
    joined = pre.join(
        F.broadcast(tot), F.col(stratum_col).eqNullSafe(F.col("_s"))
    ).drop("_s")
    b = F.lit(int(budget)).cast("long")
    # highest epoch whose copy still starts under budget — INTEGRAL
    # division (`div`), not `/`: at real budgets (10^12+ tokens) the
    # double-precision ratio rounds near epoch boundaries. A stratum of
    # only 0-token docs (T=0) clamps to one epoch.
    e_row = F.when(
        F.col("_tot") > 0,
        F.expr(f"({int(budget)}L - 1L - cum_before) div _tot") + 1,
    ).otherwise(F.lit(1))
    e_max = F.least(F.lit(int(max_epochs)).cast("long"), e_row.cast("long"))
    return (
        joined.filter(F.col("cum_before") < b)  # epoch 1 must fit
        .withColumn("epoch", F.explode(F.sequence(F.lit(1).cast("long"), e_max)))
        .withColumn(
            "cum_global",
            ((F.col("epoch") - 1) * F.col("_tot") + F.col("cum_before")).cast(
                "long"
            ),
        )
        .select(id_col, stratum_col, "epoch", "n_tok", "cum_global")
    )
