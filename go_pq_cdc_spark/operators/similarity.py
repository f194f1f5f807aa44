"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (broadcast the query set, scan the
corpus once — at 100 TB this is a single narrow pass, no shuffle until the
per-query top-k aggregation). Scale path: random-hyperplane LSH bucketing so
candidates come from an equi-join on the bucket id instead of a full scan.

Cosine is computed in exact fixed-point int64 (see
`functions.portable.scaled_dot`) so results are bit-identical to the DuckDB
oracle; the float end result differs from true float cosine by < 1e-5,
irrelevant for ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import portable as P
from .scale import spread_small_input

LSH_PLANES = 8
# Reducer fan-out of the salted partial top-k (see _topk_per_query).
TOPK_SALTS = 32
# Pseudo-random hyperplane component for plane k, dim j: centered int in
# (-2^20, 2^20), derived with pure int64 arithmetic — portable to DuckDB.
_PLANE = "((((k * 64 + j) * " + str(P.KNUTH) + ") % 2097152) - 1048576)"


def _topk_per_query(
    pairs: DataFrame,
    order_cols: list,
    rank_name: str,
    k: int,
    cand_col: str,
    query_col: str = "q_id",
) -> DataFrame:
    """Per-query top-k via the shared two-level salted reduction
    (`scale.salted_topk`): never a single `Window.partitionBy(q_id)` —
    for the full-corpus scorers (brute-force cosine, PQ-ADC) that one
    reducer task IS the job at 100 TB. Results are provably identical to
    the one-level window, so the DuckDB oracles keep theirs."""
    from .scale import salted_topk

    return salted_topk(
        pairs, order_cols, rank_name, k, cand_col,
        partition_cols=(query_col,), salts=TOPK_SALTS,
    )


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Query side is broadcast;
    ranking is a per-query window (shuffle on query id only). The corpus is
    widened only when the input is narrower than the session parallelism
    (see `spread_small_input`) — at scale there is no injected shuffle.

    (Optimization r13 note: an unrolled-codegen dot spelling
    (`P.scaled_dot_fast`) was tried here and reverted — per-row it is
    ~1.6x cheaper, but the ~400-node expression tree costs more in
    per-execution planning/codegen than it saves at bench row counts;
    see OPTIMIZATION_r13.md.)"""
    norm = P.scaled_dot("v", "v", "v")["spark"]
    corpus = spread_small_input(
        df.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("v")),
        F.col("c_id"),
    ).withColumn("c_nrm", F.expr(norm))
    qset = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    ).withColumn("q_nrm", F.expr(P.scaled_dot("qv", "qv", "qv")["spark"]))
    dot = P.scaled_dot("qv", "v", "qv")["spark"]
    pairs = (
        corpus.join(F.broadcast(qset), F.col("q_id") != F.col("c_id"))
        .withColumn("dot", F.expr(dot))
        .withColumn(
            "cos_sim",
            F.expr(
                "CAST(dot AS DOUBLE) / (sqrt(CAST(q_nrm AS DOUBLE)) * sqrt(CAST(c_nrm AS DOUBLE)))"
            ),
        )
    )
    return _topk_per_query(
        pairs, [F.desc("cos_sim"), F.asc("c_id")], "rank", k, "c_id"
    ).select("q_id", F.col("c_id").alias("neighbor_id"), "rank", "cos_sim")


def lsh_bucket_fragments(vec: str, planes: int = LSH_PLANES) -> dict[str, str]:
    """Bucket id = sign-bit string of `planes` pseudo-random hyperplane dot
    products, packed into an int. Fixed-point arithmetic keeps every product
    in int64: |component| < 2^17 scaled, |plane| < 2^20, 64 dims -> < 2^43."""
    comp_sp = f"CAST(round(CAST(element_at({vec}, j) AS DOUBLE) * 1000000) AS BIGINT)"
    comp_du = f"CAST(round(CAST(({vec})[j] AS DOUBLE) * 1000000) AS BIGINT)"
    dot_sp = (
        f"aggregate(transform(sequence(1, size({vec})), j -> {comp_sp} * "
        f"{_PLANE.replace('j', '(j - 1)')}), 0L, (acc, x) -> acc + x)"
    )
    dot_du = (
        f"CAST(list_sum([{comp_du} * {_PLANE.replace('j', '(j - 1)')} "
        f"FOR j IN range(1, len({vec}) + 1)]) AS BIGINT)"
    )
    sp = (
        f"aggregate(sequence(0, {planes - 1}), 0L, (bac, k) -> bac + "
        f"CASE WHEN ({dot_sp}) > 0 THEN CAST(power(2, k) AS BIGINT) ELSE 0L END)"
    )
    du = (
        f"CAST(list_sum([CASE WHEN ({dot_du}) > 0 THEN CAST(2 ** k AS BIGINT) ELSE 0 END "
        f"FOR k IN range(0, {planes})]) AS BIGINT)"
    )
    return {"spark": sp, "duck": du}


# NOTE (optimization r13): an unrolled literal-coefficient fast path for
# the bucket (planes x dims = 512 flat terms + the generic fallback) was
# tried and REVERTED — the ~3000-node expression tree pushed the task
# binary past 1 MiB and Catalyst's per-query planning walks made the
# query 4x SLOWER end-to-end than the interpreted HOF it replaced. The
# unroll trick only pays below ~a few hundred expression nodes
# (P.scaled_dot_fast's 64-term dot); the bucket keeps the generic
# fragments.


def with_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", planes: int = LSH_PLANES
) -> DataFrame:
    """Assign each vector its LSH bucket — candidate generation for ANN is
    then an equi-join on `bucket` (optionally multi-probe neighbors).

    The bucket is coalesced non-nullable: when it becomes a join key,
    Catalyst then does NOT infer an `isnotnull(bucket)` filter — which
    matters because the HOF expression is CodegenFallback (no
    common-subexpression elimination), so an inferred null-check would
    re-evaluate the full planes×dims aggregate per row.

    NULL embeddings get a negative sentinel disjoint from the real bucket
    range [0, 2^planes): -1 - xxhash64 of the row's OTHER columns (id
    etc.), folded positive. Without the explicit null-route, a NULL
    vector FOLDS TO BUCKET 0 (each plane's `CASE dot > 0 … ELSE 0`
    swallows the NULL dot), colliding with real bucket-0 vectors and
    emitting NULL-cosine neighbor rows (ADVICE r4). The sentinel is a
    DETERMINISTIC content hash — a nondeterministic one
    (monotonically_increasing_id, r5 review) changes across stage
    retries, the same trap `_bucket_col`'s salt comment forbids — and is
    per-row-unique whenever the accompanying id column is unique, so
    NULL vectors can never equi-join anything and drop out of ANN
    candidate generation while the column stays non-nullable."""
    # bitwiseAND, not pmod: Pmod is nullable in Catalyst's analysis (a
    # zero divisor yields NULL), which would make the coalesce nullable
    # again and resurrect the inferred-isnotnull re-evaluation this
    # docstring exists to prevent
    others = [c for c in df.columns if c != vec_col] or [vec_col]
    sentinel = F.lit(-1).cast("long") - F.xxhash64(*others).bitwiseAND(
        F.lit((1 << 61) - 1)
    )
    expr = F.coalesce(
        F.when(
            F.col(vec_col).isNotNull(),
            F.expr(lsh_bucket_fragments(vec_col, planes)["spark"]),
        ),
        sentinel,
    )
    return df.withColumn("bucket", expr)


def ann_topk_lsh(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine only within the query's LSH bucket.
    Same output shape as `cosine_topk`; recall depends on bucket balance.

    `probes` > 1 is the multi-probe refinement: each query additionally
    searches the buckets at Hamming distance 1 (one hyperplane sign
    flipped — the likeliest buckets to hide a near neighbor), probing
    min(probes, planes+1) buckets total. Candidates are a superset of the
    single-probe set, so recall is monotone in `probes` while cost stays
    O(probes * bucket) — still sub-linear, no new shuffle shape (the join
    key is unchanged; only the broadcast query side fans out).

    The corpus is widened to the session parallelism before the bucket/norm
    projection ONLY when the input is narrow (see `spread_small_input`):
    the interpreted HOF bucket expression is the dominant cost, and a small
    input (few parquet row-groups) would otherwise evaluate it in a handful
    of tasks — while at scale the scan already has thousands of splits and
    no Exchange is injected."""
    corpus = with_lsh_bucket(
        spread_small_input(
            df.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("v")),
            F.col("c_id"),
        ),
        "v",
        planes,
    ).withColumn("c_nrm", F.expr(P.scaled_dot("v", "v", "v")["spark"]))
    qset = with_lsh_bucket(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")), "qv", planes
    ).withColumnRenamed("bucket", "q_bucket").withColumn(
        "q_nrm", F.expr(P.scaled_dot("qv", "qv", "qv")["spark"])
    )
    n_probes = max(1, min(probes, planes + 1))
    if n_probes > 1:
        # probe list: own bucket, then flip bit 0, bit 1, ... (xor 2^i)
        qset = qset.withColumn(
            "q_bucket",
            F.explode(
                F.expr(
                    "concat(array(q_bucket), transform(sequence(0, "
                    f"{n_probes - 2}), i -> CAST(q_bucket ^ CAST(power(2, i) AS BIGINT) AS BIGINT)))"
                )
            ),
        )
    pairs = corpus.join(
        F.broadcast(qset),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("q_id") != F.col("c_id")),
    )
    if n_probes > 1:
        # a candidate can surface through several probe buckets
        pairs = pairs.dropDuplicates(["q_id", "c_id"])
    dot = P.scaled_dot("qv", "v", "qv")["spark"]
    pairs = pairs.withColumn("dot", F.expr(dot)).withColumn(
        "cos_sim",
        F.expr(
            "CAST(dot AS DOUBLE) / (sqrt(CAST(q_nrm AS DOUBLE)) * sqrt(CAST(c_nrm AS DOUBLE)))"
        ),
    )
    return _topk_per_query(
        pairs, [F.desc("cos_sim"), F.asc("c_id")], "rank", k, "c_id"
    ).select("q_id", F.col("c_id").alias("neighbor_id"), "rank", "cos_sim")


def _fold_centroids(
    centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Fold the (driver-size) centroid table into ONE broadcastable row of
    pre-cast fixed-point codewords. Callers that assign several relations
    against the same centroids (ivf_topk's corpus + query sides) build
    this once and pass it to each `ivf_assign` — the planner does NOT
    reliably dedupe two structurally-identical fold subtrees into a
    ReusedExchange (measured r13: both sides rebuilt scan→agg→broadcast),
    so sharing the DataFrame is the portable spelling."""
    return centroids.select(
        F.struct(
            F.col(id_col).cast("long").alias("cent_id"),
            F.expr(P.fx_vec(vec_col)).alias("cvi"),
        ).alias("c")
    ).agg(F.collect_list("c").alias("cents"))


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_assign: int = 1,
    *,
    spread: bool = True,
    cent_row: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest `n_assign`
    centroids by (exact fixed-point) inner product — ZERO-SHUFFLE.

    The centroid table is driver-size by construction (k×dims floats), so
    it is folded into a single `array<struct<cent_id, cv>>` row (one tiny
    collect_list aggregate) that is broadcast to every task; the argmax is
    then a pure Catalyst expression over that array — sort the
    (neg-dot, cent_id) structs (lexicographic = dot DESC, cent_id ASC,
    identical tie-break to the reference ordering), slice the first
    n_assign, explode. One narrow pass over the corpus, no join fan-out,
    no window.

    Why not the r4 shape (broadcast-join × k + row_number window): that
    plan materialized corpus×k rows and then SHUFFLED them all on `id` for
    the window — at 100 TB that shuffle is the whole job. This plan's only
    exchanges are the single-row broadcast and the k-row partial aggregate
    (plan-gated: tests/test_plans_explain.py asserts no hash-partition
    Exchange in the assignment stage).

    `n_assign` > 1 keeps the n nearest centroids per vector — used on the
    QUERY side as the nprobe knob (corpus stays single-assigned so the
    index size is unchanged; queries search their nprobe nearest cells).

    Per-task work (optimization r13, guide §1.2-2): the row vector is
    cast to fixed-point int64 ONCE (`P.fx_vec`) and the centroid fold
    carries PRE-CAST codewords (`cvi`), so the k-per-row argmin dots run
    on integers (`P.int_dot` — identical values/fold order to
    `scaled_dot`) instead of re-rounding the vector once per centroid.
    (Inside the cents lambda everything is interpreted either way, so
    the pre-cast — not unrolling — is the win here; TOP-LEVEL dots use
    `P.scaled_dot_fast` instead.)

    Centroids are a supplied DataFrame (cent_id, cv): at scale they come
    from offline k-means; tests use a deterministic subset of the corpus.
    A NULL dot (NULL vector or centroid) sorts last — same as the old
    window's DESC NULLS LAST — via a max-int64 coalesce."""
    dot = P.int_dot("_vi", "c.cvi")
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # `spread=False` for query-sized inputs (optimization r13): spreading
    # an 8-row query set to session parallelism injects an Exchange + a
    # task wave for nothing — the spread exists to parallelize the heavy
    # interpreted argmin over a NARROW CORPUS input, not over queries.
    vecs = (spread_small_input(base, F.col("id")) if spread else base).withColumn(
        "_vi", F.expr(P.fx_vec("v"))
    )
    if cent_row is None:
        cent_row = _fold_centroids(centroids, id_col, vec_col)
    ranked = (
        f"slice(array_sort(transform(cents, c -> struct("
        f"coalesce(-({dot}), 9223372036854775807L) AS nd, c.cent_id AS cent_id))), "
        f"1, {int(n_assign)})"
    )
    return (
        vecs.crossJoin(F.broadcast(cent_row))  # single-row build side
        .withColumn("asn", F.explode(F.expr(ranked)))
        .select("id", "v", F.col("asn.cent_id").alias("cent_id"))
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Offline k-means for the IVF coarse quantizer (Lloyd's iterations,
    Spark-first): deterministic kmeans‖-style seeding in ONE corpus pass,
    then each iteration is assign (expression argmax over broadcast
    centroids — the same metric `ivf_assign` serves with) and an
    elementwise mean recompute.

    Seeding (r4 verdict item 6): draw `k*oversample` candidates by ranking
    on an md5-derived pseudo-random key — a TakeOrderedAndProject
    (per-partition top-k + merge, no global sort, ONE pass) — then run
    greedy farthest-point selection DRIVER-SIDE over that candidate set
    (k*oversample rows × dims floats: driver-size). r4's seeding made k-1
    full corpus passes with a collect() each. The pseudo-random draw keeps
    the farthest-point property kmeans++ needs (candidates land in every
    sizeable cluster w.h.p.) while staying RNG-free and reproducible.

    Guards (ADVICE r4): an empty corpus returns an empty centroid frame
    (no IndexError); already-chosen seeds are excluded from re-selection;
    k is clamped to the candidate count so seeds are always distinct rows;
    NULL vectors are filtered before seeding and assignment.

    Scale shape per iteration: one narrow corpus pass for assignment + one
    shuffle keyed on (cluster, dim) for the means — dimension fan-out keeps
    the aggregation wide rather than deep, so no reducer sees more than one
    (cluster, dim) slice. Centroids are k×dims floats — driver-size by
    construction. Returns (id_col, vec_col) ready to drop into `ivf_topk`'s
    centroids argument."""
    sess = df.sparkSession
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    oversample = 8
    n_cand = max(k * oversample, k)
    rkey = P.md5_hash("CAST(id AS STRING)")["spark"]
    cand = (
        vecs.withColumn("rk", F.expr(rkey)).orderBy("rk", "id").limit(n_cand).collect()
    )
    if not cand:
        return sess.createDataFrame([], "cent_id long, cv array<float>").select(
            F.col("cent_id").alias(id_col), F.col("cv").alias(vec_col)
        )

    def fdot(a, b):  # driver-side mirror of portable.scaled_dot
        return sum(round(x * 1e6) * round(y * 1e6) for x, y in zip(a, b))

    by_id = sorted(cand, key=lambda r: r["id"])
    chosen, chosen_ids = [by_id[0]], {by_id[0]["id"]}
    while len(chosen) < min(k, len(by_id)):
        # next seed: the unchosen candidate whose best (max) inner product
        # against the chosen seeds is LOWEST — ties by id
        nxt = min(
            (r for r in by_id if r["id"] not in chosen_ids),
            key=lambda r: (max(fdot(r["v"], s["v"]) for s in chosen), r["id"]),
        )
        chosen.append(nxt)
        chosen_ids.add(nxt["id"])
    seeds = [(i, r["v"]) for i, r in enumerate(chosen)]
    cents = sess.createDataFrame(seeds, "cent_id long, cv array<float>")
    for _ in range(iters):
        assigned = ivf_assign(
            vecs.withColumnRenamed("id", id_col).withColumnRenamed("v", vec_col),
            cents.select(F.col("cent_id").alias(id_col), F.col("cv").alias(vec_col)),
            id_col,
            vec_col,
        )
        means = (
            assigned.select("cent_id", F.posexplode("v").alias("dim", "val"))
            .groupBy("cent_id", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cent_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("dims")
            )
            .select(
                "cent_id",
                F.expr("transform(dims, d -> CAST(d.m AS FLOAT))").alias("cv"),
            )
        )
        # empty clusters keep their previous centroid (standard Lloyd's fix)
        new_rows = {r["cent_id"]: r["cv"] for r in means.collect()}
        prev = {r["cent_id"]: r["cv"] for r in cents.collect()}
        merged = [(cid, new_rows.get(cid, cv)) for cid, cv in prev.items()]
        cents = sess.createDataFrame(merged, "cent_id long, cv array<float>")
    # (id_col, vec_col)-shaped so the result drops straight into ivf_topk's
    # centroids argument
    return cents.select(
        F.col("cent_id").alias(id_col), F.col("cv").alias(vec_col)
    )


def ivf_index_write(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: vectors + precomputed norms, PARTITIONED BY
    their coarse cell (`cent_id`). This is the serving layout for 100 TB —
    a query touching `nprobe` cells reads ONLY those partitions' files
    (Hive partition pruning on the directory layout), never the corpus.
    Build cost: the zero-shuffle `ivf_assign` pass + one partitioned write."""
    idx = ivf_assign(df, centroids, id_col, vec_col).withColumnRenamed("id", "c_id")
    idx = idx.withColumn("c_nrm", F.expr(P.scaled_dot("v", "v", "v")["spark"]))
    idx.write.mode("overwrite").partitionBy("cent_id").parquet(path)


# The persisted-index schema is part of the layout contract: readers declare
# it instead of inferring (schema inference samples parquet FOOTERS across
# partitions at analysis time — an all-partitions touch that defeats the
# point of pruning, and at 100 TB a listing+footer storm).
IVF_INDEX_SCHEMA = "c_id bigint, v array<float>, c_nrm bigint, cent_id bigint"


def ivf_topk_index(
    spark,
    path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Serve IVF ANN from a persisted index (`ivf_index_write`): quantize
    the queries (expression argmax over broadcast centroids), collect the
    touched cell ids (queries×nprobe values — driver-size by definition),
    and scan ONLY those partitions via an `isin` filter that Hive partition
    pruning turns into a directory-level skip (plan-gated: PartitionFilters
    on cent_id, no full-index scan). Same output shape and ranking as
    `ivf_topk`."""
    qset = (
        # queries are tiny by definition here — no corpus-width spread
        ivf_assign(queries, centroids, id_col, vec_col, n_assign=nprobe, spread=False)
        .withColumnRenamed("id", "q_id")
        .withColumnRenamed("v", "qv")
        .withColumnRenamed("cent_id", "q_cent")
        .withColumn("q_nrm", F.expr(P.scaled_dot("qv", "qv", "qv")["spark"]))
    )
    cells = [r["q_cent"] for r in qset.select("q_cent").distinct().collect()]
    if not cells:
        return spark.createDataFrame(
            [], "q_id long, neighbor_id long, rnk long, cos_sim double"
        )
    corpus = (
        spark.read.schema(IVF_INDEX_SCHEMA)  # declared: no footer sampling
        .parquet(path)
        .filter(F.col("cent_id").isin(cells))
    )
    pairs = corpus.join(
        F.broadcast(qset),
        (F.col("cent_id") == F.col("q_cent")) & (F.col("q_id") != F.col("c_id")),
    )
    pairs = pairs.withColumn("dot", F.expr(P.scaled_dot_fast("qv", "v"))).withColumn(
        "cos_sim",
        F.expr(
            "CAST(dot AS DOUBLE) / (sqrt(CAST(q_nrm AS DOUBLE)) * sqrt(CAST(c_nrm AS DOUBLE)))"
        ),
    )
    return _topk_per_query(
        pairs, [F.desc("cos_sim"), F.asc("c_id")], "rnk", k, "c_id"
    ).select("q_id", F.col("c_id").alias("neighbor_id"), "rnk", "cos_sim")


# --------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)
# --------------------------------------------------------------------------
# The vector is split into PQ_M contiguous subspaces; each subvector is
# quantized to the nearest of ksub codewords (per-subspace codebook). A
# corpus vector is then PQ_M bytes instead of dims floats (~64x smaller at
# 64-dim float32 / m=4), and query-time distance is a table lookup: per
# query, a LUT[j][c] of exact subspace distances is computed ONCE against
# the broadcast codebook, and each corpus row costs O(m) integer adds —
# the FAISS-style scale path for 100 TB embedding tables, next to the
# IVF/LSH cell-pruning paths above. All arithmetic is fixed-point int64
# (portable.scaled_dot's scheme), so codes and ADC distances are
# oracle-exact.

PQ_M = 4  # subspaces
PQ_KSUB = 16  # codewords per subspace


def _fx(e: str) -> str:
    """Fixed-point int64 of one float element (Spark + DuckDB share it)."""
    return f"CAST(round(CAST({e} AS DOUBLE) * 1000000) AS BIGINT)"


def _sub_dot(a_vec: str, j: str, b_cw: str, dsub: int) -> dict[str, str]:
    """Exact fixed-point dot of subspace `j` of full vector `a_vec` with a
    dsub-dim codeword `b_cw`. Indexes the FULL vector directly
    (element_at(v, j*dsub + i)) rather than slicing — `slice()` inside an
    aggregate lambda would be re-evaluated per element, turning O(dsub)
    into O(dsub^2)."""
    ax_sp = _fx(f"element_at({a_vec}, {j} * {dsub} + i)")
    bx_sp = _fx(f"element_at({b_cw}, i)")
    ax_du = _fx(f"({a_vec})[{j} * {dsub} + i]")
    bx_du = _fx(f"({b_cw})[i]")
    return {
        "spark": (
            f"aggregate(transform(sequence(1, {dsub}), i -> {ax_sp} * {bx_sp}), "
            f"0L, (acc, x) -> acc + x)"
        ),
        "duck": (
            f"CAST(list_sum([{ax_du} * {bx_du} FOR i IN range(1, {dsub + 1})]) AS BIGINT)"
        ),
    }


def _sub_norm(a_vec: str, j: str, dsub: int) -> dict[str, str]:
    """Exact fixed-point squared norm of subspace `j` of full vector
    `a_vec` (same indexing scheme as `_sub_dot`)."""
    ax_sp = _fx(f"element_at({a_vec}, {j} * {dsub} + i)")
    ax_du = _fx(f"({a_vec})[{j} * {dsub} + i]")
    return {
        "spark": (
            f"aggregate(transform(sequence(1, {dsub}), i -> {ax_sp} * {ax_sp}), "
            f"0L, (acc, x) -> acc + x)"
        ),
        "duck": (
            f"CAST(list_sum([{ax_du} * {ax_du} FOR i IN range(1, {dsub + 1})]) AS BIGINT)"
        ),
    }


def _sub_dot_fx(vi: str, j: str, cwi: str, dsub: int) -> str:
    """Spark-side exact sub-dot of subspace `j` of PRE-CAST full vector
    `vi` (`P.fx_vec`) with a pre-cast dsub-dim codeword `cwi` — identical
    values and fold order as `_sub_dot(...)["spark"]`, with the
    per-element round/cast hoisted out of the lambda (optimization r13)."""
    return (
        f"aggregate(transform(sequence(1, {dsub}), i -> "
        f"element_at({vi}, {j} * {dsub} + i) * element_at({cwi}, i)), "
        f"0L, (acc, x) -> acc + x)"
    )


def _sub_norm_fx(vi: str, j: str, dsub: int) -> str:
    """Spark-side exact squared norm of subspace `j` of pre-cast `vi` —
    value-identical to `_sub_norm(...)["spark"]`."""
    return (
        f"aggregate(transform(sequence(1, {dsub}), i -> "
        f"element_at({vi}, {j} * {dsub} + i) * element_at({vi}, {j} * {dsub} + i)), "
        f"0L, (acc, x) -> acc + x)"
    )


def _codebook_dsub(codebook) -> int:
    """Subspace width from the CODEBOOK (m*ksub rows — a bounded tiny job
    at plan-build), never from a corpus scan: an analysis-time action on
    the corpus is an unacceptable stall at scale (r6 review finding).
    Prefer passing dsub explicitly to stay fully lazy."""
    row = codebook.select("cw").first()
    return len(row[0]) if row and row[0] is not None else 0


def pq_codebook_sample(
    df: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic sample codebook: codeword c of subspace j is subvector
    j of the corpus vector ranked c-th by id among the first `ksub` ids —
    the PQ analogue of the deterministic IVF test centroids (and the
    iteration-0 state `pq_train` improves on). Returns (j, c, cw) rows;
    driver-size by construction (m*ksub rows of dsub floats)."""
    base = (
        df.select(F.col(id_col).alias("rid"), F.col(vec_col).alias("rv"))
        .filter(F.col("rv").isNotNull())
        .orderBy("rid")
        .limit(ksub)
    )
    w = Window.orderBy("rid")
    ranked = base.withColumn("c", (F.row_number().over(w) - 1).cast("int"))
    dsub_expr = f"CAST(size(rv) / {m} AS INT)"
    return (
        ranked.crossJoin(
            F.broadcast(
                ranked.sparkSession.range(m).select(F.col("id").cast("int").alias("j"))
            )
        )
        .withColumn(
            "cw", F.expr(f"slice(rv, j * {dsub_expr} + 1, {dsub_expr})")
        )
        .select("j", "c", "cw")
    )


def pq_train(
    df: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks with the existing k-means machinery:
    subspace j's codebook is `kmeans_centroids` over the corpus's j-th
    subvectors. m small offline jobs (each Lloyd's is one narrow corpus
    pass + a (cluster, dim)-keyed mean per iteration) — the offline
    trainer feeding `pq_encode`/`pq_adc_topk`, exactly like
    `kmeans_centroids` feeds `ivf_topk`. Returns (j, c, cw) rows."""
    parts = []
    for j in range(m):
        sub = df.select(
            F.col(id_col).alias(id_col),
            F.expr(
                f"slice({vec_col}, {j} * CAST(size({vec_col}) / {m} AS INT) + 1, "
                f"CAST(size({vec_col}) / {m} AS INT))"
            ).alias(vec_col),
        ).filter(F.col(vec_col).isNotNull())
        cents = kmeans_centroids(sub, k=ksub, iters=iters, id_col=id_col, vec_col=vec_col)
        parts.append(
            cents.select(
                F.lit(j).cast("int").alias("j"),
                F.col(id_col).cast("int").alias("c"),
                F.col(vec_col).alias("cw"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _fold_pq_codebook(codebook: DataFrame) -> DataFrame:
    """Fold (j, c, cw) codebook rows into ONE row
    `cbs: array<struct<j, words: array<struct<c, cw, cwi, cwn2>>>>`
    (sorted by j, words sorted by c) carrying the PRE-CAST fixed-point
    codeword (`cwi`, optimization r13 — so per-row sub-dots run on
    integers) and its precomputed norm — the broadcast build side for the
    zero-shuffle encode, same pattern as `ivf_assign`'s centroid fold.
    `cw` stays in the struct for float-side consumers; the fold is
    m*ksub rows, so the duplication is bytes-trivial."""
    per_j = (
        codebook.withColumn("cwi", F.expr(P.fx_vec("cw")))
        .withColumn("cwn2", F.expr(P.int_dot("cwi", "cwi")))
        .groupBy("j")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("c", "cw", "cwi", "cwn2"))
            ).alias("words")
        )
    )
    return per_j.agg(
        F.array_sort(F.collect_list(F.struct("j", "words"))).alias("cbs")
    )


def _pq_codes_expr(m: int, dsub: int, fx: str = "_vi") -> str:
    """Per-subspace argmin codes over the broadcast `cbs` fold — THE one
    definition of PQ encoding; pq_encode and ivf_pq_topk share it (and
    the oracles mirror it), so a tie-break/arithmetic fix lands
    everywhere at once (r6 review). Operates on the PRE-CAST `fx`
    vector column and the fold's `cwi` (optimization r13 — identical
    values to the float spelling, see `_sub_dot_fx`)."""
    dot = _sub_dot_fx(fx, "j", "w.cwi", dsub)
    return (
        f"transform(sequence(0, {m - 1}), j -> "
        f"element_at(array_sort(transform(element_at(cbs, j + 1).words, "
        f"w -> struct(w.cwn2 - 2 * ({dot}) AS d, w.c AS c))), 1).c)"
    )


def _pq_lut_expr(m: int, dsub: int, fx: str = "_qvi") -> str:
    """Per-query exact-distance lookup table over the broadcast fold —
    LUT[j][c] = ||q_j||^2 + ||cw||^2 - 2*dot(q_j, cw), on pre-cast
    integers (value-identical, see `_sub_dot_fx`)."""
    qdot = _sub_dot_fx(fx, "j", "w.cwi", dsub)
    qn2 = _sub_norm_fx(fx, "j", dsub)
    return (
        f"transform(sequence(0, {m - 1}), j -> "
        f"transform(element_at(cbs, j + 1).words, "
        f"w -> ({qn2}) + w.cwn2 - 2 * ({qdot})))"
    )


def _pq_adc_sum_expr(m: int) -> str:
    """ADC distance: m integer LUT lookups summed.

    Kept as the generic `aggregate(sequence(...))` HOF after a
    measured revert (optimization r13): unrolling the sum to a flat
    `element_at + element_at + ...` chain looked like a win in an
    isolated subplan A/B (the HOF is CodegenFallback, so the lookups
    evaluate interpreted), but at the FULL-QUERY level the unroll lost
    every one of 8 interleaved A/B pairs (~+0.1 s median on the sf0.1
    bench row): the codegen'd chain gets inlined into downstream
    operators (top-k sort key, projections) and re-evaluated, while the
    CodegenFallback expression acts as its own materialization point.
    Guide §1.1's warning in action — the "ideal" spelling lost to a
    gotcha, so the empirical loop decided.

    Optimization r14 retried the unroll behind an `explode(array(...))`
    single-evaluation generator boundary (the re-inlining fix the r13
    verdict suggested) and it was STILL a wash at both scales —
    interleaved A/B: sf0.1 min -8.4% / 3-of-6 pairs, sf1 min -4.1% /
    2-of-3 — because m = PQ_M = 4 lookups per pair is too cheap to
    dominate and the pair count is query-bounded (8 queries x corpus),
    so the generator overhead + bigger plan eat the interpreted-HOF
    saving. Measured, reverted; do not retry below m ~ 16 or without a
    corpus-x-corpus pair stage. The same A/B verdict applies to the
    once-per-side `fx_vec` + `int_dot_fast` factoring tried across
    cosine_topk / ann_topk_lsh / ivf_topk this round (sf0.1 -17%/-35%/
    +5%, sf1 -7%/-11%/—): the r13 change-14 win needed ~25M dedup pairs;
    the similarity family's broadcast-query fan-out never produces
    enough pairs to amortize the ~400-node chains' per-execution
    planning/codegen cost."""
    return (
        f"aggregate(sequence(0, {m - 1}), 0L, (acc, j) -> "
        f"acc + element_at(element_at(qlut, j + 1), element_at(codes, j + 1) + 1))"
    )


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    m: int = PQ_M,
    dsub: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    cb_row: DataFrame | None = None,
) -> DataFrame:
    """PQ-encode every vector to `m` small codes — ZERO-SHUFFLE, the same
    shape as `ivf_assign`: the codebook folds to a single broadcast row and
    the per-subspace argmin is a pure Catalyst expression (sort the
    (distance, c) structs, take the head). Distance is the exact
    fixed-point `||x_j - cw||^2` with the constant `||x_j||^2` dropped
    (same argmin): `cwn2 - 2*dot(x_j, cw)`. NULL vectors are filtered (a
    NULL subvector has no meaningful code). Returns (id, v, codes).

    At 100 TB the output is the compressed corpus representation —
    `codes` is m ints per row (write it, drop `v`), read back by
    `pq_adc_topk` without ever touching the raw vectors."""
    if dsub is None:
        dsub = _codebook_dsub(codebook)
    vecs = spread_small_input(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).filter(
            F.col("v").isNotNull()
        ),
        F.col("id"),
    ).withColumn("_vi", F.expr(P.fx_vec("v")))
    # `cb_row=` lets encode+ADC callers share ONE codebook fold
    # (optimization r13): two independent folds each re-ran the
    # scan→agg→broadcast build per execution (no ReusedExchange fired);
    # sharing the DataFrame measured ~15 % off the ADC bench row.
    if cb_row is None:
        cb_row = _fold_pq_codebook(codebook)
    return (
        vecs.crossJoin(F.broadcast(cb_row))
        .withColumn("codes", F.expr(_pq_codes_expr(m, dsub)))
        .select("id", "v", "codes")
    )


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    m: int = PQ_M,
    dsub: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    cb_row: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ-encoded corpus: each query
    precomputes LUT[j][c] = `||q_j||^2 + ||cw||^2 - 2*dot(q_j, cw)` (the
    exact squared L2 to every codeword — m*ksub ints, computed ONCE per
    query on the broadcast side), then every corpus row costs m integer
    array lookups: `sum_j LUT[j][codes[j]]`. One narrow pass over the
    codes, no join fan-out; the only shuffle is the per-query top-k window
    (keyed on q_id — the query count, not the corpus). Ranking ascending
    by distance, ties by neighbor id. `adc_dist` is the fixed-point value
    scaled back to float^2 units (/1e12)."""
    if dsub is None:
        dsub = _codebook_dsub(codebook)
    if cb_row is None:  # share the fold with pq_encode — see its note
        cb_row = _fold_pq_codebook(codebook)
    lut = _pq_lut_expr(m, dsub)
    qset = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .filter(F.col("qv").isNotNull())
        .withColumn("_qvi", F.expr(P.fx_vec("qv")))
        .crossJoin(F.broadcast(cb_row))
        .withColumn("qlut", F.expr(lut))
        .select("q_id", "qlut")
    )
    pairs = (
        codes_df.join(F.broadcast(qset), F.col("q_id") != F.col("id"))
        .withColumn("adc", F.expr(_pq_adc_sum_expr(m)))
    )
    return (
        _topk_per_query(pairs, [F.asc("adc"), F.asc("id")], "rnk", k, "id")
        .select(
            "q_id",
            F.col("id").alias("neighbor_id"),
            "rnk",
            (F.col("adc").cast("double") / F.lit(1e12)).alias("adc_dist"),
        )
    )


def ivf_pq_topk(
    df: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = PQ_M,
    dsub: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF-PQ (the FAISS IVFPQ shape): coarse-quantize the corpus to IVF
    cells AND PQ-encode it in the SAME single narrow pass (both are pure
    expressions over broadcast structures — one crossJoin with the 1-row
    centroid fold, one with the 1-row codebook fold, zero corpus
    shuffles). A query probes its `nprobe` nearest cells and ADC-scans
    only those cells' codes: candidate generation is sub-linear (cell
    equi-join) and per-candidate cost is m integer LUT lookups — at
    100 TB the scan reads compressed codes, touches a fraction of the
    cells, and never shuffles the corpus. Ranking ascending by ADC
    distance, ties by neighbor id."""
    if dsub is None:
        dsub = _codebook_dsub(codebook)
    cb_row = _fold_pq_codebook(codebook)
    cent_row = centroids.select(
        F.struct(
            F.col(id_col).cast("long").alias("cent_id"),
            F.expr(P.fx_vec(vec_col)).alias("cvi"),
        ).alias("c")
    ).agg(F.collect_list("c").alias("cents"))

    cdot = P.int_dot("_vi", "c.cvi")
    cent_expr = (
        f"element_at(array_sort(transform(cents, c -> struct("
        f"coalesce(-({cdot}), 9223372036854775807L) AS nd, c.cent_id AS cent_id))), 1).cent_id"
    )
    codes_expr = _pq_codes_expr(m, dsub)
    corpus = (
        spread_small_input(
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).filter(
                F.col("v").isNotNull()
            ),
            F.col("id"),
        )
        .withColumn("_vi", F.expr(P.fx_vec("v")))
        .crossJoin(F.broadcast(cent_row))
        .crossJoin(F.broadcast(cb_row))
        .select(
            "id",
            F.expr(cent_expr).alias("cent_id"),
            F.expr(codes_expr).alias("codes"),
        )
    )

    lut_expr = _pq_lut_expr(m, dsub)
    probe_expr = (
        f"slice(array_sort(transform(cents, c -> struct("
        f"coalesce(-({P.int_dot('_qvi', 'c.cvi')}), "
        f"9223372036854775807L) AS nd, c.cent_id AS cent_id))), 1, {int(nprobe)})"
    )
    qset = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .filter(F.col("qv").isNotNull())
        .withColumn("_qvi", F.expr(P.fx_vec("qv")))
        .crossJoin(F.broadcast(cent_row))
        .crossJoin(F.broadcast(cb_row))
        .withColumn("qlut", F.expr(lut_expr))
        .withColumn("probe", F.explode(F.expr(probe_expr)))
        .select("q_id", "qlut", F.col("probe.cent_id").alias("q_cent"))
    )
    pairs = corpus.join(
        F.broadcast(qset),
        (F.col("cent_id") == F.col("q_cent")) & (F.col("q_id") != F.col("id")),
    ).withColumn("adc", F.expr(_pq_adc_sum_expr(m)))
    return (
        _topk_per_query(pairs, [F.asc("adc"), F.asc("id")], "rnk", k, "id")
        .select(
            "q_id",
            F.col("id").alias("neighbor_id"),
            "rnk",
            (F.col("adc").cast("double") / F.lit(1e12)).alias("adc_dist"),
        )
    )


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF ANN: exact cosine only inside the query's nearest `nprobe`
    centroid cells. Same output shape as cosine_topk; recall is monotone in
    nprobe (candidates are a superset) while cost stays O(nprobe * cell).
    The corpus index is unchanged — only the broadcast query side fans out."""
    # ONE centroid fold shared by both assignment sides (optimization
    # r13): two independent folds each rebuilt scan -> agg -> broadcast
    # per execution (no ReusedExchange fired); the query side skips the
    # corpus-width spread (8 queries do not need 32 tasks).
    cent_row = _fold_centroids(centroids, id_col, vec_col)
    corpus = ivf_assign(
        df, centroids, id_col, vec_col, cent_row=cent_row
    ).withColumnRenamed("id", "c_id")
    corpus = corpus.withColumn("c_nrm", F.expr(P.scaled_dot("v", "v", "v")["spark"]))
    qset = (
        ivf_assign(
            queries, centroids, id_col, vec_col, n_assign=nprobe,
            spread=False, cent_row=cent_row,
        )
        .withColumnRenamed("id", "q_id")
        .withColumnRenamed("v", "qv")
        .withColumn("q_nrm", F.expr(P.scaled_dot("qv", "qv", "qv")["spark"]))
    )
    pairs = corpus.join(
        F.broadcast(qset.withColumnRenamed("cent_id", "q_cent")),
        (F.col("cent_id") == F.col("q_cent")) & (F.col("q_id") != F.col("c_id")),
    )
    # corpus vectors are single-assigned, so (q_id, c_id) pairs are unique
    # even with nprobe > 1 — no dedupe needed (unlike multi-probe LSH)
    dot = P.scaled_dot("qv", "v", "qv")["spark"]
    pairs = pairs.withColumn("dot", F.expr(dot)).withColumn(
        "cos_sim",
        F.expr(
            "CAST(dot AS DOUBLE) / (sqrt(CAST(q_nrm AS DOUBLE)) * sqrt(CAST(c_nrm AS DOUBLE)))"
        ),
    )
    return _topk_per_query(
        pairs, [F.desc("cos_sim"), F.asc("c_id")], "rnk", k, "c_id"
    ).select("q_id", F.col("c_id").alias("neighbor_id"), "rnk", "cos_sim")
