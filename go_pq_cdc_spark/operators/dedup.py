"""Deduplication operators for training-data pipelines.

Four families (SURVEY.md/BASELINE.json north-star):
  exact            — hash-groupBy on a canonicalized key (1 shuffle)
  minhash_lsh      — shingle → MinHash signature → banded LSH bucket join →
                     exact-Jaccard verify on candidates only (the 100 TB
                     path: candidate generation is an equi-join on
                     (band, key), never an all-pairs product)
  ngram_jaccard    — exact pairwise Jaccard inside blocks (ground truth /
                     small-block path)
  embedding cosine — near-dup by cosine over embedding vectors, blocked

All candidate generation uses equi-joins so Catalyst shuffles on the
bucket/block key; only verified candidates pay the O(set) Jaccard cost.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P

MINHASH_K = 16
LSH_BANDS = 4
ROWS_PER_BAND = MINHASH_K // LSH_BANDS


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5 of the raw text, min-id canonical representative.
    Returns (key_hash, canonical_id, n_copies). One shuffle on the hash."""
    return (
        df.select(F.md5(F.col(text_col)).alias("key_hash"), F.col(id_col))
        .groupBy("key_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def band_key_fragments(sig: str, band_var: str = "b") -> dict[str, str]:
    """Comma-joined signature slice for LSH band `b` (0-based)."""
    sp = ", ".join(
        f"element_at({sig}, {band_var} * {ROWS_PER_BAND} + {j + 1})"
        for j in range(ROWS_PER_BAND)
    )
    du = " || ',' || ".join(
        f"CAST({sig}[{band_var} * {ROWS_PER_BAND} + {j + 1}] AS VARCHAR)"
        for j in range(ROWS_PER_BAND)
    )
    return {"spark": f"concat_ws(',', {sp})", "duck": du}


def shingle_doc(
    df: DataFrame, id_col: str, text_col: str = "text", *, portable: bool = True,
    n: int = 3, spread: bool = True,
) -> DataFrame:
    """(id, sh) with sh = distinct n-token-shingle hashes (default 3);
    rows with < n tokens dropped (can't shingle). Tokens are materialized to a column
    first (see token_shingles_col) and a NARROW input widened so a
    single-file table still parallelizes the hashing — already-wide inputs
    are left untouched (no shuffle at scale; see scale.spread_small_input).

    portable=True (default) hashes shingles with the md5-derived portable
    hash so results are DuckDB-oracle-comparable. portable=False is the
    production path: xxhash64 (JVM intrinsic, much cheaper per byte) folded
    into the same [0, 2^31-1) range — identical pipeline shape and
    candidate semantics, not cross-engine comparable.

    `spread=False` skips the small-input widening probe: pass it when
    `df` is already downstream of a shuffle (it has
    spark.sql.shuffle.partitions partitions by construction, and the
    probe's `.rdd` materialization would EXECUTE the upstream stages at
    plan time under AQE — the pre-collapse path paid its whole groupBy
    eagerly for a no-op answer)."""
    from .scale import spread_small_input

    tok = P.tokens(text_col)["spark"]
    sh = P.token_shingles_col("toks", n)["spark"]
    if portable:
        h = P.md5_hash_m31("sh")["spark"]
    else:
        h = f"pmod(xxhash64(sh), {P.MERSENNE31})"
    src = spread_small_input(df, F.col(id_col)) if spread else df
    return (
        src
        .withColumn("toks", F.expr(tok))
        .filter(F.expr(f"size(toks) >= {int(n)}"))
        .select(
            F.col(id_col).alias("id"),
            F.expr(f"array_distinct(transform({sh}, sh -> {h}))").alias("sh"),
        )
    )


def minhash_per_doc(
    df: DataFrame, id_col: str, text_col: str = "text", *, portable: bool = True,
    spread: bool = True,
) -> DataFrame:
    """Per-document MinHash state: (id, sh, m0..m{K-1}) — the shingle-hash
    set plus all K permutation minima, each an `array_min(transform(...))`
    narrow expression (the shingle set never leaves its partition).
    `spread=False` as in `shingle_doc` (post-shuffle inputs)."""
    mh = []
    for k in range(MINHASH_K):
        a_k, b_k = P.minhash_coeffs(k)
        mh.append(
            F.expr(
                f"array_min(transform(sh, h -> ({a_k}L * h + {b_k}L) % {P.MERSENNE31}L))"
            ).alias(f"m{k}")
        )
    return shingle_doc(
        df, id_col, text_col, portable=portable, spread=spread
    ).select("id", "sh", *mh)


def _band_structs_sql() -> str:
    """SQL array of (band, band_key) structs over the m0..m{K-1} columns."""
    return ", ".join(
        "struct({b} AS band, concat_ws(',', {ms}) AS band_key)".format(
            b=b,
            ms=", ".join(f"m{b * ROWS_PER_BAND + j}" for j in range(ROWS_PER_BAND)),
        )
        for b in range(LSH_BANDS)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.5,
    *,
    portable: bool = True,
    max_bucket: int | None = None,
    collapse_exact: bool | str = "auto",
    dup_ratio: float | None = None,
) -> DataFrame:
    """Near-duplicate pairs by MinHash+LSH with exact-Jaccard verification.

    Pipeline: EXACT-DUP PRE-COLLAPSE (md5-of-text groups, one
    representative each) → shingle-hash array per representative →
    16 permutation minima as narrow `array_min(transform(...))`
    expressions → 4 bands of 4 → self-equi-join on (band, band_key) →
    distinct candidate pairs → exact Jaccard on the shingle sets →
    filter >= threshold → expand representative pairs back to member
    pairs (plus the intra-group pairs, Jaccard exactly 1.0).

    The pre-collapse is output-IDENTICAL to running LSH over the raw
    corpus (verbatim copies have identical shingle sets, hence identical
    signatures, bands, and Jaccards) but pays the shingle/minhash/join
    cost once per DISTINCT text. Web-crawl corpora are ~50% verbatim
    duplicates, and a text duplicated D times costs D shingle passes and
    D^2 candidate rows uncollapsed versus 1 and 1 collapsed — at 100 TB
    the collapse is the difference between LSH-over-corpus and
    LSH-over-distinct-texts. `collapse_exact=False` runs the historical
    direct path (same results; kept for A/B tests and corpora known to
    be exact-dup-free).

    The default `"auto"` decides per dataset: one cheap aggregate
    (count + approx_count_distinct over the text fingerprint — a single
    hash per doc, partial-aggregable HLL sketch, no shuffle of text)
    measures the verbatim-duplicate mass; the collapse runs only when
    >= ~5% of docs are copies. On a dedup-clean corpus the collapse's
    group/expand joins are pure overhead (A/B-measured ~+40% at sf0.1),
    while on a crawl-grade corpus they pay for themselves many times
    over — and the output is provably identical either way, so the
    dispatch is free to be data-dependent (same class of bounded
    plan-time job as the chunk planner's MIN/MAX probe).

    `dup_ratio` — the caller's known verbatim-duplicate fraction
    (1 - distinct_texts/docs), e.g. from an earlier `text_profile`
    pass — skips the auto probe entirely: at 100 TB the probe is still
    one full scan of the text column per invocation, and a pipeline
    that already profiled the corpus shouldn't pay it twice (r8
    verdict item 8). The hint path dispatches on the RATIO alone
    (collapse when >= 5%), deliberately WITHOUT the auto probe's
    absolute duplicate-mass floor: the floor needs a row count the
    hint path refuses to pay a job for, and a caller passing a
    profile hint is a large-corpus pipeline that clears it anyway —
    on a small corpus the hint may pick the measured-slower collapse
    (output identical either way). Ignored when `collapse_exact` is
    passed as an explicit bool.

    Scale: signature computation is embarrassingly parallel over docs;
    candidates come from an equi-join on band buckets (high-cardinality
    key) — cost is O(candidates), not O(n^2). At 100 TB pass
    portable=False: shingle hashing switches from the md5-derived
    oracle-portable hash to xxhash64 (JVM intrinsic) — same minhash
    permutations, bands, verification, and near-dup semantics, ~the
    per-byte hashing cost removed; only cross-engine comparability is
    given up.

    `max_bucket` is the HOT-BUCKET CAP — the standard guard every
    at-scale LSH dedup needs: a degenerate band bucket (empty docs,
    boilerplate templates, adversarial spam) with B members contributes
    B^2/2 candidate pairs; one million-member bucket is 5e11 pairs and
    the job never finishes. Buckets larger than the cap are DROPPED from
    candidate generation (their members are template-grade duplicates a
    cheaper exact/URL/line-dedup pass already handles; the cluster
    resolver still sees them through their other, sub-cap bands if any).
    The size precount groups on the SAME (band, band_key) the self-join
    shuffles on, so the guard rides the existing exchange. Under the
    pre-collapse, bucket size is the SUM of group sizes in the bucket —
    exactly the member count the direct path would see, so the same
    buckets are dropped and the capped output is also identical (a group
    whose every bucket is dropped emits no intra-group pairs either,
    matching the direct path). Default None preserves exact oracle
    semantics."""
    if collapse_exact == "auto" and dup_ratio is not None:
        # hint supplied: ratio-only dispatch (the caller profiled their
        # corpus; a pipeline passing a hint is a large-corpus pipeline),
        # zero Spark jobs
        collapse_exact = dup_ratio >= 0.05
    if collapse_exact == "auto":
        # Two-stage probe (optimization r13, guide §1.2-1): the dispatch
        # carries an ABSOLUTE duplicate-mass floor of 25k (see below), so
        # when the corpus has fewer rows than the floor the decision is
        # predetermined — direct path — and the text-scan + HLL aggregate
        # below would be a wasted full pass over the text column. Gate it
        # behind a zero-column row count first (reads no data pages; at
        # scale its cost is epsilon next to the probe scan it can save,
        # and when the count clears the floor the probe runs as before).
        if df.count() < 25_000:
            collapse_exact = False
    if collapse_exact == "auto":
        stats = df.agg(
            F.count(F.lit(1)).alias("n"),
            # xxhash64, not md5: the probe is internal (never compared
            # against an oracle), so take the JVM-intrinsic hash
            F.approx_count_distinct(F.xxhash64(F.col(text_col))).alias("nd"),
        ).collect()[0]
        # Two-condition dispatch: a clear >=5% duplicate RATIO (HLL
        # relative error ~2% — sketch noise must never flip a clean
        # corpus onto the collapse path) AND an absolute duplicate MASS
        # floor. The collapse's overhead is two extra corpus-order joins
        # (group + expand) — roughly fixed per doc — while its savings
        # scale with the number of duplicate docs removed from the LSH;
        # r8's A/B measured the break-even in the tens of thousands of
        # duplicates (sf0.1: 1.40s direct vs 1.95s collapsed at ~4.5k
        # dups; sf1: 3.54 vs 3.30 at ~45k). Below the floor the direct
        # path wins even on a dup-heavy corpus; both paths are
        # output-identical, so the dispatch is free to be cost-based.
        n, nd = stats["n"], stats["nd"]
        collapse_exact = n > 0 and nd < 0.95 * n and (n - nd) >= 25_000
    if collapse_exact:
        return _lsh_pairs_collapsed(
            df, id_col, text_col, threshold,
            portable=portable, max_bucket=max_bucket,
        )
    # No .cache() on per_doc (optimization r13, guide §5): Catalyst
    # column-prunes each of the three uses instead — the band side
    # computes signatures, the two verify-join sides recompute only the
    # shingle arrays (the 16 minhash columns are pruned out of those
    # subtrees). A/B at sf0.1: caching cost ~+0.2 s (populate + read
    # for a relation used 3x in one action) — and at 100 TB a corpus-
    # order cache is not a real option anyway (it evicts execution
    # memory; the at-scale spelling of "reuse" is writing the encoded
    # relation out once, which the persisted-index path already does).
    per_doc = minhash_per_doc(df, id_col, text_col, portable=portable)
    pairs, _kept = _band_cand_verify(per_doc, threshold, max_bucket, weights=None)
    return pairs


def _band_cand_verify(
    per_doc: DataFrame,
    threshold: float,
    max_bucket: int | None,
    weights: DataFrame | None,
) -> tuple[DataFrame, DataFrame]:
    """The LSH core over a (id, sh, m0..m{K-1}) relation: band explosion,
    hot-bucket cap, candidate self-join, exact-Jaccard verify. Returns
    (pairs, kept_ids): verified (doc_a, doc_b, jaccard) pairs plus the
    distinct ids that retain >= 1 sub-cap bucket (every id when uncapped).

    `weights` (id, _gn) — set by the exact-dup pre-collapse — makes the
    cap count each representative as its group size, so capped results
    match the uncollapsed corpus exactly."""
    docs = per_doc.select("id", "sh")
    bands = per_doc.select(
        "id", F.expr(f"explode(array({_band_structs_sql()}))").alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"))
    if max_bucket is not None:
        if weights is not None:
            weighted = bands.join(weights, "id")
            sizes = (
                weighted.groupBy("band", "band_key")
                .agg(F.sum("_gn").alias("_bn"))
            )
        else:
            sizes = (
                bands.groupBy("band", "band_key")
                .agg(F.count(F.lit(1)).alias("_bn"))
            )
        sizes = sizes.filter(F.col("_bn") <= max_bucket).drop("_bn")
        bands = bands.join(sizes, ["band", "band_key"])
    kept_ids = bands.select("id").distinct() if max_bucket is not None else per_doc.select("id")
    # AQE-exempt keyed repartition (scale.grid_self_join_sides lesson):
    # the band join's input is bytes-tiny relative to its candidate
    # output, so adaptive coalescing would squeeze the self-join toward
    # one partition exactly when a hot band bucket makes it explosive.
    # The sort-merge join reuses this exchange — no extra shuffle.
    # Width = defaultParallelism, not 2x (optimization r13): the guard
    # needs enough partitions that the explosive output spreads over
    # the cluster, and defaultParallelism IS the scale-adaptive knob;
    # the extra 2x bought nothing at either scale while doubling the
    # per-task fixed overhead of every stage that reuses the exchange
    # (measured at sf0.1: 2.0 s -> 1.2 s for the whole pipeline).
    from .scale import explosive_join_parts

    par = explosive_join_parts(bands)
    bands = bands.repartition(par, "band", "band_key")
    # shuffle_hash hint (optimization r14 — the substring_dedup
    # treatment, guide §2.4): without it the planner broadcasts side b,
    # which re-executes the ENTIRE band subtree (scan -> shingle ->
    # minhash -> explode -> both exchanges) a second time just to build
    # the broadcast — and the verify joins then ALSO re-scan instead of
    # reusing (final plan: 4 parquet scans / 2 full shingle+minhash
    # passes). With the hint, side b is a ReusedExchange and the verify
    # sides reuse the doc-spread stage + each other's broadcast: ONE
    # scan, one shingle+minhash pass (executed-plan evidence in
    # plans/r14). Broadcasting a corpus x LSH_BANDS-row relation is a
    # local-SF artifact anyway (the 8 GB / 512M-row broadcast cap kills
    # it at scale). Local wall-time is flat (interleaved A/B: sf0.1
    # +1.6%, sf1 -8%..+16% across runs — every stage is fixed-overhead-
    # bound here); the win is the removed duplicate compute at scale.
    # Memory contract of the forced SHJ: the per-partition build side is
    # corpus x LSH_BANDS / explosive_join_parts() skinny rows — the same
    # per-task order as every stage riding this exchange; if a
    # deployment's partitions outgrow executor memory, widen the
    # explosive-join width rather than dropping the hint to SMJ.
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b").hint("shuffle_hash"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    pairs = (
        cand.join(docs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(docs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("n_inter", F.expr("size(array_intersect(sh_a, sh_b))").cast("long"))
        .withColumn(
            "jaccard",
            F.expr("CAST(n_inter AS DOUBLE) / (size(sh_a) + size(sh_b) - n_inter)"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard")
    )
    return pairs, kept_ids


def _lsh_pairs_collapsed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    *,
    portable: bool,
    max_bucket: int | None,
) -> DataFrame:
    """minhash_lsh_pairs with the exact-dup pre-collapse (see its
    docstring for the output-identity argument). Three relations:

      groups  (_ek, _rep, _gn)  one row per distinct text (cached — tiny:
                                hash + id + count, no text)
      members (_rep, _mid, _gn) doc id -> its group representative
      reps                      the representative document rows

    LSH runs over reps only; representative pairs expand back to member
    pairs through two equi-joins on the representative id, and each
    multi-member group whose representative retains >= 1 sub-cap bucket
    contributes its intra-group pairs at Jaccard exactly 1.0 (what the
    direct path computes for identical shingle sets). Singleton groups
    (the common case) are filtered out of the intra self-join up front."""
    keyed = df.select(
        F.col(id_col), F.col(text_col), F.md5(F.col(text_col)).alias("_ek")
    )
    # One aggregation builds the group table AND carries the representative
    # text (values are identical within a group, so first() is exact and the
    # map-side partial agg collapses copies before the shuffle — the only
    # text that crosses the wire is one copy per distinct text per map
    # partition). Cached: reused by reps, members, and the cap weights; at
    # cluster scale swap the cache for a checkpoint/write-read.
    groups = (
        keyed.groupBy("_ek")
        .agg(
            F.min(id_col).alias("_rep"),
            F.count(F.lit(1)).alias("_gn"),
            F.first(text_col).alias(text_col),
        )
        .cache()
    )
    members = keyed.select("_ek", F.col(id_col).alias("_mid")).join(
        groups.select("_ek", "_rep", "_gn"), "_ek"
    ).select("_rep", "_mid", "_gn")
    reps = groups.select(F.col("_rep").alias(id_col), text_col)
    # spread=False: reps sits downstream of the md5 groupBy — already
    # shuffle-partition wide, and the spread probe's .rdd materialization
    # would execute that groupBy eagerly at plan time under AQE
    per_doc = minhash_per_doc(
        reps, id_col, text_col, portable=portable, spread=False
    ).cache()
    weights = groups.select(F.col("_rep").alias("id"), "_gn")
    rep_pairs, kept_ids = _band_cand_verify(per_doc, threshold, max_bucket, weights)
    cross = (
        rep_pairs.withColumnRenamed("doc_a", "_ra").withColumnRenamed("doc_b", "_rb")
        .join(members.select(F.col("_rep").alias("_ra"), F.col("_mid").alias("_ma")), "_ra")
        .join(members.select(F.col("_rep").alias("_rb"), F.col("_mid").alias("_mb")), "_rb")
        .select(
            F.least("_ma", "_mb").alias("doc_a"),
            F.greatest("_ma", "_mb").alias("doc_b"),
            "jaccard",
        )
    )
    multi = members.filter(F.col("_gn") > 1).select("_rep", "_mid")
    multi_kept = multi.join(
        kept_ids.withColumnRenamed("id", "_rep"), "_rep", "left_semi"
    )
    intra = (
        multi_kept.alias("x")
        .join(
            multi_kept.alias("y"),
            (F.col("x._rep") == F.col("y._rep")) & (F.col("x._mid") < F.col("y._mid")),
        )
        .select(
            F.col("x._mid").alias("doc_a"),
            F.col("y._mid").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 3,
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing >= `min_shared`
    distinct n-token shingles with ANY benchmark/eval document (the
    standard n-gram-overlap test-set leakage check in LLM training-data
    pipelines). Returns (id, n_shared, n_shingles, contaminated_frac) —
    the FRACTION is the signal real pipelines act on: n_shared=3 means
    opposite things for a 10-shingle and a 10,000-shingle document
    (drop vs trim-the-overlap).

    Scale shape: the benchmark side is an eval set — tiny relative to the
    corpus — so its distinct shingle hashes broadcast; the corpus pays one
    shingle pass + one broadcast hash join + one groupBy on doc id. The
    corpus NEVER self-joins and never shuffles on shingles."""
    c = shingle_doc(corpus, id_col, text_col, n=n)
    b = shingle_doc(benchmark, id_col, text_col, n=n)
    # explode_outer (optimization r13): shingle_doc guarantees sh is
    # non-null and non-empty (docs with < n tokens are filtered), and a
    # plain explode's inferred `size(sh)>0 AND isnotnull(sh)` filter is
    # pushed through the projection and re-evaluates the WHOLE
    # shingle+md5 chain (inlined, O(tokens^2)) twice more per corpus row
    # at the scan — measured as the dominant per-row cost. Outer explode
    # infers nothing; row set identical.
    bench_hashes = b.select(F.explode_outer("sh").alias("h")).distinct()
    return (
        c.select(
            "id",
            F.size("sh").cast("long").alias("n_shingles"),
            F.explode_outer("sh").alias("h"),
        )
        .join(F.broadcast(bench_hashes), "h")
        # sh is array_distinct per doc, so (id, h) rows are unique — a plain
        # count IS the distinct shared-shingle count (no countDistinct state).
        # n_shingles is functionally dependent on id; grouping on both keeps
        # it without a join back.
        .groupBy("id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .withColumn(
            "contaminated_frac",
            F.col("n_shared").cast("double") / F.col("n_shingles"),
        )
        .filter(F.col("n_shared") >= min_shared)
        .select("id", "n_shared", "n_shingles", "contaminated_frac")
    )


MINHASH_INDEX_BUCKETS = 64
# Declared reader schema for the persisted index: no parquet-footer
# sampling at analysis time (schema inference would touch every bucket
# partition — a listing+footer storm at 100 TB). `bucket` is the Hive
# partition column.
MINHASH_INDEX_SCHEMA = (
    "id bigint, band int, band_key string, sh array<bigint>, bucket int"
)


def _bucket_expr(n_buckets: int):
    """Routing bucket for a (band, band_key) pair. xxhash64 (JVM intrinsic)
    — NOT oracle-portable, and doesn't need to be: the bucket only routes
    rows to partitions; both writer and reader compute it in Spark."""
    return F.expr(f"pmod(xxhash64(band, band_key), {int(n_buckets)})").cast("int")


def minhash_band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    portable: bool = True,
    n_buckets: int = MINHASH_INDEX_BUCKETS,
) -> DataFrame:
    """(id, band, band_key, sh, bucket) — the index row shape, computed in
    one narrow pass. Shared by the index writer, the incremental lookup
    and the streaming sink (which caches ONE of these per micro-batch and
    reuses it for lookup, within-batch pairing AND the index append —
    shingling/minhashing is the dominant per-batch cost and runs once)."""
    return (
        minhash_per_doc(df, id_col, text_col, portable=portable)
        .select(
            "id", "sh", F.expr(f"explode(array({_band_structs_sql()}))").alias("bb")
        )
        .select(
            "id",
            F.col("bb.band").alias("band"),
            F.col("bb.band_key").alias("band_key"),
            "sh",
        )
        .withColumn("bucket", _bucket_expr(n_buckets))
    )


def _jaccard_pairs(cand: DataFrame, threshold: float) -> DataFrame:
    """(id_a, sh_a, id_b, sh_b) candidates -> verified (doc_a, doc_b,
    jaccard) at >= threshold."""
    return (
        cand.withColumn(
            "n_inter", F.expr("size(array_intersect(sh_a, sh_b))").cast("long")
        )
        .withColumn(
            "jaccard",
            F.expr("CAST(n_inter AS DOUBLE) / (size(sh_a) + size(sh_b) - n_inter)"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard")
    )


def within_batch_pairs(nb: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs INSIDE one batch from its precomputed band rows —
    identical semantics to `minhash_lsh_pairs` (banded candidates, exact
    Jaccard verify, id_a < id_b) without re-shingling the batch."""
    cand = (
        nb.alias("a")
        .join(
            nb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.id").alias("id_b"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return _jaccard_pairs(cand, threshold)


def dedup_incremental_from_bands(
    spark,
    nb: DataFrame,
    index_path: str,
    threshold: float = 0.5,
    *,
    n_buckets: int = MINHASH_INDEX_BUCKETS,
    exclude_identical: bool = False,
) -> DataFrame:
    """`dedup_incremental` over precomputed (cached) band rows `nb`.

    `exclude_identical=True` drops index hits that are the batch's OWN
    content — same id AND same shingle set (a retried batch whose append
    already landed, or an unchanged re-ingest). A same-id hit with
    DIFFERENT content survives: the indexed old version of doc X really
    is a near-dup of new doc Y, and dropping every pair touching X's id
    would silently admit duplicates (r5 review finding)."""
    buckets = sorted(r["bucket"] for r in nb.select("bucket").distinct().collect())
    if not buckets:
        return spark.createDataFrame([], "doc_a bigint, doc_b bigint, jaccard double")
    idx = (
        spark.read.schema(MINHASH_INDEX_SCHEMA)  # declared: no footer sampling
        .parquet(index_path)
        .filter(F.col("bucket").isin(buckets))
    )
    cand = (
        idx.alias("a")
        .join(
            nb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.id").alias("id_b"),
            F.col("b.sh").alias("sh_b"),
        )
        # a pair can collide in several bands; sh_* are functions of the id
        .dropDuplicates(["id_a", "id_b"])
    )
    if exclude_identical:
        ident = nb.select(
            F.col("id").alias("_bid"), F.col("sh").alias("_bsh")
        ).dropDuplicates(["_bid"])
        cand = cand.join(
            F.broadcast(ident),
            (F.col("id_a") == F.col("_bid")) & F.col("sh_a").eqNullSafe(F.col("_bsh")),
            "left_anti",
        )
    return _jaccard_pairs(cand, threshold)


def minhash_index_write(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str = "text",
    *,
    portable: bool = True,
    n_buckets: int = MINHASH_INDEX_BUCKETS,
) -> None:
    """Persist the corpus's MinHash-LSH state as a SERVING INDEX for
    incremental dedup: one row per (doc, band) carrying the band key AND
    the doc's full shingle-hash set, PARTITIONED BY a hash bucket of the
    band key (reference parity: the persisted-state role of
    go-pq-cdc's slot/offset docs, applied to the dedup domain; analogous
    to `similarity.ivf_index_write` for ANN).

    Layout contract: `bucket = pmod(xxhash64(band, band_key), n_buckets)`.
    A new-document batch computes the same buckets for its own band keys,
    so candidate lookup scans ONLY the touched bucket directories (Hive
    partition pruning) — never the whole index.

    Carrying `sh` inline duplicates the shingle set ×LSH_BANDS in storage.
    That is deliberate: exact-Jaccard verification then needs ZERO extra
    passes (no join back to a doc table, which at 100 TB would be a second
    full-index shuffle). Storage is cheap; corpus-wide shuffles are not."""
    bands = minhash_band_rows(
        df, id_col, text_col, portable=portable, n_buckets=n_buckets
    )
    bands.write.mode("overwrite").partitionBy("bucket").parquet(path)


def dedup_incremental(
    spark,
    new_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.5,
    *,
    portable: bool = True,
    n_buckets: int = MINHASH_INDEX_BUCKETS,
) -> DataFrame:
    """Near-dup pairs between a NEW document batch and a persisted corpus
    index (`minhash_index_write`) — the daily-increment shape of a 100 TB
    training-data pipeline: dedup today's crawl against the whole corpus
    WITHOUT re-reading, re-shingling, or re-hashing the corpus.

    Plan: the new batch computes its own band rows + buckets (one narrow
    pass, cached for the lookup's two uses); the distinct touched buckets
    are collected (<= n_buckets values — driver-size by construction);
    the index is read with a declared schema and a `bucket IN (...)`
    filter that Hive partition pruning turns into a directory-level skip;
    candidates come from the (band, band_key) equi-join; exact Jaccard
    verifies candidates only, using the shingle sets BOTH sides already
    carry (zero extra passes). When the increment is small relative to
    the index, AQE broadcasts the new side. Returns (doc_a, doc_b,
    jaccard) with doc_a from the index. A re-ingested id never pairs
    with itself (id_a != id_b). Streaming callers should build the band
    rows once via `minhash_band_rows` and use
    `dedup_incremental_from_bands` (reuse + explicit unpersist).
    """
    nb = minhash_band_rows(
        new_docs, id_col, text_col, portable=portable, n_buckets=n_buckets
    ).cache()
    try:
        return dedup_incremental_from_bands(
            spark, nb, index_path, threshold, n_buckets=n_buckets
        )
    finally:
        # from_bands' eager bucket collect already ran off the cache; the
        # returned plan recomputes nb at execution (deterministic — same
        # buckets), trading one narrow re-pass over the SMALL batch for
        # not pinning a cache entry per call (r5 review). Streaming
        # callers wanting the cache across all three uses go through
        # minhash_band_rows + dedup_incremental_from_bands directly.
        nb.unpersist()


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve near-dup PAIRS into connected-component CLUSTERS — the step
    between 'minhash_lsh_pairs found a~b, b~c' and 'keep one of {a,b,c}'.
    Returns (id, cluster_id) with cluster_id = min doc id in the component
    (the canonical survivor).

    Algorithm: hash-min label propagation — every node repeatedly adopts
    the smallest label among itself and its neighbors until a fixpoint.
    Each iteration is one equi-join + one groupBy MIN (both shuffle on the
    node id, no global state); iterations ~ graph diameter, and near-dup
    graphs are overwhelmingly tiny star/clique components, so 3-5 rounds
    converge in practice. The convergence check is a single driver-side
    count per round (a plan-time scalar, not a data collect).

    LINEAGE IS TRUNCATED per round with eager `localCheckpoint`, not
    `.cache()` (optimization r13). The earlier cache-per-round spelling
    kept execution incremental but left the LOGICAL plan doubling every
    iteration — a cached plan is substituted at physical planning, but
    analysis/optimization still walk the full tree, so each round's
    convergence count paid exponentially growing DRIVER planning time
    (measured at sf0.01: 1.3 s -> 1.8 -> 4.2 -> 11.3 -> 27.2 over five
    rounds at a constant 7 jobs each), and every later consumer of the
    returned labels re-paid the whole final tree (19 s to count 500
    rows). Checkpointed labels plan as a leaf RDD scan: per-round cost
    is flat and the returned plan is constant-size. The edge set is
    checkpointed too — it is the output of the dedup family's most
    expensive candidate-generation pipeline (LSH band join / SemDeDup
    grid cosine join), and truncating it keeps every iteration's
    analysis from re-walking that tree. Data footprint: two narrow
    bigint columns per edge, one (id, label) pair per node, stored at
    MEMORY_AND_DISK on the executors. On a cluster where executor loss
    must be survivable mid-loop, swap for reliable `checkpoint()` with
    a checkpoint dir — same truncation, durable storage."""
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    sym = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def canonical_survivors(pairs: DataFrame, corpus: DataFrame, id_col: str) -> DataFrame:
    """The dedup pipeline's end product: the corpus with near-dup clusters
    collapsed to their canonical (min-id) member. Docs in no pair survive
    untouched (left anti join against non-canonical cluster members)."""
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return corpus.join(losers, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    block_col: str | None = None,
    threshold: float = 0.5,
    grid: int = 16,
) -> DataFrame:
    """Exact pairwise shingle-Jaccard inside blocks (all-pairs within a
    block key — ground truth for LSH recall; use only with bounded blocks).

    GRID-PARTITIONED self-join (`scale.grid_self_join_sides`): a block
    column is typically LOW-cardinality (lang: ~5 values), so a plain
    equi-join on it hashes each block's entire pair set into ONE task —
    the per-pair array_intersect loop serializes and the biggest block
    IS the job (found by the r8 sf1 sweep: the "en" block alone was a
    35-minute single task). The grid spreads each block's pairs over
    grid² cells at the cost of grid× replication; output identical to
    the naive join (pure partitioning)."""
    from .scale import grid_self_join_sides

    docs = shingle_doc(df, id_col, text_col)
    if block_col is not None:
        docs = docs.join(
            df.select(F.col(id_col).alias("id"), F.col(block_col).alias("blk")), "id"
        )
        blk_eq = [F.col("a.blk") == F.col("b.blk")]
    else:
        blk_eq = []
    a, b, grid_conds = grid_self_join_sides(
        docs, grid=grid, extra_keys=("blk",) if block_col is not None else ()
    )
    cond = blk_eq + grid_conds
    joined = a.alias("a").join(b.alias("b"), functools.reduce(lambda x, y: x & y, cond))
    return (
        joined
        .withColumn("n_inter", F.expr("size(array_intersect(a.sh, b.sh))").cast("long"))
        .withColumn(
            "jaccard",
            F.expr("CAST(n_inter AS DOUBLE) / (size(a.sh) + size(b.sh) - n_inter)"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"), "jaccard")
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT all-corpus Jaccard similarity join via PREFIX FILTERING
    (Chaudhuri et al. SSJoin / Bayardo et al. All-Pairs) — the third leg
    of the similarity-join triangle here: `ngram_jaccard_pairs` is exact
    but needs a bounded block key; `minhash_lsh_pairs` is unblocked but
    probabilistic (band-split pairs are false negatives); this is exact
    AND unblocked. No reference counterpart (LLM-pipeline surface).

    The theorem (both directions proven from J >= t => i >= t*max(na,nb),
    i = |a∩b|): order each doc's distinct shingle set globally
    (array_sort of the hashes) and call its first n - ceil(t*n) + 1
    elements the PREFIX; if J(a, b) >= t then b's FULL set intersects
    a's prefix — a pair sharing nothing in the smaller-id side's prefix
    cannot clear the threshold. So candidates = equi-join of exploded
    PREFIX elements (smaller id) against exploded FULL sets (larger id),
    plus the length filter t*nb <= na <= nb/t (also necessary, proven
    above); each survivor is verified with the exact intersect. At
    t = 0.5 the prefix is ~half of each set, the candidate join keys on
    high-cardinality shingle hashes (AQE-skew-splittable, never a block
    funnel), and there are NO false negatives to tune away.

    Output: (doc_a, doc_b, jaccard) — doc_a < doc_b, jaccard >= t."""
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    docs = (
        shingle_doc(df, id_col, text_col)
        .withColumn("sh", F.array_sort("sh"))
        .withColumn("n", F.size("sh").cast("long"))
    )
    prefix = F.expr(
        f"slice(sh, 1, size(sh) - CAST(ceil({t!r} * size(sh)) AS INT) + 1)"
    )
    # explode_outer on both sides (optimization r13): sh (and hence the
    # prefix slice) is non-null/non-empty by shingle_doc's token filter,
    # and the plain explode's inferred filter re-evaluates the inlined
    # shingle+md5 chain at the scan (see decontaminate).
    pre_ex = docs.select(
        F.col("id").alias("ida"),
        F.col("n").alias("na"),
        F.explode_outer(prefix).alias("h"),
    )
    full_ex = docs.select(
        F.col("id").alias("idb"),
        F.col("n").alias("nb"),
        F.explode_outer("sh").alias("h"),
    )
    cand = (
        pre_ex.join(
            full_ex,
            (pre_ex["h"] == full_ex["h"])
            & (F.col("ida") < F.col("idb"))
            # length filter: J >= t forces t*nb <= na and t*na <= nb
            & (F.col("na") >= t * F.col("nb"))
            & (F.col("nb") >= t * F.col("na")),
        )
        .select("ida", "idb")
        .distinct()
    )
    a = docs.select(F.col("id").alias("ida"), F.col("sh").alias("sha"))
    b = docs.select(F.col("id").alias("idb"), F.col("sh").alias("shb"))
    return (
        cand.join(a, "ida")
        .join(b, "idb")
        .withColumn(
            "n_inter", F.expr("size(array_intersect(sha, shb))").cast("long")
        )
        .withColumn(
            "jaccard",
            F.expr("CAST(n_inter AS DOUBLE) / (size(sha) + size(shb) - n_inter)"),
        )
        .filter(F.col("jaccard") >= t)
        .select(
            F.col("ida").alias("doc_a"), F.col("idb").alias("doc_b"), "jaccard"
        )
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    planes: int = 8,
    grid: int = 8,
) -> DataFrame:
    """The scale path for embedding near-dup: block by random-hyperplane
    LSH bucket instead of a metadata column, so candidates come from a
    self-equi-join on `bucket` (2^planes buckets) — sub-quadratic, no
    attribute column needed. Same exact fixed-point cosine verification as
    `embedding_near_dup`; pairs split across buckets are the (tunable)
    recall loss.

    The bucket join goes through `scale.grid_self_join_sides`: 2^planes
    is a bounded key space whose hottest bucket (correlated or duplicate
    vectors pile into the same hyperplane cell) otherwise serializes into
    one task, and the explicit keyed repartition keeps AQE from
    coalescing the tiny-input/explosive-output join down to one
    partition (the r8 sf1 finding on its blocked sibling)."""
    from .scale import grid_self_join_sides
    from .similarity import with_lsh_bucket

    # Per-task work (optimization r13): the bucket, the norm and every
    # pair dot use the unrolled whole-stage-codegen fast path
    # (`P.scaled_dot_fast` / `_lsh_bucket_fast_expr`) — bit-identical
    # values, interpreted-HOF fallback for uncommon widths. The pair dot
    # runs over PER-SIDE pre-cast fixed-point arrays (`fx_vec` computed
    # above the grid exchange, so floats — not the wider int64s — cross
    # the wire): each row is rounded once per side instead of once per
    # candidate pair, which at sf1 is a ~B/grid-fold reduction in
    # round/cast work for the quadratic stage.
    dot = P.int_dot_fast("a.vq", "b.vq")
    norm = P.scaled_dot_fast("v", "v")
    # nrm is coalesced non-nullable: the cos_sim threshold filter would
    # otherwise infer isnotnull(nrm) and push it to both join sides, and HOF
    # aggregates are CodegenFallback (no CSE) — the null-check would
    # re-evaluate the whole 64-dim aggregate per row (r4 perf-gate test).
    vecs = with_lsh_bucket(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "v", planes
    ).withColumn("nrm", F.coalesce(F.expr(norm), F.lit(0).cast("long")))
    a, b, grid_conds = grid_self_join_sides(vecs, grid=grid, extra_keys=("bucket",))
    a = a.withColumn("vq", F.expr(P.fx_vec("v")))
    b = b.withColumn("vq", F.expr(P.fx_vec("v")))
    return (
        a.alias("a")
        .join(
            b.alias("b"),
            functools.reduce(
                lambda x, y: x & y,
                [F.col("a.bucket") == F.col("b.bucket")] + grid_conds,
            ),
        )
        .withColumn("dot", F.expr(dot))
        .withColumn(
            "cos_sim",
            F.expr(
                "CAST(dot AS DOUBLE) / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos_sim")
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.4,
    grid: int = 16,
) -> DataFrame:
    """Near-duplicate vectors by exact fixed-point cosine within blocks.
    Blocking bounds the pair count; at scale use `embedding_near_dup_lsh`
    (LSH-bucket blocking) for sub-quadratic candidates without relying on
    a metadata column. The self-join is grid-partitioned
    (`scale.grid_self_join_sides`): a label column has ~tens of values,
    so the plain block-equi-join would serialize each label's whole pair
    set into one task — same funnel, same fix as ngram_jaccard_pairs."""
    from .scale import grid_self_join_sides

    # unrolled codegen norms + once-per-side-row pre-cast pair dots (see
    # the LSH sibling for the full rationale)
    dot = P.int_dot_fast("a.vq", "b.vq")
    norm = P.scaled_dot_fast("v", "v")
    # coalesce: see embedding_near_dup_lsh — keeps the inferred null-check
    # from re-evaluating the norm aggregate on both join sides
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col(block_col).alias("blk")
    ).withColumn("nrm", F.coalesce(F.expr(norm), F.lit(0).cast("long")))
    a, b, grid_conds = grid_self_join_sides(vecs, grid=grid, extra_keys=("blk",))
    a = a.withColumn("vq", F.expr(P.fx_vec("v")))
    b = b.withColumn("vq", F.expr(P.fx_vec("v")))
    return (
        a.alias("a")
        .join(
            b.alias("b"),
            functools.reduce(
                lambda x, y: x & y,
                [F.col("a.blk") == F.col("b.blk")] + grid_conds,
            ),
        )
        .withColumn("dot", F.expr(dot))
        .withColumn(
            "cos_sim",
            F.expr(
                "CAST(dot AS DOUBLE) / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos_sim")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    grid: int = 8,
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication of an embedded
    corpus — cluster by nearest centroid, find high-cosine pairs WITHIN
    each cluster only, and keep one representative (the min id) per
    connected near-dup group. The pattern that makes embedding dedup
    tractable at 100 TB: candidate pairs are bounded per cell instead of
    corpus-quadratic, and the cells come from the same coarse quantizer
    the IVF ANN index already maintains (`similarity.kmeans_centroids` /
    `ivf_assign`) — one clustering pays for both search and dedup.

    Plan shape: zero-shuffle centroid assignment (broadcast argmax
    expression, `ivf_assign`), a grid-partitioned within-cell self-join
    for exact fixed-point cosine pairs (the cell id is a low-cardinality
    block key — same funnel, same `grid_self_join_sides` fix as
    `embedding_near_dup`), then hash-min label propagation
    (`dedup_clusters`) over the pair graph. Returns one row per vector:
    (id_col, cell bigint, survivor_id bigint, keep boolean) with
    survivor_id = min id of the vector's near-dup component (itself when
    it pairs with nothing).

    At larger scale, raise the centroid count (cells shrink as k grows;
    SemDeDup runs k ~ 10k-100k on web corpora) and set `max_cell` — the
    HOT-CELL CAP, the same guard `minhash_lsh_pairs(max_bucket=)` gives
    LSH buckets: a degenerate cell with B members contributes B^2/2
    candidate pairs, and one runaway cell (a quantizer that collapsed, a
    spam/boilerplate mode in embedding space) is the whole job. Cells
    larger than the cap are DROPPED from pair generation — every member
    keeps itself — because a cell-sized near-dup mass is a signal to
    re-train with more centroids, not something to grind through. The
    size precount is one narrow count on the assignment output (at most
    k rows, broadcast back); default None preserves exact oracle
    semantics."""
    from .scale import grid_self_join_sides
    from .similarity import ivf_assign

    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col).cache()
    # unrolled codegen norms (optimization r13, values identical); the
    # pair dot runs over per-side-row pre-cast fixed-point arrays — see
    # embedding_near_dup_lsh for the once-per-side vs once-per-pair
    # rounding argument (the quadratic within-cell stage is this
    # operator's whole cost at scale)
    norm = P.scaled_dot_fast("v", "v")
    dot = P.int_dot_fast("a.vq", "b.vq")
    vecs = assigned.withColumn(
        "nrm", F.coalesce(F.expr(norm), F.lit(0).cast("long"))
    )
    if max_cell is not None:
        ok = (
            assigned.groupBy("cent_id")
            .agg(F.count(F.lit(1)).alias("_csz"))
            .filter(F.col("_csz") <= max_cell)
            .select("cent_id")
        )
        vecs = vecs.join(F.broadcast(ok), "cent_id")
    a, b, grid_conds = grid_self_join_sides(vecs, grid=grid, extra_keys=("cent_id",))
    a = a.withColumn("vq", F.expr(P.fx_vec("v")))
    b = b.withColumn("vq", F.expr(P.fx_vec("v")))
    pairs = (
        a.alias("a")
        .join(
            b.alias("b"),
            functools.reduce(
                lambda x, y: x & y,
                [F.col("a.cent_id") == F.col("b.cent_id")] + grid_conds,
            ),
        )
        .withColumn("dot", F.expr(dot))
        .withColumn(
            "cos_sim",
            F.expr(
                "CAST(dot AS DOUBLE) / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
    )
    labels = dedup_clusters(pairs)
    return (
        assigned.select("id", "cent_id")
        .join(labels.withColumnRenamed("cluster_id", "_surv"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("cent_id").cast("long").alias("cell"),
            F.coalesce(F.col("_surv"), F.col("id")).cast("long").alias("survivor_id"),
            (F.coalesce(F.col("_surv"), F.col("id")) == F.col("id")).alias("keep"),
        )
    )
