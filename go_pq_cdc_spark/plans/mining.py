"""Corpus-mining queries: exact heavy hitters, BM25 retrieval, and
semantic (embedding-cluster) deduplication.

These close out the LLM-pipeline families (SURVEY.md §2 extensions) with
three patterns a 100 TB curation run leans on:

  * `text_heavy_hitters` — exact phi-frequent tokens via the two-pass
    Misra-Gries candidate/verify pattern (`sketch.heavy_hitters_exact`).
    Boilerplate/stopword discovery over a web-scale vocabulary without
    ever shuffling the full distinct-token set: the candidate pass moves
    O(tasks x capacity) rows, the verify pass counts candidates only.
  * `text_bm25_topk` — BM25 relevance top-k (`search.bm25_topk`): one
    narrow corpus pass (per-term tf via token-array HOFs), a single
    broadcast stats row, a salted top-k. Decontamination probes and
    eval-set mining are this exact query.
  * `dedup_semantic` — SemDeDup (Abbas et al. 2023): nearest-centroid
    cells from the IVF coarse quantizer, exact fixed-point cosine pairs
    WITHIN cells only (grid-partitioned self-join), hash-min components,
    keep the min-id representative. The embedding-space complement to
    the MinHash/SimHash lexical dedup family.

Oracle determinism follows registry.py's rules; the BM25 scorer is
specifically constructed log-free so every score is bit-identical across
engines (see operators/search.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import portable as P
from ..operators import dedup as D
from ..operators import search as S
from ..operators.sketch import heavy_hitters_exact
from .registry import register

_HH_PHI = 0.02  # heavy-hitter frequency threshold
_HH_CAP = 128  # Misra-Gries capacity: 129 > 1/0.02, guarantee holds
_BM25_TERMS = ("merge", "vector", "window", "stream")
_SEM_TAU = 0.35  # within-cell cosine threshold (SemDeDup tau)

_TOKS_DUCK = P.tokens("text")["duck"]


@register(
    "text_heavy_hitters",
    oracle=f"""
    WITH t AS (
        SELECT unnest({_TOKS_DUCK}) AS token FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t)
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(*) AS DOUBLE) / CAST(n AS DOUBLE) AS freq
    FROM t, tot
    GROUP BY token, n
    HAVING CAST(COUNT(*) AS DOUBLE) > CAST(0.02 AS DOUBLE) * CAST(n AS DOUBLE)
    """,
    tags=("text", "sketch", "heavy-hitters"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens covering more than phi=2% of the corpus token stream, with
    EXACT counts — candidate generation by per-partition Misra-Gries
    summaries, verification by a candidate-only broadcast-filtered count.
    The oracle is the brute-force GROUP BY ... HAVING; the Spark side
    never shuffles the full vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr(P.tokens("text")["spark"])).alias("token")
    )
    return heavy_hitters_exact(toks, "token", phi=_HH_PHI, capacity=_HH_CAP)


_CMS_PROBES = ("merge", "vector", "window", "stream", "zzz_never_a_token")
_CMS_D, _CMS_W = 4, 512


def _cms_oracle() -> str:
    from ..operators.sketch import cms_oracle_sql

    return cms_oracle_sql(
        f"SELECT unnest({_TOKS_DUCK}) AS token FROM documents",
        _CMS_PROBES,
        d=_CMS_D,
        w=_CMS_W,
    )


@register(
    "q_cms_frequencies",
    oracle=_cms_oracle(),
    tags=("sketch", "frequency", "cms", "mergeable"),
)
def q_cms_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point-frequency estimates — the third mergeable
    sketch family (KMV distinct / MG heavy hitters / CMS frequencies):
    counters built over the corpus token stream with plan-time literal
    hash coefficients (one narrow map + one d x w-bounded groupBy), then
    point estimates for a fixed probe list including an absent token.
    The CMS no-undercount guarantee (est >= exact, always) is fused into
    the plan as an assert_true; the oracle rebuilds the identical
    counters and estimates in SQL — pure integer arithmetic, exact on
    both engines."""
    from ..operators.sketch import cms_counters, cms_point_estimates

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr(P.tokens("text")["spark"])).alias("token")
    )
    counters = cms_counters(toks, "token", d=_CMS_D, w=_CMS_W)
    probes = spark.createDataFrame(
        [(p,) for p in _CMS_PROBES], "token string"
    )
    est = cms_point_estimates(
        counters, probes, "token", d=_CMS_D, w=_CMS_W
    )
    exact = (
        probes.join(
            toks.groupBy("token").agg(
                F.count(F.lit(1)).cast("long").alias("_n")
            ),
            "token",
            "left",
        )
        .select("token", F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("exact_cnt"))
    )
    guard = F.assert_true(
        F.col("est_cnt") >= F.col("exact_cnt"),
        F.lit("q_cms_frequencies: CMS undercounted — impossible by construction"),
    )
    return (
        est.join(F.broadcast(exact), "token")
        .select(
            "token",
            F.when(guard.isNull(), F.col("est_cnt")).alias("est_cnt"),
            "exact_cnt",
        )
    )


@register(
    "q_cms_merge",
    oracle=_cms_oracle(),
    tags=("sketch", "frequency", "cms", "mergeable", "merge"),
)
def q_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS merge associativity under the oracle — the `q_kmv_merge`
    design applied to frequencies: Spark builds one sketch PER LANGUAGE
    (the sketch-at-fine-granularity-once pattern), merges them by
    counter addition, and estimates from the MERGED sketch; DuckDB
    sketches the whole corpus directly. Bit-identical estimates prove
    the merge is exact cross-engine — the property that lets a 100 TB
    corpus keep per-partition/day sketches and answer global frequency
    questions without rescanning."""
    from ..operators.sketch import cms_point_estimates

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.expr(P.tokens("text")["spark"])).alias("token")
    )
    h = P.md5_hash_m31("CAST(token AS STRING)")["spark"]
    from ..operators.sketch import _cms_bucket_exprs

    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                F.expr(e["spark"]).cast("long").alias("bucket"),
            )
            for j, e in enumerate(_cms_bucket_exprs(_CMS_D, _CMS_W))
        ]
    )
    per_lang = (
        toks.select("lang", F.expr(h).alias("hv"))
        .select("lang", F.explode(cells).alias("c"))
        .groupBy("lang", "c.j", "c.bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    merged = per_lang.groupBy("j", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    probes = spark.createDataFrame(
        [(p,) for p in _CMS_PROBES], "token string"
    )
    est = cms_point_estimates(merged, probes, "token", d=_CMS_D, w=_CMS_W)
    exact = probes.join(
        toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("_n")),
        "token",
        "left",
    ).select(
        "token", F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("exact_cnt")
    )
    return est.join(F.broadcast(exact), "token").select(
        "token", "est_cnt", "exact_cnt"
    )


_BLOOM_PROBE_MOD = 100  # probe set: every 100th custkey (some never ordered)


def _bloom_membership_oracle() -> str:
    from ..operators.sketch import (
        BLOOM_BITS,
        BLOOM_K,
        BLOOM_LANE,
        _bloom_cell_cols,
        _bloom_pos_exprs,
        bloom_oracle_ctes,
    )

    h = P.md5_hash_m31("CAST(probe AS VARCHAR)")["duck"]
    cell = _bloom_cell_cols("//", BLOOM_LANE)
    pos_list = ", ".join(
        e["duck"] for e in _bloom_pos_exprs(BLOOM_K, BLOOM_BITS)
    )
    return f"""
    WITH {bloom_oracle_ctes("orders", "o_orderpriority", "o_custkey")},
    probes AS (
        SELECT c_custkey AS probe FROM customer
        WHERE c_custkey % {_BLOOM_PROBE_MOD} = 0
    ),
    phv AS (SELECT probe, {h} AS hv FROM probes),
    ppos AS (SELECT probe, unnest([{pos_list}]) AS pos FROM phv),
    pcells AS (
        SELECT probe, {cell['word']} AS word, bit_or({cell['mask']}) AS req
        FROM ppos GROUP BY probe, word
    ),
    nw AS (SELECT probe, CAST(COUNT(*) AS BIGINT) AS n_words
           FROM pcells GROUP BY probe),
    okj AS (
        SELECT c.grp, p.probe, CAST(COUNT(*) AS BIGINT) AS ok
        FROM pcells p
        JOIN cells c ON p.word = c.word AND (c.bits & p.req) = p.req
        GROUP BY c.grp, p.probe
    ),
    members AS (
        SELECT o.grp, o.probe FROM okj o JOIN nw USING (probe)
        WHERE o.ok = nw.n_words
    ),
    exact AS (
        SELECT DISTINCT o.o_orderpriority AS grp, p.probe
        FROM orders o JOIN probes p ON o.o_custkey = p.probe
    ),
    grps AS (SELECT DISTINCT grp FROM cells),
    nb AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_bloom
           FROM members GROUP BY grp),
    ne AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_exact
           FROM exact GROUP BY grp)
    SELECT g.grp AS o_orderpriority,
           COALESCE(nb.n_bloom, 0) AS n_bloom,
           COALESCE(ne.n_exact, 0) AS n_exact,
           COALESCE(nb.n_bloom, 0) - COALESCE(ne.n_exact, 0) AS n_false_pos
    FROM grps g
    LEFT JOIN nb ON g.grp = nb.grp
    LEFT JOIN ne ON g.grp = ne.grp
    """


@register(
    "q_bloom_membership",
    oracle=_bloom_membership_oracle(),
    tags=("sketch", "bloom", "mergeable", "membership"),
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter membership — the FIFTH mergeable sketch family
    (KMV / MG / CMS / HLL / Bloom), answering the question none of the
    others do: "was this exact value ever seen in this group?". A
    1024-bit filter of customer keys is built PER ORDER PRIORITY from
    orders (one narrow map + a 32-row-per-group bit_or groupBy —
    Zipf-safe like every sketch here), then a fixed probe set (every
    100th custkey, some of which never ordered) is tested via a
    broadcast equi-join on the word lane. Reported per priority:
    bloom-positive count, exact member count (ground truth rides along,
    CMS-style), and the false-positive overshoot. The no-false-negative
    theorem (every true member's bits are necessarily set) is fused into
    the plan as assert_true; the oracle rebuilds the identical state and
    probe arithmetic in SQL — pure int64 ops both engines share, so the
    match is bit-exact, false positives included."""
    from ..operators.sketch import (
        bloom_cells,
        bloom_members,
        bloom_probe_cells,
    )

    orders = load_table(spark, sf_dir, "orders")
    cells = bloom_cells(orders, ["o_orderpriority"], "o_custkey")
    probes = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % _BLOOM_PROBE_MOD == 0)
        .select(F.col("c_custkey").alias("probe"))
    )
    pcells = bloom_probe_cells(probes, "probe")
    members = bloom_members(cells, ["o_orderpriority"], pcells, "probe")
    exact = (
        orders.join(F.broadcast(probes), orders["o_custkey"] == probes["probe"])
        .select("o_orderpriority", "probe")
        .distinct()
    )
    grps = cells.select("o_orderpriority").distinct()
    nb = members.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_bloom")
    )
    ne = exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    out = (
        grps.join(nb, "o_orderpriority", "left")
        .join(ne, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            F.coalesce("n_bloom", F.lit(0)).cast("long").alias("n_bloom"),
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
        )
    )
    guard = F.assert_true(
        F.col("n_bloom") >= F.col("n_exact"),
        F.lit(
            "q_bloom_membership: bloom false negative — impossible by construction"
        ),
    )
    return out.select(
        "o_orderpriority",
        F.when(guard.isNull(), F.col("n_bloom")).alias("n_bloom"),
        "n_exact",
        (F.col("n_bloom") - F.col("n_exact")).cast("long").alias("n_false_pos"),
    )


def _bloom_merge_oracle() -> str:
    from ..operators.sketch import bloom_oracle_ctes

    return f"""
    WITH {bloom_oracle_ctes("documents", "lang", "text")}
    SELECT grp AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(bit_count(bits)) AS BIGINT) AS bits_set,
           CAST(SUM(bits) AS BIGINT) AS state_sum
    FROM cells GROUP BY grp
    """


@register(
    "q_bloom_merge",
    oracle=_bloom_merge_oracle(),
    tags=("sketch", "bloom", "mergeable", "merge"),
)
def q_bloom_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom state MERGEABILITY, proven cross-engine (the q_kmv_merge /
    q_cms_merge / q_hll_merge design): Spark builds filters of distinct
    texts at the FINE (lang, source) granularity and OR-folds the word
    lanes up to lang; DuckDB builds lang directly from the raw rows. The
    reported state fingerprint (word count, total set bits via
    bit_count, exact int64 sum of the lanes) is bit-identical iff every
    lane merged exactly — bit_or is associative, commutative AND
    idempotent, so unlike CMS addition the fold also survives
    re-delivery (exactly the at-least-once property a CDC ingest's
    "seen this key?" filter needs). A 100 TB corpus keeps a 4 KiB state
    per partition/day and answers membership by folding lanes, never
    rescanning."""
    from ..operators.sketch import bloom_cells, bloom_merge_cells

    docs = load_table(spark, sf_dir, "documents")
    fine = bloom_cells(docs, ["lang", "source"], "text")
    merged = bloom_merge_cells(fine, ["lang"])
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.expr("bit_count(bits)")).cast("long").alias("bits_set"),
        F.sum("bits").cast("long").alias("state_sum"),
    )


@register(
    "q_bloom_stream_state",
    oracle=_bloom_merge_oracle(),
    tags=("sketch", "bloom", "streaming", "merge"),
)
def q_bloom_stream_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING Bloom seen-keys machine under the driver's eye
    (the `dedup_stream_pairs` treatment applied to
    `streaming/bloom_stream.py`): documents arrive as three id-ordered
    micro-batches through the REAL `update_bloom_state` foreachBatch
    body — per-batch cells OR-folded into the versioned per-lang state —
    and the final state's exact-int64 fingerprint must equal the DuckDB
    oracle's DIRECT build from all rows at once. That equality is the
    idempotent-merge theorem made a gate row: bit_or folding over ANY
    batching (including replays) reaches the same state as one pass.
    Rides the shared `fold_id_batches` scaffold."""
    from ..streaming.bloom_stream import (
        bloom_state_fingerprint,
        update_bloom_state,
    )
    from .registry import fold_id_batches

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )

    def update(batch, batch_id, root):
        update_bloom_state(batch, batch_id, f"{root}/state", "lang", "text")

    def read_final(spark, root):
        return bloom_state_fingerprint(spark, f"{root}/state").select(
            F.col("grp").alias("lang"), "n_words", "bits_set", "state_sum"
        )

    return fold_id_batches(
        docs, "doc_id", update, read_final, prefix="bloom_stream_gate_"
    )


@register(
    "q_bloom_join_prune",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
    tags=("sketch", "bloom", "join", "runtime-filter"),
    bench=True,  # the runtime-filter shape: pure-expression fact prune
)
def q_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi-join — the runtime-filter pattern Spark's own
    DPP/bloom-join applies to partition keys, spelled explicitly so it
    works for ANY key: revenue of lineitems belonging to urgent orders,
    where the fact scan is pre-filtered by a PURE-EXPRESSION literal
    Bloom of the dim keys (`sketch.bloom_prune_predicate` — a bounded
    <= 32-row state collect inlined as an array literal; zero joins,
    zero shuffles, whole-stage codegen) and the residual false
    positives die in the exact broadcast join. No false negatives, so
    prune + exact join == exact join — the oracle IS the plain
    semi-join SQL, which is the point: at 100 TB the 4 KiB filter
    drops ~all non-matching fact bytes before any join machinery runs,
    and correctness never depends on the filter. The prune-really-
    prunes property is pinned by unit test (tests/test_mining.py)."""
    from ..catalog import table_row_bound
    from ..operators.sketch import (
        bloom_state_array,
        bloom_state_probe_predicate,
    )

    orders = load_table(spark, sf_dir, "orders")
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    # portable=False (optimization r13): the filter STATE is internal to
    # this query — only which fact rows reach the exact join depends on
    # it, and false positives die there — so the build/probe hash is the
    # xxhash64 intrinsic over the RAW key (no per-row string cast) and
    # the probe predicate stays inside whole-stage codegen (the md5
    # arm's forall-lambda forced the fact filter into interpreted
    # evaluation: ~2s of this bench row at sf0.1; the string cast
    # another ~0.4s). Results are identical for ANY consistent hash
    # family; the oracle-pinned Bloom rows (q_bloom_membership/merge/
    # stream) keep the portable family.
    #
    # ZERO plan-time jobs (optimization r14, guide §3.2 / §1.2-1 — the
    # r13 leftover): the state is built IN-PLAN (`bloom_state_array`: a
    # one-row dense array crossJoin-broadcast onto the fact scan, the
    # same shape as Spark's own injected bloom_filter_agg scalar
    # subquery) instead of a plan-time `dim.count()` + 8k-row state
    # `collect()` — two driver jobs per plan build on the r13 spelling,
    # ~0.3-0.5 s each on this box. Sizing now comes from the parquet
    # FOOTER row count of orders (metadata read, no job) — an upper
    # bound on the filtered dim, so bits land at ~8 per BOUND key
    # (>= 8 per real key; FP only drops). The r13-rejected footer-bound
    # variant oversized a plan LITERAL (65k-word from_json string —
    # 2.3x slower); with the state in-plan the oversize costs only a
    # bounded build aggregate and a <= 1 MiB broadcast, never plan text.
    # Native injection (spark.sql.optimizer.runtime.bloomFilter.*) is
    # deliberately not forced: its applicationSideScanSizeThreshold
    # (10 GB) is the right production gate, and lowering it session-wide
    # so it fires at local SFs would re-plan every other join in the
    # bench to a shape production would not use.
    n_bound = table_row_bound(sf_dir, "orders")
    bloom_bits = 1 << max(10, min(22, (8 * max(n_bound, 1) - 1).bit_length()))
    state = bloom_state_array(
        dim, "o_orderkey", portable=False, bits=bloom_bits
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .crossJoin(F.broadcast(state))
        .filter(
            bloom_state_probe_predicate(
                "l_orderkey", portable=False, bits=bloom_bits
            )
        )
        .drop("bloom_state")
    )
    return (
        li.join(F.broadcast(dim), li["l_orderkey"] == dim["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(25,6)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "text_bm25_topk",
    oracle=S.bm25_oracle_sql("documents", _BM25_TERMS),
    tags=("text", "search", "bm25"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 documents by (log-free, oracle-exact) BM25 relevance to a
    fixed 4-term query. One narrow pass + broadcast stats + salted
    top-k; see operators/search.py for the determinism construction."""
    docs = load_table(spark, sf_dir, "documents")
    return S.bm25_topk(docs, _BM25_TERMS)


_NRM_DUCK = P.scaled_dot("embedding", "embedding", "embedding")["duck"]
_CDOT_DUCK = P.scaled_dot("n.embedding", "c.cv", "n.embedding")["duck"]
_PDOT_DUCK = P.scaled_dot("a.v", "b.v", "a.v")["duck"]
# pre-scaled fixed-point form of a vector (ONE round/cast pass per
# vector instead of one per pair side) + the int-only pair dot over it —
# exactly scaled_dot's integers, factored for the quadratic pair stage
_VQ_DUCK = (
    "[CAST(round(CAST(v[i] AS DOUBLE) * 1000000) AS BIGINT)"
    " FOR i IN range(1, len(v) + 1)]"
)
_QDOT_INT_DUCK = (
    "CAST(list_sum([a.vq[i] * b.vq[i] FOR i IN range(1, len(a.vq) + 1)])"
    " AS BIGINT)"
)
# Conservative NATIVE-dot prefilter for the quadratic pair stage: DuckDB's
# interpreted list comprehension is the sf1 bottleneck (~25M within-cell
# pairs x 64 dims), while list_dot_product is a vectorized C++ kernel.
# cos from raw doubles differs from the fixed-point cos by < ~1e-4 on
# unit-scale vectors (per-component rounding to 1e-6; |v_i| <= 1, norms
# ~1 in the embeddings table), so pairs failing tau - 0.01 on the float
# cos CANNOT clear tau on the exact cos — the exact fixed-point dot runs
# only on survivors and the result set is IDENTICAL. Margin is 100x the
# bound; the EXACT filter still decides every emitted row.
_SEM_PREFILTER_MARGIN = 0.01
_PREDOT_DUCK = (
    "list_dot_product(a.v, b.v) >= "
    f"({_SEM_TAU} - {_SEM_PREFILTER_MARGIN}) * a.fn * b.fn"
)
_FN_DUCK = "sqrt(list_dot_product(v, v))"


@register(
    "dedup_semantic",
    # Within-cell pair cost at sf1 (r12 verdict item 6): each vector is
    # pre-scaled to its fixed-point int form ONCE in `cells` (the
    # all-pairs spelling re-rounded both 64-dim vectors per pair), the
    # pair dot is evaluated once (the WHERE + SELECT double-evaluation
    # halved), and `cells` is MATERIALIZED so the assignment window isn't
    # inlined into the self-join sides. Same integers, same division —
    # identical result to the direct scaled_dot spelling.
    oracle=f"""
    WITH RECURSIVE cents AS (
        SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8
    ),
    nrm AS (
        SELECT vec_id, embedding, {_NRM_DUCK} AS n2 FROM embeddings
    ),
    assign_raw AS (
        SELECT n.vec_id AS id, n.embedding AS v, n.n2, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                                  ORDER BY {_CDOT_DUCK} DESC, c.cent_id) AS crn
        FROM nrm n, cents c
    ),
    cells AS MATERIALIZED (
        SELECT id, v, {_VQ_DUCK} AS vq, {_FN_DUCK} AS fn, n2, cent_id
        FROM assign_raw WHERE crn = 1
    ),
    pdots AS (
        SELECT a.id AS src, b.id AS dst, a.n2 AS na, b.n2 AS nb,
               {_QDOT_INT_DUCK} AS dot
        FROM cells a JOIN cells b
          ON a.cent_id = b.cent_id AND a.id < b.id
        WHERE {_PREDOT_DUCK}
    ),
    pairs AS MATERIALIZED (
        SELECT src, dst FROM pdots
        WHERE CAST(dot AS DOUBLE)
                  / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
              >= {_SEM_TAU}
    ),
    edges AS MATERIALIZED (
        SELECT src, dst FROM pairs
        UNION
        SELECT dst AS src, src AS dst FROM pairs
    ),
    comp(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, c.label FROM edges e JOIN comp c ON e.dst = c.id
    ),
    lab AS (SELECT id, MIN(label) AS survivor FROM comp GROUP BY id)
    SELECT c.id AS vec_id,
           CAST(c.cent_id AS BIGINT) AS cell,
           CAST(COALESCE(l.survivor, c.id) AS BIGINT) AS survivor_id,
           COALESCE(l.survivor, c.id) = c.id AS keep
    FROM cells c LEFT JOIN lab l ON c.id = l.id
    """,
    tags=("dedup", "embedding", "semantic"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: 8 deterministic centroids (the
    `vec_id < 8` convention the IVF family uses), within-cell exact
    cosine pairs at tau=0.35, min-id survivor per near-dup component.
    Returns every vector with its cell, survivor, and keep flag."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    return D.semantic_dedup(emb, cents, threshold=_SEM_TAU)


@register(
    "emb_semdedup_stream_pairs",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8
    ),
    nrm AS (
        SELECT vec_id, embedding, {_NRM_DUCK} AS n2 FROM embeddings
    ),
    assign_raw AS (
        SELECT n.vec_id AS id, n.embedding AS v, n.n2, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                                  ORDER BY {_CDOT_DUCK} DESC, c.cent_id) AS crn
        FROM nrm n, cents c
    ),
    cells AS MATERIALIZED (
        SELECT id, v, {_VQ_DUCK} AS vq, {_FN_DUCK} AS fn, n2, cent_id
        FROM assign_raw WHERE crn = 1
    ),
    pdots AS (
        SELECT b.id AS vec_id, a.id AS dup_of, a.n2 AS na, b.n2 AS nb,
               {_QDOT_INT_DUCK} AS dot
        FROM cells a JOIN cells b
          ON a.cent_id = b.cent_id AND a.id < b.id
        WHERE {_PREDOT_DUCK}
    )
    SELECT vec_id, dup_of,
           CAST(dot AS DOUBLE)
               / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
               AS cos_sim
    FROM pdots
    WHERE CAST(dot AS DOUBLE)
              / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
          >= {_SEM_TAU}
    """,
    tags=("dedup", "embedding", "semantic", "streaming"),
)
def emb_semdedup_stream_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING SemDeDup machine under the driver's eye — the
    `dedup_stream_pairs` treatment applied to
    `streaming/semdedup_stream.py` (previously pytest-only): the
    embeddings arrive as three id-ordered micro-batches through the REAL
    `semdedup_batch_against_index` foreachBatch body (broadcast-centroid
    cell assignment computed once; partition-pruned index-cell lookup;
    within-batch pairing; marker-guarded cell-partitioned append). The
    union over any batching is exactly the batch SemDeDup within-cell
    pair set, so the oracle is `dedup_semantic`'s from-scratch cell
    assignment with the pair join emitted directly; orientation is
    normalized to (vec_id=greater, dup_of=lesser). The fixed-point dot,
    the sqrt norms, and the one division are correctly-rounded IEEE on
    both engines, so cos_sim hashes bit-exactly. Rides the shared
    `fold_id_batches` scaffold (declared-schema pairs read — a corpus
    with no within-cell pair over tau is an empty MATCH, not a
    schema-inference crash)."""
    from ..streaming.semdedup_stream import (
        SEM_PAIR_SCHEMA,
        semdedup_batch_against_index,
    )
    from .registry import fold_id_batches

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id") < 8)

    def update(batch, batch_id, root):
        semdedup_batch_against_index(
            batch, batch_id, f"{root}/index", f"{root}/pairs", cents,
            threshold=_SEM_TAU,
        )

    def read_final(spark, root):
        return (
            spark.read.schema(SEM_PAIR_SCHEMA + ", batch_id int")
            .parquet(f"{root}/pairs")
            .select(
                F.greatest("vec_id", "dup_of").alias("vec_id"),
                F.least("vec_id", "dup_of").alias("dup_of"),
                "cos_sim",
            )
        )

    return fold_id_batches(
        emb, "vec_id", update, read_final, prefix="semdedup_stream_gate_"
    )
