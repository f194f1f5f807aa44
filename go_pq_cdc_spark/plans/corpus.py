"""Corpus-preparation queries: context-window chunking, stratified
deterministic sampling, and embedding-column health stats.

These extend the LLM-pipeline families (SURVEY.md §2 extensions) with the
remaining preprocessing steps a 100 TB training-data run needs between
capture and packing:

  * `text_chunk_windows` — split every document into fixed-size token
    windows with a stride (the context-window prep step that feeds
    `pack_token_sequences`). Pure projection + explode: zero shuffles,
    scales as a map over the corpus.
  * `sample_stratum_topk` — deterministic k-docs-per-language sample by
    hash order. Per-stratum top-k routes through the shared two-level
    salted helper (`scale.salted_topk`), so one giant stratum ("en" is
    ~half the web) never funnels through a single reducer.
  * `emb_dim_stats` — per-dimension count/min/max/mean over the
    embedding column (feature-health check before ANN indexing or
    quantization). posexplode + groupBy(dim): partial aggregation
    reduces every task's output to D rows, so the final shuffle carries
    O(tasks × D) rows regardless of corpus size.

Oracle determinism follows registry.py's rules: exact DECIMAL sums with
the VARCHAR bridge on the DuckDB side, float columns cast to DOUBLE
before comparison, ranks tie-broken by unique keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.scale import salted_topk
from .registry import register

# Context-window chunking parameters: 50-token windows, stride 40
# (10-token overlap) — small enough that sf0.01 docs produce multiple
# windows, structurally identical to the 2k/8k-token production shape.
_WIN = 50
_STRIDE = 40


@register(
    "text_chunk_windows",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t, len(t) AS n_tokens,
               unnest(generate_series(0, len(t) - 1, {_STRIDE})) AS start
        FROM toks
    )
    SELECT doc_id,
           start // {_STRIDE} AS chunk_idx,
           CAST(start AS BIGINT) AS start_tok,
           CAST(len(t[start + 1 : start + {_WIN}]) AS BIGINT) AS chunk_tokens,
           array_to_string(t[start + 1 : start + {_WIN}], ' ') AS chunk_text
    FROM starts
    """,
    tags=("text", "chunking", "pipeline"),
    bench=True,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token-window chunking with overlap: every document
    becomes ceil(n_tokens/stride) windows of up to `_WIN` whitespace
    tokens starting every `_STRIDE` tokens (trailing windows may be
    short). The LLM-context-window prep step: at 100 TB this is a pure
    narrow map (split + sequence + explode + slice), no exchange at all —
    output partitioning inherits the scan's."""
    doc = load_table(spark, sf_dir, "documents")
    toks = doc.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).withColumn("n_tokens", F.size("t"))
    starts = toks.withColumn(
        "start",
        F.explode(F.sequence(F.lit(0), F.col("n_tokens") - 1, F.lit(_STRIDE))),
    )
    chunk = F.slice(F.col("t"), F.col("start") + 1, F.lit(_WIN))
    return starts.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


@register(
    "sample_stratum_topk",
    oracle="""
    SELECT lang, doc_id, rk
    FROM (
        SELECT lang, doc_id,
               md5('smpl' || CAST(doc_id AS VARCHAR)) AS rk,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('smpl' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= 10
    """,
    tags=("sampling", "pipeline", "scale"),
)
def sample_stratum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-stratum sample: the 10 docs per language that
    rank first in md5-hash order — a reproducible uniform sample whose
    membership is stable under corpus growth *within* the selected
    hash-prefix region. Oracle formulates the one-level window; the Spark
    plan routes through `scale.salted_topk` (two-level, 32 salts per
    stratum) because a language stratum at web scale is billions of rows —
    a `Window.partitionBy(lang)` would funnel half the corpus ("en")
    through one reducer. Results are provably identical (salted_topk
    docstring)."""
    doc = load_table(spark, sf_dir, "documents")
    df = doc.select(
        "lang",
        "doc_id",
        F.md5(F.concat(F.lit("smpl"), F.col("doc_id").cast("string"))).alias("rk"),
    )
    out = salted_topk(
        df,
        order_cols=[F.col("rk"), F.col("doc_id")],
        rank_name="rn",
        k=10,
        salt_col="doc_id",
        partition_cols=("lang",),
    )
    return out.select("lang", "doc_id", "rk")


@register(
    "emb_dim_stats",
    oracle="""
    WITH ex AS (
        SELECT unnest(generate_series(1, len(embedding))) AS dim,
               unnest(embedding) AS e
        FROM embeddings
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           COUNT(*) AS n,
           MIN(CAST(e AS DOUBLE)) AS min_e,
           MAX(CAST(e AS DOUBLE)) AS max_e,
           -- input-side VARCHAR bridge: Spark's double->DECIMAL goes
           -- through the shortest decimal string (BigDecimal(Double.
           -- toString)) then HALF_UP; DuckDB's direct cast rounds the
           -- binary double instead and disagrees by one 1e-10 ulp on
           -- ~1 in 30k values. Casting through VARCHAR makes DuckDB
           -- round the same shortest string Spark does.
           CAST(CAST(SUM(CAST(CAST(CAST(e AS DOUBLE) AS VARCHAR)
                               AS DECIMAL(27,10))) AS VARCHAR)
                AS DOUBLE) / COUNT(*) AS avg_e
    FROM ex
    GROUP BY dim
    """,
    tags=("embedding", "stats", "pipeline"),
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension health stats over the embedding column — the
    pre-flight check before quantization (`emb_quantize` picks scales
    from exactly these extrema) or ANN index build. posexplode fans each
    vector into (dim, value) pairs; the groupBy(dim) partial-aggregates
    map-side, so each task ships only D=64 rows to the final exchange no
    matter how many vectors it scanned. Mean uses the exact-DECIMAL-sum
    convention (registry.py) so both engines agree bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("pos", "e"))
    n = F.count(F.lit(1))
    return (
        ex.groupBy((F.col("pos") + 1).cast("long").alias("dim"))
        .agg(
            n.alias("n"),
            F.min(F.col("e").cast("double")).alias("min_e"),
            F.max(F.col("e").cast("double")).alias("max_e"),
            (
                F.sum(F.col("e").cast("double").cast("decimal(27,10)")).cast(
                    "double"
                )
                / n
            ).alias("avg_e"),
        )
    )


@register(
    "emb_mad_outliers",
    oracle="""
    WITH ex AS (
        SELECT unnest(generate_series(1, len(embedding))) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS q
        FROM embeddings
    ),
    med AS (SELECT dim, quantile_cont(q, 0.5) AS med FROM ex GROUP BY dim),
    dev AS (
        SELECT e.dim, m.med, abs(CAST(e.q AS DOUBLE) - m.med) AS dev
        FROM ex e JOIN med m USING (dim)
    ),
    mad AS (SELECT dim, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY dim)
    SELECT CAST(d.dim AS BIGINT) AS dim,
           MIN(d.med) / 1000000 AS med_e,
           MIN(m.mad) / 1000000 AS mad_e,
           CAST(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (dim)
    GROUP BY d.dim
    """,
    tags=("embedding", "stats", "robust", "outliers"),
)
def emb_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension ROBUST outlier stats: median + MAD (median absolute
    deviation) and the count of values beyond the classic 3-MAD fence —
    the robust sibling of `emb_dim_stats`' min/max/mean (one corrupted
    ingest batch drags a mean arbitrarily; the median barely moves, so
    this is the signal that actually flags it). Exactness: values land
    on the repo's fixed-point grid first (round(e * 1e6) int64), where
    EVERY interpolated median is exactly representable (ints and their
    midpoints/quarters stay far inside 2^53), so Spark's `percentile`
    and DuckDB's `quantile_cont` agree bit-for-bit regardless of
    formula spelling — the same grid trick the cosine family uses. The
    3-MAD comparison is exact-double; only the final /1e6 rescales.
    Scale: posexplode then TWO dim-keyed aggs + broadcast joins of
    64-row stats — each task ships D rows per agg no matter how many
    vectors it scanned; no window anywhere."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("pos", "e")).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.expr(
            "CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT)"
        ).alias("q"),
    )
    med = ex.groupBy("dim").agg(F.expr("percentile(q, 0.5D)").alias("med"))
    dev = ex.join(F.broadcast(med), "dim").select(
        "dim",
        "med",
        F.expr("abs(CAST(q AS DOUBLE) - med)").alias("dev"),
    )
    mad = dev.groupBy("dim").agg(
        F.expr("percentile(dev, 0.5D)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "dim")
        .groupBy("dim")
        .agg(
            (F.min("med") / F.lit(1000000.0)).alias("med_e"),
            (F.min("mad") / F.lit(1000000.0)).alias("mad_e"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# Long-n-gram length for substring-level dedup: 8 whitespace tokens — the
# test-scale analogue of the 50-token threshold in suffix-array training
# dedup (Lee et al. 2021); long enough that sharing one is never chance.
_SUBNGRAM = 8
# Boilerplate cap: an n-gram present in MORE docs than this is template
# text (headers, licenses) — cheaper passes (line/url dedup) own those.
_SUBNGRAM_MAX_DOCS = 20


@register(
    "text_substring_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    g0 AS (
        SELECT doc_id, t,
               unnest(generate_series(1, len(t) - {_SUBNGRAM - 1})) AS i
        FROM toks
        WHERE len(t) >= {_SUBNGRAM}
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i : i + {_SUBNGRAM - 1}], ' ') AS g
        FROM g0
    ),
    keep AS (
        SELECT g FROM grams GROUP BY g
        HAVING COUNT(*) BETWEEN 2 AND {_SUBNGRAM_MAX_DOCS}
    ),
    kept AS (SELECT doc_id, g FROM grams WHERE g IN (SELECT g FROM keep))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS shared_ngrams
    FROM kept a JOIN kept b USING (g)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    tags=("text", "dedup", "pipeline", "scale"),
    bench=True,
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-level cross-document duplication — the op suffix-array
    training-data dedup performs (find documents sharing long verbatim
    spans even when the documents as wholes differ), re-expressed
    Spark-natively as long-token-n-gram intersection: explode every
    {_SUBNGRAM}-token gram, keep grams shared by 2..{_SUBNGRAM_MAX_DOCS}
    docs (the upper bound drops boilerplate/template text exactly like
    the LSH hot-bucket cap), self-join within gram groups, count shared
    grams per pair.

    100 TB shape: the gram explosion is a narrow map; the equi-join key
    (the gram) is HIGH cardinality and the doc cap bounds every group's
    pair fan-out at {_SUBNGRAM_MAX_DOCS}^2/2, so no bucket explodes. The
    AQE-exempt keyed repartition applies the r8 lesson: adaptive
    coalescing sizes by the join's byte-tiny input and would otherwise
    re-funnel its pair output. Grams are hashed (multi-arg xxhash64,
    optimization r13) before any shuffle: the hash is an internal
    equality key that never reaches the output, so the result is
    identical to the string form up to 2^-64 collisions and the oracle
    keeps the exact string join."""
    from ..operators.text import substring_dup_pairs

    doc = load_table(spark, sf_dir, "documents")
    return substring_dup_pairs(
        doc, "doc_id", "text", n=_SUBNGRAM, max_docs=_SUBNGRAM_MAX_DOCS,
        # hashed (optimization r13): the gram is an INTERNAL equality key
        # only — no hash value reaches the output, so the multi-arg
        # xxhash64 arm is output-identical to the string arm up to the
        # 2^-64 collision class (re-MATCHed vs the unchanged string-SQL
        # oracle at sf0.01 and sf1) while the distinct/keep/self-join
        # shuffles carry 8-byte keys instead of ~8-token strings and no
        # gram string is ever allocated. Measured 1.72s -> ~1.4s on the
        # sf0.1 bench row; at 100 TB the shuffle-byte ratio is the point
        # (guide §2.3).
        hashed=True,
    )


@register(
    "text_substring_dedup_apply",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    g0 AS (
        SELECT doc_id, t,
               unnest(generate_series(1, len(t) - {_SUBNGRAM - 1})) AS i
        FROM toks
        WHERE len(t) >= {_SUBNGRAM}
    ),
    occ AS (
        SELECT doc_id, i,
               array_to_string(t[i : i + {_SUBNGRAM - 1}], ' ') AS g
        FROM g0
    ),
    keep AS (
        SELECT g FROM (SELECT DISTINCT doc_id, g FROM occ)
        GROUP BY g HAVING COUNT(*) BETWEEN 2 AND {_SUBNGRAM_MAX_DOCS}
    ),
    ranked AS (
        SELECT doc_id, i,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, i) AS rn
        FROM occ WHERE g IN (SELECT g FROM keep)
    ),
    rm AS (
        SELECT doc_id, i AS j, i + {_SUBNGRAM - 1} AS hit_end
        FROM ranked WHERE rn > 1
    ),
    tokpos AS (
        SELECT doc_id, t[j] AS tok, j
        FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t))) AS j
              FROM toks)
    ),
    cov AS (
        SELECT p.doc_id, p.j, p.tok,
               MAX(r.hit_end) OVER (
                   PARTITION BY p.doc_id ORDER BY p.j
                   ROWS UNBOUNDED PRECEDING
               ) AS cov_end
        FROM tokpos p LEFT JOIN rm r
          ON p.doc_id = r.doc_id AND p.j = r.j
    ),
    agg AS (
        SELECT doc_id,
               string_agg(tok, ' ' ORDER BY j) AS dedup_text,
               COUNT(*) AS kept
        FROM cov WHERE cov_end IS NULL OR cov_end < j
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(a.dedup_text, '') AS dedup_text,
           CAST(len(t.t) - COALESCE(a.kept, 0) AS BIGINT) AS n_tokens_removed
    FROM toks t LEFT JOIN agg a USING (doc_id)
    """,
    tags=("text", "dedup", "pipeline", "scale"),
    bench=True,
)
def text_substring_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span REMOVAL — the apply half of `text_substring_dedup` (r9
    verdict item 4; the actual training-data op in suffix-array dedup,
    Lee et al. 2021): every occurrence of a cross-document duplicated
    {_SUBNGRAM}-token span except the globally-first one is cut from the
    corpus, overlapping hits merged, text reconstructed from surviving
    tokens. One row per document: (doc_id, dedup_text,
    n_tokens_removed). Idempotent (property-tested: re-applying removes
    nothing). Registry arm carries gram STRINGS for oracle exactness;
    `hashed=True` (operators/text.substring_dedup_apply) is the
    production arm — xxhash64 grams before the shuffles,
    property-tested output-identical."""
    from ..operators.text import substring_dedup_apply

    doc = load_table(spark, sf_dir, "documents")
    return substring_dedup_apply(
        doc, "doc_id", "text", n=_SUBNGRAM, max_docs=_SUBNGRAM_MAX_DOCS,
        hashed=False,
    )


@register(
    "emb_centroid_outliers",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label,
               unnest(generate_series(1, len(embedding))) AS dim,
               unnest(embedding) AS e
        FROM embeddings
    ),
    cent AS (
        SELECT label, dim,
               -- exact-DECIMAL mean with the VARCHAR bridge (registry.py):
               -- both engines must agree on every centroid component
               -- bit-for-bit or the distances downstream diverge
               CAST(CAST(SUM(CAST(CAST(CAST(e AS DOUBLE) AS VARCHAR)
                                  AS DECIMAL(27,10))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS c
        FROM ex GROUP BY label, dim
    ),
    cent_arr AS (
        SELECT label, list(c ORDER BY dim) AS cvec FROM cent GROUP BY label
    ),
    dists AS (
        SELECT e.vec_id, e.label,
               list_sum(list_transform(
                   generate_series(1, len(e.embedding)),
                   i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
                        * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
               )) AS dist_sq
        FROM embeddings e JOIN cent_arr c USING (label)
    )
    SELECT label, vec_id, dist_sq
    FROM (
        SELECT label, vec_id, dist_sq,
               ROW_NUMBER() OVER (
                   PARTITION BY label ORDER BY dist_sq DESC, vec_id
               ) AS rn
        FROM dists
    )
    WHERE rn <= 5
    """,
    tags=("embedding", "quality", "pipeline", "scale"),
)
def emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabeled-example mining: the 5 vectors FARTHEST from their own
    label's centroid, per label — the embedding-space QC pass a training
    pipeline runs before using labels for contrastive sampling or
    stratified mixing (a point far from its class center is a labeling
    error, an outlier, or a class worth splitting).

    Determinism: centroid components go through the exact-DECIMAL-sum +
    VARCHAR-bridge convention (identical doubles in both engines), and
    the distance folds element-wise in array order in both engines, so
    dist_sq is bit-identical and the (dist_sq DESC, vec_id) rank is
    exact. 100 TB shape: the centroid pass is posexplode + map-side
    partial agg (O(tasks x labels x dims) shuffle rows); centroids are a
    labels x dims table broadcast back over the scan; the per-label top-k
    routes through `scale.salted_topk` so a web-scale label never funnels
    one reducer."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "e")
    )
    cent = (
        ex.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.col("e").cast("double").cast("decimal(27,10)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "c"))),
                lambda x: x["c"],
            ).alias("cvec")
        )
    )
    dists = emb.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.aggregate(
            F.zip_with(
                "embedding",
                "cvec",
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ).alias("dist_sq"),
    )
    out = salted_topk(
        dists,
        order_cols=[F.col("dist_sq").desc(), F.col("vec_id")],
        rank_name="rn",
        k=5,
        salt_col="vec_id",
        partition_cols=("label",),
    )
    return out.select("label", "vec_id", "dist_sq")
