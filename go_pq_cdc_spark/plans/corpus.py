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
