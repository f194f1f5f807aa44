"""BM25 full-text relevance — the retrieval side of a training-data
pipeline: eval-set mining, decontamination probes against benchmark
queries, and quality-weighted sampling by query relevance.

Reference scope: go-pq-cdc has no text/query surface at all (it is a CDC
library — SURVEY.md §2 extensions); this family exists for the 100 TB
corpus-curation story alongside operators/text.py and operators/dedup.py.

Design (Spark-first). The whole scorer is ONE narrow projection over the
corpus: per-document term frequencies come from ``size(filter(tokens,
x -> x = term))`` per query term (|Q| is a small literal list), document
length from ``size(tokens)``, and the corpus statistics (N docs, total
token count T, per-term document frequencies df_t) from a SINGLE global
aggregate row broadcast back with a 1-row crossJoin. No explode and no
per-term shuffle: the only exchanges in the plan are the bounded scalar
fold (fan-in = map partitions) and the two-level salted top-k.

Oracle determinism. Textbook BM25 needs ln(), the one primitive whose
last ulp differs across engines. This scorer uses the log-free rational
idf (N - df + 0.5)/(df + 0.5) — strictly monotone in df, same ranking —
and clears ALL fractions so each per-term score is a ratio of two exact
int64 products evaluated with ONE IEEE division; the per-document score
folds the |Q| per-term doubles in fixed left-to-right order. Both engines
therefore produce bit-identical doubles (registry.py determinism rules).

With k1 = 1.2, b = 0.75 and avgdl = T/N:

    tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
            = 22*T*tf / (10*T*tf + 3*T + 9*dl*N)            (scale by 10T)
    idf     = (N - df + 0.5) / (df + 0.5)
            = (2N - 2df + 1) / (2df + 1)                    (scale by 2)
    s_term  = CAST(idf_num * tf_num AS DOUBLE)
            / CAST(idf_den * tf_den AS DOUBLE)

int64 headroom: the numerator is (2N)·(22·T·tf) — safe through corpus
sizes where N·T·tf_max < 2^63/44 (sf1: ~3e14, ample). At true 100 TB
scale pass ``exact=False``: the identical formula evaluates in doubles
(each *, /, + correctly rounded; ranking unchanged for any realistic
magnitudes), trading oracle-grade bit parity for unbounded range — the
same knob the portable-hash operators expose via ``portable=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P
from .scale import salted_topk, spread_small_input

BM25_K = 15  # default result depth


def _tf_expr(toks: str, term: str, engine: str) -> str:
    """Per-document term frequency as a pure HOF over the token array."""
    lit = term.replace("'", "''")
    if engine == "spark":
        return f"CAST(size(filter({toks}, xx -> xx = '{lit}')) AS BIGINT)"
    return f"CAST(len(list_filter({toks}, xx -> xx = '{lit}')) AS BIGINT)"


def _term_score(i: int, exact: bool) -> str:
    """One query term's BM25 contribution — identical SQL text on both
    engines (all inputs are pre-aliased BIGINT columns)."""
    idf_num = f"(2 * n_docs - 2 * df{i} + 1)"
    idf_den = f"(2 * df{i} + 1)"
    tf_num = f"(22 * tot_toks * tf{i})"
    tf_den = f"(10 * tot_toks * tf{i} + 3 * tot_toks + 9 * dl * n_docs)"
    if exact:
        return (
            f"(CAST({idf_num} * {tf_num} AS DOUBLE)"
            f" / CAST({idf_den} * {tf_den} AS DOUBLE))"
        )
    # double arithmetic end to end: no overflow at any corpus size
    return (
        f"((CAST({idf_num} AS DOUBLE) * CAST({tf_num} AS DOUBLE))"
        f" / (CAST({idf_den} AS DOUBLE) * CAST({tf_den} AS DOUBLE)))"
    )


def _fold_scores(n_terms: int, exact: bool) -> str:
    """Fixed left-to-right sum of the per-term doubles (FP addition is not
    associative; explicit parens pin the order on both engines)."""
    expr = _term_score(0, exact)
    for i in range(1, n_terms):
        expr = f"({expr} + {_term_score(i, exact)})"
    return expr


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = BM25_K,
    exact: bool = True,
) -> DataFrame:
    """Top-k documents by BM25 relevance to the literal query `terms`.

    Returns (id_col, score double, rnk bigint) — rnk 1..k, ties broken by
    id. Plan shape: one narrow pass computing (dl, tf_t...) per doc, a
    single-row stats fold broadcast back (1-row crossJoin — bounded BNLJ),
    the score projection, and `scale.salted_topk` for the global top-k
    (never a one-reducer global window)."""
    toks = P.tokens(text_col)["spark"]
    base = spread_small_input(
        df.select(
            F.col(id_col),
            F.expr(f"CAST(size({toks}) AS BIGINT)").alias("dl"),
            *[
                F.expr(_tf_expr(toks, t, "spark")).alias(f"tf{i}")
                for i, t in enumerate(terms)
            ],
        ),
        F.col(id_col),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot_toks"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = (
        base.crossJoin(F.broadcast(stats))
        .withColumn("score", F.expr(_fold_scores(len(terms), exact)))
        .select(id_col, "score")
    )
    return salted_topk(
        scored,
        order_cols=[F.col("score").desc(), F.col(id_col)],
        rank_name="rnk",
        k=k,
        salt_col=id_col,
    )


def bm25_oracle_sql(
    source: str,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = BM25_K,
) -> str:
    """DuckDB twin of `bm25_topk` (exact arm) — same token split, same
    int64 rationals, same fold order, one-level window (oracle side only)."""
    toks = P.tokens(text_col)["duck"]
    tf_cols = ",\n               ".join(
        f"{_tf_expr(toks, t, 'duck')} AS tf{i}" for i, t in enumerate(terms)
    )
    df_cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    return f"""
    WITH base AS (
        SELECT {id_col},
               CAST(len({toks}) AS BIGINT) AS dl,
               {tf_cols}
        FROM {source}
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS tot_toks,
               {df_cols}
        FROM base
    ),
    scored AS (
        SELECT {id_col}, {_fold_scores(len(terms), exact=True)} AS score
        FROM base, stats
    )
    SELECT {id_col}, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, {id_col}) AS BIGINT) AS rnk
    FROM scored
    QUALIFY rnk <= {int(k)}
    """
