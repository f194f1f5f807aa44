"""One-command corpus health report — the operational front door to the
curation operators: profile, duplication, boilerplate, and embedding
stats for a captured corpus, as ONE JSON line (machine-readable, same
spirit as bench.py).

Usage:
    python tools/corpus_report.py [corpus_dir] [phi] [top_n]

corpus_dir defaults to $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01 and
must hold documents.parquet (embeddings.parquet is optional). `phi`
(default 0.02) is the heavy-hitter frequency threshold; `top_n` caps the
reported boilerplate tokens.

Every number comes from the same operators the oracle-gated queries run:
  * corpus size / token profile — one narrow aggregate pass,
  * verbatim-duplicate ratio — xxhash64 text fingerprint distinct
    (HLL partials; the signal `minhash_lsh_pairs(dup_ratio=)` wants,
    so one report pays for every later LSH invocation's probe),
  * boilerplate tokens — `sketch.heavy_hitters_exact` (two-pass
    Misra-Gries candidate/verify; exact counts),
  * per-language doc counts — plain aggregation,
  * Gopher rule-bundle pass rate + per-rule failure counts — the
    zero-shuffle quality map (`text.with_gopher_quality`); corpora
    without newline structure naturally fail line rules trivially, so
    the report shows per-signal failures, not just the verdict,
  * BPE compressibility — train `bpe_merges` merges on the corpus
    itself and report pieces-per-word (tokens-per-word under a
    corpus-fit vocabulary: a direct proxy for how expensive this text
    is to train on),
  * embedding health — row count, dim count, NULL-vector count.

Scale shape: six bounded-output passes over documents plus one over
embeddings; nothing is collected that isn't aggregate- or vocab-sized.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_pq_cdc_spark.functions import portable as P  # noqa: E402
from go_pq_cdc_spark.operators.sketch import heavy_hitters_exact  # noqa: E402
from go_pq_cdc_spark.operators.text import GOPHER_RULES, with_gopher_quality  # noqa: E402
from go_pq_cdc_spark.operators.tokenizer import (  # noqa: E402
    bpe_token_counts,
    train_bpe_from_corpus,
)
from go_pq_cdc_spark.session import get_spark  # noqa: E402


def corpus_report(
    spark, corpus_dir: str, phi: float = 0.02, top_n: int = 20, bpe_merges: int = 256
) -> dict:
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    ntok = F.expr(P.n_tokens("text")["spark"]).cast("long")

    prof = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(ntok).cast("long").alias("total_tokens"),
        F.min(ntok).cast("long").alias("min_tokens"),
        F.max(ntok).cast("long").alias("max_tokens"),
        F.count_distinct(F.xxhash64(F.col("text"))).alias("distinct_texts"),
        F.sum(F.when(F.col("text").isNull() | (F.trim("text") == ""), 1).otherwise(0))
        .cast("long")
        .alias("empty_docs"),
    ).collect()[0]
    n = prof["n_docs"]

    langs = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    } if "lang" in docs.columns else {}

    toks = docs.select(F.explode(F.expr(P.tokens("text")["spark"])).alias("token"))
    hot = sorted(
        (
            (r["token"], r["cnt"], r["freq"])
            for r in heavy_hitters_exact(toks, "token", phi=phi).collect()
        ),
        key=lambda t: (-t[1], t[0]),
    )[:top_n]

    report = {
        "corpus_dir": corpus_dir,
        "n_docs": n,
        "empty_docs": prof["empty_docs"],
        "total_tokens": prof["total_tokens"],
        "mean_tokens": (prof["total_tokens"] / n) if n else 0.0,
        "min_tokens": prof["min_tokens"],
        "max_tokens": prof["max_tokens"],
        "distinct_texts": prof["distinct_texts"],
        # the dup_ratio hint minhash_lsh_pairs() accepts
        "verbatim_dup_ratio": (1.0 - prof["distinct_texts"] / n) if n else 0.0,
        "langs": langs,
        "heavy_hitter_phi": phi,
        "heavy_hitters": [
            {"token": t, "cnt": c, "freq": f} for t, c, f in hot
        ],
    }

    g = with_gopher_quality(docs.select("doc_id", "text"))
    r = GOPHER_RULES
    fails = {
        "word_count": (F.col("n_words") < r["min_words"])
        | (F.col("n_words") > r["max_words"]),
        "mean_word_len": (F.col("mean_word_len") < r["min_mean_word_len"])
        | (F.col("mean_word_len") > r["max_mean_word_len"]),
        "symbol_ratio": F.col("symbol_ratio") >= r["max_symbol_ratio"],
        "bullet_ratio": F.col("bullet_ratio") >= r["max_bullet_ratio"],
        "ellipsis_ratio": F.col("ellipsis_ratio") >= r["max_ellipsis_ratio"],
        "alpha_ratio": F.col("alpha_ratio") <= r["min_alpha_ratio"],
        "stop_hits": F.col("stop_hits") < r["min_stop_hits"],
    }
    gq = g.agg(
        F.sum("keep").cast("long").alias("kept"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
            for name, cond in fails.items()
        ],
    ).collect()[0]
    report["gopher_quality"] = {
        "keep_rate": (gq["kept"] / n) if n else 0.0,
        "rule_failures": {name: gq[name] for name in fails},
    }

    if bpe_merges > 0 and n:
        merges = train_bpe_from_corpus(docs, bpe_merges)
        bc = bpe_token_counts(docs, merges).agg(
            F.sum("n_words").cast("long").alias("w"),
            F.sum("n_bpe_tokens").cast("long").alias("p"),
        ).collect()[0]
        report["bpe"] = {
            "merges": len(merges),
            "pieces_per_word": (bc["p"] / bc["w"]) if bc["w"] else 0.0,
        }

    emb_path = os.path.join(corpus_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        emb = spark.read.parquet(emb_path)
        vec = "embedding" if "embedding" in emb.columns else None
        if vec:
            es = emb.agg(
                F.count(F.lit(1)).cast("long").alias("n_vecs"),
                F.max(F.size(vec)).cast("long").alias("dims"),
                F.sum(F.when(F.col(vec).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("null_vecs"),
            ).collect()[0]
            report["embeddings"] = {
                "n_vecs": es["n_vecs"],
                "dims": es["dims"],
                "null_vecs": es["null_vecs"],
            }
    return report


def main(argv: list[str]) -> None:
    corpus_dir = argv[1] if len(argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    phi = float(argv[2]) if len(argv) > 2 else 0.02
    top_n = int(argv[3]) if len(argv) > 3 else 20
    bpe_merges = int(argv[4]) if len(argv) > 4 else 256
    spark = get_spark("corpus-report")
    print(json.dumps(corpus_report(spark, corpus_dir, phi, top_n, bpe_merges)))


if __name__ == "__main__":
    main(sys.argv)
