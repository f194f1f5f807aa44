"""Text-analysis operators for training-data pipelines: token stats,
quality signals, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (whole-stage codegen; no Python UDFs):
embarrassingly parallel per-row maps — at 100 TB these scale linearly with
no shuffle at all until the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import portable as P

# Priority-ordered stopword sets for the language-ID heuristic. The CASE
# chain below resolves ties by this order (deterministic, oracle-matchable).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "y"),
    "fr": ("le", "les", "des", "est", "et"),
    "zh": ("de", "shi", "le", "zai", "he"),
}


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, alpha char count, avg token length, stopword ratio.
    Tokens materialized once per row (split is the expensive part)."""
    tok = P.tokens(text_col)["spark"]
    stop = LANG_STOPWORDS["en"]
    stop_list = ", ".join(f"'{w}'" for w in stop)
    return (
        df.withColumn("_toks", F.expr(tok))
        .withColumn("n_tokens", F.expr("size(_toks)").cast("long"))
        .withColumn(
            "n_alpha",
            F.expr(f"length(replace(trim({text_col}), ' ', ''))").cast("long"),
        )
        .withColumn(
            "avg_token_len",
            F.expr("CAST(n_alpha AS DOUBLE) / n_tokens"),
        )
        .withColumn(
            "stop_ratio",
            F.expr(
                f"CAST(size(filter(_toks, x -> x IN ({stop_list}))) AS DOUBLE) / size(_toks)"
            ),
        )
        .drop("_toks")
    )


def stop_count_fragments(text_col: str, words: tuple[str, ...]) -> dict[str, str]:
    tok = P.tokens(text_col)
    lst = ", ".join(f"'{w}'" for w in words)
    return {
        "spark": f"size(filter({tok['spark']}, x -> x IN ({lst})))",
        "duck": f"len(list_filter({tok['duck']}, x -> x IN ({lst})))",
    }


def lang_id_fragments(text_col: str = "text") -> dict[str, str]:
    """Argmax-by-stopword-hits language classifier as a single CASE chain,
    tie-broken by LANG_STOPWORDS order — emitted for both engines from one
    builder so the oracle can't drift."""
    out = {}
    for engine in ("spark", "duck"):
        hit = {
            lang: stop_count_fragments(text_col, words)[engine]
            for lang, words in LANG_STOPWORDS.items()
        }
        langs = list(LANG_STOPWORDS)
        case = "CASE "
        for i, lang in enumerate(langs):
            geq = " AND ".join(f"{hit[lang]} >= {hit[o]}" for o in langs[i + 1 :])
            case += f"WHEN {geq or 'TRUE'} THEN '{lang}' "
        case += "END"
        out[engine] = case
    return out


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic: hit count per language's
    stopword set, argmax with deterministic priority-order tie-break."""
    return df.withColumn("pred_lang", F.expr(lang_id_fragments(text_col)["spark"]))


def with_fingerprint(
    df: DataFrame, text_col: str = "text", prefix_len: int = 64, *, portable: bool = True
) -> DataFrame:
    """Rolling polynomial fingerprint of the document prefix. With
    portable=False uses xxhash64 (cheaper, production path)."""
    prefix = f"substr({text_col}, 1, {prefix_len})"
    if portable:
        expr = P.poly_hash({"spark": prefix, "duck": prefix})["spark"]
    else:
        expr = f"xxhash64({prefix})"
    return df.withColumn("fingerprint", F.expr(expr))


def repetition_fragments(text_col: str = "text", n: int = 3) -> dict[str, str]:
    """Internal n-gram repetition ratio — the Gopher/MassiveText-style
    quality signal: 1 - distinct_ngrams/total_ngrams, 0.0 for docs too
    short to shingle. Highly repetitive (template/boilerplate) docs score
    near 1. Pure expression in both dialects; the division is exact-int ->
    IEEE double, so Spark and DuckDB print identical values."""
    tok = P.tokens(text_col)
    sh = P.token_shingles(tok, n)
    return {
        "spark": (
            f"CASE WHEN size({tok['spark']}) < {n} THEN CAST(0.0 AS DOUBLE) "
            f"ELSE 1.0 - CAST(size(array_distinct({sh['spark']})) AS DOUBLE)"
            f" / size({sh['spark']}) END"
        ),
        "duck": (
            f"CASE WHEN len({tok['duck']}) < {n} THEN CAST(0.0 AS DOUBLE) "
            f"ELSE 1.0 - CAST(len(list_distinct({sh['duck']})) AS DOUBLE)"
            f" / len({sh['duck']}) END"
        ),
    }


def with_repetition_ratio(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Spark-side evaluation materializes tokens and shingles to columns
    first (CollapseProject keeps multiply-referenced non-cheap aliases in
    their own projection), so the text is split once per row — the inline
    `repetition_fragments` spelling would re-split per array element."""
    tok = P.tokens(text_col)["spark"]
    shc = P.token_shingles_col("_rtoks", n)["spark"]
    return (
        df.withColumn("_rtoks", F.expr(tok))
        .withColumn("_rsh", F.expr(shc))  # fragment is total: [] when short
        .withColumn(
            "repetition_ratio",
            F.expr(
                "CASE WHEN size(_rsh) = 0 THEN CAST(0.0 AS DOUBLE) "
                "ELSE 1.0 - CAST(size(array_distinct(_rsh)) AS DOUBLE)"
                " / size(_rsh) END"
            ),
        )
        .drop("_rtoks", "_rsh")
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty — the curation signal dedup misses:
    what share of a doc's DISTINCT n-token shingles appears nowhere
    earlier in the corpus (id order)? 1.0 = entirely fresh content,
    ~0.0 = restatement of earlier documents (template spam, syndicated
    copies that are not near-dups of any ONE doc). Docs shorter than n
    tokens carry no shingles and are absent from the output.

    Scale shape: explode distinct shingle hashes (the MinHash input set,
    `P.shingle_hashes`), first-occurrence via a PARTIAL-AGGREGABLE
    `groupBy(sh).agg(min(id))` — never `MIN(id) OVER (PARTITION BY sh)`.
    Shingle frequency follows the corpus: a boilerplate shingle present
    in a large fraction of a crawl would funnel its entire partition
    through ONE WindowExec task that AQE cannot split, whereas map-side
    combine collapses each task's hot shingle to one row before the
    shuffle. No row-level join-back either: a doc's novel count is just
    how many shingles list it as their MIN — `firsts.groupBy(id)` — so
    the only join is between two DOC-sized aggregates (n_shingles LEFT
    n_novel, absent docs = 0), never against the exploded pair stream.
    (A shuffle-free `size(shingles)` spelling of n_shingles was tried
    and measured 5x SLOWER at sf0.1 — the scalar array expression leaves
    the codegen fast path the Generate-based explode stays on; the
    per-doc groupBy's shuffle is id-keyed and map-side-combined, so it
    costs little and wins.) tests/test_plan_lint.py bans the raw-key
    window shape registry-wide.

    Output: (id, n_shingles, n_novel, novelty)."""
    from .scale import spread_small_input

    # Per-task work (optimization r13, guide §4.1/§1.2-2): the inline
    # `P.shingle_hashes(text)` fragment re-evaluates split() inside the
    # shingle lambda — O(tokens²) regex splits per document in Spark's
    # interpreted HOF evaluation (the exact trap token_shingles_col's
    # docstring names) — and explode() additionally makes
    # InferFiltersFromGenerate evaluate the WHOLE shingle+md5 chain two
    # more times per doc inside the inferred `size(..)>0 AND
    # isnotnull(..)` filter. Materialize tokens once, shingle over the
    # array, and pre-filter on the CHEAP equivalent predicate
    # (text IS NOT NULL AND size(tokens) >= n — exactly the docs whose
    # shingle set is empty, by token_shingles_col's CASE) so
    # explode_outer never sees an empty/null array and infers nothing.
    # Values, row set, and the DuckDB oracle are unchanged.
    tok = P.tokens(text_col)["spark"]
    shc = P.token_shingles_col("_toks", n)["spark"]
    h = P.md5_hash_m31("sh")["spark"]
    # the per-shingle md5 is the expensive part — spread a narrow local
    # input across cores before it runs (structural no-op at scale,
    # where the scan already has thousands of splits); without this a
    # one-file table evaluates ~tokens-per-corpus md5 calls in ONE task.
    # shingle hashes are array_distinct per doc, so (id, sh) pairs are
    # already distinct — counting them per doc counts distinct shingles.
    # Optimization r13 (second pass): the former text-null + size(_toks)
    # pre-filters were pushed to the scan, where each re-evaluated
    # split() per row (and any derived text expression in full). Both
    # are replaced by ONE cheap post-explode `sh IS NOT NULL` filter:
    # a null text propagates to a null _sh, and a (< n)-token doc's
    # shingle CASE yields an empty array — explode_outer turns both
    # into exactly one (id, NULL) row, and real shingle hashes are
    # never null, so the kept row set is identical (the md5 chain still
    # runs only on docs that shingle — empty/null arrays transform to
    # nothing). A generated column can't sink below its Generate, so no
    # scan-side re-evaluation remains.
    exploded = (
        spread_small_input(df.select(id_col, text_col), F.col(id_col))
        .withColumn("_toks", F.expr(tok))
        .withColumn(
            "_sh", F.expr(f"array_distinct(transform({shc}, sh -> {h}))")
        )
        .select(F.col(id_col), F.explode_outer("_sh").alias("sh"))
        .filter(F.col("sh").isNotNull())
    )
    per_doc = exploded.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    novel = (
        exploded.groupBy("sh")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    return (
        per_doc.join(novel, id_col, "left")
        .withColumn("n_novel", F.coalesce(F.col("n_novel"), F.lit(0)).cast("long"))
        .withColumn(
            "novelty",
            F.col("n_novel").cast("double") / F.col("n_shingles"),
        )
    )


def token_rarity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc token-rarity score — the log-free stand-in for unigram-LM
    perplexity quality scoring (rare-token-heavy docs score high; listy
    stopword-free spam scores low is NOT true here — this is a RARITY
    signal, combine with `with_gopher_quality` for quality gating):
    each token contributes the INTEGER ratio N div cnt(token) (corpus
    token total over the token's corpus count), summed per doc; the mean
    divides once at the end. Everything before that division is int64
    arithmetic — order-independent, engine-exact — the same reason BM25
    here is log-free (libm log is not correctly rounded and diverges
    across engines by ulps).

    Scale shape: one narrow SUM(size(tokens)) agg for the corpus total
    (scalar to the driver, no explode), then a per-(doc, token)
    partial-aggregated collapse of the occurrence stream, vocab counts
    derived FROM that collapse (second partial agg), and a token-keyed
    join-back — never `COUNT() OVER (PARTITION BY token)`. Token
    frequency is Zipfian: at web scale one stopword is percents of the
    whole occurrence stream, and a raw-token WindowExec funnels all of
    it through ONE task AQE cannot split. Map-side combine collapses
    each task's hot token before both shuffles here, and the join-back
    probe side is (doc, token)-distinct rows — AQE skew-split territory.
    tests/test_plan_lint.py bans the raw-key window shape registry-wide.

    Output: (id, n_tok, rarity_sum, mean_rarity)."""
    from .scale import spread_small_input

    tok = P.tokens(text_col)
    # spread a narrow local input before the tokenize+explode (see
    # ngram_novelty; structural no-op on a wide at-scale scan). The
    # spread is KEYED by the doc id (optimization r13, guide §2.4): a
    # hash partitioning on `id` satisfies the clustering every
    # downstream id-subset aggregation needs (groupBy(id, token),
    # groupBy(id)), so those reuse this exchange instead of planning
    # their own — measured 11 -> 8 jobs / ~-0.4 s on the sf0.1 rarity
    # rows, identical results (id is high-cardinality, so the keyed
    # spread is as even as round-robin).
    #
    # Optimization r13 (guide §1.2-1, §4.4-class): two per-task-work and
    # one job-count fix, all value-identical —
    #  * text IS NOT NULL pre-filter + explode_outer: the plain explode
    #    made InferFiltersFromGenerate evaluate the tokenizer two extra
    #    times per row inside the inferred `size(split(..))>0 AND
    #    isnotnull(split(..))` scan filter (on the skew canary that
    #    filter also rebuilt the concat/repeat hot-token string twice).
    #    split() of a non-null text is never null and never empty
    #    (split("", '\\s+') = ['']), so the cheap null test keeps the
    #    row set identical and the outer explode infers no filter.
    #  * the corpus token total no longer runs as its OWN collect() job
    #    (a second full scan+tokenize per invocation): it is the sum of
    #    the vocab counts, folded into the SAME plan as a one-row
    #    aggregate broadcast-crossJoined back; AQE exchange reuse
    #    evaluates the shared doc_tok/vocab subtrees once.
    base = (
        spread_small_input(df.select(id_col, text_col), F.col(id_col))
        .withColumn("_toks", F.expr(tok["spark"]))
    )
    # Null-text docs are dropped AFTER the explode by a cheap
    # `token IS NOT NULL` filter on the generated column (optimization
    # r13, second pass): the former `text IS NOT NULL` pre-filter was
    # pushed to the scan as isnotnull(<the full text expression>) — on a
    # derived text column (the skew canary's concat/repeat injection)
    # that re-built the ENTIRE derived string once in the Filter and
    # again in the Project, doubling the dominant per-row cost. A null
    # text tokenizes to a null array, explode_outer emits exactly one
    # (id, NULL) row for it, and split() never yields null elements for
    # non-null text — so this filter keeps the row set identical while
    # costing one null-check per row. It must stay explicit: without it
    # the NULL token would form a vocab group and shift the corpus
    # total. (A generated column can't be pushed below its Generate, so
    # the scan filter is gone for good.)
    doc_tok = (
        base.select(F.col(id_col), F.explode_outer("_toks").alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("long").alias("_occ"))
    )
    vocab = doc_tok.groupBy("token").agg(F.sum("_occ").alias("_cnt"))
    # n_total = sum over vocab counts == sum of size(tokens) over docs
    total = vocab.agg(F.sum("_cnt").cast("long").alias("_nt"))
    return (
        doc_tok.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .withColumn("_r", F.expr("(_nt div _cnt) * _occ"))
        .groupBy(id_col)
        .agg(
            F.sum("_occ").cast("long").alias("n_tok"),
            F.sum("_r").cast("long").alias("rarity_sum"),
        )
        .withColumn(
            "mean_rarity",
            F.col("rarity_sum").cast("double") / F.col("n_tok"),
        )
    )


def _doc_token_counts(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Shared per-(doc, token) occurrence collapse for the quality
    scorers (diversity, keywords; rarity keeps its own variant because
    it also needs the pre-explode token arrays for the corpus total):
    spread a narrow local input, tokenize + explode, partial-aggregated
    count — keys carry the doc id, so a corpus-hot token spreads like
    the docs themselves. One definition so a tokenizer or Zipf-safety
    change cannot fork the signals (review find).

    Null-text docs are dropped by a cheap POST-EXPLODE `token IS NOT
    NULL` filter and the explode is the outer variant (optimization
    r13, see token_rarity): a plain explode makes
    InferFiltersFromGenerate re-evaluate the tokenizer twice more per
    row in its inferred filter, and a text-side pre-filter is pushed to
    the scan where it re-evaluates any DERIVED text expression; split()
    of a non-null string never yields null elements and a null text
    explodes to one (id, NULL) row, so the row set is identical.
    Output: (id, token, _occ long)."""
    from .scale import spread_small_input

    tok = P.tokens(text_col)
    return (
        spread_small_input(df.select(id_col, text_col), F.col(id_col))
        .select(F.col(id_col), F.explode_outer(F.expr(tok["spark"])).alias("token"))
        # cheap post-explode null filter instead of a text pre-filter —
        # see token_rarity: the pre-filter re-evaluated derived text
        # expressions at the scan; a null text explodes to exactly one
        # (id, NULL) row, so the row set is identical
        .filter(F.col("token").isNotNull())
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("long").alias("_occ"))
    )


def token_diversity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc lexical diversity via the Simpson/Gini index — the
    probability that two tokens drawn (with replacement) from the doc
    DIFFER: simpson = (n^2 - sum_t cnt_t^2) / n^2. Keyword-stuffed and
    single-phrase-repetition spam scores near 0; natural prose sits
    high. The type-token ratio (n_distinct / n) rides along as the
    classic cheap companion signal.

    Exactness: everything before the division is int64 (sum cnt^2 <=
    n^2, and n^2 stays far inside 2^53 for any real document, so the
    final cast to double is itself exact); each score is then ONE
    correctly-rounded division — order-independent and engine-exact,
    where an entropy-based diversity (the Shannon spelling) would hang
    on libm log ulps (the BM25/rarity stance).

    Scale shape: stronger than rarity's Zipf-safety — there is no
    corpus-global key AT ALL. Both groupBys carry the doc id ((doc,
    token), then (doc)), so a corpus-hot stopword cannot concentrate on
    any task: its occurrences are spread across the doc-keyed
    partitions exactly like the docs themselves, and map-side combine
    collapses within-doc repeats before the only shuffle.

    Output: (id, n_tok, n_distinct, simpson, ttr)."""
    doc_tok = _doc_token_counts(df, id_col, text_col)
    per_doc = doc_tok.groupBy(id_col).agg(
        F.sum("_occ").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.expr("_occ * _occ")).cast("long").alias("_s2"),
    )
    return per_doc.select(
        id_col,
        "n_tok",
        "n_distinct",
        (
            (F.col("n_tok") * F.col("n_tok") - F.col("_s2")).cast("double")
            / (F.col("n_tok") * F.col("n_tok")).cast("double")
        ).alias("simpson"),
        (F.col("n_distinct").cast("double") / F.col("n_tok")).alias("ttr"),
    )


def doc_keywords(
    df: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc keyword extraction: top-k tokens by the LOG-FREE tf-idf
    score occ x (n_docs div df) — term frequency times the integer
    rarity weight (total docs over the token's document frequency), the
    same rational-instead-of-log stance as BM25/rarity so every score
    is int64-exact and engine-identical. Corpus-wide stopwords weigh 1
    (n_docs div df = 1) and only surface in pathological docs; rare
    terms dominate — the standard keyword/tag-extraction signal.

    Scale shape: document frequency via the partial-aggregable
    `groupBy(token)` over (doc, token)-DISTINCT rows (map-side combine
    collapses hot tokens; the join-back probe side is AQE-skew-split
    territory — token_rarity's exact shape). The final top-k window
    partitions by DOC ID, never a raw token: partition size = the
    doc's distinct-token count, bounded by document length — not by
    corpus Zipf. n_docs rides the plan as a broadcast one-row aggregate
    (optimization r13: the former plan-time `df.count()` was a separate
    full-scan JOB per invocation — token_rarity's corpus-total treatment
    applied here; value and oracle unchanged). Ties break on token order
    so the result is total-deterministic.

    Output: (id, rk, token, score) — top_k rows per doc."""
    doc_tok = _doc_token_counts(df, id_col, text_col)
    nd = df.agg(F.count(F.lit(1)).cast("long").alias("_ndocs"))
    dfreq = doc_tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    scored = (
        doc_tok.join(dfreq, "token")
        .crossJoin(F.broadcast(nd))
        .withColumn("score", F.expr("_occ * (_ndocs div _df)"))
        .drop("_ndocs")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(id_col, F.col("rk").cast("long").alias("rk"), "token",
                F.col("score").cast("long").alias("score"))
    )


def typo_pairs(
    df: DataFrame,
    min_len: int = 4,
    max_dist: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary typo/spelling-variant pairs at edit distance <=
    `max_dist` (1 or 2) via the SymSpell deletion-neighborhood join
    (Garbe's public algorithm) — the corpus-normalization signal (map
    the rare variant onto the frequent canonical spelling) found
    WITHOUT an all-pairs scan.

    Theorem (the SymSpell blocking guarantee): if lev(a, b) <= d, an
    optimal alignment deletes <= d chars from each side down to a
    common string, so del<=d(a) ∪ {a} and del<=d(b) ∪ {b} intersect.
    Candidates therefore come from an EQUI-JOIN on the
    (token-or-deletion-variant) key, and the exact `levenshtein`
    verify — an integer function both engines evaluate bit-for-bit —
    kills the false candidates the block admits (e.g. two deletions at
    unrelated positions). No false negatives by the theorem; no false
    positives by the verify.

    Scale shape: the vocabulary is (token)-DISTINCT first (map-side
    combine collapses the Zipf head before anything else — a stopword
    is ONE vocab row no matter how hot), the key relation is
    vocab x O(len²/2) narrow DISTINCT rows, the self-join is an
    equi-join on the key (AQE skew-split territory; `min_len` is what
    keeps short-key deletion buckets from degenerating — production
    SymSpell additionally truncates to a key prefix, same knob), and
    corpus counts join back token-keyed. Output:
    (tok_a, tok_b, dist, cnt_a, cnt_b) with tok_a < tok_b."""
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")
    doc_tok = _doc_token_counts(df, id_col, text_col)
    cnt = doc_tok.groupBy("token").agg(F.sum("_occ").cast("long").alias("cnt"))
    vocab = cnt.filter(F.length("token") >= min_len)
    del_at = (
        "concat(substring({s}, 1, i - 1), "
        "substring({s}, i + 1, length({s})))"
    )
    d1 = vocab.select(
        "token",
        F.explode(F.expr("sequence(1, length(token))")).alias("i"),
    ).select("token", F.expr(del_at.format(s="token")).alias("key"))
    keys = vocab.select("token", F.col("token").alias("key")).unionByName(d1)
    if max_dist == 2:
        d2 = d1.filter(F.length("key") >= 1).select(
            "token",
            F.col("key").alias("base"),
            F.explode(F.expr("sequence(1, greatest(length(key), 1))")).alias("i"),
        ).select("token", F.expr(del_at.format(s="base")).alias("key"))
        keys = keys.unionByName(d2)
    keys = keys.distinct()
    a = keys.select(F.col("token").alias("tok_a"), "key")
    b = keys.select(F.col("token").alias("tok_b"), "key")
    cand = (
        a.join(b, "key")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
        .distinct()
        .withColumn("dist", F.expr("levenshtein(tok_a, tok_b)").cast("long"))
        .filter(F.col("dist") <= max_dist)
    )
    return (
        cand.join(cnt.select(F.col("token").alias("tok_a"), F.col("cnt").alias("cnt_a")), "tok_a")
        .join(cnt.select(F.col("token").alias("tok_b"), F.col("cnt").alias("cnt_b")), "tok_b")
        .select("tok_a", "tok_b", "dist", "cnt_a", "cnt_b")
    )


def token_hashes_fragments(text_col: str = "text") -> dict[str, str]:
    """md5-derived hash per whitespace token — shared by SimHash and tests."""
    tok = P.tokens(text_col)
    h = P.md5_hash_m31("sh")
    return {
        "spark": f"transform({tok['spark']}, sh -> {h['spark']})",
        "duck": f"[{h['duck']} FOR sh IN {tok['duck']}]",
    }


def with_simhash(df: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash over token polynomial hashes — near-duplicate fingerprint
    where small text edits flip few bits. Token hashes are materialized to
    a column first so the per-bit vote doesn't re-hash the text."""
    tok = P.tokens(text_col)["spark"]
    h = P.md5_hash_m31("sh")["spark"]
    df = df.withColumn("_toks", F.expr(tok)).withColumn(
        "_th", F.expr(f"transform(_toks, sh -> {h})")
    )
    sim = P.simhash({"spark": "_th", "duck": "_th"}, bits)["spark"]
    return df.withColumn("simhash", F.expr(sim)).drop("_th", "_toks")


# PII scrubbing — the redaction pass a training-data pipeline runs before
# anything else sees the text. Patterns are written in the common subset of
# Java regex (Spark) and RE2 (DuckDB oracle): no lookaround, no backrefs.
# Order matters: emails first (an address can embed an IP-looking host),
# then bare IPv4s, then international phones (anchored on '+', so they
# can't eat SSN-style ids), then SSN-style ids.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
    ("id", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
)


def with_pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Redact PII in place (chained JVM-side regexp_replace — one narrow
    projection, no UDF, no shuffle; at 100 TB this is a pure map over the
    scan) and count each category pre-scrub (`n_<name>` columns)."""
    # Python-API construction (not F.expr): SQL string literals would
    # re-process the regex backslashes (\b, \.) as escape sequences.
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return df.select("*", *counts, clean.alias(out_col))


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """C4-style LINE-level dedup: a sentence appearing in >= `min_docs`
    DISTINCT documents is boilerplate (nav chrome, cookie banners,
    subscribe prompts) and is removed from every document — the standard
    intra-corpus cleanup that document-level MinHash cannot do (the
    documents are not near-dups; they just share furniture).

    Plan: sentence-split with position (posexplode), count distinct docs
    per line (one shuffle on the line), flag lines at the threshold, and
    reassemble each doc's surviving sentences in order
    (collect_list(struct(pos, line)) + array_sort — pos is unique per
    doc, so the sort is deterministic). At 100 TB the boilerplate set is
    the interesting scale question: it is small by definition (lines
    REPEATED across documents), so the flag join broadcasts; the heavy
    side only shuffles on (doc) for reassembly. Returns
    (id, n_lines, n_kept, clean_text)."""
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), r"\.\s+")).alias("pos", "line"),
        )
        .withColumn("line", F.trim("line"))
        .filter(F.length("line") > 0)
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("line", F.lit(True).alias("is_b"))
    )
    marked = lines.join(F.broadcast(boiler), "line", "left")
    kept_struct = F.when(
        F.col("is_b").isNull(), F.struct(F.col("pos"), F.col("line"))
    )
    return (
        marked.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.count(kept_struct).cast("long").alias("n_kept"),
            F.array_join(
                F.expr(
                    "transform(array_sort(filter(collect_list("
                    "CASE WHEN is_b IS NULL THEN struct(pos, line) END"
                    "), x -> x IS NOT NULL)), x -> x.line)"
                ),
                ". ",
            ).alias("clean_text"),
        )
        .select("id", "n_lines", "n_kept", "clean_text")
    )


# URL canonicalization — web-corpus dedup's first key: most crawl dumps
# carry the same page under scheme/case/port/tracking-param/fragment
# variants, and URL-level dedup removes them for the cost of one narrow
# map + one groupBy (vs MinHash's shingle hashing). Written in the common
# Java-regex/RE2 subset like PII_PATTERNS; the whole normalization is a
# pure Catalyst projection (no UDF, no shuffle).
URL_PARTS_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]+)([^?#]*)(\?[^#]*)?(#.*)?$"
URL_HOST_RE = r"^(\[[^\]]*\]|[^:]+)"  # bracketed IPv6 literal or up-to-colon
URL_TRACKING_RE = r"^(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|ref_src)="


def with_url_normalized(
    df: DataFrame, url_col: str = "url", out_col: str = "norm_url"
) -> DataFrame:
    """Canonicalize a URL column: lowercase scheme+host, strip a leading
    `www.`, drop default ports (http:80 / https:443), strip trailing
    slashes from the path, drop the fragment, remove tracking query params
    (utm_* / fbclid / gclid / ...) and SORT the survivors so param order
    never splits a group. Non-URL strings fall back to lower(trim(s)).
    Idempotent: normalizing a normalized URL is the identity.

    Built with the Python Column API (not F.expr) so regex backslashes
    reach Java unprocessed — same rule as `with_pii_scrub`."""
    u = F.trim(F.col(url_col))
    scheme = F.lower(F.regexp_extract(u, URL_PARTS_RE, 1))
    hostport = F.lower(F.regexp_extract(u, URL_PARTS_RE, 2))
    path = F.regexp_extract(u, URL_PARTS_RE, 3)
    rawq = F.regexp_extract(u, URL_PARTS_RE, 4)
    # authority split: a bracketed IPv6 literal is ONE host token (its
    # colons are not port separators); anything after the host that is
    # not a well-formed ':digits' port is preserved VERBATIM — silently
    # dropping it would merge distinct origins (r6 review finding)
    host = F.regexp_replace(
        F.regexp_extract(hostport, URL_HOST_RE, 1), r"^www\.", ""
    )
    rest = F.regexp_replace(hostport, URL_HOST_RE, "")
    port = F.regexp_extract(rest, r"^:([0-9]+)$", 1)
    portpart = (
        F.when(rest == "", F.lit(""))
        .when(
            ~rest.rlike(r"^:[0-9]+$"), rest  # malformed authority tail: keep
        )
        .when(
            ((scheme == "http") & (port == "80"))
            | ((scheme == "https") & (port == "443")),
            F.lit(""),
        )
        .otherwise(F.concat(F.lit(":"), port))
    )
    cpath = F.regexp_replace(path, r"/+$", "")
    qstr = F.regexp_replace(rawq, r"^\?", "")
    params = F.filter(
        F.split(qstr, "&"),
        lambda p: (p != "") & ~p.rlike(URL_TRACKING_RE),
    )
    q = F.array_join(F.array_sort(params), "&")
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    norm = F.when(scheme == "", F.lower(u)).otherwise(
        F.concat(scheme, F.lit("://"), host, portpart, cpath, qpart)
    )
    return df.withColumn(out_col, norm)


def url_normalize_oracle(col: str) -> str:
    """DuckDB expression computing EXACTLY `with_url_normalized` (RE2 and
    Java regex agree on this pattern subset; both engines' string sort is
    binary). Subexpressions repeat — stage the input column in a CTE when
    row counts matter."""
    # DuckDB regexp_extract yields NULL (not '') for a non-participating
    # optional group — Spark yields ''. Coalesce every group.
    u = f"trim({col})"
    scheme = f"lower(coalesce(regexp_extract({u}, '{URL_PARTS_RE}', 1), ''))"
    hostport = f"lower(coalesce(regexp_extract({u}, '{URL_PARTS_RE}', 2), ''))"
    path = f"coalesce(regexp_extract({u}, '{URL_PARTS_RE}', 3), '')"
    rawq = f"coalesce(regexp_extract({u}, '{URL_PARTS_RE}', 4), '')"
    host = (
        f"regexp_replace(coalesce(regexp_extract({hostport}, '{URL_HOST_RE}', 1), ''), "
        f"'^www\\.', '')"
    )
    rest = f"regexp_replace({hostport}, '{URL_HOST_RE}', '')"
    port = f"coalesce(regexp_extract({rest}, '^:([0-9]+)$', 1), '')"
    portpart = (
        f"CASE WHEN {rest} = '' THEN '' "
        f"WHEN NOT regexp_matches({rest}, '^:[0-9]+$') THEN {rest} "
        f"WHEN ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') "
        f"THEN '' ELSE ':' || {port} END"
    )
    cpath = f"regexp_replace({path}, '/+$', '')"
    qstr = f"regexp_replace({rawq}, '^\\?', '')"
    params = (
        f"list_filter(string_split({qstr}, '&'), "
        f"p -> p != '' AND NOT regexp_matches(p, '{URL_TRACKING_RE}'))"
    )
    # array_to_string([]) is NULL in DuckDB; Spark's array_join gives ''
    q = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    qpart = f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END"
    return (
        f"CASE WHEN {scheme} = '' THEN lower({u}) "
        f"ELSE {scheme} || '://' || {host} || {portpart} || {cpath} || {qpart} END"
    )


# Text cleanup — the unicode-hygiene pass a web corpus needs before any
# token/shingle/hash operator sees it: crawl text is full of zero-width
# characters (which silently split tokens and change every hash), control
# bytes, typographic quotes/dashes, and whitespace runs. Pure chained
# regexp_replace/translate in the Java-regex/RE2 common subset (the
# \x{hhhh} class syntax both engines share) — a zero-shuffle map.
ZERO_WIDTH_RE = r"[\x{200B}\x{200C}\x{200D}\x{FEFF}]"
CTRL_RE = r"[\x{0000}-\x{0008}\x{000B}-\x{001F}\x{007F}]"  # keeps \n \t
_PUNCT_FROM = "’‘“”–—"  # ’ ‘ “ ” – —
_PUNCT_TO = "''\"\"--"


def with_text_cleanup(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Normalize a text column: drop zero-width chars, drop control chars
    (newline/tab survive), fold typographic quotes/dashes to ASCII,
    collapse space/tab runs to one space, collapse 3+ newlines to 2, and
    trim. Adds `n_chars_removed` (original minus cleaned length).
    Idempotent. Column-API construction — same backslash rule as
    `with_pii_scrub`."""
    c = F.regexp_replace(F.col(text_col), ZERO_WIDTH_RE, "")
    c = F.regexp_replace(c, CTRL_RE, "")
    c = F.translate(c, _PUNCT_FROM, _PUNCT_TO)
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    c = F.trim(c)
    return df.withColumn(out_col, c).withColumn(
        "n_chars_removed",
        (F.length(F.col(text_col)) - F.length(F.col(out_col))).cast("long"),
    )


def text_cleanup_oracle(col: str) -> str:
    """DuckDB expression computing EXACTLY `with_text_cleanup`'s cleaned
    text (RE2 'g' flag = Java replace-all). The from-set of the
    translate() is built with chr() so the oracle SQL stays ASCII."""
    pfrom = "||".join(f"chr({ord(ch)})" for ch in _PUNCT_FROM)
    pto = "chr(39)||chr(39)||'\"\"--'"
    c = f"regexp_replace({col}, '{ZERO_WIDTH_RE}', '', 'g')"
    c = f"regexp_replace({c}, '{CTRL_RE}', '', 'g')"
    c = f"translate({c}, {pfrom}, {pto})"
    c = f"regexp_replace({c}, '[ \\t]+', ' ', 'g')"
    c = f"regexp_replace({c}, '\\n{{3,}}', chr(10)||chr(10), 'g')"
    return f"trim({c})"


def bag_fingerprint_fragments(text_col: str = "text") -> dict[str, str]:
    """Permutation-invariant document fingerprint: md5 of the SORTED token
    multiset. Catches reordered duplicates (shuffled list items, moved
    paragraphs-of-one-line, template field reordering) that positional
    shingle MinHash scores as distant — the cheap companion pass between
    exact dedup and near-dup. Both engines sort strings in binary order,
    so the fingerprint is oracle-exact."""
    tok = P.tokens(text_col)
    return P.md5_hash(
        {
            "spark": f"array_join(array_sort({tok['spark']}), ' ')",
            "duck": f"array_to_string(list_sort({tok['duck']}), ' ')",
        }
    )


def with_bag_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the sorted-token-multiset fingerprint (pure expression, no
    shuffle)."""
    return df.withColumn(
        "bag_fp", F.expr(bag_fingerprint_fragments(text_col)["spark"])
    )


# Gopher quality rules (Rae et al. 2021, MassiveText §A.1.1) — the
# canonical pre-training document filter: hard thresholds over cheap
# per-document signals. Thresholds are the paper's published values.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_RULES: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_ratio": 0.9,
    "max_ellipsis_ratio": 0.3,
    "min_alpha_ratio": 0.8,
    "min_stop_hits": 2,
}


def gopher_signal_exprs(
    engine: str, toks: str, lines: str, text: str
) -> dict[str, str]:
    """The Gopher signal set as SQL fragments over pre-materialized token
    and line arrays — ONE builder for both engines (lang_id_fragments
    rule: the oracle cannot drift). Every ratio is one IEEE division of
    exact ints, so both engines print identical doubles."""
    if engine == "spark":
        size, filt, rx_all = "size", "filter", "regexp_extract_all({t}, '{p}', 0)"
        ell = "\\\\.\\\\.\\\\."
        arr = "array(" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + ")"
        contains = f"s -> array_contains({toks}, s)"
        alpha = "w -> w rlike '[A-Za-z]'"
        ws = "'\\\\s+'"
    else:
        size, filt, rx_all = "len", "list_filter", "regexp_extract_all({t}, '{p}')"
        ell = "\\.\\.\\."
        arr = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"
        contains = f"s -> list_contains({toks}, s)"
        alpha = "w -> regexp_matches(w, '[A-Za-z]')"
        ws = "'\\s+', '', 'g'"
    n_words = f"{size}({toks})"
    nonws = (
        f"length(regexp_replace({text}, {ws}))"
        if engine != "spark"
        else f"length(regexp_replace({text}, {ws}, ''))"
    )
    n_hash = f"(length({text}) - length(replace({text}, '#', '')))"
    n_ell = f"{size}({rx_all.format(t=text, p=ell)})"
    n_lines = f"{size}({lines})"
    bullets = f"{size}({filt}({lines}, l -> substring(l, 1, 2) IN ('- ', '* ', '• ')))"
    ell_lines = f"{size}({filt}({lines}, l -> right(l, 3) = '...'))"
    alpha_words = f"{size}({filt}({toks}, {alpha}))"
    return {
        "n_words": f"CAST({n_words} AS BIGINT)",
        "mean_word_len": f"CAST({nonws} AS DOUBLE) / {n_words}",
        "symbol_ratio": f"CAST({n_hash} + {n_ell} AS DOUBLE) / {n_words}",
        "bullet_ratio": f"CAST({bullets} AS DOUBLE) / {n_lines}",
        "ellipsis_ratio": f"CAST({ell_lines} AS DOUBLE) / {n_lines}",
        "alpha_ratio": f"CAST({alpha_words} AS DOUBLE) / {n_words}",
        "stop_hits": f"CAST({size}({filt}({arr}, {contains})) AS BIGINT)",
    }


def gopher_keep_expr(ref: dict[str, str]) -> str:
    """keep = 1 iff every rule passes, over signal REFERENCES (column or
    alias names) — shared by the Spark side and the oracle's outer
    select. Both engines evaluate the identical comparisons on identical
    doubles."""
    r = GOPHER_RULES
    conds = [
        f"{ref['n_words']} >= {r['min_words']}",
        f"{ref['n_words']} <= {r['max_words']}",
        f"{ref['mean_word_len']} >= {r['min_mean_word_len']}",
        f"{ref['mean_word_len']} <= {r['max_mean_word_len']}",
        f"{ref['symbol_ratio']} < {r['max_symbol_ratio']}",
        f"{ref['bullet_ratio']} < {r['max_bullet_ratio']}",
        f"{ref['ellipsis_ratio']} < {r['max_ellipsis_ratio']}",
        f"{ref['alpha_ratio']} > {r['min_alpha_ratio']}",
        f"{ref['stop_hits']} >= {r['min_stop_hits']}",
    ]
    return "CASE WHEN " + " AND ".join(conds) + " THEN 1 ELSE 0 END"


def with_gopher_quality(
    df: DataFrame, text_col: str = "text", out_prefix: str = ""
) -> DataFrame:
    """Gopher rule-bundle quality filter: per-document signals (word
    count, mean word length, symbol-to-word ratio, bullet/ellipsis line
    ratios, alpha-word ratio, required-stopword hits) plus the composite
    `keep` verdict. Tokens and lines are materialized once per row; every
    signal is a pure Catalyst expression off that one materialization —
    zero shuffles at any scale (the filter is a map over the scan)."""
    p = out_prefix
    toks = P.tokens(text_col)["spark"]
    df = df.withColumn("_gtoks", F.expr(toks)).withColumn(
        "_glines", F.expr(f"split({text_col}, '\\n')")
    )
    sig = gopher_signal_exprs("spark", "_gtoks", "_glines", text_col)
    for name, expr in sig.items():
        df = df.withColumn(f"{p}{name}", F.expr(expr))
    keep = gopher_keep_expr({k: f"{p}{k}" for k in sig})
    return df.withColumn(f"{p}keep", F.expr(keep)).drop("_gtoks", "_glines")


def _gram_expr(n: int, hashed: bool):
    """The {n}-token gram key over a token-array column `t` at start
    position column `i` — ONE definition shared by the find and apply
    halves of substring dedup so the two can never disagree on what a
    gram is.

    hashed=False: the space-joined gram STRING (tokens carry no
    whitespace, so the join is injective) — the cross-engine-comparable
    spelling the DuckDB oracles mirror.

    hashed=True (the at-scale arm): the n token strings are hashed
    DIRECTLY with multi-argument xxhash64 — no slice() array and no
    concat_ws string are ever allocated (optimization r13, guide
    §1.2-2/§2.3: measured faster than xxhash64-of-the-concat, which in
    turn beats carrying ~n*wordlen strings through the distinct/keep/
    join shuffles). Multi-arg xxhash64 seed-chains length-delimited
    args, so distinct token sequences keep distinct hashes up to the
    same 2^-64 collision class as hashing the joined string; every
    consumer treats `g` as an opaque equality key."""
    if hashed:
        return F.xxhash64(*[F.expr(f"element_at(t, i + {j})") for j in range(n)])
    return F.concat_ws(" ", F.slice(F.col("t"), F.col("i"), F.lit(n)))


def substring_dedup_apply(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    n: int = 8,
    max_docs: int = 20,
    hashed: bool = False,
) -> DataFrame:
    """The APPLY half of substring-level dedup (r9 verdict item 4 — the
    span-REMOVAL op suffix-array training dedup performs, Lee et al.
    2021): every occurrence of a cross-document duplicated span EXCEPT
    the first (keep-first-occurrence: the lexicographically smallest
    (doc_id, position)) is removed from the corpus, overlapping hits
    merged, and the text reconstructed from the surviving tokens.

    Pipeline (pure DataFrame ops, no UDF):
      1. kept grams: {n}-token grams shared by 2..max_docs DISTINCT docs
         (same bounds as `substring_dup_pairs`; >max_docs is boilerplate
         owned by cheaper passes). Within-doc repeats of a kept gram
         dedupe too — only the global first occurrence survives.
      2. removal hits: every occurrence of a kept gram ranked by
         (doc_id, i) per gram; rank > 1 marks positions [i, i+n-1] dead.
      3. coverage: per doc, a running max over hit-end positions
         (window ordered by token position) — a token j is covered iff
         some hit starting at or before j ends at or after j; merged
         overlapping spans fall out of the running max for free.
      4. reconstruct: surviving tokens re-joined in position order;
         fully-covered docs yield the empty string.

    Returns (doc_id, dedup_text, n_tokens_removed) — one row per input
    doc, idempotent (re-applying removes nothing: only first
    occurrences remain, property-tested).

    `hashed=True` is the 100 TB arm, exactly like the pair finder's:
    grams reduce to xxhash64 BEFORE the keep/rank shuffles (8-byte keys
    instead of ~n*wordlen strings; output identical up to 2^-64 hash
    collisions, property-tested equal). 100 TB shape: gram explode and
    token posexplode are narrow maps; the keep aggregate and the per-g
    rank window shuffle on the HIGH-cardinality gram; the rank window's
    groups are bounded by max_docs x per-doc repeats; the coverage
    window and final rebuild shuffle once on doc_id with per-doc state
    bounded by document length (context-window-scale docs)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
    )
    g0 = toks.filter(F.size("t") >= n).withColumn(
        "i", F.explode(F.sequence(F.lit(1), F.size("t") - (n - 1)))
    )
    # one gram-keyed exchange for the whole g-keyed phase (optimization
    # r13 — the substring_dup_pairs treatment): the (doc_id, g)
    # distinct, the keep aggregate, the keep semi-join and the
    # first-occurrence rank window all cluster on g, so a single
    # AQE-exempt repartition feeds them all via exchange reuse; the
    # shuffle_hash hint keeps AQE from trading the reuse for a
    # per-execution broadcast build
    from .scale import explosive_join_parts

    par = explosive_join_parts(df)
    occ = g0.select("doc_id", "i", _gram_expr(n, hashed).alias("g")).repartition(
        par, "g"
    )
    # The `_z` column is identically ZERO (pmod(x, 1) = 0 for every x,
    # xxhash64 never NULL), so the distinct is value-identical to
    # distinct(doc_id, g). Its job is plan-shape only: it keeps `i`
    # referenced in this branch, so column pruning cannot shrink the
    # projection under the shared g-keyed exchange — without it the keep
    # branch projects (doc_id, g) while the hits branch projects
    # (doc_id, i, g), the exchanges stop matching canonically, and AQE
    # re-runs the whole scan+tokenize+gram pipeline to build `keep`
    # instead of serving it from a ReusedExchange (r14; same anchor
    # argument as training.with_prefix_offsets, guide §1.2-1/§2.4).
    keep = (
        occ.select(
            "doc_id", "g", F.pmod(F.xxhash64("i"), F.lit(1)).alias("_z")
        )
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_docs))
        .select("g")
    )
    # The probe-side projection is value-identical (pmod(x,1)=0) and
    # exists so the user g-repartition is not the DIRECT child of the
    # semi-join: EnsureRequirements swaps a direct-child REPARTITION_BY_NUM
    # exchange for its own ENSURE_REQUIREMENTS one (to let AQE coalesce),
    # which breaks canonical equality with the keep branch's exchange and
    # forfeits the ReusedExchange — i.e. the whole scan+tokenize+gram
    # pipeline ran twice (r14; observed on the executed plan).
    probe = occ.select(
        "doc_id",
        (F.col("i") + F.pmod(F.xxhash64("g"), F.lit(1))).cast("int").alias("i"),
        "g",
    )
    hits = probe.join(keep.hint("shuffle_hash"), "g", "left_semi")
    w_first = Window.partitionBy("g").orderBy("doc_id", "i")
    rm = (
        hits.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") > 1)
        .select("doc_id", F.col("i").alias("j"), (F.col("i") + n - 1).alias("hit_end"))
        # overlapping kept grams can start at the same position in the
        # same doc only once (one gram per (doc, i)), so (doc_id, j) is
        # already unique — no distinct needed
    )
    # posexplode_OUTER keeps a (doc_id, NULL, NULL) row for NULL-text
    # docs so the one doc_id-keyed aggregate below emits every input doc
    # — the coverage filter and the token total are folded INTO that
    # aggregate (survivors via `when`, collect_list/array_join skip the
    # NULL entries), which drops the old shape's fourth corpus scan and
    # its doc-keyed join-back (r14, guide §1.2-1: one corpus pass and
    # one exchange fewer; value-identical incl. size(NULL)=NULL giving
    # n_tokens_removed NULL for NULL text, pinned by the NULL/empty-text
    # unit test).
    tok = toks.select(
        "doc_id", F.posexplode_outer("t").alias("p", "tok")
    ).withColumn("j", (F.col("p") + 1).cast("int")).drop("p")
    w_cov = (
        Window.partitionBy("doc_id")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    alive = F.col("cov_end").isNull() | (F.col("cov_end") < F.col("j"))
    covered = (
        tok.join(rm, ["doc_id", "j"], "left")
        .withColumn("cov_end", F.max("hit_end").over(w_cov))
    )
    return covered.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(alive, F.struct("j", "tok")))
                ),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("dedup_text"),
        (
            F.sum(F.when(F.col("tok").isNotNull(), 1))
            - F.coalesce(
                F.sum(F.when(alive & F.col("tok").isNotNull(), 1)), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_tokens_removed"),
    )


def substring_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    n: int = 8,
    max_docs: int = 20,
    hashed: bool = False,
) -> DataFrame:
    """SUBSTRING-level cross-document duplication (the op suffix-array
    training dedup performs — find documents sharing long verbatim spans
    even when the documents as wholes differ) as long-token-n-gram
    intersection: explode every n-token gram, keep grams shared by
    2..max_docs docs (the upper bound drops boilerplate/template text
    exactly like the LSH hot-bucket cap and bounds every join group's
    pair fan-out at max_docs^2/2), self-join within gram groups, count
    shared grams per (doc_a, doc_b).

    `hashed=True` is the 100 TB arm: the gram is reduced to xxhash64
    BEFORE the distinct/keep/join shuffles, so every exchange carries an
    8-byte key instead of the ~n*wordlen gram string — identical output
    up to 2^-64-probability hash collisions (property-tested equal on
    real corpora; keep hashed=False when results feed a cross-engine
    oracle). The AQE-exempt keyed repartition applies the r8 lesson:
    adaptive coalescing sizes by the join's byte-tiny input and would
    otherwise re-funnel its pair output."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
    ).filter(F.size("t") >= n)
    g0 = toks.withColumn(
        "i", F.explode(F.sequence(F.lit(1), F.size("t") - (n - 1)))
    )
    # ONE gram-keyed exchange feeds the whole pipeline (optimization
    # r13, guide §2.4): hash-partitioning by `g` satisfies the
    # clustering every downstream operator needs — the (doc_id, g)
    # distinct (same-g rows colocate, a superset key clusters), the
    # keep aggregate, the keep semi-join and the pair self-join all
    # reuse this single exchange instead of each shuffling again
    # (measured 1.8s -> ~1.0s at sf0.1: 4 ReusedExchange in the final
    # plan). The user-numbered repartition stays AQE-exempt, so the r8
    # funnel guard (adaptive coalescing sizing the explosive self-join
    # by its byte-tiny input) moves UP the pipeline rather than away.
    # Skew note: keying the pre-distinct stream by g alone concentrates
    # a boilerplate gram's occurrences where (doc_id, g) spread them —
    # bounded in practice because n >= 8-token gram frequency is orders
    # flatter than token Zipf (the reason long grams are the dedup key
    # at all), and the map-side partial aggregate still collapses
    # within-partition repeats. The shuffle_hash hints keep AQE from
    # rewriting the co-partitioned joins into broadcasts, which would
    # discard the exchange reuse (a per-execution driver collect +
    # broadcast build locally, and never the join you'd run at scale).
    from .scale import explosive_join_parts

    par = explosive_join_parts(df)
    occ = g0.select("doc_id", _gram_expr(n, hashed).alias("g")).repartition(
        par, "g"
    )
    grams = occ.distinct()
    keep = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_docs))
        .select("g")
    )
    kept = grams.join(keep.hint("shuffle_hash"), "g", "left_semi")
    return (
        kept.alias("a")
        .join(
            kept.alias("b").hint("shuffle_hash"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
