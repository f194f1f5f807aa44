"""Training-data pipeline queries (dedup / similarity / text analysis) with
DuckDB oracles.

Every oracle is generated from the SAME portable fragment builders the
Spark operators use (`functions.portable`, `operators.text/dedup/
similarity`), so both engines evaluate structurally identical arithmetic —
the comparisons are exact, including the MinHash-LSH pipeline end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import portable as P
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as TX
from .registry import register

_TOK = P.tokens("text")
_NTOK = P.n_tokens("text")


@register(
    "text_token_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM({_NTOK['duck']}) AS BIGINT) AS sum_tokens,
           CAST(CAST(SUM({_NTOK['duck']}) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
    tags=("text",),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting, aggregated per language tag."""
    docs = load_table(spark, sf_dir, "documents")
    nt = F.expr(_NTOK["spark"]).cast("long")
    return (
        docs.withColumn("nt", nt)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("sum_tokens"),
            (F.sum("nt").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        )
    )


_STOP_EN = TX.stop_count_fragments("text", TX.LANG_STOPWORDS["en"])
_FP = P.poly_hash({"spark": "substr(text, 1, 64)", "duck": "substr(text, 1, 64)"})
_TH = TX.token_hashes_fragments("text")
_SIMHASH_DUCK = P.simhash({"spark": "_th", "duck": "_th"}, 32)["duck"]
_LANGID_DUCK = TX.lang_id_fragments("text")["duck"]
_BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "text_profile",
    oracle=f"""
    WITH th AS (SELECT doc_id, lang, text, {_TH['duck']} AS _th FROM documents)
    SELECT doc_id,
           CAST({_NTOK['duck']} AS BIGINT) AS n_tokens,
           CAST(length(replace(trim(text), ' ', '')) AS BIGINT) AS n_alpha,
           CAST(length(replace(trim(text), ' ', '')) AS DOUBLE) / {_NTOK['duck']} AS avg_token_len,
           CAST({_STOP_EN['duck']} AS DOUBLE) / {_NTOK['duck']} AS stop_ratio,
           {_LANGID_DUCK} AS pred_lang,
           CASE WHEN {_LANGID_DUCK} = lang THEN 1 ELSE 0 END AS is_match,
           {_FP['duck']} AS fingerprint,
           {_SIMHASH_DUCK} AS simhash,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens
    FROM th
    """,
    tags=("text", "quality", "langid", "fingerprint", "dedup", "tokenize"),
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-analysis profile in ONE corpus pass — folds the
    former text_quality / text_langid / text_fingerprint / text_simhash /
    text_bpe_token_count gate queries (identical operator code paths, one
    registry row): quality signals (token count, alpha mass, avg token
    length, stopword ratio), stopword-argmax language ID + source-tag
    agreement, rolling polynomial prefix fingerprint, 32-bit SimHash, and
    the BPE-ish regex token count. At 100 TB this is also the right shape:
    every signal is a narrow projection off one scan, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    df = TX.with_token_stats(docs)
    df = TX.with_lang_id(df)
    df = TX.with_fingerprint(df)
    df = TX.with_simhash(df)
    return df.select(
        "doc_id",
        "n_tokens",
        "n_alpha",
        "avg_token_len",
        "stop_ratio",
        "pred_lang",
        F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0).alias("is_match"),
        "fingerprint",
        "simhash",
        F.expr(f"size(regexp_extract_all(text, '{_BPE_PATTERN}', 0))")
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def _gopher_synth(engine: str) -> str:
    """Deterministic document structure for the Gopher line rules — the
    corpus has no newlines/bullets/symbols, so both engines inject the
    SAME doc_id-derived furniture (text_pii_scrub's synthesis pattern).

    Injection varies by doc_id so the composite verdict is NON-degenerate
    on this corpus (each rule discriminates): 0/9/18/27 bullet lines
    (bullet-ratio rule fails at 18+: k/(k+2) >= 0.9), the 9-bullet bucket
    ends its bullets in an ellipsis (ellipsis-ratio rule fails: 9/11),
    the footer carries 5 of the 8 required stopwords (stop rule passes —
    the synthetic vocabulary barely contains them), and the word-count
    floor discriminates naturally on body length."""
    vc = "STRING" if engine == "spark" else "VARCHAR"
    nl = "char(10)" if engine == "spark" else "chr(10)"
    return (
        f"repeat('- item ' || CAST(doc_id % 5 AS {vc}) || ' sale' || "
        f"CASE WHEN doc_id % 4 = 1 THEN '...' ELSE '.' END || {nl}, "
        f"CAST((doc_id % 4) * 9 AS INT)) || text || {nl} || "
        f"'see the end of notes that have value with extras'"
    )


def _gopher_oracle() -> str:
    toks = P.tokens("gtext")["duck"]
    sig = TX.gopher_signal_exprs("duck", "toks", "glines", "gtext")
    cols = ",\n               ".join(f"{expr} AS {name}" for name, expr in sig.items())
    keep = TX.gopher_keep_expr({k: k for k in sig})
    return f"""
    WITH synth AS (SELECT doc_id, {_gopher_synth('duck')} AS gtext FROM documents),
    arr AS (
        SELECT doc_id, gtext, {toks} AS toks,
               string_split(gtext, chr(10)) AS glines
        FROM synth
    ),
    sig AS (
        SELECT doc_id,
               {cols}
        FROM arr
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
           ellipsis_ratio, alpha_ratio, stop_hits,
           {keep} AS keep
    FROM sig
    """


@register(
    "text_gopher_quality",
    oracle=_gopher_oracle(),
    tags=("text", "quality", "filter"),
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-bundle quality filter (Rae et al. 2021 §A.1.1) — the
    canonical pre-training document gate: word-count bounds, mean word
    length bounds, symbol-to-word ratio, bullet-line and ellipsis-line
    ratios, alpha-word ratio, and required-stopword hits, folded into a
    composite `keep` verdict. Pure Catalyst expressions off ONE token/line
    materialization per row — a zero-shuffle map over the scan at any
    scale. Both engines evaluate the same synthesized document structure
    (`_gopher_synth`) through the same fragment builder
    (`operators.text.gopher_signal_exprs`), so the oracle cannot drift."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_gopher_synth("spark")).alias("text")
    )
    out = TX.with_gopher_quality(docs)
    return out.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "bullet_ratio",
        "ellipsis_ratio",
        "alpha_ratio",
        "stop_hits",
        "keep",
    )


def _pii_oracle() -> str:
    """Synthesized-PII scrub oracle: both engines append the same
    deterministic email/phone/IP/SSN block (built from doc_id) to each
    document, then count and redact with the same pattern table
    (`operators.text.PII_PATTERNS`). DuckDB needs the 'g' flag for
    global replacement; standard single-quoted strings keep backslashes
    literal in both dialects."""
    clean = "text"
    for _, pat, repl in TX.PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in TX.PII_PATTERNS
    )
    return f"""
    WITH synth AS (
        SELECT doc_id,
               substr(text, 1, 40)
               || ' reach user' || CAST(doc_id AS VARCHAR)
               || '@mail.example.com or call +1 (555) 010-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
               || '.0.1 id 123-45-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents
    )
    SELECT doc_id,
           {counts},
           {clean} AS clean_text
    FROM synth
    """


@register(
    "text_pii_scrub",
    oracle=_pii_oracle(),
    tags=("text", "pii", "redaction"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails, IPv4s, international phones and
    SSN-style ids counted and replaced with typed placeholders — chained
    JVM-side regexp_replace, one narrow projection (the standard scrub
    stage before any other pipeline step sees the text). The corpus has
    no real PII, so a deterministic block built from doc_id is appended
    to every document; both engines scrub the identical string."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sid = F.col("doc_id").cast("string")
    synth = F.concat(
        F.substring("text", 1, 40),
        F.lit(" reach user"),
        sid,
        F.lit("@mail.example.com or call +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1 id 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return TX.with_pii_scrub(docs.select("doc_id", synth.alias("text"))).select(
        "doc_id",
        *[f"n_{name}" for name, _, _ in TX.PII_PATTERNS],
        "clean_text",
    )


@register(
    "text_line_dedup",
    oracle="""
    WITH synth AS (
        SELECT doc_id,
               text || '. Subscribe to our newsletter today. Unique tail number '
                    || CAST(doc_id AS VARCHAR) AS text
        FROM documents
    ),
    raw AS (
        SELECT doc_id, regexp_split_to_array(text, '\\.\\s+') AS arr FROM synth
    ),
    lines AS (
        SELECT doc_id, trim(unnest(arr)) AS line,
               unnest(range(1, len(arr) + 1)) AS pos
        FROM raw
    ),
    fl AS (SELECT * FROM lines WHERE length(line) > 0),
    boiler AS (
        SELECT line FROM fl GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 3
    ),
    marked AS (
        SELECT f.doc_id, f.pos, f.line, (b.line IS NOT NULL) AS is_b
        FROM fl f LEFT JOIN boiler b USING (line)
    )
    SELECT doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(
               string_agg(CASE WHEN NOT is_b THEN line END, '. ' ORDER BY pos),
               ''
           ) AS clean_text
    FROM marked GROUP BY doc_id
    """,
    tags=("text", "dedup", "boilerplate"),
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level boilerplate dedup: sentences appearing in >= 3
    distinct documents are removed from every document (nav chrome /
    cookie banners / subscribe prompts — shared furniture that
    document-level MinHash can't touch). A common boilerplate sentence
    plus a doc-unique tail are appended to every document so the removal
    and the keep are both exercised deterministically."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    synth = F.concat(
        F.col("text"),
        F.lit(". Subscribe to our newsletter today. Unique tail number "),
        F.col("doc_id").cast("string"),
    )
    return TX.remove_boilerplate_lines(
        docs.select("doc_id", synth.alias("text")), "doc_id", min_docs=3
    ).select(F.col("id").alias("doc_id"), "n_lines", "n_kept", "clean_text")


@register(
    "dedup_exact",
    oracle="""
    WITH u AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
    SELECT md5(text) AS key_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
    FROM u GROUP BY md5(text)
    """,
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hash dedup over a corpus with injected duplicates (each doc
    unioned once under a shifted id): every group must collapse to the
    original id with n_copies=2."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return D.exact_dedup(docs.unionByName(dup), "doc_id")


def _minhash_oracle(threshold: float = 0.5, source: str = "documents") -> str:
    sh = P.shingle_hashes("text")["duck"]
    sig = P.minhash_signature({"spark": "sh", "duck": "sh"}, D.MINHASH_K)["duck"]
    bk = D.band_key_fragments("sig")["duck"]
    return f"""
    WITH docs AS (
        SELECT doc_id AS id, {sh} AS sh
        FROM {source} WHERE {_NTOK['duck']} >= 3
    ),
    sigs AS (SELECT id, sh, {sig} AS sig FROM docs),
    bands AS (
        SELECT id, b AS band, {bk} AS band_key
        FROM sigs, range(0, {D.LSH_BANDS}) t(b)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
    ),
    pairs AS (
        SELECT id_a, id_b,
               len(list_intersect(da.sh, db.sh)) AS n_inter,
               len(da.sh) AS la, len(db.sh) AS lb
        FROM cand
        JOIN docs da ON cand.id_a = da.id
        JOIN docs db ON cand.id_b = db.id
    )
    SELECT id_a AS doc_a, id_b AS doc_b,
           CAST(n_inter AS DOUBLE) / (la + lb - n_inter) AS jaccard
    FROM pairs
    WHERE CAST(n_inter AS DOUBLE) / (la + lb - n_inter) >= {threshold}
    """


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    tags=("dedup", "minhash", "lsh"),
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (16 hashes, 4 bands of 4), verified with
    exact Jaccard on candidates — the sub-quadratic dedup path."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, "doc_id")


@register(
    "dedup_stream_pairs",
    oracle=_minhash_oracle(),
    tags=("dedup", "minhash", "streaming", "incremental"),
)
def dedup_stream_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING incremental-dedup machine under the driver's eye —
    the `cdc_topk_view` treatment applied to `streaming/dedup_stream.py`
    (previously pytest-only): the corpus arrives as three id-ordered
    micro-batches through the REAL `dedup_batch_against_index`
    foreachBatch body (batch band rows computed once; partition-pruned
    index lookup; within-batch pairing; marker-guarded index append),
    pairs accumulate per batch partition. The union of cross-batch and
    within-batch pairs over any batching is exactly the batch LSH pair
    set, so the oracle is `dedup_minhash_lsh`'s from-scratch SQL;
    orientation is normalized (least, greatest) since the stream emits
    (index_doc, batch_doc). Rides the shared `fold_id_batches` scaffold
    (declared-schema pairs read — a zero-pair corpus is an empty MATCH,
    not a schema-inference crash)."""
    from ..streaming.dedup_stream import PAIR_SCHEMA, dedup_batch_against_index
    from .registry import fold_id_batches

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def update(batch, batch_id, root):
        dedup_batch_against_index(
            batch, batch_id, f"{root}/index", f"{root}/pairs"
        )

    def read_final(spark, root):
        return (
            spark.read.schema(PAIR_SCHEMA + ", batch_id int")
            .parquet(f"{root}/pairs")
            .select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
                "jaccard",
            )
        )

    return fold_id_batches(
        docs, "doc_id", update, read_final, prefix="dedup_stream_gate_"
    )


def _incremental_oracle(threshold: float = 0.5) -> str:
    """Cross-batch MinHash oracle: OLD side = 80% of documents (the
    persisted index), NEW side = the other 20% plus exact copies of every
    doc_id % 7 == 0 doc under a shifted id (guaranteed jaccard-1.0
    cross-batch pairs). Candidates join old bands × new bands only."""
    sh = P.shingle_hashes("text")["duck"]
    sig = P.minhash_signature({"spark": "sh", "duck": "sh"}, D.MINHASH_K)["duck"]
    bk = D.band_key_fragments("sig")["duck"]
    return f"""
    WITH old_docs AS (
        SELECT doc_id AS id, {sh} AS sh
        FROM documents WHERE doc_id % 10 < 8 AND {_NTOK['duck']} >= 3
    ),
    new_src AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
    ),
    new_docs AS (
        SELECT doc_id AS id, {sh} AS sh
        FROM new_src WHERE {_NTOK['duck']} >= 3
    ),
    old_sigs AS (SELECT id, sh, {sig} AS sig FROM old_docs),
    new_sigs AS (SELECT id, sh, {sig} AS sig FROM new_docs),
    old_bands AS (
        SELECT id, b AS band, {bk} AS band_key
        FROM old_sigs, range(0, {D.LSH_BANDS}) t(b)
    ),
    new_bands AS (
        SELECT id, b AS band, {bk} AS band_key
        FROM new_sigs, range(0, {D.LSH_BANDS}) t(b)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM old_bands a JOIN new_bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.id <> b.id
    ),
    pairs AS (
        SELECT id_a, id_b,
               len(list_intersect(da.sh, db.sh)) AS n_inter,
               len(da.sh) AS la, len(db.sh) AS lb
        FROM cand
        JOIN old_docs da ON cand.id_a = da.id
        JOIN new_docs db ON cand.id_b = db.id
    )
    SELECT id_a AS doc_a, id_b AS doc_b,
           CAST(n_inter AS DOUBLE) / (la + lb - n_inter) AS jaccard
    FROM pairs
    WHERE CAST(n_inter AS DOUBLE) / (la + lb - n_inter) >= {threshold}
    """


@register(
    "dedup_incremental",
    oracle=_incremental_oracle(),
    tags=("dedup", "minhash", "incremental", "index"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a PERSISTED MinHash index — the
    daily-increment shape: 80% of the corpus is written as a
    bucket-partitioned serving index (`minhash_index_write`), then a new
    batch (the other 20% plus injected exact copies of the %7==0 docs
    under shifted ids) is deduped against it WITHOUT re-reading the
    indexed corpus text. Candidate lookup scans only the bucket
    partitions the new batch's band keys touch (Hive partition pruning);
    exact Jaccard verifies candidates from the shingle sets both sides
    already carry. Oracle recomputes both sides from scratch in SQL."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 10 < 8)
    new = docs.filter(F.col("doc_id") % 10 >= 8).unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    path = tempfile.mkdtemp(prefix="mh_index_")
    D.minhash_index_write(old, path, "doc_id")
    return D.dedup_incremental(spark, new, path, "doc_id")


@register(
    "dedup_cluster_assign",
    # pairs/edges are MATERIALIZED (r12 verdict item 6): DuckDB inlines
    # plain CTEs, so the full LSH pair SQL re-evaluated under the
    # recursive closure made this oracle ~40 min at sf1 — materializing
    # both reduces the closure to iteration over the (small) edge list
    oracle=f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_minhash_oracle()}),
    edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    comp(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, c.label FROM edges e JOIN comp c ON e.dst = c.id
    )
    SELECT id, MIN(label) AS cluster_id FROM comp GROUP BY id
    """,
    tags=("dedup", "clusters"),
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair graph resolved into connected-component clusters
    (hash-min label propagation; cluster_id = min doc id in the component
    — the canonical survivor). The step between 'LSH found a~b, b~c' and
    'keep one of {a,b,c}'. Oracle: recursive-CTE reachability over the
    same pair graph."""
    docs = load_table(spark, sf_dir, "documents")
    return D.dedup_clusters(D.minhash_lsh_pairs(docs, "doc_id"))


def _jaccard_oracle(threshold: float = 0.5) -> str:
    """Inverted-index formulation (r12 verdict item 6 — this oracle was
    sf1-sweep-excluded as within-block ALL-PAIRS list_intersect, hours of
    DuckDB at sf1): unnest the per-doc DISTINCT shingle set and
    equi-join on the shingle hash, so n_inter = COUNT(*) of shared
    shingles per (a, b) — only pairs sharing >= 1 shingle are ever
    enumerated, and a zero-intersection pair has jaccard 0 < threshold,
    so the result set is IDENTICAL to the all-pairs spelling. Same
    double formula, same BIGINT arithmetic -> same value hash."""
    sh = P.shingle_hashes("text")["duck"]
    return f"""
    WITH docs AS (
        SELECT doc_id AS id, lang AS blk, {sh} AS sh
        FROM documents WHERE {_NTOK['duck']} >= 3
    ),
    ex AS (SELECT id, blk, len(sh) AS n, unnest(sh) AS h FROM docs),
    inter AS (
        SELECT a.id AS doc_a, b.id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_inter,
               ANY_VALUE(a.n) AS la, ANY_VALUE(b.n) AS lb
        FROM ex a JOIN ex b
          ON a.h = b.h AND a.blk = b.blk AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (la + lb - n_inter) AS jaccard
    FROM inter
    WHERE CAST(n_inter AS DOUBLE) / (la + lb - n_inter) >= {threshold}
    """


@register(
    "dedup_ngram_jaccard",
    oracle=_jaccard_oracle(),
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact blocked (by lang) pairwise 3-token-shingle Jaccard — ground
    truth for the LSH recall test."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", block_col="lang")


def _prefix_jaccard_oracle(threshold: float = 0.5) -> str:
    """Global (unblocked) exact-Jaccard oracle in the inverted-index
    formulation (see `_jaccard_oracle` — same trick, no block key)."""
    sh = P.shingle_hashes("text")["duck"]
    return f"""
    WITH docs AS (
        SELECT doc_id AS id, {sh} AS sh
        FROM documents WHERE {_NTOK['duck']} >= 3
    ),
    ex AS (SELECT id, len(sh) AS n, unnest(sh) AS h FROM docs),
    inter AS (
        SELECT a.id AS doc_a, b.id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_inter,
               ANY_VALUE(a.n) AS la, ANY_VALUE(b.n) AS lb
        FROM ex a JOIN ex b ON a.h = b.h AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (la + lb - n_inter) AS jaccard
    FROM inter
    WHERE CAST(n_inter AS DOUBLE) / (la + lb - n_inter) >= {threshold}
    """


@register(
    "dedup_prefix_jaccard",
    oracle=_prefix_jaccard_oracle(),
    tags=("dedup", "jaccard", "prefix-filter", "exact"),
)
def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-wide Jaccard similarity join with NO block key and NO
    LSH false negatives — prefix filtering (All-Pairs/SSJoin): a pair at
    J >= 0.5 must share an element of the smaller-id doc's sorted-hash
    prefix, so candidates come from a high-cardinality shingle-hash
    equi-join (AQE-skew-splittable) + length filter, then exact-verify.
    Completes the similarity-join triangle: blocked-exact
    (dedup_ngram_jaccard), probabilistic-unblocked (dedup_minhash_lsh),
    exact-unblocked (this). Oracle: the unblocked inverted-index SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return D.prefix_jaccard_pairs(docs, "doc_id")


_NRM = P.scaled_dot("embedding", "embedding", "embedding")
_QDOT_DUCK = P.scaled_dot("qv", "v", "qv")["duck"]


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH nrm AS (
        SELECT vec_id, embedding, {_NRM['duck']} AS n2 FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, embedding AS qv, n2 AS q_n2 FROM nrm WHERE vec_id < 8),
    c AS (SELECT vec_id AS c_id, embedding AS v, n2 AS c_n2 FROM nrm),
    pairs AS (
        SELECT q_id, c_id,
               CAST({_QDOT_DUCK} AS DOUBLE)
                   / (sqrt(CAST(q_n2 AS DOUBLE)) * sqrt(CAST(c_n2 AS DOUBLE))) AS cos_sim
        FROM q, c WHERE q_id <> c_id
    ),
    ranked AS (
        SELECT q_id, c_id AS neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rnk
        FROM pairs
    )
    SELECT q_id, neighbor_id, rnk, cos_sim FROM ranked WHERE rnk <= 5
    """,
    tags=("similarity", "topk"),
    bench=True,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 8 query vectors (broadcast queries,
    single corpus scan, per-query window)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)
    return out.withColumnRenamed("rank", "rnk")


_BUCKET = S.lsh_bucket_fragments("embedding")


@register(
    "sim_lsh_buckets",
    oracle=f"""
    SELECT {_BUCKET['duck']} AS bucket, COUNT(*) AS n_vecs
    FROM embeddings GROUP BY 1
    """,
    tags=("similarity", "lsh"),
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket histogram — the ANN candidate
    partitioning (8 planes -> 256 buckets)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        S.with_lsh_bucket(emb)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


_ABDOT_DUCK = P.scaled_dot("a.v", "b.v", "a.v")["duck"]


@register(
    "emb_near_dup",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id AS id, embedding AS v, label AS blk, {_NRM['duck'].replace('embedding', 'embedding')} AS n2
        FROM embeddings
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST({_ABDOT_DUCK} AS DOUBLE)
               / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
    FROM vecs a JOIN vecs b ON a.blk = b.blk AND a.id < b.id
    WHERE CAST({_ABDOT_DUCK} AS DOUBLE)
              / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) >= 0.4
    """,
    tags=("dedup", "embedding"),
)
def emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_near_dup(emb, threshold=0.4)


_LANG_DUCK = TX.lang_id_fragments("text")["duck"]


@register(
    "curation_pipeline",
    oracle=f"""
    WITH RECURSIVE kept AS (
        SELECT doc_id, text,
               CAST({_NTOK['duck']} AS BIGINT) AS n_tokens,
               CAST({_STOP_EN['duck']} AS DOUBLE) / {_NTOK['duck']} AS stop_ratio
        FROM documents
        WHERE {_NTOK['duck']} >= 10
          AND CAST({_STOP_EN['duck']} AS DOUBLE) / {_NTOK['duck']} >= 0.10
          AND {_LANG_DUCK} = 'en'
    ),
    ndpairs AS ({_minhash_oracle(source="kept")}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM ndpairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM ndpairs
    ),
    comp(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, c.label FROM edges e JOIN comp c ON e.dst = c.id
    ),
    losers AS (
        SELECT id
        FROM (SELECT id, MIN(label) AS cluster_id FROM comp GROUP BY id)
        WHERE id <> cluster_id
    )
    SELECT doc_id, n_tokens, stop_ratio FROM kept
    WHERE doc_id NOT IN (SELECT id FROM losers)
    """,
    tags=("pipeline", "curation", "dedup"),
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation in ONE declarative plan — the
    composition a 100 TB corpus job runs nightly: quality gate (token
    count + stopword ratio) -> language gate (predicted 'en') -> MinHash
    LSH near-dup clustering on the survivors -> canonical (min-id)
    survivor per cluster, with quality stats attached. Every stage is the
    already-gated operator; the composition itself is what's verified
    here (oracle: same gates + recursive-CTE cluster resolution)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = TX.with_lang_id(TX.with_token_stats(docs))
    kept = scored.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("stop_ratio") >= 0.10)
        & (F.col("pred_lang") == "en")
    )
    pairs = D.minhash_lsh_pairs(kept, "doc_id")
    surv = D.canonical_survivors(pairs, kept, "doc_id")
    return surv.select("doc_id", "n_tokens", "stop_ratio")


_EMB_BUCKET_DUCK = S.lsh_bucket_fragments("embedding")["duck"]


@register(
    "emb_near_dup_lsh",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id AS id, embedding AS v,
               {_EMB_BUCKET_DUCK} AS bucket,
               {_NRM['duck']} AS nrm
        FROM embeddings
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST({_ABDOT_DUCK} AS DOUBLE)
               / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cos_sim
    FROM vecs a JOIN vecs b ON a.bucket = b.bucket AND a.id < b.id
    WHERE CAST({_ABDOT_DUCK} AS DOUBLE)
              / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) >= 0.4
    """,
    tags=("dedup", "embedding", "lsh"),
)
def emb_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup with LSH-bucket blocking — the 100 TB path:
    candidates from a self-equi-join on the 2^8-bucket hyperplane hash
    instead of a metadata block column; exact fixed-point cosine verify."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_near_dup_lsh(emb, threshold=0.4)


@register(
    "emb_quantize",
    oracle="""
    WITH d AS (
        SELECT vec_id AS id, [CAST(x AS DOUBLE) FOR x IN embedding] AS dv
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    s AS (
        SELECT id, dv, list_min(dv) AS mn,
               (list_max(dv) - list_min(dv)) / 255.0 AS scale
        FROM d
    )
    SELECT id,
           array_to_string(
               CASE WHEN scale = 0 THEN [0 FOR x IN dv]
                    ELSE [CAST(round((x - mn) / scale) AS INT) FOR x IN dv]
               END, ',') AS q,
           mn, scale
    FROM s
    """,
    tags=("embedding", "quantize"),
)
def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 linear quantization of the embedding corpus — the
    4x storage/IO cut before anything else touches a 100 TB embedding
    table. All elementwise expressions (no float accumulation), so the
    codes, mins and scales are oracle-exact.

    The gated query serializes the code array to a comma-joined string:
    the driver canonicalizer sorts every output column in pandas, and raw
    array cells are unhashable there (r6 ERR row). The programmatic
    operator `training.quantize_embeddings` keeps the typed array<int>."""
    from ..operators.training import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    return q.select(
        "id",
        F.concat_ws(",", F.expr("transform(q, x -> CAST(x AS STRING))")).alias("q"),
        "mn",
        "scale",
    )


@register(
    "text_top_tokens",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_TOK['duck']}) AS token FROM documents
    ),
    counts AS (
        SELECT token, COUNT(*) AS n FROM tok GROUP BY token
    ),
    ranked AS (
        SELECT token, n,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS rnk
        FROM counts
    )
    SELECT token, n, rnk FROM ranked WHERE rnk <= 20
    """,
    tags=("text", "vocab"),
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: explode tokens -> count -> deterministic
    top-20 (map-side partial counts; the global top-k is tiny)."""
    docs = load_table(spark, sf_dir, "documents")
    top = (
        docs.select(F.explode(F.expr(_TOK["spark"])).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)  # TakeOrderedAndProject — no global window over the vocab
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))  # 20 rows only
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def _ivf_oracle() -> str:
    nrm = P.scaled_dot("embedding", "embedding", "embedding")["duck"]
    dot_nc = P.scaled_dot("n.embedding", "c.cv", "n.embedding")["duck"]
    dot_qc = P.scaled_dot("qv", "cvv", "qv")["duck"]
    return f"""
    WITH nrm AS (SELECT vec_id, embedding, {nrm} AS n2 FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
    assign_raw AS (
        SELECT n.vec_id AS id, n.embedding AS v, n.n2, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                                  ORDER BY {dot_nc} DESC, c.cent_id) AS crn
        FROM nrm n, cents c
    ),
    assigned AS (SELECT id, v, n2, cent_id FROM assign_raw WHERE crn = 1),
    q AS (SELECT id AS q_id, v AS qv, n2 AS q_n2, cent_id AS q_cent
          FROM assigned WHERE id >= 8 AND id < 16),
    c AS (SELECT id AS c_id, v AS cvv, n2 AS c_n2, cent_id FROM assigned),
    pairs AS (
        SELECT q_id, c_id,
               CAST({dot_qc} AS DOUBLE)
                   / (sqrt(CAST(q_n2 AS DOUBLE)) * sqrt(CAST(c_n2 AS DOUBLE))) AS cos_sim
        FROM q JOIN c ON cent_id = q_cent AND q_id <> c_id
    ),
    ranked AS (
        SELECT q_id, c_id AS neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                       ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rnk
        FROM pairs
    )
    SELECT q_id, neighbor_id, rnk, cos_sim FROM ranked WHERE rnk <= 5
    """


@register(
    "sim_ivf_topk",
    oracle=_ivf_oracle(),
    tags=("similarity", "ivf", "ann"),
    bench=True,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (probe=1): vectors coarse-quantized to their nearest of 8
    deterministic centroids; top-5 by exact cosine within the query's cell.
    The sub-linear scale path next to brute-force `sim_cosine_topk`."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
    return S.ivf_topk(emb, cents, queries, k=5)


_EPOCH_KEY_DUCK = P.md5_hash("('1:' || CAST(doc_id AS VARCHAR))")["duck"]


@register(
    "train_epoch_order",
    oracle=f"""
    WITH k AS (SELECT doc_id, {_EPOCH_KEY_DUCK} AS ek FROM documents)
    SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY ek) - 1 AS BIGINT) AS pos
    FROM k
    """,
    tags=("training", "shuffle"),
    bench=True,
)
def train_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffling: a seed-keyed pseudo-random global
    position per document, computed as the DISTRIBUTED two-level prefix
    sum over the md5 shuffle key (range partition -> per-partition window
    -> broadcast offsets) — the oracle is allowed the single-partition
    `ROW_NUMBER() OVER (ORDER BY ek)`; the Spark plan is gated NOT to
    contain it."""
    from ..operators.training import epoch_order

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_order(docs, "doc_id", seed=1).select("doc_id", "pos")


_BAG_FP = TX.bag_fingerprint_fragments("text")


@register(
    "text_bag_dedup",
    oracle=f"""
    SELECT {_BAG_FP['duck']} AS bag_fp,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS canonical_id
    FROM documents GROUP BY 1
    """,
    tags=("text", "dedup", "fingerprint"),
)
def text_bag_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation-invariant dedup key: group documents by the md5 of
    their SORTED token multiset — reordered duplicates collapse here that
    positional shingling cannot pair. One narrow fingerprint map + one
    shuffle on the fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        TX.with_bag_fingerprint(docs)
        .groupBy("bag_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


# Deterministic dirty-text synthesis for the cleanup gate (chr() builds
# identical junk on both engines): zero-width chars mid-word, control
# bytes, typographic punctuation, tab/space runs, newline stacks.
# NOTE: Spark's chr(n) wraps at 256 (ASCII only), so the Spark dialect
# embeds the actual unicode characters as string literals; DuckDB builds
# the same characters with chr() to keep the oracle SQL ASCII-clean.
def _dirty_build(dialect: str) -> str:
    if dialect == "duck":
        zw, quo, dash = "chr(8203)", "chr(8217)", "chr(8212)"
    else:
        zw, quo, dash = "'​'", "'’'", "'—'"
    return (
        f"CASE CAST(doc_id % 3 AS INT) "
        f"WHEN 0 THEN text || {zw} || 'zw' || chr(1) || '  spaced' "
        f"WHEN 1 THEN {quo} || 's ' || text || chr(9) || chr(9) || 'tab' "
        f"ELSE ' ' || text || chr(10) || chr(10) || chr(10) || chr(10) || {dash} || ' end ' END"
    )


@register(
    "text_cleanup",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_dirty_build('duck')} AS dirty FROM documents),
    c AS (SELECT doc_id, dirty, {TX.text_cleanup_oracle('dirty')} AS clean_text FROM d)
    SELECT doc_id, clean_text,
           CAST(length(dirty) - length(clean_text) AS BIGINT) AS n_chars_removed
    FROM c
    """,
    tags=("text", "cleanup"),
)
def text_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-hygiene normalization (zero-width/control strip, punct
    folding, whitespace collapse) — the pass that runs BEFORE any
    token/shingle/hash operator, since an invisible U+200B changes every
    downstream hash. Zero-shuffle chained regexp_replace; exercised on a
    deterministic dirty-text construction both engines share."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select("doc_id", F.expr(_dirty_build("spark")).alias("dirty"))
    return TX.with_text_cleanup(dirty, text_col="dirty").select(
        "doc_id", "clean_text", "n_chars_removed"
    )


# Deterministic URL synthesis for the URL-dedup gate: documents carry no
# URL column, so (like text_pii_scrub's appended PII block) both engines
# construct the same crawl-style variant mix — six surface forms per
# canonical page key, exercising case folding, default ports, tracking
# params, param order and fragments.
def _url_build(cast_str: str) -> str:
    k = f"CAST(doc_id % 50 AS {cast_str})"
    return (
        f"CASE CAST(doc_id % 6 AS INT) "
        f"WHEN 0 THEN 'https://www.example.com/a/' || {k} "
        f"WHEN 1 THEN 'HTTPS://EXAMPLE.COM:443/a/' || {k} "
        f"WHEN 2 THEN 'https://example.com/a/' || {k} || '/?utm_source=feed' "
        f"WHEN 3 THEN 'https://example.com/a/' || {k} || '#section' "
        f"WHEN 4 THEN 'https://example.com/a/' || {k} || '?b=2&a=1' "
        f"ELSE 'https://example.com/a/' || {k} || '?a=1&b=2&gclid=xyz' END"
    )


@register(
    "text_url_dedup",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_url_build('VARCHAR')} AS url FROM documents),
    n AS (SELECT doc_id, {TX.url_normalize_oracle('url')} AS norm_url FROM u)
    SELECT norm_url, COUNT(*) AS n_urls, MIN(doc_id) AS canonical_id
    FROM n GROUP BY norm_url
    """,
    tags=("text", "url", "dedup"),
)
def text_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup — the cheapest web-corpus dedup key: canonicalize
    each document's URL (case, default ports, www, tracking params, param
    order, fragments — `with_url_normalized`, a pure Catalyst projection)
    and group on the canonical form. One narrow map + one shuffle on the
    normalized URL; at 100 TB this runs before any content-based dedup."""
    docs = load_table(spark, sf_dir, "documents")
    urled = docs.withColumn("url", F.expr(_url_build("STRING")))
    return (
        TX.with_url_normalized(urled)
        .groupBy("norm_url")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


def _pq_shared_ctes() -> str:
    """Codebook + encode CTEs shared VERBATIM by `_pq_adc_oracle` and
    `_ivfpq_oracle` — one definition of the oracle-side PQ arithmetic,
    mirroring the single `_pq_codes_expr` on the Spark side (r6 review)."""
    m, ksub, dsub = S.PQ_M, S.PQ_KSUB, 16
    cwn2 = P.scaled_dot("cw", "cw", "cw")["duck"]
    enc_dot = S._sub_dot("e.embedding", "cb.j", "cb.cw", dsub)["duck"]
    return f"""cb0 AS (
        SELECT j,
               CAST(ROW_NUMBER() OVER (PARTITION BY j ORDER BY vec_id) - 1 AS INT) AS c,
               list_slice(embedding, j * {dsub} + 1, (j + 1) * {dsub}) AS cw
        FROM (SELECT vec_id, embedding FROM embeddings
              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT {ksub}),
             (SELECT CAST(range AS INT) AS j FROM range(0, {m}))
    ),
    cb AS (SELECT j, c, cw, {cwn2} AS cwn2 FROM cb0),
    enc_raw AS (
        SELECT e.vec_id AS id, cb.j, cb.c,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.j
                                  ORDER BY cb.cwn2 - 2 * ({enc_dot}), cb.c) AS rn
        FROM embeddings e, cb
        WHERE e.embedding IS NOT NULL
    ),
    enc AS (SELECT id, j, c FROM enc_raw WHERE rn = 1)"""


def _pq_adc_oracle() -> str:
    """DuckDB oracle for the PQ-ADC path: codebook = subvectors of the 16
    lowest-id vectors (`pq_codebook_sample`), encode = per-subspace argmin
    of `cwn2 - 2*dot` (exact fixed-point, ties by codeword id — identical
    to Spark's struct sort), distance = summed exact subspace L2^2 via the
    joined codewords. Same integer arithmetic as the Spark LUT, so the ADC
    distances hash-compare exactly."""
    ksub, dsub = S.PQ_KSUB, 16
    q_dot = S._sub_dot("q.embedding", "cb.j", "cb.cw", dsub)["duck"]
    qn2 = S._sub_norm("q.embedding", "cb.j", dsub)["duck"]
    return f"""
    WITH {_pq_shared_ctes()},
    terms AS (
        SELECT q.vec_id AS q_id, en.id AS c_id,
               ({qn2}) + cb.cwn2 - 2 * ({q_dot}) AS term
        FROM (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id >= {ksub} AND vec_id < {ksub + 8}
                AND embedding IS NOT NULL) q,
             enc en JOIN cb ON cb.j = en.j AND cb.c = en.c
        WHERE en.id <> q.vec_id
    ),
    dists AS (SELECT q_id, c_id, CAST(SUM(term) AS BIGINT) AS adc
              FROM terms GROUP BY q_id, c_id),
    ranked AS (
        SELECT q_id, c_id AS neighbor_id, adc,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                       ORDER BY adc, c_id) AS BIGINT) AS rnk
        FROM dists)
    SELECT q_id, neighbor_id, rnk, CAST(adc AS DOUBLE) / 1e12 AS adc_dist
    FROM ranked WHERE rnk <= 5
    """


@register(
    "sim_pq_adc_topk",
    oracle=_pq_adc_oracle(),
    tags=("similarity", "pq", "ann"),
    bench=True,
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k: the corpus is PQ-encoded to 4 codes
    per vector (zero-shuffle expression argmin over a broadcast codebook);
    each query precomputes an exact-distance LUT once and every corpus row
    costs 4 integer lookups — the FAISS-style compressed-domain scan that
    makes a 100 TB embedding table searchable without reading the raw
    vectors. Codebook here is the deterministic corpus sample; `pq_train`
    is the offline k-means trainer for production."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = S.pq_codebook_sample(emb)
    queries = emb.filter(
        (F.col("vec_id") >= S.PQ_KSUB) & (F.col("vec_id") < S.PQ_KSUB + 8)
    )
    # dsub probed ONCE and the codebook FOLD built once, shared by both
    # halves (optimization r13): encode and ADC each defaulted to their
    # own `_codebook_dsub` first() (two plan-time jobs for one scalar)
    # and their own `_fold_pq_codebook` (two scan→agg→broadcast builds
    # per execution — no ReusedExchange fired; sharing measured ~15 %).
    dsub = S._codebook_dsub(cb)
    cb_row = S._fold_pq_codebook(cb)
    codes = S.pq_encode(emb, cb, dsub=dsub, cb_row=cb_row)
    return S.pq_adc_topk(codes, queries, cb, k=5, dsub=dsub, cb_row=cb_row)


def _cluster_balanced_oracle() -> str:
    """IVF cell assignment (8 deterministic centroids, same construction
    as `_ivf_oracle`) + the md5-threshold keep predicate with a per-cell
    rate CASE + per-cell kept counts."""
    from ..operators.training import sample_fragments

    cell_dot = P.scaled_dot("e.embedding", "c.cv", "e.embedding")["duck"]
    rate = (
        "CASE WHEN cent_id = 0 THEN CAST(1.0 AS DOUBLE) "
        "WHEN cent_id = 1 THEN CAST(0.5 AS DOUBLE) "
        "WHEN cent_id = 2 THEN CAST(0.25 AS DOUBLE) "
        "ELSE CAST(0.1 AS DOUBLE) END"
    )
    keep = sample_fragments("id", rate)["duck"]
    return f"""
    WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
                   WHERE vec_id < 8),
    arows AS (
        SELECT e.vec_id AS id, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cell_dot} DESC, c.cent_id) AS crn
        FROM embeddings e, cents c WHERE e.embedding IS NOT NULL
    ),
    assigned AS (SELECT id, cent_id FROM arows WHERE crn = 1),
    kept AS (SELECT id, cent_id FROM assigned WHERE {keep})
    SELECT cent_id, COUNT(*) AS n_kept FROM kept GROUP BY cent_id
    """


@register(
    "sample_cluster_balanced",
    oracle=_cluster_balanced_oracle(),
    tags=("training", "sampling", "embedding"),
)
def sample_cluster_balanced_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cluster-balanced subsampling: nearest-centroid cell (one
    zero-shuffle expression pass) + per-cell deterministic keep rates
    (cell 0: 100%, 1: 50%, 2: 25%, rest 10%) — rebalances over-represented
    content modes without RNG, joins, or extra shuffles."""
    from ..operators.training import sample_cluster_balanced

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    kept = sample_cluster_balanced(
        emb, cents, {0: 1.0, 1: 0.5, 2: 0.25}, default_fraction=0.1
    )
    return kept.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n_kept"))


def _ivfpq_oracle() -> str:
    """DuckDB oracle for IVF-PQ: IVF cells from the 8 deterministic
    centroids (same as `_ivf_oracle`), PQ codes from the shared CTEs
    (`_pq_shared_ctes`), candidates restricted to the query's cell,
    distance = summed exact integer subspace L2^2."""
    ksub, dsub = S.PQ_KSUB, 16
    q_dot = S._sub_dot("q.embedding", "cb.j", "cb.cw", dsub)["duck"]
    qn2 = S._sub_norm("q.embedding", "cb.j", dsub)["duck"]
    cell_dot = P.scaled_dot("e.embedding", "c.cv", "e.embedding")["duck"]
    return f"""
    WITH {_pq_shared_ctes()},
    cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
              WHERE vec_id < 8),
    arows AS (
        SELECT e.vec_id AS id, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cell_dot} DESC, c.cent_id) AS crn
        FROM embeddings e, cents c WHERE e.embedding IS NOT NULL
    ),
    assigned AS (SELECT id, cent_id FROM arows WHERE crn = 1),
    terms AS (
        SELECT q.vec_id AS q_id, en.id AS c_id,
               ({qn2}) + cb.cwn2 - 2 * ({q_dot}) AS term
        FROM (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id >= {ksub} AND vec_id < {ksub + 8}
                AND embedding IS NOT NULL) q
             JOIN assigned qa ON qa.id = q.vec_id,
             enc en
             JOIN cb ON cb.j = en.j AND cb.c = en.c
             JOIN assigned ca ON ca.id = en.id
        WHERE en.id <> q.vec_id AND ca.cent_id = qa.cent_id
    ),
    dists AS (SELECT q_id, c_id, CAST(SUM(term) AS BIGINT) AS adc
              FROM terms GROUP BY q_id, c_id),
    ranked AS (
        SELECT q_id, c_id AS neighbor_id, adc,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                       ORDER BY adc, c_id) AS BIGINT) AS rnk
        FROM dists)
    SELECT q_id, neighbor_id, rnk, CAST(adc AS DOUBLE) / 1e12 AS adc_dist
    FROM ranked WHERE rnk <= 5
    """


@register(
    "sim_ivfpq_topk",
    oracle=_ivfpq_oracle(),
    tags=("similarity", "pq", "ivf", "ann"),
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (FAISS IVFPQ shape): one narrow corpus pass computes
    BOTH the coarse cell and the PQ codes as expressions over broadcast
    folds; queries probe their nearest cell and ADC-scan only that cell's
    compressed codes. Sub-linear candidates x O(m)-per-candidate cost —
    the compounding of the two scale paths."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    cb = S.pq_codebook_sample(emb)
    queries = emb.filter(
        (F.col("vec_id") >= S.PQ_KSUB) & (F.col("vec_id") < S.PQ_KSUB + 8)
    )
    return S.ivf_pq_topk(emb, cents, cb, queries, k=5)


def _ann_lsh_oracle() -> str:
    """DuckDB oracle for the LSH ANN path: the bucket assignment is the
    SAME fixed-point int64 arithmetic on both engines (lsh_bucket_fragments),
    so 'approximate' is still deterministic — candidates, ranks and cosines
    hash-compare exactly (same construction as `_ivf_oracle`)."""
    nrm = P.scaled_dot("embedding", "embedding", "embedding")["duck"]
    dot = P.scaled_dot("qv", "v", "qv")["duck"]
    bucket = S.lsh_bucket_fragments("embedding")["duck"]
    return f"""
    WITH nrm AS (
        SELECT vec_id, embedding, {nrm} AS n2, {bucket} AS bucket FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, embedding AS qv, n2 AS q_n2, bucket AS q_bucket
          FROM nrm WHERE vec_id < 8),
    c AS (SELECT vec_id AS c_id, embedding AS v, n2 AS c_n2, bucket FROM nrm),
    pairs AS (
        SELECT q_id, c_id,
               CAST({dot} AS DOUBLE)
                   / (sqrt(CAST(q_n2 AS DOUBLE)) * sqrt(CAST(c_n2 AS DOUBLE))) AS cos_sim
        FROM q JOIN c ON bucket = q_bucket AND q_id <> c_id
    ),
    ranked AS (
        SELECT q_id, c_id AS neighbor_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                       ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rnk
        FROM pairs
    )
    SELECT q_id, neighbor_id, rnk, cos_sim FROM ranked WHERE rnk <= 5
    """


@register(
    "sim_ann_lsh_topk",
    oracle=_ann_lsh_oracle(),
    tags=("similarity", "lsh", "ann"),
    bench=True,
)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-5 for 8 queries (candidates only from the
    query's hyperplane bucket — the sub-linear path); recall vs exact
    top-k sanity-tested in tests/test_ann_quality.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_topk_lsh(emb, emb.filter(F.col("vec_id") < 8), k=5).withColumnRenamed(
        "rank", "rnk"
    )


def _multimodal_oracle() -> str:
    """DuckDB oracle for the mapInPandas multimodal kernel: the stub
    feature is bytes 0..7 of sha256(payload)/255 as float32 — rebuilt in
    SQL by slicing the hex digest (hex pair -> int via strpos) and matching
    the float32 quantization (CAST AS FLOAT) before %.6f formatting, so
    the Arrow kernel and the oracle print identical strings."""
    hexv = "0123456789abcdef"
    feats = ", ".join(
        f"printf('%.6f', CAST(CAST(((strpos('{hexv}', substr(h, {2 * k + 1}, 1)) - 1) * 16"
        f" + strpos('{hexv}', substr(h, {2 * k + 2}, 1)) - 1) / 255.0 AS FLOAT) AS DOUBLE))"
        for k in range(8)
    )
    return f"""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
               CAST(octet_length(encode('.' || text)) AS BIGINT) AS n_bytes,
               sha256('.' || text) AS h
        FROM documents
    )
    SELECT media_id, kind, n_bytes, h AS content_hash,
           concat_ws(',', {feats}) AS feature_str
    FROM media
    """


@register(
    "multimodal_features",
    oracle=_multimodal_oracle(),
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end on synthesized media: document text
    bytes become binary payloads; mapInPandas extracts size/hash/feature
    (deterministic stub kernel standing in for image/audio codecs). The
    gated projection renders the float32 feature vector as a fixed-precision
    string so it is hashable and engine-comparable; the array<float> API
    surface is exercised in tests/test_e2e_pipeline.py."""
    from ..operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        # '.' prefix pins the DIGEST feature path: document text can
        # never sniff as a PPM/BMP/WAV header, so the oracle's
        # sha256-stub model stays valid however real the codecs get
        # (r6 review finding)
        F.encode(F.concat(F.lit("."), F.col("text")), "UTF-8").alias("payload"),
        F.lit(None)
        .cast("struct<mime:string,width:int,height:int,duration_ms:int>")
        .alias("meta"),
    )
    return extract_features(media).select(
        "media_id",
        "kind",
        "n_bytes",
        "content_hash",
        F.expr(
            "array_join(transform(feature, x -> format_string('%.6f', CAST(x AS DOUBLE))), ',')"
        ).alias("feature_str"),
    )


def _simhash_pairs_oracle(max_hamming: int = 1) -> str:
    return f"""
    WITH th AS (SELECT doc_id, {_TH['duck']} AS _th FROM documents),
    sh AS (SELECT doc_id, {_SIMHASH_DUCK} AS simhash FROM th),
    bands AS (
        SELECT doc_id, simhash, b AS band,
               CAST(FLOOR(simhash / (2 ** (b * 8))) AS BIGINT) % 256 AS band_key
        FROM sh, range(0, 4) t(b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sim_a, b.simhash AS sim_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
    """


@register(
    "dedup_simhash_pairs",
    oracle=_simhash_pairs_oracle(),
    tags=("dedup", "simhash"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 32-bit fingerprints banded into 4 bytes —
    near-identical docs share at least one byte band (pigeonhole: with
    hamming <= 1 at least 3 of 4 bands are equal) — candidates verified by
    exact Hamming distance. Threshold 1 because this corpus's shared
    vocabulary makes bag-of-words SimHash collide aggressively.
    Same equi-join-on-band scale shape as MinHash LSH."""
    from ..operators.scale import spread_small_input
    from ..operators.text import with_simhash

    docs = with_simhash(
        spread_small_input(load_table(spark, sf_dir, "documents"), F.col("doc_id"))
    ).select("doc_id", "simhash")
    bands = docs.select(
        "doc_id",
        "simhash",
        F.expr(
            "explode(transform(sequence(0, 3), b -> "
            "struct(b AS band, CAST(FLOOR(simhash / power(2, b * 8)) AS BIGINT) % 256 AS band_key)))"
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)"))
        .filter(F.col("hamming") <= 1)
        .select("doc_a", "doc_b", "hamming")
    )


def _decontaminate_oracle(min_shared: int = 3) -> str:
    """DuckDB oracle: same shingle-hash sets (`P.shingle_hashes`), benchmark
    = every 97th doc id (a deterministic pseudo-eval set), corpus = the
    rest; a corpus doc is contaminated when it shares >= min_shared distinct
    shingle hashes with the benchmark's union set."""
    sh = P.shingle_hashes("text")["duck"]
    return f"""
    WITH shingled AS (
        SELECT doc_id, {sh} AS sh FROM documents WHERE {_NTOK['duck']} >= 3
    ),
    bench AS (
        SELECT DISTINCT h
        FROM (SELECT unnest(sh) AS h FROM shingled WHERE doc_id % 97 = 0)
    ),
    hits AS (
        SELECT c.doc_id, c.n_shingles, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
                     unnest(sh) AS h
              FROM shingled WHERE doc_id % 97 <> 0) c
        JOIN bench USING (h)
        GROUP BY c.doc_id, c.n_shingles
    )
    SELECT doc_id, n_shared, n_shingles,
           CAST(n_shared AS DOUBLE) / n_shingles AS contaminated_frac
    FROM hits WHERE n_shared >= {min_shared}
    """


@register(
    "dedup_decontaminate",
    oracle=_decontaminate_oracle(),
    tags=("dedup", "decontamination"),
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (n-gram test-set-leakage check): corpus
    docs sharing >= 3 distinct 3-token shingles with the pseudo-eval set
    (doc_id % 97 = 0). Broadcast the eval shingle hashes; the corpus never
    self-joins — the scale shape of every production decontamination pass."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    out = D.decontaminate(corpus, bench, "doc_id", min_shared=3)
    return out.select(
        F.col("id").alias("doc_id"), "n_shared", "n_shingles", "contaminated_frac"
    )


def _repetition_oracle() -> str:
    from ..operators.text import repetition_fragments

    rep = repetition_fragments("text")["duck"]
    return f"""
    SELECT doc_id, {rep} AS repetition_ratio
    FROM documents
    WHERE {rep} > 0.0
    """


@register(
    "text_repetition",
    oracle=_repetition_oracle(),
    tags=("text", "quality"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal n-gram repetition ratio (Gopher/MassiveText-style quality
    signal): docs with any repeated 3-token shingle, with the ratio.
    Pure expression — one scan, no shuffle before the filter."""
    from ..operators.text import with_repetition_ratio

    docs = load_table(spark, sf_dir, "documents")
    return with_repetition_ratio(docs).filter(
        F.col("repetition_ratio") > 0.0
    ).select("doc_id", "repetition_ratio")


def _pack_oracle(budget: int = 2048) -> str:
    """DuckDB oracle for sequence packing: ONE global window cumsum — fine
    for an oracle at sf0.01, exactly the plan the Spark side must NOT use
    (see training.with_prefix_offsets for the distributed two-level sum)."""
    return f"""
    WITH t AS (
        SELECT doc_id, CAST({_NTOK['duck']} AS BIGINT) AS n_tok FROM documents
    ),
    c AS (
        SELECT doc_id, n_tok,
               CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS cum_before
        FROM t
    )
    SELECT doc_id, n_tok, cum_before,
           cum_before // {budget} AS seq_first,
           CASE WHEN n_tok > 0 THEN (cum_before + n_tok - 1) // {budget}
                ELSE cum_before // {budget} END AS seq_last
    FROM c
    """


@register(
    "pack_token_sequences",
    oracle=_pack_oracle(),
    tags=("training", "packing"),
    bench=True,  # new plan family (distributed prefix sum) — track regressions
)
def pack_token_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: documents concatenated in id order, cut
    every 2048 tokens; each doc's (seq_first, seq_last) span from a
    DISTRIBUTED prefix sum (range partition -> per-partition window ->
    broadcast offsets) — never the oracle's single-partition global
    window."""
    from ..operators.training import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=2048)


_TB_BUDGET = 4000


@register(
    "sample_token_budget",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, CAST({_NTOK['duck']} AS BIGINT) AS n_tok
        FROM documents
    ),
    sel AS (
        SELECT doc_id, lang, n_tok,
               CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY n_tok DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM toks
    )
    SELECT doc_id, lang, n_tok, cum_before
    FROM sel WHERE cum_before < {_TB_BUDGET}
    """,
    tags=("training", "sampling", "mixing"),
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum take-until-token-budget (the Dolma/RedPajama mixing
    primitive): each language keeps its highest-priority docs
    (longest-first, id tiebreak) until the stratum's cumulative token
    count crosses the budget. The oracle states the one-level
    per-stratum window; the Spark side is the scale-safe TWO-LEVEL scan
    (per-stratum literal priority cuts -> within-(stratum, bucket)
    window -> driver-size subtotal offsets broadcast back) — a plain
    PARTITION BY lang window would funnel each multi-billion-row
    language through one reducer at 100 TB."""
    from ..operators.training import sample_token_budget as op

    docs = load_table(spark, sf_dir, "documents")
    return op(docs, budget=_TB_BUDGET)


_UP_BUDGET = 60_000
_UP_MAX_EPOCHS = 3


@register(
    "sample_upsample_epochs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, CAST({_NTOK['duck']} AS BIGINT) AS n_tok
        FROM documents
    ),
    pre AS (
        SELECT doc_id, lang, n_tok,
               CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY n_tok DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM toks
    ),
    tot AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS t FROM toks GROUP BY lang),
    fan AS (
        SELECT p.doc_id, p.lang, p.n_tok, p.cum_before, t.t,
               -- zero-total strata (every doc tokenizes to 0) clamp to
               -- one epoch exactly like the Spark side (training.py
               -- upsample_token_budget's _tot > 0 CASE); a bare // t.t
               -- would NULL the row out and silently drop the stratum
               -- (r11 advisor)
               LEAST({_UP_MAX_EPOCHS},
                     CASE WHEN t.t > 0
                          THEN ({_UP_BUDGET} - 1 - p.cum_before) // t.t + 1
                          ELSE 1 END) AS e_max
        FROM pre p JOIN tot t ON p.lang IS NOT DISTINCT FROM t.lang
        WHERE p.cum_before < {_UP_BUDGET}
    )
    SELECT doc_id, lang, CAST(g.epoch AS BIGINT) AS epoch, n_tok,
           CAST((g.epoch - 1) * t + cum_before AS BIGINT) AS cum_global
    FROM fan CROSS JOIN generate_series(1, {_UP_MAX_EPOCHS}) AS g(epoch)
    WHERE g.epoch <= fan.e_max
    """,
    tags=("training", "sampling", "mixing", "upsampling"),
)
def sample_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-repetition mixing (the LLaMA/Dolma "repeat small sources up
    to k epochs" rule): each language's docs cycle in priority order
    until the token budget is crossed or max_epochs full cycles emit —
    the complement of sample_token_budget for UNDER-budget strata. The
    Spark side derives everything from the shared two-level per-stratum
    prefix scan plus a broadcast per-stratum totals frame (the epoch
    fan-out is a narrow per-row sequence explode); the oracle states the
    one-level window + lateral generate_series. Integral `div` on both
    sides — a double-precision epoch boundary would round at real
    (10^12-token) budgets."""
    from ..operators.training import upsample_token_budget

    docs = load_table(spark, sf_dir, "documents")
    return upsample_token_budget(
        docs, budget=_UP_BUDGET, max_epochs=_UP_MAX_EPOCHS
    )


def _stratified_oracle() -> str:
    from ..operators.training import sample_fragments

    rate = (
        "CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE) "
        "WHEN lang = 'de' THEN CAST(0.5 AS DOUBLE) "
        "WHEN lang = 'fr' THEN CAST(0.25 AS DOUBLE) "
        "ELSE CAST(0.1 AS DOUBLE) END"
    )
    keep = sample_fragments("doc_id", rate)["duck"]
    return f"""
    SELECT lang, COUNT(*) AS n_kept
    FROM documents
    WHERE {keep}
    GROUP BY lang
    """


@register(
    "sample_stratified_mix",
    oracle=_stratified_oracle(),
    tags=("training", "sampling"),
)
def sample_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (mixture weights per language:
    en 100%, de 50%, fr 25%, rest 10%): hash-threshold keep predicate, a
    single narrow filter — no RNG (retry-stable), no shuffle before the
    count."""
    from ..operators.training import sample_stratified

    docs = load_table(spark, sf_dir, "documents")
    kept = sample_stratified(
        docs,
        {"en": 1.0, "de": 0.5, "fr": 0.25},
        strata_col="lang",
        id_col="doc_id",
        default_fraction=0.1,
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


def _rarity_oracle(source_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """Token-rarity oracle over an arbitrary (doc_id, text) relation —
    shared by the natural-corpus gate and the Zipf-injected skew bench
    row (r12 verdict item 8)."""
    return f"""
    WITH src AS ({source_sql}),
    tok AS (
        SELECT doc_id, unnest({_TOK['duck']}) AS token FROM src
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
    cnts AS (
        SELECT doc_id,
               CAST(COUNT(*) OVER (PARTITION BY token) AS BIGINT) AS cnt
        FROM tok
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(tot.n // cnt) AS BIGINT) AS rarity_sum,
           CAST(SUM(tot.n // cnt) AS DOUBLE) / COUNT(*) AS mean_rarity
    FROM cnts, tot
    GROUP BY doc_id
    """


@register(
    "text_rarity_score",
    oracle=_rarity_oracle(),
    tags=("text", "quality", "rarity"),
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token rarity (log-free unigram-perplexity proxy): each
    token contributes the INTEGER ratio corpus_total div token_count —
    int64 all the way, one double division at the end, so the score is
    order-independent and engine-exact where a log-based perplexity
    diverges by libm ulps (the BM25 stance). Partial-aggregated
    (doc, token) collapse + vocab-count join-back — NOT a raw-token
    window, which Zipfian token frequency turns into a one-task funnel
    at crawl scale (see `operators.text.token_rarity`)."""
    from ..operators.text import token_rarity

    docs = load_table(spark, sf_dir, "documents")
    return token_rarity(docs)


# the injected hot token and its share of the skewed stream: each doc
# appends n_tokens copies of 'zipfhot', so the hot token is EXACTLY 50%
# of the corpus token stream — a skew factor far past anything a natural
# sf0.1 corpus carries (documented for BENCH adjudication, r12 item 8)
_SKEW_HOT_TOKEN = "zipfhot"
_SKEW_SRC_DUCK = (
    "SELECT doc_id, text || repeat(' " + _SKEW_HOT_TOKEN + "', "
    f"{_NTOK['duck']}) AS text FROM documents"
)


@register(
    "text_rarity_skew",
    oracle=_rarity_oracle(_SKEW_SRC_DUCK),
    tags=("text", "rarity", "skew", "bench-canary"),
    bench=True,  # the skew canary MUST stay a bench row
)
def text_rarity_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key canary (r12 verdict item 8): token rarity over a corpus
    with an INJECTED Zipf head — every doc appends n_tokens copies of
    one token, so that token is exactly 50% of the whole occurrence
    stream. With `token_rarity`'s partial-agg + join-back plan the hot
    token collapses map-side and this row times like the natural-corpus
    rarity query; a reintroduced raw-token-keyed WindowExec (the r12
    scale-killer class) would funnel HALF the corpus token stream
    through one task and show up as a loud bench regression, not just a
    plan-review find. Oracle = the shared rarity SQL over the same
    skewed relation."""
    from ..operators.text import token_rarity

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    skewed = docs.withColumn(
        "text",
        F.expr(
            f"concat(text, repeat(' {_SKEW_HOT_TOKEN}', {P.n_tokens('text')['spark']}))"
        ),
    )
    return token_rarity(skewed)


def _novelty_oracle(n: int = 3) -> str:
    sh = P.shingle_hashes("text", n)["duck"]
    return f"""
    WITH sh AS (
        SELECT doc_id, unnest({sh}) AS sh FROM documents
    ),
    firsts AS (
        SELECT doc_id, sh,
               MIN(doc_id) OVER (PARTITION BY sh) AS first_doc
        FROM sh
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS novelty
    FROM firsts
    GROUP BY doc_id
    """


@register(
    "text_ngram_novelty",
    oracle=_novelty_oracle(),
    tags=("text", "quality", "novelty", "dedup"),
    bench=True,  # partial-agg + join-back de-Zipf rewrite (r13) — track
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram novelty (share of the doc's distinct 3-gram
    shingles first seen in this doc, id order) — the diversity/freshness
    curation signal near-dup detection misses: syndication and template
    spam score near 0 without being a near-dup of any single doc.
    Partial-aggregated MIN(id)-per-shingle + join-back, NOT a raw-shingle
    window — a crawl-wide boilerplate shingle would funnel one WindowExec
    task (see `operators.text.ngram_novelty`)."""
    from ..operators.text import ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(docs)


@register(
    "text_token_diversity",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOK['duck']}) AS token FROM documents
    ),
    dt AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS occ
        FROM tok GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(SUM(occ) AS BIGINT) AS n_tok,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(occ) * SUM(occ) - SUM(occ * occ) AS DOUBLE)
               / CAST(SUM(occ) * SUM(occ) AS DOUBLE) AS simpson,
           CAST(COUNT(*) AS DOUBLE) / SUM(occ) AS ttr
    FROM dt GROUP BY doc_id
    """,
    tags=("text", "quality", "diversity"),
)
def text_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Simpson/Gini lexical diversity + type-token ratio — the
    third leg of the quality-scoring family (gopher = thresholds,
    rarity = corpus-relative informativeness, diversity = within-doc
    distributional health; repetition spam scores near 0 here even when
    its shingles are corpus-unique and novelty misses it). Exact int64
    arithmetic up to ONE double division per score, so engine-exact
    without the varchar bridge; no corpus-global key anywhere in the
    plan — both aggregations are doc-keyed, the strongest Zipf-safety
    shape in the family (see `operators.text.token_diversity`)."""
    from ..operators.text import token_diversity

    docs = load_table(spark, sf_dir, "documents")
    return token_diversity(docs)


@register(
    "text_keywords",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOK['duck']}) AS token FROM documents
    ),
    dt AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS occ
        FROM tok GROUP BY doc_id, token
    ),
    dfr AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS dfreq
        FROM dt GROUP BY token
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT dt.doc_id, dt.token, dt.occ * (nd.n_docs // dfr.dfreq) AS score
        FROM dt JOIN dfr USING (token) CROSS JOIN nd
    ),
    ranked AS (
        SELECT doc_id, token, score,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, token
               ) AS rk
        FROM scored
    )
    SELECT doc_id, CAST(rk AS BIGINT) AS rk, token,
           CAST(score AS BIGINT) AS score
    FROM ranked WHERE rk <= 3
    """,
    tags=("text", "keywords", "tfidf", "topk"),
)
def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by log-free tf-idf (occ x
    (n_docs div df)) — the tag/keyword-extraction step of a curation
    pipeline, int64-exact cross-engine like BM25/rarity. Document
    frequency is a partial-aggregable groupBy over (doc, token)-distinct
    rows; the only window partitions by DOC ID (partition size bounded
    by document length, not corpus Zipf — the plan-lint-approved key
    class). Deterministic tie-break on token order."""
    from ..operators.text import doc_keywords

    docs = load_table(spark, sf_dir, "documents")
    return doc_keywords(docs)


@register(
    "text_typo_pairs",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_TOK['duck']}) AS token FROM documents
    ),
    cnt AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ),
    vocab AS (SELECT token, cnt FROM cnt WHERE length(token) >= 4),
    d1 AS (
        SELECT token,
               substr(token, 1, i - 1) || substr(token, i + 1) AS key
        FROM (SELECT token,
                     unnest(generate_series(1, length(token))) AS i
              FROM vocab)
    ),
    d2 AS (
        SELECT token,
               substr(key, 1, i - 1) || substr(key, i + 1) AS key
        FROM (SELECT token, key,
                     unnest(generate_series(1, greatest(length(key), 1))) AS i
              FROM d1 WHERE length(key) >= 1)
    ),
    keys AS (
        SELECT DISTINCT token, key FROM (
            SELECT token, token AS key FROM vocab
            UNION ALL SELECT token, key FROM d1
            UNION ALL SELECT token, key FROM d2
        )
    ),
    cand AS (
        SELECT DISTINCT a.token AS tok_a, b.token AS tok_b
        FROM keys a JOIN keys b ON a.key = b.key AND a.token < b.token
    ),
    hits AS (
        SELECT tok_a, tok_b,
               CAST(levenshtein(tok_a, tok_b) AS BIGINT) AS dist
        FROM cand WHERE levenshtein(tok_a, tok_b) <= 2
    )
    SELECT h.tok_a, h.tok_b, h.dist, ca.cnt AS cnt_a, cb.cnt AS cnt_b
    FROM hits h
    JOIN vocab ca ON ca.token = h.tok_a
    JOIN vocab cb ON cb.token = h.tok_b
    """,
    tags=("text", "dedup", "fuzzy-join", "typo"),
)
def text_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spelling-variant / typo pairs across the corpus vocabulary at
    edit distance <= 2 — the SymSpell deletion-neighborhood equi-join
    (never all-pairs), exact by blocking theorem + integer levenshtein
    verify on both engines. The missing fuzzy-JOIN leg of the
    similarity family (prefix-Jaccard = set fuzzy join, this = string
    fuzzy join); corpus counts ride along so the rare->frequent
    normalization direction is readable. See `operators.text.typo_pairs`
    for the scale argument."""
    from ..operators.text import typo_pairs

    docs = load_table(spark, sf_dir, "documents")
    return typo_pairs(docs)


def _temperature_oracle() -> str:
    from ..operators.training import sample_fragments

    keep = sample_fragments("d.doc_id", "r.rate")["duck"]
    return f"""
    WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    mn AS (SELECT MIN(n) AS n_min FROM cnt),
    rated AS (
        SELECT cnt.lang AS rl, sqrt(CAST(mn.n_min AS DOUBLE) / cnt.n) AS rate
        FROM cnt, mn
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rated r ON d.lang IS NOT DISTINCT FROM r.rl
    WHERE {keep}
    """


@register(
    "sample_temperature_mix",
    oracle=_temperature_oracle(),
    tags=("training", "sampling", "mixing", "temperature"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature/alpha sampling (the mT5 multilingual mixing rule,
    alpha=0.5): each language keeps rate (n_min/n_lang)^(1-alpha), so
    kept counts flatten to ∝ n_lang^alpha with the smallest language
    kept whole — the data-DERIVED-rates complement of
    `sample_stratified_mix`'s user-given rates. The Spark side inlines
    engine-evaluated sqrt-of-literal-counts rates into one narrow hash-
    threshold filter (no join, no shuffle); the oracle derives the same
    rates in SQL — division and sqrt are IEEE correctly-rounded on both
    engines, so the thresholds agree bit-exactly."""
    from ..operators.training import sample_temperature

    docs = load_table(spark, sf_dir, "documents")
    return sample_temperature(docs, alpha=0.5).select("doc_id", "lang")


def _weighted_oracle() -> str:
    from ..operators.training import weighted_sample_key

    key = weighted_sample_key("doc_id", "n_chars")["duck"]
    return f"""
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(ROW_NUMBER() OVER (ORDER BY {key} DESC, doc_id) AS BIGINT)
               AS draw_rank
    FROM documents
    WHERE CAST(n_chars AS DOUBLE) > 0
    QUALIFY draw_rank <= 50
    """


@register(
    "sample_weighted_docs",
    oracle=_weighted_oracle(),
    tags=("training", "sampling"),
)
def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement (Efraimidis–Spirakis A-ES):
    50 documents drawn with probability proportional to length — the
    per-ROW-weight mixture primitive `sample_stratified`'s per-stratum
    rates can't express. Deterministic (the id hash is the randomness),
    and the global top-k is the two-level salted reduction, never a
    single-reducer window (the oracle's one-level QUALIFY is the
    semantic spec; results are provably identical)."""
    from ..operators.training import sample_weighted

    docs = load_table(spark, sf_dir, "documents")
    return sample_weighted(docs, "doc_id", "n_chars", k=50).select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"), "draw_rank"
    )


def _split_oracle() -> str:
    from ..operators.training import split_fragments

    case = split_fragments("doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})[
        "duck"
    ]
    return f"""
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(25,6))) AS BIGINT) AS n_chars
    FROM (SELECT {case} AS split, n_chars FROM documents) t
    GROUP BY split
    """


@register(
    "split_train_val_test",
    oracle=_split_oracle(),
    tags=("training", "sampling"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment: hash-threshold
    CASE over the portable uniform, one narrow projection — an id keeps
    its split across reruns over a grown corpus, so held-out examples
    can never migrate into training. Gated on per-split doc and char
    counts."""
    from ..operators.training import split_assign

    docs = load_table(spark, sf_dir, "documents")
    return (
        split_assign(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(25,6)")).cast("long").alias("n_chars"),
        )
    )
