"""Decontamination (n-gram test-set-leakage check) and repetition-ratio
quality signal — operator-level semantics on hand-built corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pq_cdc_spark.operators.dedup import decontaminate
from go_pq_cdc_spark.operators.text import with_repetition_ratio


def test_decontaminate_flags_overlap_not_clean_docs(spark):
    corpus = spark.createDataFrame(
        [
            # verbatim copy of the benchmark doc -> all shingles shared
            (1, "the quick brown fox jumps over the lazy dog"),
            # partial overlap: shares exactly the benchmark's first shingles
            (2, "the quick brown fox sat still today ok fine"),
            # no 3-gram overlap at all
            (3, "completely unrelated words about spark plans here"),
            # too short to shingle -> never flagged
            (4, "two words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r["n_shared"]
        for r in decontaminate(corpus, bench, min_shared=2).collect()
    }
    assert out[1] == 7  # 9 tokens -> 7 shingles, all shared
    assert out[2] == 2  # "the quick brown", "quick brown fox"
    assert 3 not in out and 4 not in out

    # threshold monotonicity: raising min_shared can only drop docs
    strict = {r["id"] for r in decontaminate(corpus, bench, min_shared=5).collect()}
    assert strict == {1}


def test_decontaminate_broadcasts_benchmark_side(spark):
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(20)],
        "doc_id long, text string",
    )
    bench = corpus.limit(2)
    plan = (
        decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # eval set broadcast, corpus streams


def test_shingle_paths_total_on_short_docs(spark):
    """ANSI regression gate: docs with < n tokens must flow through every
    shingle-based path as empty sets, never as an out-of-range element_at
    (Spark's sequence() runs backwards on start>stop; optimizer-inferred
    predicates can evaluate the shingle expression on rows the caller's
    size-guard filter would drop)."""
    from go_pq_cdc_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox jumps over the lazy dog"),
            (2, "en", "the quick brown fox jumps over the lazy dog"),
            (3, "en", "two words"),
            (4, "en", "one"),
            (5, "en", ""),
        ],
        "doc_id long, lang string, text string",
    )
    pairs = minhash_lsh_pairs(docs, "doc_id").collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}
    jac = ngram_jaccard_pairs(docs, "doc_id", block_col="lang").collect()
    assert {(r["doc_a"], r["doc_b"]) for r in jac} == {(1, 2)}


def test_repetition_ratio_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 shingles, 3 distinct
            (2, "one two three four five"),  # all distinct -> 0.0
            (3, "x y"),  # too short -> 0.0
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["repetition_ratio"]
        for r in with_repetition_ratio(docs).collect()
    }
    assert abs(out[1] - (1.0 - 3.0 / 7.0)) < 1e-12
    assert out[2] == 0.0 and out[3] == 0.0

    # expression-only: no shuffle in the plan (narrow projection off the scan)
    plan = (
        with_repetition_ratio(docs)
        .filter(F.col("repetition_ratio") > 0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_minhash_hot_bucket_cap(spark):
    """The LSH hot-bucket cap: a degenerate bucket (here, an exact-dup
    template cluster whose every band bucket exceeds the cap) is dropped
    from candidate generation, while ordinary near-dup pairs below the
    cap are untouched; max_bucket=None reproduces the uncapped output
    exactly."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators.dedup import minhash_lsh_pairs

    template = "the quick brown fox jumps over the lazy dog again and again today"
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    rows = [(i, template) for i in range(10)] + [(100, near_a), (101, near_b)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(df, "doc_id", threshold=0.5).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(df, "doc_id", threshold=0.5, max_bucket=5).collect()
    }
    # uncapped: all template pairs (45) + the near-dup pair
    assert (100, 101) in uncapped and len(uncapped) == 46
    # capped: the 10-member template buckets are dropped; the near-dup
    # pair (bucket size 2) survives
    assert capped == {(100, 101)}
    # None-cap is bit-identical to the historical behavior
    none_cap = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", threshold=0.5, max_bucket=None
        ).collect()
    }
    assert none_cap == uncapped


def test_collapse_exact_identity_randomized(spark):
    """The exact-dup pre-collapse is output-IDENTICAL to the direct LSH
    path — on a randomized corpus mixing verbatim duplicate groups of
    varying sizes, near-duplicates, singletons, and un-shingleable short
    docs, both capped and uncapped (the cap weights each representative
    by its group size, so the same buckets die either way)."""
    import random

    from go_pq_cdc_spark.operators.dedup import minhash_lsh_pairs

    rng = random.Random(0xC0FFEE)
    vocab = [f"w{i}" for i in range(40)]
    rows: list[tuple[int, str]] = []
    next_id = 0
    for _ in range(12):
        base = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 20)))
        copies = rng.choice([1, 1, 1, 2, 3, 7])
        for _ in range(copies):
            rows.append((next_id, base))
            next_id += 1
        if rng.random() < 0.5:  # a near-dup: one token appended
            rows.append((next_id, base + " " + rng.choice(vocab)))
            next_id += 1
    rows.append((next_id, "too short"))  # un-shingleable (< 3 tokens)
    rng.shuffle(rows)  # ids interleave across groups
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    for cap in (None, 4):
        direct = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(
                df, "doc_id", threshold=0.4, max_bucket=cap, collapse_exact=False
            ).collect()
        }
        collapsed = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(
                df, "doc_id", threshold=0.4, max_bucket=cap, collapse_exact=True
            ).collect()
        }
        assert collapsed == direct, f"cap={cap}: {collapsed ^ direct}"
    assert len(direct) > 0


def test_collapse_auto_dispatch(spark):
    """collapse_exact="auto" (the default) measures the verbatim-dup mass
    with one count+HLL aggregate and picks the path: a dup-heavy corpus
    takes the collapse, a dup-free corpus takes the direct path — output
    identical to both forced modes either way."""
    from go_pq_cdc_spark.operators.dedup import minhash_lsh_pairs

    vocab = [f"w{i}" for i in range(30)]
    base = " ".join(vocab[i % 30] for i in range(12))
    # dup-heavy: 4 groups x 5 verbatim copies
    dup_rows = [
        (g * 10 + c, f"{base} g{g}") for g in range(4) for c in range(5)
    ]
    dup = spark.createDataFrame(dup_rows, "doc_id bigint, text string")
    # dup-free: every doc distinct
    uniq_rows = [(i, f"{base} u{i}") for i in range(20)]
    uniq = spark.createDataFrame(uniq_rows, "doc_id bigint, text string")

    for df in (dup, uniq):
        got = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(df, "doc_id", threshold=0.4).collect()
        }
        forced = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(
                df, "doc_id", threshold=0.4, collapse_exact=True
            ).collect()
        }
        assert got == forced
    # dup corpus: every intra-group pair present at jaccard 1.0
    got_dup = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(dup, "doc_id", threshold=0.4).collect()
        if r["jaccard"] == 1.0
    }
    for g in range(4):
        ids = [g * 10 + c for c in range(5)]
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                assert (a, b) in got_dup


def test_dup_ratio_hint_skips_probe(spark):
    """A caller-supplied dup_ratio (e.g. from an earlier text_profile
    pass) replaces the auto probe: PLANNING the pairs DataFrame launches
    ZERO Spark jobs (the probe was an eager count+HLL collect), and the
    dispatch is identical to what the probe would have picked — >=5%
    collapses, below stays direct (r8 verdict item 8)."""
    from go_pq_cdc_spark.operators.dedup import minhash_lsh_pairs

    vocab = [f"w{i}" for i in range(30)]
    base = " ".join(vocab[i % 30] for i in range(12))
    rows = [(g * 10 + c, f"{base} g{g}") for g in range(4) for c in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    sc = spark.sparkContext
    sc.setJobGroup("dup_ratio_hint", "zero-job assertion")
    try:
        hinted = minhash_lsh_pairs(
            df, "doc_id", threshold=0.4, dup_ratio=0.8
        )
        ids = sc.statusTracker().getJobIdsForGroup("dup_ratio_hint")
    finally:
        sc.setJobGroup("", "")
    assert list(ids) == [], "dup_ratio hint must not launch the probe job"

    # dispatch identity: hinted >=5% == forced collapse; hinted <5% ==
    # forced direct (and all four agree on the output set)
    def pairset(d):
        return {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in d.collect()
        }

    assert pairset(hinted) == pairset(
        minhash_lsh_pairs(df, "doc_id", threshold=0.4, collapse_exact=True)
    )
    assert pairset(
        minhash_lsh_pairs(df, "doc_id", threshold=0.4, dup_ratio=0.0)
    ) == pairset(
        minhash_lsh_pairs(df, "doc_id", threshold=0.4, collapse_exact=False)
    )


def test_substring_dup_pairs_hashed_identity(spark):
    """The hashed (production, 8-byte shuffle key) arm of
    substring_dup_pairs is output-identical to the string-gram arm on a
    corpus with real span-level duplication — xxhash64 collisions at
    2^-64 never surface at any realistic corpus size."""
    import random

    from go_pq_cdc_spark.operators.text import substring_dup_pairs

    rng = random.Random(0xBEEF)
    vocab = [f"w{i}" for i in range(50)]
    span = " ".join(rng.choice(vocab) for _ in range(12))  # a shared span
    rows = []
    for i in range(30):
        prefix = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10)))
        suffix = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10)))
        # half the docs embed the shared span; all differ as wholes
        body = f"{prefix} {span} {suffix}" if i % 2 == 0 else f"{prefix} {suffix} x{i}"
        rows.append((i, body))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def pairs(hashed):
        return {
            (r["doc_a"], r["doc_b"], r["shared_ngrams"])
            for r in substring_dup_pairs(
                df, "doc_id", n=8, max_docs=20, hashed=hashed
            ).collect()
        }

    plain, fast = pairs(False), pairs(True)
    assert plain == fast
    assert len(plain) > 0  # span-sharers found each other


def test_substring_dup_pairs_hashed_identity_real_corpus(spark):
    """ADVICE r13: the hashed-vs-string identity pinned on the REAL
    documents corpus (the bench row `text_substring_dedup` ships
    hashed=True while its DuckDB oracle stays exact-string SQL — this is
    the deterministic canary that catches a gram-expression edit
    breaking injectivity-up-to-hashing before the probabilistic oracle
    gate ever could)."""
    from tests.conftest import SF_DIR

    from go_pq_cdc_spark.catalog import load_table
    from go_pq_cdc_spark.operators.text import substring_dup_pairs

    docs = load_table(spark, SF_DIR, "documents")

    def pairs(hashed):
        return {
            (r["doc_a"], r["doc_b"], r["shared_ngrams"])
            for r in substring_dup_pairs(
                docs, "doc_id", n=8, max_docs=20, hashed=hashed
            ).collect()
        }

    plain, fast = pairs(False), pairs(True)
    assert plain == fast
    assert len(plain) > 0  # the corpus has real span-level duplication


def test_substring_dedup_apply_semantics(spark):
    """Span REMOVAL semantics pinned by hand: keep-first-occurrence
    (global (doc_id, position) order), within-doc repeats removed,
    overlapping hits merged into one span, fully-covered docs read
    empty, untouched docs pass through byte-identical."""
    from go_pq_cdc_spark.operators.text import substring_dedup_apply

    S = " ".join(f"s{i}" for i in range(1, 9))  # exactly 8 shared tokens
    T = " ".join(f"t{i}" for i in range(1, 10))  # 9 tokens -> overlap pair
    rows = [
        (1, f"a1 a2 {S} a3"),      # first occurrence: owner keeps it
        (2, f"b1 {S} b2 b3"),      # later occurrence: span cut
        (3, S),                    # doc IS the span: fully covered
        (4, "c1 c2 c3"),           # no shared grams: untouched
        (5, f"{S} d1 {S}"),        # within-doc repeat: BOTH cut (owner is doc 1)
        (6, f"e1 {T} e2"),         # overlap-pair owner
        (7, f"f1 f2 {T}"),         # two overlapping hits merge into one span
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["dedup_text"], r["n_tokens_removed"])
        for r in substring_dedup_apply(df, "doc_id", n=8).collect()
    }
    assert out[1] == (f"a1 a2 {S} a3", 0)
    assert out[2] == ("b1 b2 b3", 8)
    assert out[3] == ("", 8)
    assert out[4] == ("c1 c2 c3", 0)
    assert out[5] == ("d1", 16)
    assert out[6] == (f"e1 {T} e2", 0)
    assert out[7] == ("f1 f2", 9)


def test_substring_dedup_apply_null_and_empty_text(spark):
    """r14: the rebuild aggregate folded the coverage filter and the
    token total into one doc-keyed pass (dropping the fourth corpus scan
    and the join-back). Pin the edge rows that shape must reproduce
    exactly: NULL text -> ("", NULL n_tokens_removed) like the old
    size(NULL)=NULL join-back; empty text -> ("", 0); whitespace-only
    and short docs pass through untouched."""
    from go_pq_cdc_spark.operators.text import substring_dedup_apply

    S = " ".join(f"s{i}" for i in range(1, 9))
    rows = [
        (1, None),               # NULL text
        (2, ""),                 # empty text: one '' token, no grams
        (3, "x1 x2"),            # short doc, no grams
        (4, f"k0 {S}"),          # owner
        (5, f"{S} k1"),          # later occurrence: cut
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["dedup_text"], r["n_tokens_removed"])
        for r in substring_dedup_apply(df, "doc_id", n=8).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}, "every input doc must appear"
    assert out[1] == ("", None)
    assert out[2] == ("", 0)
    assert out[3] == ("x1 x2", 0)
    assert out[4] == (f"k0 {S}", 0)
    assert out[5] == ("k1", 8)


def _span_corpus(seed: int, n_docs: int = 20):
    """Docs with per-doc DISJOINT vocab plus at most ONE shared span
    each: any gram crossing a removal junction contains a doc-unique
    token, so no NEW cross-doc gram can appear after removal — the
    domain where single-pass span dedup is provably idempotent (matches
    real corpora, where glue-gram collisions are vanishingly rare)."""
    import random

    rng = random.Random(seed)
    spans = [
        " ".join(f"sh{k}_{j}" for j in range(rng.randint(8, 14)))
        for k in range(3)
    ]
    rows = []
    for i in range(n_docs):
        words = [f"d{i}_w{j}" for j in range(rng.randint(4, 25))]
        if rng.random() < 0.7:
            pos = rng.randint(0, len(words))
            words[pos:pos] = [rng.choice(spans)]
        rows.append((i, " ".join(words)))
    return rows


def test_substring_dedup_apply_idempotent(spark):
    """dedup(dedup(x)) == dedup(x) (r9 verdict item 4's property): after
    one pass only first occurrences remain, so a second pass finds no
    shared gram and removes nothing."""
    from go_pq_cdc_spark.operators.text import substring_dedup_apply

    for seed in (1, 0xCAFE, 0x5EED):
        df = spark.createDataFrame(
            _span_corpus(seed), "doc_id bigint, text string"
        )
        once = substring_dedup_apply(df, "doc_id", n=8)
        first = {
            r["doc_id"]: r["dedup_text"] for r in once.collect()
        }
        assert any(
            r["n_tokens_removed"] > 0 for r in once.collect()
        ), "corpus must actually exercise removal"
        twice = substring_dedup_apply(
            spark.createDataFrame(
                list(first.items()), "doc_id bigint, text string"
            ),
            "doc_id",
            n=8,
        )
        for r in twice.collect():
            assert r["n_tokens_removed"] == 0
            assert r["dedup_text"] == first[r["doc_id"]]


def test_substring_dedup_apply_hashed_identity(spark):
    """The hashed (production, 8-byte shuffle key) arm is
    output-identical to the string-gram arm."""
    from go_pq_cdc_spark.operators.text import substring_dedup_apply

    df = spark.createDataFrame(_span_corpus(7), "doc_id bigint, text string")

    def run(hashed):
        return {
            r["doc_id"]: (r["dedup_text"], r["n_tokens_removed"])
            for r in substring_dedup_apply(
                df, "doc_id", n=8, hashed=hashed
            ).collect()
        }

    plain, fast = run(False), run(True)
    assert plain == fast
    assert any(v[1] > 0 for v in plain.values())
