"""Training-data assembly operators: sequence packing (distributed prefix
sum correctness incl. empty docs and boundary spans) and deterministic
sampling (retry-stability, stratified rates)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_pq_cdc_spark.operators.training import (
    pack_sequences,
    sample_deterministic,
    sample_stratified,
    with_prefix_offsets,
)


def test_prefix_offsets_match_serial_cumsum(spark):
    """The two-level distributed sum must equal the serial exclusive
    cumsum for any id order/weights — including ids far apart and zero
    weights."""
    rows = [(i * 7, (i * 13) % 5) for i in range(200)]  # some zero weights
    df = spark.createDataFrame(rows, "id long, w long")
    got = {
        r["id"]: r["cum_before"]
        for r in with_prefix_offsets(df, "id", "w").collect()
    }
    acc = 0
    for i, w in sorted(rows):
        assert got[i] == acc, f"id {i}: {got[i]} != {acc}"
        acc += w


def test_pack_sequences_spans_and_boundaries(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # 4 tokens -> seq 0
            (2, "e f g"),          # tokens 4..6 -> seq 0, crosses at 8? no
            (3, "h i j k l m"),    # tokens 7..12 -> spans seq 0 -> 1 (budget 8)
            (4, ""),               # empty doc pins to its boundary seq
            (5, "n o p"),          # tokens 14..16 -> spans seq 1 -> 2
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tok"], r["cum_before"], r["seq_first"], r["seq_last"])
        for r in pack_sequences(docs, budget=8).collect()
    }
    assert out[1] == (4, 0, 0, 0)
    assert out[2] == (3, 4, 0, 0)
    assert out[3] == (6, 7, 0, 1)  # crosses the 8-token boundary
    # split('') on empty text yields one empty token on Spark AND DuckDB —
    # the portable n_tokens contract counts it as 1
    assert out[4][0] == 1
    assert out[5] == (3, 14, 1, 2)  # tokens 14..16 cross the 16 boundary


def test_sample_deterministic_stable_and_monotone(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in sample_deterministic(df, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in sample_deterministic(df, "doc_id", 0.3).collect()}
    assert a == b  # retry-stable: same rows every run
    assert 0.2 < len(a) / 2000 < 0.4
    bigger = {r["doc_id"] for r in sample_deterministic(df, "doc_id", 0.6).collect()}
    assert a <= bigger  # threshold sampling nests: rate up, superset out


def test_sample_stratified_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = sample_stratified(
        df, {"en": 1.0, "de": 0.2}, strata_col="lang", id_col="doc_id"
    )
    counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["en"] == 1000  # rate 1.0 keeps everything
    assert 100 < counts.get("de", 0) < 300  # ~20%
    # unknown stratum with default 0.0 drops out entirely
    df2 = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
    assert sample_stratified(
        df2, {"en": 1.0}, strata_col="lang", id_col="doc_id"
    ).count() == 0


def test_quantize_embeddings_reconstruction_bound(spark):
    """Dequantized values must sit within scale/2 of the originals
    (linear quantization's error bound), constant vectors reconstruct
    exactly, and NULL vectors are dropped."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators.training import quantize_embeddings

    rows = [
        (1, [0.0, 1.0, 0.25, -1.0]),
        (2, [3.5, 3.5, 3.5]),   # constant: scale 0, reconstructs exactly
        (3, None),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["id"]: r for r in quantize_embeddings(df).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    orig = [0.0, 1.0, 0.25, -1.0]
    for code, x in zip(r1["q"], orig):
        recon = r1["mn"] + code * r1["scale"]
        assert abs(recon - x) <= r1["scale"] / 2 + 1e-12
    assert 0 in r1["q"] and 255 in r1["q"]  # min and max hit the endpoints
    r2 = out[2]
    assert r2["scale"] == 0.0 and r2["q"] == [0, 0, 0]
    assert abs(r2["mn"] - 3.5) < 1e-6  # all elements reconstruct as mn


def test_cluster_balanced_sampling_excludes_null_vectors(spark):
    """r6 review: a NULL embedding has no cell — it must be excluded, not
    tie-broken into cell 0 and sampled at cell 0's rate."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.catalog import load_table
    from go_pq_cdc_spark.operators.training import sample_cluster_balanced

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    with_null = emb.unionByName(
        emb.limit(1).select(
            F.lit(999999).cast("long").alias("vec_id"),
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(None).cast("int").alias("label"),
        )
    )
    cents = emb.filter(F.col("vec_id") < 8)
    kept = sample_cluster_balanced(
        with_null, cents, {0: 1.0, 1: 0.5, 2: 0.25}, default_fraction=0.1
    )
    assert kept.filter(F.col("id") == 999999).count() == 0


def test_epoch_order_is_a_seeded_permutation(spark):
    """epoch_order: positions are exactly 0..n-1 (a permutation), stable
    across re-runs for the same seed, and a different seed yields a
    different ordering."""
    from go_pq_cdc_spark.catalog import load_table
    from go_pq_cdc_spark.operators.training import epoch_order

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    n = docs.count()
    s1 = {r["doc_id"]: r["pos"] for r in epoch_order(docs, "doc_id", seed=1).collect()}
    assert sorted(s1.values()) == list(range(n))
    again = {r["doc_id"]: r["pos"] for r in epoch_order(docs, "doc_id", seed=1).collect()}
    assert again == s1
    s2 = {r["doc_id"]: r["pos"] for r in epoch_order(docs, "doc_id", seed=2).collect()}
    assert sorted(s2.values()) == list(range(n))
    assert s2 != s1


def test_epoch_order_arithmetic_pid_matches_boundary_count(spark):
    """r14: epoch_order derives the bucket id as min(nb-1, (ek-1) DIV
    width) instead of the generic O(nb) boundary-array filter. Pin the
    two spellings equal at the adversarial edges — ek=0, exact bucket
    boundaries, boundary±1, and the key-space max — for the real
    (nb, width) the operator computes on this session."""
    from go_pq_cdc_spark.operators.training import epoch_order  # noqa: F401

    par = spark.sparkContext.defaultParallelism
    nb = max(1, min(par, 1024))
    if nb < 2:
        pytest.skip("single-bucket session: no boundaries to compare")
    width = (1 << 60) // nb
    bounds = [i * width for i in range(1, nb)]
    eks = {0, 1, width - 1, width, width + 1, (1 << 60) - 1}
    for i in (1, 2, nb // 2, nb - 1):
        eks |= {i * width - 1, i * width, i * width + 1}
    df = spark.createDataFrame([(e,) for e in sorted(eks)], "_ek long")
    barr = F.array(*[F.lit(b) for b in bounds])
    generic = F.size(F.filter(barr, lambda b: b < F.col("_ek"))).cast("int")
    arith = F.least(F.lit(nb - 1), F.expr(f"(_ek - 1) DIV {width}")).cast("int")
    bad = df.select("_ek", generic.alias("g"), arith.alias("a")).filter(
        F.col("g") != F.col("a")
    )
    assert bad.count() == 0, bad.collect()


def test_prefix_offsets_rejects_bad_weights(spark):
    """The non-negative-integer weight contract must actually ENFORCE: the
    r5 guard lived in a withColumn(...).drop(...) column that Catalyst
    pruned along with its assert (dead code, found in r6). Now fused into
    the weight column itself: negative and NULL weights raise; valid
    weights pass through unchanged."""
    import pytest

    from go_pq_cdc_spark.operators.training import with_prefix_offsets

    bad = spark.createDataFrame([(1, 5), (2, -3)], "id long, w long")
    with pytest.raises(Exception, match="non-negative"):
        with_prefix_offsets(bad, "id", "w").collect()
    nulls = spark.createDataFrame([(1, 5), (2, None)], "id long, w long")
    with pytest.raises(Exception, match="non-negative"):
        with_prefix_offsets(nulls, "id", "w").collect()
    ok = spark.createDataFrame([(1, 5), (2, 3)], "id long, w long")
    rows = {r["id"]: r["cum_before"] for r in with_prefix_offsets(ok, "id", "w").collect()}
    assert rows == {1: 0, 2: 5}


def test_prefix_offsets_string_keys(spark):
    """r6 review: a STRING order key (e.g. 'doc-<n>' ids) must bucket via
    the sampled-boundary path — not crash on a long cast (ANSI) or
    silently collapse to one bucket — and must match the driver-side
    ground truth. Also covers column names needing quoting."""
    from go_pq_cdc_spark.operators.training import with_prefix_offsets

    rows = [(f"doc-{i:04d}", i % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "`my id` string, w long")
    out = {
        r["my id"]: r["cum_before"]
        for r in with_prefix_offsets(df, "my id", "w").collect()
    }
    expect, acc = {}, 0
    for k, w in sorted(rows):
        expect[k] = acc
        acc += w
    assert out == expect


def test_sample_weighted_aes_properties(spark):
    """A-ES weighted sampling: dominant weights always win the first
    draw, non-positive weights are excluded, k >= corpus returns every
    eligible row, and the two-level salted reduction equals the
    driver-computed one-level ranking exactly."""
    import math

    from pyspark.sql import Row

    from go_pq_cdc_spark.operators.training import (
        SAMPLE_BASIS,
        sample_weighted,
        weighted_sample_key,
    )

    rows = [Row(id=i, w=float(w)) for i, w in enumerate([1, 5, 0, -2, 1e9, 3, 2])]
    df = spark.createDataFrame(rows)
    out = sample_weighted(df, "id", "w", k=3).collect()
    assert [r["draw_rank"] for r in sorted(out, key=lambda r: r["draw_rank"])] == [1, 2, 3]
    # the 1e9-weight row dominates: ln(u)/w -> ~0^- beats every other key
    assert sorted(out, key=lambda r: r["draw_rank"])[0]["id"] == 4
    # zero/negative weights never drawn
    assert {r["id"] for r in out}.isdisjoint({2, 3})

    everything = sample_weighted(df, "id", "w", k=100).collect()
    assert {r["id"] for r in everything} == {0, 1, 4, 5, 6}  # all w > 0

    # two-level == one-level: recompute keys driver-side from the same
    # portable expression and compare the full ranking
    keyed = df.filter(df.w > 0).selectExpr(
        "id", weighted_sample_key("id", "w")["spark"] + " AS k"
    ).collect()
    expect = [r["id"] for r in sorted(keyed, key=lambda r: (-r["k"], r["id"]))]
    got = [
        r["id"]
        for r in sorted(everything, key=lambda r: r["draw_rank"])
    ]
    assert got == expect


def test_split_assign_exhaustive_stable_and_validated(spark):
    """Every id lands in EXACTLY one split; assignment is stable across
    calls and corpus growth (an id never migrates); bad ratios raise."""
    import pytest as _pytest

    from pyspark.sql import Row

    from go_pq_cdc_spark.operators.training import split_assign

    df = spark.createDataFrame([Row(id=i) for i in range(500)])
    ratios = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["id"]: r["split"] for r in split_assign(df, "id", ratios).collect()}
    assert set(a.values()) == {"train", "val", "test"}
    assert len(a) == 500
    # rough proportions (hash-uniform, 500 ids)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.7 * 500 < n_train < 0.9 * 500
    # growth stability: the same ids keep their split in a larger corpus
    bigger = spark.createDataFrame([Row(id=i) for i in range(1000)])
    b = {r["id"]: r["split"] for r in split_assign(bigger, "id", ratios).collect()}
    assert all(b[i] == a[i] for i in a)
    with _pytest.raises(ValueError, match="sum"):
        split_assign(df, "id", {"a": 0.9, "b": 0.2})
    with _pytest.raises(ValueError, match="non-negative"):
        split_assign(df, "id", {"a": -0.1, "b": 0.5})


def test_split_assign_single_split(spark):
    """r7 review: a one-entry ratios dict must produce a constant split,
    not invalid zero-branch CASE SQL."""
    from pyspark.sql import Row

    from go_pq_cdc_spark.operators.training import split_assign

    df = spark.createDataFrame([Row(id=i) for i in range(5)])
    out = split_assign(df, "id", {"holdout": 1.0}).collect()
    assert {r["split"] for r in out} == {"holdout"}


def test_weighted_sample_key_resolution(spark):
    """r7 review: the A-ES uniform must be high-resolution — with the old
    1e-4 quantization, distinct ids collide into the same u class and the
    'sample' degenerates to heaviest-in-class. 500 equal-weight ids must
    produce 500 distinct keys."""
    from pyspark.sql import Row

    from go_pq_cdc_spark.operators.training import weighted_sample_key

    df = spark.createDataFrame([Row(id=i, w=1.0) for i in range(500)])
    keys = [
        r["k"]
        for r in df.selectExpr(
            weighted_sample_key("id", "w")["spark"] + " AS k"
        ).collect()
    ]
    assert len(set(keys)) == 500


def test_sample_token_budget_matches_one_level_window(spark):
    """The two-level per-stratum scan must equal the naive one-level
    PARTITION BY window (the oracle formulation), including whole-bucket
    ties and the crossed-budget boundary doc."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from go_pq_cdc_spark.operators.training import sample_token_budget

    rows = []
    did = 0
    for lang, sizes in (
        ("en", [50, 40, 40, 40, 30, 5, 5]),   # ties at 40 span buckets
        ("de", [100]),                         # single doc over budget
        ("fr", [10, 10, 10, 10]),
    ):
        for n in sizes:
            did += 1
            rows.append((did, lang, " ".join(["w"] * n)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    budget = 100
    got = {
        (r["doc_id"]): (r["lang"], r["n_tok"], r["cum_before"])
        for r in sample_token_budget(df, budget, n_cuts=3).collect()
    }
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_tok"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["doc_id"]: (r["lang"], r["n_tok"], r["cum_before"])
        for r in df.select("doc_id", "lang", ntok.alias("n_tok"))
        .withColumn(
            "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
        )
        .filter(F.col("cum_before") < budget)
        .collect()
    }
    assert got == want
    # every stratum keeps at least its first doc, even one over budget
    assert {lang for lang, _n, _c in got.values()} == {"en", "de", "fr"}
    # the budget is exclusive-prefix: de's single 100-token doc is kept
    assert got[8] == ("de", 100, 0)


def test_sample_token_budget_null_stratum_and_null_text(spark):
    """r11 review: a NULL stratum is a real group (null-safe join + an
    explicit CASE branch — a plain equi-join silently dropped it); NULL
    text is a loud contract violation, never a silent misordering."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from go_pq_cdc_spark.operators.training import sample_token_budget

    rows = [
        (1, "en", " ".join(["w"] * 50)),
        (2, None, " ".join(["w"] * 30)),
        (3, None, " ".join(["w"] * 80)),
        (4, None, " ".join(["w"] * 80)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["lang"], r["cum_before"])
        for r in sample_token_budget(df, 100, n_cuts=2).collect()
    }
    # NULL stratum ordered (n_tok desc, id): 3(80) kept at 0, 4(80)
    # crosses at 80 (<100, kept), 2(30) at 160 dropped
    assert got == {1: ("en", 0), 3: (None, 0), 4: (None, 80)}

    bad = spark.createDataFrame(
        [(1, "en", None)], "doc_id long, lang string, text string"
    )
    with pytest.raises(Exception, match="sample_token_budget"):
        sample_token_budget(bad, 100, n_cuts=2).collect()


def test_upsample_token_budget_epochs_and_caps(spark):
    """Epoch repetition: under-budget strata cycle whole epochs until the
    budget is crossed (partial last epoch), max_epochs caps repetition,
    and an over-budget stratum degenerates to a single partial epoch."""
    from go_pq_cdc_spark.operators.training import upsample_token_budget

    rows = [
        # 'small': 30 tokens/epoch -> epochs at budget 100: e1(0), e2(30),
        # e3(60), e4 would start at 90 (<100) but max_epochs=3 caps it
        (1, "small", " ".join(["w"] * 20)),
        (2, "small", " ".join(["w"] * 10)),
        # 'big': 120 tokens -> doc 3 (70, cum 0) kept, doc 4 (50, cum 70)
        # kept, no second epoch (starts at 120 >= 100)
        (3, "big", " ".join(["w"] * 70)),
        (4, "big", " ".join(["w"] * 50)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = sorted(
        (r["lang"], r["doc_id"], r["epoch"], r["cum_global"])
        for r in upsample_token_budget(df, 100, max_epochs=3, n_cuts=2).collect()
    )
    want = sorted(
        [
            ("small", 1, 1, 0), ("small", 2, 1, 20),
            ("small", 1, 2, 30), ("small", 2, 2, 50),
            ("small", 1, 3, 60), ("small", 2, 3, 80),
            ("big", 3, 1, 0), ("big", 4, 1, 70),
        ]
    )
    assert got == want


def test_upsample_token_budget_zero_total_stratum(spark):
    """Degenerate stratum whose docs ALL tokenize to zero (r11 verdict
    item 5): the epoch divisor is the stratum total, so the fan-out must
    clamp to exactly one epoch instead of dividing by zero — each doc
    emits once at epoch 1 with cum_global 0, and mixed strata are
    unaffected. Whitespace tokenization counts every doc >= 1 token, so
    the case is driven through `_epoch_fanout` on a handcrafted prefix
    frame; the registry oracle mirrors the clamp with an explicit CASE
    (plans/pipeline.py sample_upsample_epochs)."""
    from go_pq_cdc_spark.operators.training import _epoch_fanout

    rows = [
        # (doc_id, lang, n_tok, cum_before) — 'empty' totals 0 tokens
        (1, "empty", 0, 0),
        (2, "empty", 0, 0),
        # live stratum: 30 tokens/epoch
        (3, "live", 20, 0),
        (4, "live", 10, 20),
    ]
    pre = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tok long, cum_before long"
    )
    got = sorted(
        (r["lang"], r["doc_id"], r["epoch"], r["n_tok"], r["cum_global"])
        for r in _epoch_fanout(pre, 100, 3, "lang", "doc_id").collect()
    )
    want = sorted(
        [
            # zero-total stratum: one epoch, no repetition, prefix stays 0
            ("empty", 1, 1, 0, 0),
            ("empty", 2, 1, 0, 0),
            # live stratum cycles normally (30/epoch, budget 100, cap 3)
            ("live", 3, 1, 20, 0), ("live", 4, 1, 10, 20),
            ("live", 3, 2, 20, 30), ("live", 4, 2, 10, 50),
            ("live", 3, 3, 20, 60), ("live", 4, 3, 10, 80),
        ]
    )
    assert got == want

    # the aligned DuckDB-oracle fragment agrees on the same frame: a bare
    # `// t` would NULL the zero-total stratum out of the result entirely
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pre (doc_id BIGINT, lang VARCHAR, n_tok BIGINT, "
        "cum_before BIGINT)"
    )
    con.executemany("INSERT INTO pre VALUES (?, ?, ?, ?)", rows)
    oracle_rows = con.execute(
        """
        WITH tot AS (
            SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS t FROM pre GROUP BY lang
        ),
        fan AS (
            SELECT p.doc_id, p.lang, p.n_tok, p.cum_before, t.t,
                   LEAST(3, CASE WHEN t.t > 0
                                 THEN (100 - 1 - p.cum_before) // t.t + 1
                                 ELSE 1 END) AS e_max
            FROM pre p JOIN tot t ON p.lang IS NOT DISTINCT FROM t.lang
            WHERE p.cum_before < 100
        )
        SELECT lang, doc_id, CAST(g.epoch AS BIGINT) AS epoch, n_tok,
               CAST((g.epoch - 1) * t + cum_before AS BIGINT) AS cum_global
        FROM fan CROSS JOIN generate_series(1, 3) AS g(epoch)
        WHERE g.epoch <= fan.e_max
        """
    ).fetchall()
    assert sorted(oracle_rows) == want


def test_sample_temperature_flattens_to_alpha(spark):
    """Temperature sampling: the smallest stratum is kept whole, larger
    strata downsample at (n_min/n_i)^(1-alpha) so kept counts flatten to
    ~n_i^alpha; alpha=1 keeps everything; NULL strata are a stratum."""
    from go_pq_cdc_spark.operators.training import sample_temperature

    rows = (
        [(i, "big") for i in range(4000)]
        + [(10_000 + i, "small") for i in range(250)]
        + [(20_000 + i, None) for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = {
        r["lang"]: r["n"]
        for r in sample_temperature(df, alpha=0.5)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert kept["small"] == 250  # anchor stratum kept whole
    # big: rate sqrt(250/4000) = 0.25 -> ~1000 of 4000
    assert 800 < kept["big"] < 1200
    # NULL stratum: rate sqrt(250/1000) = 0.5 -> ~500 of 1000
    assert 380 < kept[None] < 620
    # alpha=1 is proportional: everything kept
    assert sample_temperature(df, alpha=1.0).count() == len(rows)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        sample_temperature(df, alpha=0.0)


def test_ngram_novelty_first_occurrence_semantics(spark):
    """A doc repeating an earlier doc's shingles scores 0 novelty; the
    first doc scores 1.0; partial overlap lands in between; docs shorter
    than n tokens are absent."""
    from go_pq_cdc_spark.operators.text import ngram_novelty

    rows = [
        (1, "a b c d"),            # shingles {a b c, b c d} -> novelty 1.0
        (2, "a b c d"),            # exact restatement -> 0.0
        (3, "a b c x y z"),        # {a b c, b c x, c x y, x y z}: 3 of 4 new
        (4, "t u"),                # too short: absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(df).collect()
    }
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (4, 3, 0.75)
    assert 4 not in got


def test_token_rarity_integer_exactness(spark):
    """Rarity is exact integer arithmetic until the final division: a
    token appearing c times out of N total contributes N div c to every
    doc containing it (per occurrence)."""
    from go_pq_cdc_spark.operators.text import token_rarity

    rows = [
        (1, "common common rare"),   # N=6: common cnt 4 -> 1 each; rare cnt 1 -> 6
        (2, "common common other"),  # other cnt 1 -> 6
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tok"], r["rarity_sum"], r["mean_rarity"])
        for r in token_rarity(df).collect()
    }
    # doc 1: 1 + 1 + 6 = 8 over 3 tokens
    assert got[1] == (3, 8, 8.0 / 3)
    assert got[2] == (3, 8, 8.0 / 3)


def test_sample_temperature_general_alpha_pow_branch(spark):
    """alpha != 0.5 goes through pow() instead of sqrt: rate
    (n_min/n_i)^(1-alpha) still anchors the smallest stratum at 1.0 and
    keeps ~n_i^alpha of larger ones (alpha=0.75: rate (250/4000)^0.25
    ~= 0.5)."""
    from go_pq_cdc_spark.operators.training import sample_temperature

    rows = [(i, "big") for i in range(4000)] + [
        (10_000 + i, "small") for i in range(250)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = {
        r["lang"]: r["n"]
        for r in sample_temperature(df, alpha=0.75)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert kept["small"] == 250
    assert 1700 < kept["big"] < 2300  # ~0.5 * 4000


def test_samplers_refuse_high_cardinality_strata(spark):
    """The CASE-inlining samplers are designed for low-cardinality strata
    (languages/sources); a high-cardinality stratum column must REFUSE
    before a strata-sized collect reaches the driver or a mega-CASE
    reaches the plan (r12 verdict item 4 — the max_groups pattern). The
    collects are LIMIT-bounded, so the probe cost is max_strata+1 rows."""
    import pytest

    from go_pq_cdc_spark.operators.training import (
        sample_stratified,
        sample_temperature,
        sample_token_budget,
        upsample_token_budget,
    )

    # 25 distinct strata against a ceiling of 8 — refusal must name the
    # column and point at the bounded-stratum escape hatch
    df = spark.createDataFrame(
        [(i, f"s{i % 25}", "alpha beta gamma") for i in range(200)],
        "doc_id long, lang string, text string",
    )
    with pytest.raises(ValueError, match="lang.*more than 8|more than 8"):
        sample_temperature(df, alpha=0.5, max_strata=8)
    with pytest.raises(ValueError, match="hash bucket"):
        sample_token_budget(df, budget=100, n_cuts=4, max_strata=8)
    with pytest.raises(ValueError, match="hash bucket"):
        upsample_token_budget(df, budget=100, n_cuts=4, max_strata=8)
    # the user-given map gets the same plan-size ceiling
    from go_pq_cdc_spark.operators import training as tr

    big_map = {f"s{i}": 0.5 for i in range(tr.MAX_STRATA + 1)}
    with pytest.raises(ValueError, match="sample_stratified"):
        sample_stratified(df, big_map, strata_col="lang", id_col="doc_id")
    # under the ceiling everything still works (incl. the derived
    # token-budget default of 32_000 // n_cuts)
    assert sample_temperature(df, alpha=0.5, max_strata=25).count() > 0
    assert sample_token_budget(df, budget=10**9, n_cuts=4).count() == 200


def test_token_diversity_simpson_and_ttr(spark):
    """Simpson diversity is exact integer arithmetic until the final
    division: a doc of n tokens with per-token counts c_t scores
    (n^2 - sum c_t^2) / n^2. Repetition spam scores 0; all-distinct
    prose scores 1 - 1/n."""
    from go_pq_cdc_spark.operators.text import token_diversity

    rows = [
        (1, "spam spam spam spam"),       # n=4, s2=16 -> simpson 0
        (2, "alpha beta gamma delta"),    # n=4, all distinct -> 12/16
        (3, "a a b c"),                   # n=4, s2=4+1+1=6 -> 10/16
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tok"], r["n_distinct"], r["simpson"], r["ttr"])
        for r in token_diversity(df).collect()
    }
    assert got[1] == (4, 1, 0.0, 0.25)
    assert got[2] == (4, 4, 12.0 / 16, 1.0)
    assert got[3] == (4, 3, 10.0 / 16, 0.75)


def test_doc_keywords_rational_tfidf_and_ties(spark):
    """Keyword scores are exact integer tf x (n_docs div df) and the
    top-k tie-break is token order."""
    from go_pq_cdc_spark.operators.text import doc_keywords

    rows = [
        (1, "apple apple banana common"),
        (2, "banana cherry common common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rk"]): (r["token"], r["score"])
        for r in doc_keywords(df, top_k=3).collect()
    }
    # df: apple 1, banana 2, cherry 1, common 2; weights 2/1/2/1
    assert got[(1, 1)] == ("apple", 4)
    assert got[(1, 2)] == ("banana", 1)  # tie with common -> token order
    assert got[(1, 3)] == ("common", 1)
    assert got[(2, 1)] == ("cherry", 2)  # tie with common (2) -> order
    assert got[(2, 2)] == ("common", 2)
    assert got[(2, 3)] == ("banana", 1)


def test_typo_pairs_matches_brute_force(spark):
    """SymSpell deletion-neighborhood blocking finds EXACTLY the
    brute-force lev<=d pair set (no false negatives by the alignment
    theorem, no false positives by the verify), at d=1 and d=2, and
    counts ride along."""
    from go_pq_cdc_spark.operators.text import typo_pairs

    words = [
        "spark", "spork", "sprak", "shark", "sharp", "apache", "apacha",
        "apched", "table", "tables", "tabel", "zzzzq", "stream",
    ]

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    for d in (1, 2):
        got = {
            (r["tok_a"], r["tok_b"], r["dist"])
            for r in typo_pairs(df, max_dist=d).collect()
        }
        want = {
            (a, b, lev(a, b))
            for a in words
            for b in words
            if a < b and len(a) >= 4 and len(b) >= 4 and lev(a, b) <= d
        }
        assert got == want, (d, got ^ want)
    assert want  # d=2 set is non-trivial on this fixture
    # counts join back
    (r,) = [
        r for r in typo_pairs(df).collect()
        if (r["tok_a"], r["tok_b"]) == ("table", "tables")
    ]
    assert (r["cnt_a"], r["cnt_b"]) == (1, 1)
    import pytest as _pt

    with _pt.raises(ValueError, match="max_dist"):
        typo_pairs(df, max_dist=3)


def test_emb_mad_outliers_robust_semantics(spark):
    """Median/MAD are exact on the fixed-point grid and the 3-MAD fence
    counts exactly the planted outliers — while a mean-based fence on
    the same data would move with the corruption."""
    import statistics

    from go_pq_cdc_spark.plans.corpus import emb_mad_outliers

    # dim 1: tight cluster + two wild outliers; dim 2: uniform, none
    vals1 = [0.10, 0.11, 0.12, 0.13, 0.14, 0.15, 0.16, 9.0, -9.0]
    vals2 = [float(i) / 10 for i in range(9)]
    rows = [(i, [a, b]) for i, (a, b) in enumerate(zip(vals1, vals2))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        out = {r["dim"]: r for r in emb_mad_outliers(spark, d).collect()}
    q1 = sorted(round(v * 1e6) for v in vals1)
    med1 = statistics.median(q1)
    mad1 = statistics.median(sorted(abs(q - med1) for q in q1))
    assert out[1]["med_e"] == med1 / 1e6
    assert out[1]["mad_e"] == mad1 / 1e6
    assert out[1]["n_outliers"] == 2  # exactly the planted wild pair
    assert out[2]["n_outliers"] == 0  # uniform dim: nothing past 3 MAD
