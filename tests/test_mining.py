"""Unit tests for the r10 mining family: exact heavy hitters (Misra-Gries
candidate pass), BM25 top-k, and SemDeDup semantic deduplication.

The registry-level oracle parity of the three queries is covered by the
driver gate / tools/verify_driver_contract.py; these tests pin the
operator-level guarantees the oracles cannot see: the MG no-false-negative
property under forced decrements, the BM25 ranking semantics and the
exact/double-arm agreement, and the SemDeDup survivor invariants against a
brute-force reference.
"""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from go_pq_cdc_spark.operators.search import bm25_topk
from go_pq_cdc_spark.operators.sketch import heavy_hitters_exact, mg_partition_summaries
from go_pq_cdc_spark.operators.dedup import semantic_dedup


# ---------------------------------------------------------------- heavy hitters


class TestHeavyHitters:
    def _skewed(self, spark, n_hot=400, n_noise=1600):
        # one hot key at 20%, noise keys each ~unique: forces MG decrements
        # at capacity 8 (noise cardinality >> capacity)
        rows = [("hot",)] * n_hot + [(f"nz{i}",) for i in range(n_noise)]
        return spark.createDataFrame(rows, "item string").repartition(8)

    def test_finds_all_true_heavy_hitters_exactly(self, spark):
        df = self._skewed(spark)
        out = heavy_hitters_exact(df, "item", phi=0.1, capacity=16).collect()
        assert {r["item"] for r in out} == {"hot"}
        (hot,) = out
        assert hot["cnt"] == 400
        assert hot["freq"] == 400 / 2000

    def test_decrement_path_keeps_guarantee(self, spark):
        # capacity 16 with 1600 distinct noise keys per the fixture: every
        # partition's summary decrements many times, yet the phi=0.1 hitter
        # must survive candidate generation (no false negatives).
        df = self._skewed(spark)
        cands = {
            r["item"]
            for r in mg_partition_summaries(df, "item", capacity=16).collect()
        }
        assert "hot" in cands
        # summaries are bounded: <= capacity rows per partition
        per_part = (
            mg_partition_summaries(df, "item", capacity=16)
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .collect()
        )
        assert all(r["count"] <= 16 for r in per_part)

    def test_capacity_below_phi_guarantee_raises(self, spark):
        df = self._skewed(spark, n_hot=10, n_noise=10)
        with pytest.raises(ValueError, match="capacity"):
            heavy_hitters_exact(df, "item", phi=0.01, capacity=8)

    def test_counts_match_brute_force(self, spark):
        rows = [(f"k{i % 7}",) for i in range(700)] + [("rare",)] * 3
        df = spark.createDataFrame(rows, "item string").repartition(5)
        out = {
            r["item"]: r["cnt"]
            for r in heavy_hitters_exact(df, "item", phi=0.05, capacity=64).collect()
        }
        # each of k0..k6 is 100/703 ~ 14.2% > 5%; 'rare' is 0.4% -> dropped
        assert out == {f"k{i}": 100 for i in range(7)}


# ------------------------------------------------------------------------ BM25


def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    """Driver-side textbook BM25 with the same log-free rational idf."""
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl = total / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for i, tv in toks.items():
        s = 0.0
        for t in terms:
            tf = tv.count(t)
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(tv) / avgdl))
        scores[i] = s
    return scores


class TestBM25:
    DOCS = [
        (0, "merge sort merge join merge"),
        (1, "vector scan vector"),
        (2, "window stream window"),
        (3, "table filter group agg"),
        (4, "merge vector window stream"),
        (5, "stream stream stream stream stream stream"),
    ]
    TERMS = ("merge", "vector", "window", "stream")

    def test_ranking_matches_reference(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        out = bm25_topk(df, self.TERMS, k=6).collect()
        got = [r["doc_id"] for r in sorted(out, key=lambda r: r["rnk"])]
        ref = _bm25_ref(self.DOCS, self.TERMS)
        want = sorted(ref, key=lambda i: (-ref[i], i))
        assert got == want
        # scores agree with the textbook formula to fp tolerance (the
        # exact-rational rewrite is algebraically identical)
        by_id = {r["doc_id"]: r["score"] for r in out}
        for i, s in ref.items():
            assert math.isclose(by_id[i], s, rel_tol=1e-12)

    def test_doc_without_terms_scores_zero(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        out = {r["doc_id"]: r["score"] for r in bm25_topk(df, self.TERMS, k=6).collect()}
        assert out[3] == 0.0

    def test_exact_and_double_arms_agree_on_ranking(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        a = [(r["doc_id"], r["rnk"]) for r in bm25_topk(df, self.TERMS, k=6, exact=True).collect()]
        b = [(r["doc_id"], r["rnk"]) for r in bm25_topk(df, self.TERMS, k=6, exact=False).collect()]
        assert sorted(a) == sorted(b)

    def test_k_truncates(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        assert bm25_topk(df, self.TERMS, k=2).count() == 2


# -------------------------------------------------------------------- SemDeDup


def _brute_semdedup(vecs, n_cents, tau):
    """Reference: nearest-centroid (dot desc, cent asc), within-cell cosine
    pairs, connected components, min-id survivor."""

    def fdot(a, b):  # mirrors portable.scaled_dot fixed-point rounding
        return sum(
            int(round(x * 1e6)) * int(round(y * 1e6)) for x, y in zip(a, b)
        )

    cents = {i: v for i, v in vecs.items() if i < n_cents}
    cell = {
        i: min(cents, key=lambda c: (-fdot(v, cents[c]), c)) for i, v in vecs.items()
    }
    adj = {i: {i} for i in vecs}
    for a, b in itertools.combinations(sorted(vecs), 2):
        if cell[a] != cell[b]:
            continue
        cs = fdot(vecs[a], vecs[b]) / (
            math.sqrt(fdot(vecs[a], vecs[a])) * math.sqrt(fdot(vecs[b], vecs[b]))
        )
        if cs >= tau:
            adj[a].add(b)
            adj[b].add(a)
    surv = {}
    for i in vecs:
        seen, stack = {i}, [i]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        surv[i] = min(seen)
    return cell, surv


class TestSemanticDedup:
    def _vecs(self):
        # 2 well-separated directions + near-dup bundles around each,
        # plus one orthogonal singleton
        return {
            0: [1.0, 0.0, 0.0, 0.0],
            1: [0.0, 1.0, 0.0, 0.0],
            2: [0.99, 0.01, 0.0, 0.0],  # ~dup of 0's direction
            3: [0.98, -0.02, 0.0, 0.0],
            4: [0.02, 0.97, 0.0, 0.0],  # ~dup of 1's direction
            5: [0.0, 0.0, 1.0, 0.0],  # orthogonal: own component
        }

    def test_matches_brute_force(self, spark):
        vecs = self._vecs()
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        cents = df.filter(F.col("vec_id") < 2)
        out = semantic_dedup(df, cents, threshold=0.9, grid=4).collect()
        # float32 storage: brute force must see the same float32-rounded values
        stored = {
            r["vec_id"]: list(r["embedding"])
            for r in df.select("vec_id", "embedding").collect()
        }
        cell_ref, surv_ref = _brute_semdedup(stored, n_cents=2, tau=0.9)
        assert len(out) == len(vecs)
        for r in out:
            assert r["cell"] == cell_ref[r["vec_id"]], r
            assert r["survivor_id"] == surv_ref[r["vec_id"]], r
            assert r["keep"] == (r["survivor_id"] == r["vec_id"])

    def test_hot_cell_cap_drops_pairs_only_in_capped_cells(self, spark):
        vecs = self._vecs()
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        cents = df.filter(F.col("vec_id") < 2)
        # cell of centroid 0 holds {0,2,3,5} (4 members), cell 1 holds
        # {1,4}; max_cell=3 drops cell 0 from pair generation entirely
        out = {r["vec_id"]: r for r in semantic_dedup(
            df, cents, threshold=0.9, grid=4, max_cell=3
        ).collect()}
        assert len(out) == len(vecs)  # capped members still emitted
        for i in (0, 2, 3, 5):  # capped cell: everyone keeps themselves
            assert out[i]["survivor_id"] == i and out[i]["keep"]
        assert out[4]["survivor_id"] == 1 and not out[4]["keep"]  # uncapped cell intact
        assert out[1]["keep"]

    def test_idempotent_on_survivors(self, spark):
        vecs = self._vecs()
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        cents = df.filter(F.col("vec_id") < 2)
        first = semantic_dedup(df, cents, threshold=0.9, grid=4)
        keep_ids = [r["vec_id"] for r in first.filter("keep").collect()]
        survivors = df.filter(F.col("vec_id").isin(keep_ids))
        second = semantic_dedup(survivors, cents, threshold=0.9, grid=4)
        assert all(r["keep"] for r in second.collect())


# -------------------------------------------------------- streaming heavy hitters


from go_pq_cdc_spark.streaming.heavy_hitters_stream import (  # noqa: E402
    heavy_hitter_candidates,
    latest_version,
    update_heavy_hitter_state,
)


class TestHeavyHittersStream:
    CAP = 16

    def _batch(self, spark, hot, noise_base, n_hot=200, n_noise=400):
        rows = [(hot,)] * n_hot + [(f"{noise_base}{i}",) for i in range(n_noise)]
        return spark.createDataFrame(rows, "item string").repartition(4)

    def test_stream_fold_keeps_guarantee_and_bounded_state(self, spark, tmp_path):
        sd = str(tmp_path / "hh")
        for b in range(3):
            update_heavy_hitter_state(
                self._batch(spark, "hot", f"b{b}n"), b, sd, capacity=self.CAP
            )
        cands = {r["item"]: r for r in heavy_hitter_candidates(spark, sd, 0.2).collect()}
        assert "hot" in cands  # 600/1800 = 33% of the stream, phi=0.2
        r = cands["hot"]
        assert r["n_total"] == 1800
        # MG bound: cnt_lower <= true <= cnt_upper
        assert r["cnt_lower"] <= 600 <= r["cnt_upper"]
        assert 600 - r["cnt_lower"] <= 1800 // (self.CAP + 1)
        # state never exceeds capacity despite 1200 distinct noise keys
        ver = latest_version(sd)
        n_state = spark.read.parquet(sd + f"/v{ver:012d}").count()
        assert n_state <= self.CAP

    def test_retry_is_idempotent(self, spark, tmp_path):
        sd = str(tmp_path / "hh")
        update_heavy_hitter_state(self._batch(spark, "hot", "an"), 0, sd, capacity=self.CAP)
        b1 = self._batch(spark, "hot", "bn")
        update_heavy_hitter_state(b1, 1, sd, capacity=self.CAP)
        first = sorted(
            (r["item"], r["cnt"]) for r in spark.read.parquet(sd + "/v" + "1".zfill(12)).collect()
        )
        update_heavy_hitter_state(b1, 1, sd, capacity=self.CAP)  # retry
        again = sorted(
            (r["item"], r["cnt"]) for r in spark.read.parquet(sd + "/v" + "1".zfill(12)).collect()
        )
        assert first == again
        with open(sd + "/meta/v" + "1".zfill(12) + ".json") as f:
            import json as _j

            assert _j.load(f)["n_total"] == 1200  # not double-counted

    def test_capacity_mismatch_raises(self, spark, tmp_path):
        sd = str(tmp_path / "hh")
        update_heavy_hitter_state(self._batch(spark, "hot", "an"), 0, sd, capacity=self.CAP)
        with pytest.raises(ValueError, match="capacity"):
            update_heavy_hitter_state(
                self._batch(spark, "hot", "bn"), 1, sd, capacity=self.CAP * 2
            )

    def test_empty_state_yields_empty_candidates(self, spark, tmp_path):
        out = heavy_hitter_candidates(spark, str(tmp_path / "nope"), 0.1)
        assert out.count() == 0


# ------------------------------------------------------------- corpus report


def test_corpus_report_shape(spark):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from corpus_report import corpus_report

    rep = corpus_report(spark, "/root/testdata/sf0.001", phi=0.02, top_n=5)
    assert rep["n_docs"] == 500
    assert rep["total_tokens"] > 0
    assert rep["distinct_texts"] <= rep["n_docs"]
    assert 0.0 <= rep["verbatim_dup_ratio"] <= 1.0
    assert sum(rep["langs"].values()) == rep["n_docs"]
    assert len(rep["heavy_hitters"]) == 5
    # exact counts: each reported token really clears phi
    for hh in rep["heavy_hitters"]:
        assert hh["cnt"] > 0.02 * rep["total_tokens"]
    assert rep["embeddings"] == {"n_vecs": 500, "dims": 64, "null_vecs": 0}


def test_cms_counters_merge_and_never_undercount(spark):
    """CMS is mergeable (counters over the whole corpus == the SUM of the
    two halves' counters cell-by-cell) and never undercounts a probe —
    including an absent one, which estimates 0 unless it collides."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators.sketch import (
        cms_counters,
        cms_point_estimates,
    )

    rows = [(i, f"tok{i % 37}") for i in range(2000)]
    df = spark.createDataFrame(rows, "i long, token string")
    whole = cms_counters(df, "token", d=3, w=64)
    halves = cms_counters(df.filter("i % 2 = 0"), "token", d=3, w=64).unionByName(
        cms_counters(df.filter("i % 2 = 1"), "token", d=3, w=64)
    )
    merged = halves.groupBy("j", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    a = {(r["j"], r["bucket"]): r["cnt"] for r in whole.collect()}
    b = {(r["j"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert a == b

    probes = spark.createDataFrame(
        [("tok0",), ("tok36",), ("absent",)], "token string"
    )
    est = {
        r["token"]: r["est_cnt"]
        for r in cms_point_estimates(whole, probes, "token", d=3, w=64).collect()
    }
    exact = {"tok0": sum(1 for _, t in rows if t == "tok0"),
             "tok36": sum(1 for _, t in rows if t == "tok36"),
             "absent": 0}
    for k, v in exact.items():
        assert est[k] >= v, (k, est[k], v)


def test_bloom_matches_python_reference_and_merges(spark):
    """Bloom state equals an independent Python re-implementation of the
    same literal hash family (so the SQL fragments compute what the
    docstrings claim), the claimed member set is EXACTLY the reference
    simulation's (false positives included), merge is the per-word OR,
    and merging a state with itself is a no-op (idempotence — the
    at-least-once property)."""
    import hashlib as _hl

    from go_pq_cdc_spark.operators.sketch import (
        BLOOM_LANE,
        bloom_cells,
        bloom_members,
        bloom_merge_cells,
        bloom_probe_cells,
    )

    M, KN = 2_147_483_647, 2_654_435_761
    K, BITS = 4, 1024

    def positions(v):
        hv = int(_hl.md5(str(v).encode()).hexdigest()[:15], 16) % M
        return [
            ((((j * KN + 1) % M) * hv + ((j * 40503 + 7) % M)) % M) % BITS
            for j in range(K)
        ]

    groups = {"A": [f"val{i}" for i in range(50)],
              "B": [f"val{i}" for i in range(25, 75)]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows * 3, "g string, v string")  # dup rows

    cells = bloom_cells(df, ["g"], "v")
    got = {(r["g"], r["word"]): r["bits"] for r in cells.collect()}
    want: dict[tuple[str, int], int] = {}
    for g, vs in groups.items():
        for v in vs:
            for p in positions(v):
                key = (g, p // BLOOM_LANE)
                want[key] = want.get(key, 0) | (1 << (p % BLOOM_LANE))
    assert got == want

    probes = [f"val{i}" for i in range(100)] + [f"nope{i}" for i in range(50)]
    pdf = spark.createDataFrame([(p,) for p in probes], "v string")
    claimed = {
        (r["g"], r["v"])
        for r in bloom_members(
            cells, ["g"], bloom_probe_cells(pdf, "v"), "v"
        ).collect()
    }
    expected = set()
    for g in groups:
        for p in probes:
            if all(
                want.get((g, q // BLOOM_LANE), 0) >> (q % BLOOM_LANE) & 1
                for q in positions(p)
            ):
                expected.add((g, p))
    assert claimed == expected
    # no false negatives, by construction
    assert {(g, v) for g, vs in groups.items() for v in vs} <= claimed

    # merge: fine (g, half) states OR-fold to exactly the direct state
    fine = bloom_cells(
        df.withColumn("half", F.expr("pmod(abs(hash(v)), 2)")), ["g", "half"], "v"
    )
    merged = {
        (r["g"], r["word"]): r["bits"]
        for r in bloom_merge_cells(fine, ["g"]).collect()
    }
    assert merged == want
    # idempotence: re-merging the state with itself changes nothing
    twice = {
        (r["g"], r["word"]): r["bits"]
        for r in bloom_merge_cells(cells.unionByName(cells), ["g"]).collect()
    }
    assert twice == want


def test_kmv_intersect_exact_when_under_k(spark):
    """When the union carries fewer than k distinct hashes the union
    sketch IS the union, so both KMV set-algebra estimates are exact:
    jaccard = |A∩B|/|A∪B| and est_intersection = |A∩B|."""
    from go_pq_cdc_spark.operators.sketch import kmv_intersect, kmv_sketch

    a_vals = [f"v{i}" for i in range(30)]          # A = v0..v29
    b_vals = [f"v{i}" for i in range(20, 50)]      # B = v20..v49, overlap 10
    dfa = spark.createDataFrame([("g", v) for v in a_vals] * 2, "g string, v string")
    dfb = spark.createDataFrame([("g", v) for v in b_vals], "g string, v string")
    est = kmv_intersect(
        kmv_sketch(dfa, ["g"], "v"), kmv_sketch(dfb, ["g"], "v"), ["g"]
    ).collect()
    (r,) = est
    assert r["n_kept"] == 50
    assert r["est_jaccard"] == 10 / 50
    assert r["est_intersection"] == (10 / 50) * 50.0
    # disjoint sets estimate zero intersection
    dfc = spark.createDataFrame([("g", f"w{i}") for i in range(40)], "g string, v string")
    (rz,) = kmv_intersect(
        kmv_sketch(dfa, ["g"], "v"), kmv_sketch(dfc, ["g"], "v"), ["g"]
    ).collect()
    assert rz["est_jaccard"] == 0.0 and rz["est_intersection"] == 0.0
    # one-sided groups survive (full-outer + empty stand-in — the rows
    # the oracle's `ka UNION kb` path emits; an inner join dropped them)
    dfd = spark.createDataFrame(
        [("g", "v0"), ("only_a", "x1"), ("only_a", "x2")], "g string, v string"
    )
    got = {
        r["g"]: r
        for r in kmv_intersect(
            kmv_sketch(dfd, ["g"], "v"), kmv_sketch(dfb, ["g"], "v"), ["g"]
        ).collect()
    }
    assert got["only_a"]["est_jaccard"] == 0.0
    assert got["only_a"]["est_intersection"] == 0.0
    assert got["only_a"]["n_kept"] == 2


def test_bloom_prune_predicate_prunes_without_false_negatives(spark):
    """The literal-Bloom fact-scan predicate keeps EVERY true dim key
    (no false negatives — prune + exact join == exact join) while
    dropping the bulk of non-matching keys, as a pure expression
    (no join in the pruned scan's plan)."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators.sketch import (
        bloom_cells,
        bloom_prune_predicate,
    )

    dim = spark.range(100).selectExpr("id AS k")  # keys 0..99
    fact = spark.range(4000).selectExpr("id AS k")
    state = [
        (r["word"], r["bits"]) for r in bloom_cells(dim, [], "k").collect()
    ]
    pred = bloom_prune_predicate(state, "k")
    kept = [r["k"] for r in fact.filter(pred).collect()]
    assert set(range(100)) <= set(kept)  # every true key survives
    assert len(kept) < 4000 * 0.25  # and the scan actually pruned
    # end-to-end: pruned exact join == plain semi join
    pruned = (
        fact.filter(pred)
        .join(F.broadcast(dim), "k", "left_semi")
        .count()
    )
    assert pruned == fact.join(F.broadcast(dim), "k", "left_semi").count() == 100
    # predicate is expression-only: no join/exchange in the filter plan
    plan = fact.filter(pred)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_bloom_state_array_probe_matches_literal_arm(spark):
    """The IN-PLAN Bloom state (`bloom_state_array` crossJoin-broadcast +
    `bloom_state_probe_predicate` column probe — the r14 runtime-filter
    shape behind q_bloom_join_prune) admits EXACTLY the fact rows the
    literal-collect arm admits at the same (k, bits, portable) — the two
    spellings share `bloom_cells`, so build/probe can never drift — and
    building the pruned DataFrame runs ZERO Spark jobs (the contract
    that replaced the r13 spelling's two plan-time driver jobs)."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators.sketch import (
        bloom_cells,
        bloom_prune_predicate,
        bloom_state_array,
        bloom_state_probe_predicate,
    )

    dim = spark.range(100).selectExpr("id AS k")
    fact = spark.range(4000).selectExpr("id AS k")
    bits = 4096
    sc = spark.sparkContext
    sc.setJobGroup("bloom_inplan_build_audit", "plan build must be job-free")
    try:
        state = bloom_state_array(dim, "k", bits=bits, portable=False)
        pruned = fact.crossJoin(F.broadcast(state)).filter(
            bloom_state_probe_predicate("k", bits=bits, portable=False)
        )
        built_jobs = sc.statusTracker().getJobIdsForGroup(
            "bloom_inplan_build_audit"
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(built_jobs) == [], f"plan build ran jobs: {built_jobs}"
    kept_inplan = sorted(r["k"] for r in pruned.select("k").collect())
    lit_state = [
        (r["word"], r["bits"])
        for r in bloom_cells(dim, [], "k", bits=bits, portable=False).collect()
    ]
    kept_literal = sorted(
        r["k"]
        for r in fact.filter(
            bloom_prune_predicate(lit_state, "k", bits=bits, portable=False)
        ).collect()
    )
    assert kept_inplan == kept_literal
    assert set(range(100)) <= set(kept_inplan)  # no false negatives
    assert len(kept_inplan) < 4000 * 0.25  # and the filter actually prunes


class TestBloomStream:
    def _docs(self, spark, lo, hi):
        rows = [(i, f"g{i % 3}", f"key{i}") for i in range(lo, hi)]
        return spark.createDataFrame(rows, "doc_id long, grp string, v string")

    def test_fold_equals_direct_and_replay_is_noop(self, spark, tmp_path):
        """Three-batch fold through the REAL foreachBatch body reaches the
        state of a one-pass direct build, and replaying a batch (the
        at-least-once case) leaves the state bit-identical — idempotence
        by algebra, no markers involved."""
        from go_pq_cdc_spark.operators.sketch import bloom_cells
        from go_pq_cdc_spark.streaming.bloom_stream import (
            bloom_state_fingerprint,
            update_bloom_state,
        )

        sd = str(tmp_path / "state")
        for b, (lo, hi) in enumerate([(0, 40), (40, 80), (80, 120)]):
            update_bloom_state(self._docs(spark, lo, hi), b, sd, "grp", "v")
        direct = {
            (r["grp"], r["word"]): r["bits"]
            for r in bloom_cells(
                self._docs(spark, 0, 120), ["grp"], "v"
            ).collect()
        }
        fp_before = sorted(
            tuple(r) for r in bloom_state_fingerprint(spark, sd).collect()
        )
        # replay batch 1's data as a later epoch: state must not change
        update_bloom_state(self._docs(spark, 40, 80), 3, sd, "grp", "v")
        fp_after = sorted(
            tuple(r) for r in bloom_state_fingerprint(spark, sd).collect()
        )
        assert fp_before == fp_after
        # and the folded state IS the direct build
        want = {}
        for (g, w), bits in direct.items():
            n, s, c = want.get(g, (0, 0, 0))
            want[g] = (n + 1, s + bin(bits).count("1"), c + bits)
        got = {r[0]: (r[1], r[2], r[3]) for r in fp_after}
        assert got == want

    def test_geometry_mismatch_raises(self, spark, tmp_path):
        import pytest as _pt

        from go_pq_cdc_spark.streaming.bloom_stream import update_bloom_state

        sd = str(tmp_path / "state")
        update_bloom_state(self._docs(spark, 0, 10), 0, sd, "grp", "v")
        with _pt.raises(ValueError, match="geometries never merge"):
            update_bloom_state(
                self._docs(spark, 10, 20), 1, sd, "grp", "v", k=2, bits=512
            )

    def test_empty_state_fingerprint_is_empty(self, spark, tmp_path):
        from go_pq_cdc_spark.streaming.bloom_stream import (
            bloom_state_fingerprint,
        )

        out = bloom_state_fingerprint(spark, str(tmp_path / "none")).collect()
        assert out == []


class TestHllViewStream:
    def _rows(self, spark, lo, hi):
        rows = [(i, i % 4, f"val{i % 23}") for i in range(lo, hi)]
        return spark.createDataFrame(rows, "lsn long, grp long, v string")

    def test_fold_equals_direct_and_replay_is_noop(self, spark, tmp_path):
        from go_pq_cdc_spark.operators.sketch import hll_registers
        from go_pq_cdc_spark.streaming.sketch_stream import (
            read_hll_view,
            update_hll_view_state,
        )

        sd = str(tmp_path / "state")
        for b, (lo, hi) in enumerate([(0, 30), (30, 60), (60, 90)]):
            update_hll_view_state(self._rows(spark, lo, hi), b, sd, "grp", "v")
        direct = {
            (r["grp"], r["bucket"]): r["m"]
            for r in hll_registers(
                self._rows(spark, 0, 90), ["grp"], "v"
            ).collect()
        }
        view1 = sorted(tuple(r) for r in read_hll_view(spark, sd).collect())
        # replay a middle batch as a later epoch: MAX-merge is idempotent
        update_hll_view_state(self._rows(spark, 30, 60), 3, sd, "grp", "v")
        view2 = sorted(tuple(r) for r in read_hll_view(spark, sd).collect())
        assert view1 == view2
        # the folded registers ARE the direct build's
        from go_pq_cdc_spark.streaming.sketch_stream import (
            HLL_STATE_SCHEMA,
            read_sketch_state,
        )

        st = {
            (r["grp"], r["bucket"]): r["m"]
            for r in read_sketch_state(
                spark, sd, HLL_STATE_SCHEMA
            ).collect()
        }
        assert st == direct

    def test_empty_view_and_geometry_guard(self, spark, tmp_path):
        import json
        import pytest as _pt

        from go_pq_cdc_spark.streaming.sketch_stream import (
            read_hll_view,
            update_hll_view_state,
        )
        from go_pq_cdc_spark.streaming.versioned_state import VersionedState

        assert read_hll_view(spark, str(tmp_path / "none")).collect() == []
        sd = str(tmp_path / "state")
        update_hll_view_state(self._rows(spark, 0, 10), 0, sd, "grp", "v")
        # corrupt the committed geometry marker to simulate an old build
        vs = VersionedState(sd)
        meta = vs.read_meta(0)
        meta["hll_m"] = 16
        vs.commit(0, meta)  # overwrite the marker with the old geometry
        with _pt.raises(ValueError, match="geometries never merge"):
            update_hll_view_state(self._rows(spark, 10, 20), 1, sd, "grp", "v")
