"""ANN quality sanity: LSH/IVF results are valid rankings and overlap the
exact top-k enough to be useful (recall floor is loose — 500 random
vectors in 256 buckets is a hard regime; the point is correctness of the
pipeline, not tuning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_pq_cdc_spark.catalog import load_table
from go_pq_cdc_spark.operators import similarity as S

from .conftest import SF_DIR


def _topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], []).append((r["rnk"] if "rnk" in r else r["rank"], r["neighbor_id"]))
    return {q: [n for _, n in sorted(v)] for q, v in out.items()}


def test_ann_variants_are_valid_rankings(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_map(S.cosine_topk(emb, queries, k=5).withColumnRenamed("rank", "rnk"))
    lsh = _topk_map(S.ann_topk_lsh(emb, queries, k=5).withColumnRenamed("rank", "rnk"))
    ivf = _topk_map(S.ivf_topk(emb, emb.filter(F.col("vec_id") < 8), queries, k=5))

    assert set(exact) == set(range(8))
    for variant in (lsh, ivf):
        for q, neighbors in variant.items():
            assert q not in neighbors  # never self
            assert len(neighbors) == len(set(neighbors)) <= 5
    # approximate results must come from the exact candidate universe and
    # agree with exact ordering when they do intersect
    for q in exact:
        if q in lsh and lsh[q]:
            inter = [n for n in lsh[q] if n in exact[q]]
            # order of common elements must be consistent with exact order
            exact_pos = {n: i for i, n in enumerate(exact[q])}
            assert inter == sorted(inter, key=lambda n: exact_pos[n])


def test_multiprobe_recall_is_monotone(spark):
    """Multi-probe LSH: probing Hamming-1 buckets yields a candidate
    SUPERSET, so per-query recall vs exact top-k never decreases."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_map(S.cosine_topk(emb, queries, k=5).withColumnRenamed("rank", "rnk"))
    one = _topk_map(S.ann_topk_lsh(emb, queries, k=5, probes=1))
    multi = _topk_map(S.ann_topk_lsh(emb, queries, k=5, probes=9))

    def recall(approx):
        hits = sum(len(set(approx.get(q, [])) & set(exact[q])) for q in exact)
        return hits / sum(len(exact[q]) for q in exact)

    r1, r9 = recall(one), recall(multi)
    assert r9 >= r1, f"multi-probe recall regressed: {r9} < {r1}"
    for q, neighbors in multi.items():
        assert q not in neighbors
        assert len(neighbors) == len(set(neighbors)) <= 5


def test_ivf_nprobe_recall_is_monotone(spark):
    """IVF nprobe: searching the query's n nearest cells is a candidate
    superset of probe=1 — recall vs exact top-k never decreases."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_map(S.cosine_topk(emb, queries, k=5).withColumnRenamed("rank", "rnk"))
    one = _topk_map(S.ivf_topk(emb, cents, queries, k=5, nprobe=1))
    multi = _topk_map(S.ivf_topk(emb, cents, queries, k=5, nprobe=3))

    def recall(approx):
        hits = sum(len(set(approx.get(q, [])) & set(exact[q])) for q in exact)
        return hits / sum(len(exact[q]) for q in exact)

    assert recall(multi) >= recall(one)
    for q, neighbors in multi.items():
        assert q not in neighbors
        assert len(neighbors) == len(set(neighbors)) <= 5


def test_kmeans_empty_corpus_and_oversized_k(spark):
    """ADVICE r4 guards: an empty corpus yields an empty centroid frame
    (no IndexError), and k greater than the corpus size is clamped with
    distinct seeds (the old farthest-point loop re-selected seeded rows)."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert S.kmeans_centroids(empty, k=3, iters=2).count() == 0

    small = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    rows = S.kmeans_centroids(small, k=5, iters=2).collect()
    assert len(rows) == 2  # clamped to corpus size
    vecs = [tuple(r["embedding"]) for r in rows]
    assert len(set(vecs)) == 2  # distinct seeds, no duplicate centroids


def test_null_embeddings_never_match_each_other(spark):
    """ADVICE r4: NULL-embedding rows get per-row-unique bucket sentinels,
    so a NULL query can never 'match' another NULL corpus row and emit
    NULL-cosine neighbors (the shared -1 sentinel did exactly that)."""
    df = spark.createDataFrame(
        [(0, None), (1, None), (2, [1.0, 0.0]), (3, [0.9, 0.1]), (4, [0.8, 0.2])],
        "vec_id long, embedding array<float>",
    )
    out = S.ann_topk_lsh(df, df, k=5).collect()
    assert all(r["cos_sim"] is not None for r in out)
    assert all(r["q_id"] not in (0, 1) and r["neighbor_id"] not in (0, 1) for r in out)


def test_kmeans_centroids_separate_clusters(spark):
    """Lloyd's on three well-separated direction clusters: every cluster
    ends up represented (empty seeds inherit their previous centroid), the
    trained centroids drop into ivf_topk unchanged, and cell-local search
    keeps neighbors inside the query's own cluster."""
    import math

    def vec(base, jitter):
        raw = [b + jitter * 0.01 for b in base]
        n = math.sqrt(sum(x * x for x in raw))
        return [float(x / n) for x in raw]

    bases = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    rows = [
        (cluster * 100 + j, vec(bases[cluster], j))
        for cluster in bases
        for j in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = S.kmeans_centroids(df, k=3, iters=4)
    got = {r["vec_id"]: r["embedding"] for r in cents.collect()}
    assert set(got) == {0, 1, 2}
    # each trained centroid points dominantly along exactly one base axis,
    # and all three axes are covered
    axes = sorted(max(range(4), key=lambda d: c[d]) for c in got.values())
    assert axes == [0, 1, 2]

    queries = df.filter(F.col("vec_id").isin([5, 105, 205]))
    top = _topk_map(S.ivf_topk(df, cents, queries, k=3))
    for q, neigh in top.items():
        assert all(n // 100 == q // 100 for n in neigh)  # same-cluster only


def test_ivf_persisted_index_prunes_partitions(spark, tmp_path):
    """The 100 TB ANN-serving shape: the persisted IVF index is partitioned
    by cell, a query scans ONLY its nprobe cells (Hive partition pruning —
    asserted via PartitionFilters AND the actual files read), and results
    equal the in-memory ivf_topk exactly."""
    from go_pq_cdc_spark.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 10))
    path = str(tmp_path / "ivf_index")
    S.ivf_index_write(emb, cents, path)

    got = S.ivf_topk_index(spark, path, cents, queries, k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cent_id" in plan.split("PartitionFilters")[1][:200]

    expected = sorted(
        (r["q_id"], r["neighbor_id"], r["rnk"], round(r["cos_sim"], 9))
        for r in S.ivf_topk(emb, cents, queries, k=5).collect()
    )
    actual = sorted(
        (r["q_id"], r["neighbor_id"], r["rnk"], round(r["cos_sim"], 9))
        for r in got.collect()
    )
    assert actual == expected

    # Behavioral pruning proof (inputFiles() lists the relation PRE-pruning,
    # so it can't show this): corrupt every NON-probed cell's files — the
    # pruned query must still succeed because those directories are skipped
    # at listing time, while a full-index scan would now throw.
    import glob

    probed = {
        r["cent_id"] for r in S.ivf_assign(queries, cents).select("cent_id").collect()
    }
    assert probed and len(probed) < 8
    for d in glob.glob(f"{path}/cent_id=*"):
        if int(d.rsplit("=", 1)[1]) not in probed:
            for f in glob.glob(f"{d}/*.parquet"):
                with open(f, "wb") as fh:
                    fh.write(b"not a parquet file")
    fresh = sorted(
        (r["q_id"], r["neighbor_id"], r["rnk"], round(r["cos_sim"], 9))
        for r in S.ivf_topk_index(spark, path, cents, queries, k=5).collect()
    )
    assert fresh == expected

    # empty query set degrades cleanly
    none = S.ivf_topk_index(spark, path, cents, queries.filter(F.lit(False)), k=5)
    assert none.count() == 0


def test_pq_identical_vectors_share_codes_and_quantization_error(spark):
    """PQ contracts: (1) exactly-duplicated vectors encode to identical
    codes; (2) the ADC distance from a query to an exact duplicate of
    itself equals the query's own total quantization error (sum of
    subspace L2^2 to its assigned codewords) — the LUT arithmetic is
    exact, not approximate."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cb = S.pq_codebook_sample(emb)
    # duplicate vec 30 under a fresh id
    dup = emb.filter(F.col("vec_id") == 30).withColumn(
        "vec_id", F.lit(100000).cast("long")
    )
    corpus = emb.unionByName(dup)
    codes = S.pq_encode(corpus, cb, dsub=16)
    by_id = {r["id"]: r["codes"] for r in codes.filter(F.col("id").isin(30, 100000)).collect()}
    assert by_id[30] == by_id[100000]

    queries = emb.filter(F.col("vec_id") == 30)
    topk = S.pq_adc_topk(codes, queries, cb, k=corpus.count())
    rows = {r["neighbor_id"]: r["adc_dist"] for r in topk.collect()}
    # distance to the exact duplicate == own quantization error: recompute
    # it driver-side from the codebook and codes
    cbrows = {(r["j"], r["c"]): r["cw"] for r in cb.collect()}
    qv = queries.collect()[0]["embedding"]
    fx = lambda x: round(float(x) * 1_000_000)
    err = 0
    for j in range(S.PQ_M):
        cw = cbrows[(j, by_id[30][j])]
        err += sum(
            (fx(qv[j * 16 + i]) - fx(cw[i])) ** 2 for i in range(16)
        )
    assert abs(rows[100000] - err / 1e12) < 1e-9


def test_pq_train_lloyds_error_is_monotone(spark):
    """pq_train (per-subspace k-means) must not increase total quantization
    error vs the iteration-0 codebook (Lloyd's monotonicity), measured as
    the sum of best-codeword distances over the corpus."""
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 128)
    err_expr = (
        "aggregate(sequence(0, 3), 0L, (acc, j) -> acc + "
        "array_min(transform(element_at(cbs, j + 1).words, "
        "w -> w.cwn2 - 2 * (" + S._sub_dot("v", "j", "w.cw", 16)["spark"] + "))))"
    )

    def total_err(cb):
        folded = S._fold_pq_codebook(cb)
        vecs = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
        return (
            vecs.crossJoin(F.broadcast(folded))
            .select(F.expr(err_expr).alias("e"))
            .agg(F.sum("e").alias("s"))
            .collect()[0]["s"]
        )

    seed_err = total_err(S.pq_train(emb, ksub=8, iters=0))
    trained_err = total_err(S.pq_train(emb, ksub=8, iters=3))
    assert trained_err <= seed_err, (trained_err, seed_err)


def test_ivfpq_neighbors_come_from_query_cell(spark):
    """IVF-PQ candidate contract: every reported neighbor shares the
    query's coarse cell (nprobe=1), and rankings are valid (no self, no
    dup, ascending distance)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    cb = S.pq_codebook_sample(emb)
    queries = emb.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 24))
    out = S.ivf_pq_topk(emb, cents, cb, queries, k=5).collect()
    cells = {
        r["id"]: r["cent_id"] for r in S.ivf_assign(emb, cents).collect()
    }
    per_q: dict[int, list] = {}
    for r in out:
        assert r["neighbor_id"] != r["q_id"]
        assert cells[r["neighbor_id"]] == cells[r["q_id"]]
        per_q.setdefault(r["q_id"], []).append((r["rnk"], r["adc_dist"], r["neighbor_id"]))
    for q, rows in per_q.items():
        rows.sort()
        dists = [d for _, d, _ in rows]
        assert dists == sorted(dists)
        ids = [n for _, _, n in rows]
        assert len(ids) == len(set(ids)) <= 5
