"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is materialized via count() (full plan execution, no driver
collect overhead). The first query pays JVM/session warmup; a warmup scan
is run first so per-query times reflect plan execution.

Output contract (r10 verdict item 1): the driver captures only the LAST
~2000 chars of stdout, so the FINAL stdout line is a compact summary
(headline, per-query raw minima, throughput, steal, agreement max) hard-
bounded at FINAL_LINE_BUDGET chars — `tests/test_bench_contract.py` pins
the bound against worst-case value widths. The full diagnostics that
outgrew r10's capture window (both passes' raw/normalized times, the
interleaved per-query anchor factors, per-query agreement ratios) go to a
sidecar file `BENCH_DETAIL.json` next to this script AND to an earlier
stdout line, so nothing is lost — it just never displaces the headline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_pq_cdc_spark import plans  # noqa: E402
from go_pq_cdc_spark.catalog import TABLES, load_table  # noqa: E402
from go_pq_cdc_spark.session import get_spark  # noqa: E402


# Machine-factor anchor (r8 verdict item 6, INTERLEAVED per r9 item 2):
# this host's fleet-wide CPU contention swings identical code 3-8x
# between runs (r8's headline "regression" was byte-identical plans
# measuring 11.5s..34s; r9's once-run anchor said "quiet" while ~595
# CPU-seconds of steal landed DURING the queries). The anchor times a
# FIXED pure-JVM Spark job (20B-row xxhash64 max-fold — no I/O, no
# shuffle, saturates all cores exactly like whole-stage codegen query
# execution; max, not count, so null-intolerance analysis cannot elide
# the hash, and not sum, which overflows under ANSI). It is RE-TIMED
# every ANCHOR_EVERY queries inside the sweep, each query normalizes by
# the NEAREST anchor, and the whole sweep runs TWICE in opposite orders
# — per-query minima are the headline, and the two orderings'
# normalized times are reported so round-over-round comparison is
# mechanical (they should agree within ~20%; larger spread = the noise
# landed inside one query's window and the min already took the other).
# CAL_REF_SEC is the anchor's best-of-3 on this container measured quiet
# (load ~1, zero steal) in round 9.
CAL_REF_SEC = 2.9
CAL_ROWS = 20_000_000_000
ANCHOR_EVERY = 4

# Hard budget for the FINAL stdout line: the driver records the last
# ~2000 chars of stdout, so the line that must survive transport stays
# comfortably inside it even with a few stray log lines appended after.
FINAL_LINE_BUDGET = 1500

# Short queries get extra in-pass repeats (r11 verdict item 6; widened
# to ~2.5s by r12 verdict item 7): below a few seconds the host's
# same-run agreement is 1.3-1.7x — fixed-cost jitter the size of the
# measurement — so one timing per pass (best-of-2 overall) made
# untouched queries look >1.3x regressed in r11, and in r12 the shipped
# q2_min_cost_supplier (~1.1s, jittered past the old 1s*2 gate) still
# showed agreement 1.767. Best-of-3 per pass (best-of-6 overall) brings
# per-query agreement under the ~1.2-1.3 adjudication bar on a quiet
# box. The repeat gate carries 2x HEADROOM (review): the decision input
# is itself the noisy first timing, so a truly-2s query jittered to 4s
# would otherwise get zero extra reps — exactly the artifact being
# fixed. Queries whose first timing clears 5s keep single-timing-per-
# pass: their runtime dwarfs the jitter.
REPEAT_THRESHOLD = 2.5
REPEAT_GATE_HEADROOM = 2.0
REPEAT_REPS = 3


def build_final_line(summary: dict) -> str:
    """Compact single-line JSON for the driver's tail capture. Raises if
    the line exceeds FINAL_LINE_BUDGET — growth must go to the sidecar,
    never back into this line (BENCH_r10.json was parsed:null because the
    final line hit ~5 KB)."""
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > FINAL_LINE_BUDGET:
        raise ValueError(
            f"final bench line is {len(line)} chars (> {FINAL_LINE_BUDGET});"
            " move fields to BENCH_DETAIL.json instead"
        )
    return line


def anchor_once(spark) -> float:
    t0 = time.perf_counter()
    spark.range(CAL_ROWS).selectExpr("max(xxhash64(id)) AS c").collect()
    return time.perf_counter() - t0


def machine_calibration(spark) -> float:
    """Best-of-3 of the fixed anchor job (first run pays codegen — the
    best-of discipline matches the query timings)."""
    return min(anchor_once(spark) for _ in range(3))


def read_steal_jiffies() -> int:
    """Cumulative stolen-time jiffies from /proc/stat (field 8 of the
    aggregate cpu line) — nonzero deltas mean a noisy-neighbor host."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0
    except OSError:
        return 0


def run_headline_sweep(spark, sf_dir: str, bench_specs) -> tuple[
    dict[str, float], dict[str, float], dict[str, float], list
]:
    """Warm up (tables + one UNTIMED execution per query: whole-stage-
    codegen + C2 JIT cost lands on a query's FIRST execution only — the
    pre-r10 best-of-2 absorbed it; with one timed run per pass it would
    land entirely in pass 1 and masquerade as ordering disagreement),
    then run two passes in OPPOSITE orders with the anchor re-timed every
    ANCHOR_EVERY queries inside each pass (r9 verdict item 2): a
    contention burst mid-sweep lands on a nearby anchor instead of being
    amortized into a single pre-sweep factor, and each query's two
    opposite-order measurements bracket any order-dependent warmup.
    Per-query result = min of the two passes (the pre-r10 best-of-2
    discipline, spread across orderings); per-query normalized = min of
    raw/nearest-factor. Returns (times, norm_min, agreement, passes)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    cal0 = machine_calibration(spark)

    for spec in bench_specs:
        spec.spark_fn(spark, sf_dir).count()
    passes: list[dict[str, dict[str, float]]] = []
    for order in (bench_specs, list(reversed(bench_specs))):
        raw: dict[str, float] = {}
        norm: dict[str, float] = {}
        factors: dict[str, float] = {}
        cal = cal0
        for i, spec in enumerate(order):
            if i and i % ANCHOR_EVERY == 0:
                cal = anchor_once(spark)
            t0 = time.perf_counter()
            spec.spark_fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            reps = 1
            while dt < REPEAT_THRESHOLD * REPEAT_GATE_HEADROOM and reps < REPEAT_REPS:
                t0 = time.perf_counter()
                spec.spark_fn(spark, sf_dir).count()
                dt = min(dt, time.perf_counter() - t0)
                reps += 1
            f = cal / CAL_REF_SEC
            raw[spec.name] = round(dt, 3)
            factors[spec.name] = round(f, 3)
            norm[spec.name] = round(dt / f, 3)
        passes.append({"raw": raw, "normalized": norm, "factors": factors})
        cal0 = anchor_once(spark)  # fresh anchor heading into pass 2

    times = {
        s.name: min(p["raw"][s.name] for p in passes) for s in bench_specs
    }
    norm_min = {
        s.name: min(p["normalized"][s.name] for p in passes)
        for s in bench_specs
    }
    # ordering agreement: max over queries of the two passes' normalized
    # ratio — ~1.2 or below means the anchor absorbed the host noise
    agreement = {
        s.name: round(
            max(p["normalized"][s.name] for p in passes)
            / max(min(p["normalized"][s.name] for p in passes), 1e-9),
            3,
        )
        for s in bench_specs
    }
    return times, norm_min, agreement, passes


def build_extra_sf_summary(
    times: dict[str, float],
    norm_min: dict[str, float],
    agreement: dict[str, float],
    sf: float,
    steal_delta: int,
) -> dict:
    """Summary for the OPT-IN extra-scale sweep ($SPARK_GRAFT_BENCH_SF,
    r13 verdict item 8) — the same schema as the final line's driver
    contract fields (metric/value/unit/queries/sf + the adjudication
    extras), minus the throughput rates (those are ingestion-shaped
    benches pinned to the contract SF). Written to a sidecar file, never
    to the final stdout line: at sf0.1 every bench row sits on this box's
    ~0.3-0.5 s/job scheduler floor (8 cores beats 32 — r13 scaling
    block), so per-row wins are only visible at a larger SF."""
    return {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "value_normalized": round(sum(norm_min.values()), 3),
        "ordering_agreement_max": max(agreement.values()),
        "steal_jiffies_delta": steal_delta,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("go-pq-cdc-spark-bench")
    steal0 = read_steal_jiffies()

    bench_specs = sorted(
        (s for s in plans.REGISTRY.values() if s.bench), key=lambda s: s.name
    )
    times, norm_min, agreement, passes = run_headline_sweep(
        spark, sf_dir, bench_specs
    )

    rates = throughput_benches(spark, sf_dir)

    total = round(sum(times.values()), 3)
    # Full diagnostics (r8 item 6 / r9 item 2 adjudication machinery) go
    # to the sidecar + an EARLY stdout line; only the compact summary may
    # be the final line (see module docstring).
    detail = {
        "calibration_ref_sec": CAL_REF_SEC,
        "queries_normalized": norm_min,
        "per_query_factors": [p["factors"] for p in passes],
        "pass_raw": [p["raw"] for p in passes],
        "pass_normalized": [p["normalized"] for p in passes],
        "ordering_agreement_ratio": agreement,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w", encoding="utf-8") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps({"bench_detail": detail}, separators=(",", ":")))

    # The contract SF's steal window closes HERE, before any opt-in
    # extra-scale sweep, so the final line's steal_jiffies_delta keeps
    # describing exactly the measurements it rides with.
    steal_delta = read_steal_jiffies() - steal0

    # OPT-IN extra-scale sweep (r13 verdict item 8): when
    # $SPARK_GRAFT_BENCH_SF names another SF directory (e.g. a /tmp/sf1
    # built by tools/make_scaled_sf.py), re-run the SAME headline sweep
    # there and write BENCH_SF<sf>.json + an early stdout line. Strictly
    # additive: unset (the driver's invocation) leaves every byte of the
    # sf0.1 contract output identical, and the final line stays last.
    extra_dir = os.environ.get("SPARK_GRAFT_BENCH_SF")
    if extra_dir:
        extra_sf = float(
            os.path.basename(extra_dir.rstrip("/")).replace("sf", "") or "1"
        )
        xt, xn, xa, _ = run_headline_sweep(spark, extra_dir, bench_specs)
        extra_summary = build_extra_sf_summary(
            xt, xn, xa, extra_sf, read_steal_jiffies() - steal0
        )
        extra_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"BENCH_SF{extra_sf:g}.json",
        )
        with open(extra_path, "w", encoding="utf-8") as f:
            json.dump(extra_summary, f, indent=1, sort_keys=True)
        print(json.dumps({"bench_extra_sf": extra_summary}, separators=(",", ":")))

    print(
        build_final_line(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "throughput_rows_per_sec": rates,
                "sf": sf,
                # per-query normalized minima (sidecar) are the round-
                # over-round comparison numbers; their sum rides here
                "value_normalized": round(sum(norm_min.values()), 3),
                "ordering_agreement_max": max(agreement.values()),
                "steal_jiffies_delta": steal_delta,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


def throughput_benches(spark, sf_dir: str) -> dict[str, int]:
    """Ingestion-shaped rates comparable to BASELINE.md:
    - snapshot_scan: full-width materialized scan of lineitem (the engine's
      snapshot read path; baseline 167k rows/s single instance)
    - cdc_apply: changelog -> committed -> latest-state merge written to a
      parquet mirror (the end-to-end CDC apply path; baseline 66.7k rows/s)

    Each rate is best-of-2: this host's run-to-run variance is larger than
    the effects being measured (NOTES_r4/r5 document identical back-to-back
    runs differing >2x), and BASELINE's published numbers are peak
    sustained rates, so the peak of two runs is the comparable figure.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators.cdc import filter_heartbeat, latest_state
    from go_pq_cdc_spark.sources.changelog import committed_changelog

    rates: dict[str, int] = {}

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    best = 0
    for _ in range(2):
        t0 = time.perf_counter()
        # touch every column so the scan actually materializes full rows
        li.agg(*[F.count(c) for c in li.columns]).collect()
        best = max(best, int(n / (time.perf_counter() - t0)))
    rates["snapshot_scan"] = best

    # Amplify the changelog ~10x (disjoint LSN/pk ranges) so the rate
    # reflects steady-state throughput, not per-job startup overhead —
    # BASELINE's CDC number is measured over a 10M-row run.
    AMP = 10
    base = filter_heartbeat(committed_changelog(spark, sf_dir))
    n = base.count() * AMP
    batch = None
    for i in range(AMP):
        d = base.withColumn("lsn", F.col("lsn") + F.lit(i * 10_000_000)).withColumn(
            "pk", F.col("pk") + F.lit((i % 3) * 1_000_000)
        )
        batch = d if batch is None else batch.unionByName(d)
    out = tempfile.mkdtemp(prefix="bench_mirror_")
    try:
        best = 0
        for _ in range(2):
            t0 = time.perf_counter()
            latest_state(batch).write.mode("overwrite").parquet(out)
            best = max(best, int(n / (time.perf_counter() - t0)))
        rates["cdc_apply"] = best
    finally:
        shutil.rmtree(out, ignore_errors=True)

    # state >> batch mirror merge (r9 verdict item 1): seed a mirror with
    # the full changelog's state, then merge a SMALL batch in each mode.
    # COW rewrites every affected bucket — at this batch spread that is
    # every bucket, so its write volume ∝ STATE; the delta arm appends
    # ~batch-sized delta files (write ∝ BATCH) and folds at read. Rates
    # are batch-rows/sec for the merge call — the delta/cow ratio is the
    # write-amplification win at state≫batch.
    from go_pq_cdc_spark.streaming.changelog_stream import merge_mirror_batch

    state_root = tempfile.mkdtemp(prefix="bench_state_")
    try:
        # seed with a FULLY-DISJOINT-keyspace amplification (100x distinct
        # pks, unlike cdc_apply's 3-range batch): the state must DWARF the
        # batch or the comparison measures fixed per-merge job overhead
        # and the parquet per-file floor instead of the
        # write-amplification difference. Catalyst-side crossJoin with a
        # 100-row range keeps the plan one scan, not a 100-way union.
        flat = base.select("op", "lsn", "xid", "commit_ts", "pk", "after_val")
        seed = (
            flat.crossJoin(F.broadcast(spark.range(100).select(F.col("id").alias("_amp"))))
            .withColumn("pk", F.col("pk") + F.col("_amp") * 10_000_000)
            .drop("_amp")
        )
        small = (
            base.select("op", "lsn", "xid", "commit_ts", "pk", "after_val")
            .filter(F.col("pk") % 97 == 0)
            .withColumn("lsn", F.col("lsn") + F.lit(1_000_000_000))
        )
        bn = small.count()

        def du(root):
            total = 0
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    total += os.path.getsize(os.path.join(dirpath, f))
            return total

        for mode in ("cow", "delta"):
            sd = os.path.join(state_root, mode)
            merge_mirror_batch(seed, sd, keep_epochs=2)  # seed big state;
            # retention 2 so the timed merge's GC keeps the seed epoch and
            # the bytes delta below measures WRITES, not writes-minus-GC
            pre = du(os.path.join(sd, "epochs"))
            t0 = time.perf_counter()
            merge_mirror_batch(small, sd, merge_mode=mode)
            rates[f"mirror_{mode}_state_gg_batch"] = int(
                bn / (time.perf_counter() - t0)
            )
            # the property that matters at 100 TB (local wall-clock is
            # fixed-cost-dominated at this scale): bytes written per batch
            # — COW ∝ touched-bucket STATE, delta ∝ BATCH
            rates[f"mirror_{mode}_bytes_per_batch"] = (
                du(os.path.join(sd, "epochs")) - pre
            )

        # Incremental view maintenance at the same state >> batch shape:
        # a view update costs one bounded capture + a kilobyte state
        # write + ONE bucket-pruned before-image read (the read is ∝
        # touched-bucket state, the same class as a COW merge's read
        # side; it drops to zero when the stream ships REPLICA IDENTITY
        # FULL images). Rate is batch-rows/sec for the full stage+fold
        # against the 100x-seeded mirror (sd = the delta-mode mirror
        # from the loop) — like its mirror_* neighbors, local wall-clock
        # here is fixed-job-cost-dominated.
        from go_pq_cdc_spark.streaming.agg_view_stream import (
            fold_staged_view_deltas,
            stage_view_deltas,
        )
        from go_pq_cdc_spark.streaming.changelog_stream import (
            mirror_befores_for,
        )

        view_dir = os.path.join(state_root, "view")
        t0 = time.perf_counter()
        stage_view_deltas(
            small, 1, view_dir,
            before_df=mirror_befores_for(spark, sd, small),
        )
        fold_staged_view_deltas(spark, 1, view_dir)
        rates["view_update_state_gg_batch"] = int(
            bn / (time.perf_counter() - t0)
        )
    finally:
        shutil.rmtree(state_root, ignore_errors=True)

    # End-to-end streaming CDC: changelog as WAL segments -> pq_cdc_wal
    # custom source -> TOAST-aware mirror merge (the closest shape to the
    # reference's 10M-insert CDC benchmark).
    from go_pq_cdc_spark.sources import lsn_stream
    from go_pq_cdc_spark.streaming import mirror_sink

    wal_base = tempfile.mkdtemp(prefix="bench_wal_")
    try:
        wal_dir = os.path.join(wal_base, "wal")
        os.makedirs(wal_dir)
        import glob as _glob

        ordered = base.select("op", "lsn", "xid", "commit_ts", "pk", "after_val")
        lo, hi = ordered.agg(F.min("lsn"), F.max("lsn")).collect()[0]
        span = int(hi) - int(lo) + 1
        ev_total = 0
        # AMP segments with disjoint LSN ranges ≈ the reference's 10M-row
        # sustained CDC run scaled to local size.
        for i in range(AMP):
            seg = ordered.withColumn("lsn", F.col("lsn") + F.lit(i * span)).withColumn(
                "pk", F.col("pk") + F.lit((i % 3) * 1_000_000)
            )
            seg.coalesce(1).write.mode("overwrite").parquet(os.path.join(wal_base, "tmp"))
            src = _glob.glob(os.path.join(wal_base, "tmp", "part-*.parquet"))[0]
            os.replace(
                src,
                lsn_stream.segment_path(wal_dir, int(lo) + i * span, int(hi) + i * span),
            )
            ev_total += n // AMP

        lsn_stream.register(spark)
        best = 0
        for attempt in range(2):  # fresh mirror/checkpoint per attempt
            stream = (
                spark.readStream.format("pq_cdc_wal").option("path", wal_dir).load()
            )
            t0 = time.perf_counter()
            q = mirror_sink(
                stream,
                os.path.join(wal_base, f"state{attempt}"),
                os.path.join(wal_base, f"ck{attempt}"),
            )
            q.processAllAvailable()
            q.stop()
            best = max(best, int(ev_total / (time.perf_counter() - t0)))
        rates["cdc_stream_e2e"] = best
    finally:
        shutil.rmtree(wal_base, ignore_errors=True)

    rates.update(poll_decode_benches(spark))
    return rates


def poll_decode_benches(spark) -> dict[str, int]:
    """JVM-side decode rates for the poll transport's two parser arms
    over synthetic raw segments (2M DML rows, 1000 txns each with its
    commit marker — the test_decoding arm's commit-ts stamp is a per-xid
    aggregate+join, so markers must be present for an honest rate):
    - poll_decode_wal2json: from_json over format-2 documents
    - poll_decode_test_decoding: the \\G-anchored text-grammar regexes
    Rows synthesize via Catalyst format_string (no driver loop)."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.sources.test_decoding import decode_test_decoding
    from go_pq_cdc_spark.sources.wal2json import decode_wal2json

    n = 2_000_000
    rates: dict[str, int] = {}
    ids = spark.range(n).select(
        (F.col("id") + 1).alias("lsn"),
        (F.col("id") % 1000).cast("long").alias("xid"),
        F.col("id").alias("i"),
    )

    w2j = ids.select(
        "lsn",
        "xid",
        F.format_string(
            '{"action":"I","schema":"public","table":"users",'
            '"timestamp":"2024-01-01 00:00:00",'
            '"columns":[{"name":"pk","type":"bigint","value":"%d"},'
            '{"name":"val","type":"text","value":"v %d"}]}',
            "i",
            "i",
        ).alias("data"),
    )
    best = 0
    for _ in range(2):
        t0 = time.perf_counter()
        decode_wal2json(w2j).count()
        best = max(best, int(n / (time.perf_counter() - t0)))
    rates["poll_decode_wal2json"] = best

    dml = ids.select(
        "lsn",
        "xid",
        F.format_string(
            "table public.users: INSERT: pk[bigint]:%d val[text]:'v %d' "
            "f[double]:1.5",
            "i",
            "i",
        ).alias("data"),
    )
    commits = spark.range(1000).select(
        (F.col("id") + n + 1).alias("lsn"),
        F.col("id").cast("long").alias("xid"),
        F.lit("COMMIT 1 (at 2024-01-01 00:00:00.000000+00)").alias("data"),
    )
    td = dml.unionByName(commits)
    best = 0
    for _ in range(2):
        t0 = time.perf_counter()
        decode_test_decoding(td).count()
        best = max(best, int(n / (time.perf_counter() - t0)))
    rates["poll_decode_test_decoding"] = best
    return rates


if __name__ == "__main__":
    main()
