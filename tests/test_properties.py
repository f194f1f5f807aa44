"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5 notes it has no randomized testing). Pure-Python properties run
per-example; Spark-backed properties run on a few drawn examples against an
independent Python model."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from go_pq_cdc_spark.functions import portable as P
from go_pq_cdc_spark.snapshot import plan_ctid_blocks, plan_integer_range, plan_offset


@given(
    lo=st.integers(-(10**9), 10**9),
    span=st.integers(0, 50_000),
    chunk=st.integers(10, 10**5),
)
@settings(max_examples=150, deadline=None)
def test_integer_range_plan_partitions_exactly(lo, span, chunk):
    """Chunks tile [lo, hi] exactly: no gap, no overlap, width <= chunk."""
    hi = lo + span
    plan = plan_integer_range("id", lo, hi, chunk)
    assert plan.chunks[0].range_start == lo
    assert plan.chunks[-1].range_end == hi
    for a, b in zip(plan.chunks, plan.chunks[1:]):
        assert b.range_start == a.range_end + 1
    assert all(c.range_end - c.range_start + 1 <= chunk for c in plan.chunks)
    total = sum(c.range_end - c.range_start + 1 for c in plan.chunks)
    assert total == span + 1


@given(
    relpages=st.integers(1, 20_000),
    reltuples=st.floats(0, 10**8, allow_nan=False),
    chunk=st.integers(10, 10**5),
)
@settings(max_examples=150, deadline=None)
def test_ctid_plan_covers_all_blocks(relpages, reltuples, chunk):
    """Block ranges tile [0, relpages) and the tail chunk is unbounded (the
    late-row guard, coordinator.go:797-892)."""
    plan = plan_ctid_blocks(relpages, reltuples, chunk)
    assert plan.chunks[0].block_start == 0
    assert plan.chunks[-1].block_end is None
    for a, b in zip(plan.chunks, plan.chunks[1:]):
        assert b.block_start == a.block_end
    assert plan.chunks[-1].block_start < max(relpages, 1)


@given(total=st.integers(0, 200_000), chunk=st.integers(10, 10**5))
@settings(max_examples=150, deadline=None)
def test_offset_plan_covers_count(total, chunk):
    plan = plan_offset(total, "ctid", chunk)
    covered = sum(c.limit for c in plan.chunks)
    assert covered >= max(total, 1)
    assert plan.chunks[-1].offset < max(total, 1)


def _model_latest_state(events):
    """Independent Python model of latest_state: delete-epoch TOAST fill +
    max-LSN-wins + delete removes key."""
    by_pk: dict[int, list] = {}
    for lsn, pk, op, val in sorted(events):
        by_pk.setdefault(pk, []).append((lsn, op, val))
    out = {}
    for pk, evs in by_pk.items():
        filled = None
        for _lsn, op, val in evs:
            if op == "D":
                filled = None
            elif val is not None:
                filled = val
        last_lsn, last_op, _ = evs[-1]
        if last_op != "D":
            out[pk] = (filled, last_lsn)
    return out


@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 50),  # pk
            st.sampled_from(["I", "U", "D"]),
            st.one_of(st.none(), st.floats(0, 100, allow_nan=False, width=32)),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=3, deadline=None)
def test_latest_state_matches_model(spark_session_holder, data):
    """Spark latest_state == the Python model for random changelogs."""
    spark = spark_session_holder
    from pyspark.sql import Row

    from go_pq_cdc_spark.operators.cdc import latest_state

    events = [
        (lsn, pk, op, float(val) if val is not None else None)
        for lsn, (pk, op, val) in enumerate(data)
    ]
    rows = [
        Row(lsn=lsn, pk=pk, op=op, after_val=val, xid=0, tbl="t")
        for lsn, pk, op, val in events
    ]
    df = spark.createDataFrame(
        rows, "lsn long, pk long, op string, after_val double, xid long, tbl string"
    )
    got = {
        r["pk"]: (r["last_val"], r["last_lsn"]) for r in latest_state(df).collect()
    }
    want = _model_latest_state(events)
    assert got == want


# session-scoped spark via a holder fixture (hypothesis forbids function-
# scoped fixtures that would re-run per example)
import pytest  # noqa: E402

# slow tier (r13 verdict item 1): excluded from the default pytest run
# so the driver's gate finishes inside its window; run with
# `pytest -m "slow or not slow"` (full) or `-m slow` (this tier only).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="session")
def spark_session_holder(spark):
    return spark


@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 20),  # pk
            st.sampled_from(["I", "U", "D"]),
            st.one_of(st.none(), st.floats(0, 100, allow_nan=False, width=32)),
        ),
        min_size=1,
        max_size=40,
    ),
    cuts=st.lists(st.integers(1, 39), max_size=3, unique=True),
)
@settings(max_examples=3, deadline=None)
def test_incremental_mirror_equals_batch_state(spark_session_holder, data, cuts):
    """The bucketed incremental merge, fed the changelog in ANY sequential
    batch split, must equal batch latest_state over the full log — the
    reference's no-gap-no-dup consistency invariant for the mirror layout
    (snapshot_consistency_test.go:18-26 generalized to every cut set)."""
    import shutil
    import tempfile

    from pyspark.sql import Row

    from go_pq_cdc_spark.operators.cdc import latest_state
    from go_pq_cdc_spark.streaming.changelog_stream import (
        merge_mirror_batch,
        read_mirror,
    )

    spark = spark_session_holder
    events = [
        (lsn, pk, op, float(val) if val is not None else None)
        for lsn, (pk, op, val) in enumerate(data)
    ]
    rows = [
        Row(lsn=lsn, pk=pk, op=op, after_val=val, xid=0, tbl="t")
        for lsn, pk, op, val in events
    ]
    full = spark.createDataFrame(
        rows, "lsn long, pk long, op string, after_val double, xid long, tbl string"
    )
    bounds = sorted({c for c in cuts if c < len(rows)})
    slices = []
    prev = 0
    for b in [*bounds, len(rows)]:
        if b > prev:
            slices.append(rows[prev:b])
            prev = b
    state_dir = tempfile.mkdtemp(prefix="gpcs_prop_mirror_")
    try:
        for i, chunk in enumerate(slices):
            batch = spark.createDataFrame(
                chunk,
                "lsn long, pk long, op string, after_val double, xid long, tbl string",
            )
            merge_mirror_batch(batch, state_dir, epoch=i, n_buckets=8)
        got = {
            r["pk"]: (r["after_val"], r["lsn"])
            for r in read_mirror(spark, state_dir).collect()
        }
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
    want = {
        r["pk"]: (r["last_val"], r["last_lsn"]) for r in latest_state(full).collect()
    }
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=3, deadline=None)
def test_dedup_clusters_match_union_find(spark_session_holder, edges):
    """Hash-min label propagation == a Python union-find on random pair
    graphs: every node labeled with the min id of its component."""
    spark = spark_session_holder
    from go_pq_cdc_spark.operators.dedup import dedup_clusters

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a bigint, doc_b bigint"
    )
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == expected


# -- PG text-array literal parser round-trip ---------------------------------


def _pg_array_literal(value) -> str:
    """Serialize a nested list the way PostgreSQL prints array output:
    quote any element containing specials (or empty, or literal NULL),
    escape backslash/quote, bare NULL for SQL NULL."""
    if isinstance(value, list):
        return "{" + ",".join(_pg_array_literal(v) for v in value) + "}"
    if value is None:
        return "NULL"
    s = str(value)
    needs_quote = (
        s == ""
        or s.upper() == "NULL"
        or any(c in s for c in ',{}"\\ \t')
    )
    if needs_quote:
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return s


_ELEMENT = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
        max_size=12,
    ),
)


@given(st.lists(_ELEMENT, max_size=8))
@settings(max_examples=200, deadline=None)
def test_pg_array_parser_roundtrip_flat(elems):
    """parse(serialize(x)) == x for any flat string array, including
    elements with commas, quotes, backslashes, braces, empty strings, the
    literal string 'NULL', and SQL NULLs."""
    import json

    from go_pq_cdc_spark.sources.pgoutput import pg_array_text_to_json

    lit = _pg_array_literal(elems)
    assert json.loads(pg_array_text_to_json(lit)) == elems


@given(st.lists(st.lists(_ELEMENT, min_size=1, max_size=4), min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_pg_array_parser_roundtrip_nested(rows):
    """Two-dimensional arrays round-trip too (PG prints them as nested
    braces)."""
    import json

    from go_pq_cdc_spark.sources.pgoutput import pg_array_text_to_json

    lit = _pg_array_literal(rows)
    assert json.loads(pg_array_text_to_json(lit)) == rows


# --- PII scrub: cross-engine property (Spark Java regex vs DuckDB RE2) ---
# The pattern table is written in the dialects' common subset; this pins
# that claim on generated text over the printable-ASCII contract, with
# PII-like snippets spliced in so matches actually occur.

_PII_FRAG = st.text(alphabet=" abcdefgABC0123456789@.+-()_%", max_size=30)
_PII_SNIPPETS = st.sampled_from(
    [
        "bob@x.co",
        "a.b+c@sub.example.org",
        "10.1.2.3",
        "999.999.999.999",
        "+1 (555) 123-4567",
        "123-45-6789",
        "1234-56-7890",
        "a@b",
        "1.2.3",
        "+12",
        "@.",
    ]
)
_PII_DOC = st.lists(
    st.one_of(_PII_FRAG, _PII_SNIPPETS), min_size=0, max_size=6
).map(" ".join)


@given(docs=st.lists(_PII_DOC, min_size=1, max_size=60))
@settings(max_examples=5, deadline=None)
def test_pii_scrub_cross_engine(spark, ddb, docs):
    import pandas as pd

    from go_pq_cdc_spark.operators.text import PII_PATTERNS, with_pii_scrub

    sdf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["clean_text"] for r in with_pii_scrub(sdf).collect()
    }
    chain = "text"
    for _, pat, repl in PII_PATTERNS:
        chain = f"regexp_replace({chain}, '{pat}', '{repl}', 'g')"
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})  # noqa: F841
    want = dict(
        ddb.execute(f"SELECT doc_id, {chain} AS c FROM pdf").fetchall()
    )
    assert got == want


# --- URL normalize: cross-engine property (Java regex vs RE2, HOF sort) ---
# Generated crawl-style URLs (plus junk) must normalize identically under
# `with_url_normalized` (Spark) and `url_normalize_oracle` (DuckDB).

_URL_HOSTS = st.sampled_from(
    ["Example.com", "WWW.Example.com", "sub.host.ORG", "10.0.0.1", "x.y",
     "[2001:DB8::1]", "[::1]"]
)
_URL_SCHEMES = st.sampled_from(["http", "HTTPS", "ftp", "https"])
_URL_PORTS = st.sampled_from(["", ":80", ":443", ":8080", ":8o80", ":"])
_URL_PATHS = st.sampled_from(["", "/", "/A/b", "/a/b/", "/a//", "/%20x"])
_URL_QS = st.sampled_from(
    ["", "?", "?a=1", "?b=2&a=1", "?utm_source=f", "?a=1&gclid=x&z&", "?a=1&a=0"]
)
_URL_FRAGS = st.sampled_from(["", "#f", "#a?b=1"])
_URL_FULL = st.builds(
    lambda s, h, po, pa, q, f: f"{s}://{h}{po}{pa}{q}{f}",
    _URL_SCHEMES, _URL_HOSTS, _URL_PORTS, _URL_PATHS, _URL_QS, _URL_FRAGS,
)
_URL_ANY = st.one_of(
    _URL_FULL, st.sampled_from(["", "   ", "no scheme here", "http//broken", "://x"])
)


@given(urls=st.lists(_URL_ANY, min_size=1, max_size=50))
@settings(max_examples=5, deadline=None)
def test_url_normalize_cross_engine(spark, ddb, urls):
    import pandas as pd

    from go_pq_cdc_spark.operators.text import url_normalize_oracle, with_url_normalized

    sdf = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id bigint, url string"
    )
    got = {r["doc_id"]: r["norm_url"] for r in with_url_normalized(sdf).collect()}
    pdf = pd.DataFrame({"doc_id": range(len(urls)), "url": urls})  # noqa: F841
    want = dict(
        ddb.execute(
            f"SELECT doc_id, {url_normalize_oracle('url')} AS n FROM pdf"
        ).fetchall()
    )
    assert got == want


# --- Text cleanup: cross-engine property ---

_CLEAN_CHARS = st.sampled_from(
    list("ab c\t\n") + ["​", "﻿", "’", "“", "—", "\x01", "\x1f"]
)
_CLEAN_DOC = st.lists(_CLEAN_CHARS, min_size=0, max_size=40).map("".join)


@given(docs=st.lists(_CLEAN_DOC, min_size=1, max_size=50))
@settings(max_examples=5, deadline=None)
def test_text_cleanup_cross_engine(spark, ddb, docs):
    import pandas as pd

    from go_pq_cdc_spark.operators.text import text_cleanup_oracle, with_text_cleanup

    sdf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["clean_text"] for r in with_text_cleanup(sdf).collect()}
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})  # noqa: F841
    want = dict(
        ddb.execute(
            f"SELECT doc_id, {text_cleanup_oracle('text')} AS c FROM pdf"
        ).fetchall()
    )
    assert got == want


# --- pgoutput decoder fuzz: malformed bytes never escape ValueError ---
# A live stream can deliver truncated/garbage frames (broken middlebox,
# version skew); the decoder's error contract is ValueError for anything
# malformed — never struct.error / UnicodeDecodeError / IndexError, which
# callers (slot_keeper's resilient loop) do not classify.

_FUZZ_TAGS = st.sampled_from(
    [b"w", b"k", b"B", b"C", b"I", b"U", b"D", b"T", b"R", b"S", b"E", b"c",
     b"A", b"O", b"Y", b"M", b"z", b""]
)
_FUZZ_BODY = st.binary(min_size=0, max_size=60)


@given(tag=_FUZZ_TAGS, body=_FUZZ_BODY)
@settings(max_examples=300, deadline=None)
def test_pgoutput_decode_fuzz_error_contract(tag, body):
    from go_pq_cdc_spark.sources.pgoutput import PgOutputDecoder, parse_copy_data

    dec = PgOutputDecoder()
    for fn, data in ((parse_copy_data, tag + body), (dec.decode, tag + body)):
        try:
            fn(data)
        except ValueError:
            pass  # the contract


@given(body=_FUZZ_BODY)
@settings(max_examples=200, deadline=None)
def test_pgoutput_decode_fuzz_tuple_payloads(body):
    """Structured-prefix fuzz: valid message tags with garbage tuple
    payloads (the case most likely to hit struct/unicode internals)."""
    import struct as _struct

    from go_pq_cdc_spark.sources.pgoutput import PgOutputDecoder

    dec = PgOutputDecoder()
    # register a relation so DML reaches the tuple decoder
    rel = (
        b"R" + _struct.pack(">I", 7) + b"public\x00t\x00" + b"d"
        + _struct.pack(">H", 1) + b"\x01" + b"c1\x00" + _struct.pack(">II", 25, 0)
    )
    try:
        dec.decode(rel)
    except ValueError:
        pass
    for tag in (b"I", b"U", b"D"):
        try:
            dec.decode(tag + _struct.pack(">I", 7) + body)
        except ValueError:
            pass


# --- prefix sum: property net vs driver-side ground truth ---
# The machinery produced two real r6 bugs (sampled-boundary misalignment,
# pruned weight guard); this pins it against a trivially-correct oracle
# over random ids (sparse/dense/negative), weights (zeros, big), and
# duplicates-free key sets.

_PFX_IDS = st.lists(
    st.integers(min_value=-(10**6), max_value=10**6),
    min_size=1,
    max_size=80,
    unique=True,
)


@given(ids=_PFX_IDS, data=st.data())
@settings(max_examples=5, deadline=None)
def test_prefix_offsets_matches_ground_truth(spark, ids, data):
    from go_pq_cdc_spark.operators.training import with_prefix_offsets

    weights = [
        data.draw(st.integers(min_value=0, max_value=10_000)) for _ in ids
    ]
    df = spark.createDataFrame(list(zip(ids, weights)), "id long, w long")
    got = {
        r["id"]: r["cum_before"]
        for r in with_prefix_offsets(df, "id", "w").collect()
    }
    acc, want = 0, {}
    for i, w in sorted(zip(ids, weights)):
        want[i] = acc
        acc += w
    assert got == want


# -- frames_to_committed_txns: transaction-grouping invariants ---------------


def _txn_frames_strategy():
    """Strategy producing (frames, expected) where frames is a valid
    pgoutput sequence of interleaved regular + streamed transactions
    (streamed ones may abort) and expected is the list of
    (end_lsn, [row_value, ...]) the decoder must emit — committed
    transactions only, in commit order."""
    import struct as _s

    from hypothesis import strategies as st

    from .test_pgoutput import insert_msg, relation_msg, tup

    def build(draw_plan):
        from go_pq_cdc_spark.sources.pgoutput import XLogData

        frames = [XLogData(1, 1, 0, relation_msg())]
        expected = []
        lsn = 10
        xid = 100
        # pending streamed txns: xid -> list of values not yet committed
        for kind, n_rows, commit in draw_plan:
            xid += 1
            vals = [f"{xid}-{i}" for i in range(n_rows)]
            if kind == "regular":
                # regular txns are atomic in the frame stream (the server
                # serializes them whole, in commit order)
                end = lsn + n_rows + 2
                frames.append(
                    XLogData(lsn, lsn, 0, b"B" + _s.pack(">QqI", end - 1, 0, xid))
                )
                for i, v in enumerate(vals):
                    frames.append(
                        XLogData(lsn + 1 + i, 0, 0, insert_msg(vals=(v, "1.0")))
                    )
                frames.append(
                    XLogData(
                        end - 1, 0, 0, b"C" + _s.pack(">bQQq", 0, end - 1, end, 0)
                    )
                )
                if commit:  # regular txns in WAL are always committed
                    expected.append((end, vals))
                else:
                    # an uncommitted regular txn = stream cut before 'C':
                    # drop the commit frame; nothing may be emitted
                    frames.pop()
                lsn = end + 1
            else:  # streamed: chunks, then commit or abort
                # two chunks to exercise S/E re-entry
                half = n_rows // 2
                for chunk in (vals[:half], vals[half:]):
                    frames.append(
                        XLogData(lsn, 0, 0, b"S" + _s.pack(">Ib", xid, 1))
                    )
                    for v in chunk:
                        frames.append(
                            XLogData(
                                lsn + 1, 0, 0,
                                b"I" + _s.pack(">II", xid, 16384) + b"N"
                                + tup(v, "1.0"),
                            )
                        )
                        lsn += 1
                    frames.append(XLogData(lsn, 0, 0, b"E"))
                    lsn += 2
                if commit:
                    end = lsn + 1
                    frames.append(
                        XLogData(
                            lsn, 0, 0,
                            b"c" + _s.pack(">IbQQq", xid, 0, lsn, end, 7),
                        )
                    )
                    expected.append((end, vals))
                    lsn = end + 1
                else:
                    frames.append(
                        XLogData(lsn, 0, 0, b"A" + _s.pack(">II", xid, xid))
                    )
                    lsn += 2
        return frames, expected

    plan = st.lists(
        st.tuples(
            st.sampled_from(["regular", "streamed"]),
            st.integers(min_value=1, max_value=5),
            st.booleans(),
        ),
        min_size=0,
        max_size=6,
    )
    return plan.map(build)


@given(_txn_frames_strategy())
@settings(max_examples=60, deadline=None)
def test_committed_txns_emit_exactly_committed_in_order(case):
    """Property: for any valid interleaving of regular and streamed
    transactions (streamed ones possibly aborted, regular ones possibly
    cut before commit), frames_to_committed_txns emits EXACTLY the
    committed transactions, in commit order, each with contiguous
    txn_seq 1..n and every row's lsn equal to the commit end."""
    from go_pq_cdc_spark.sources.pgoutput import frames_to_committed_txns

    frames, expected = case
    got = list(frames_to_committed_txns(frames))
    assert [(end, [dict(r["after"] or {}).get("id") for r in rows]) for end, rows in got] == [
        (end, vals) for end, vals in expected
    ]
    for end, rows in got:
        assert [r["txn_seq"] for r in rows] == list(range(1, len(rows) + 1))
        assert all(r["lsn"] == end for r in rows)
