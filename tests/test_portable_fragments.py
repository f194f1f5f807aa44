"""Cross-engine contract of `functions.portable`: each fragment pair must
evaluate to IDENTICAL values in Spark and DuckDB on the same input — the
whole oracle gate rests on this, but the query-level tests only exercise it
on clean synthetic corpora. This suite drives the fragments directly over a
deliberately tricky text corpus (empty / sub-shingle / repeated / unicode /
mixed whitespace / punctuation) in both engines."""

from __future__ import annotations

import duckdb
import pytest

from go_pq_cdc_spark.functions import portable as P
from go_pq_cdc_spark.operators.text import repetition_fragments

# The documented domain of the text fragments: whitespace-separated tokens.
CORPUS = [
    "",
    " ",
    "one",
    "two words",
    "exactly three tokens",
    "now exactly four tokens",
    "a b c a b c a b c",
    "the the the the",
    "punct, here! (and) [brackets] {braces} <angle>",
    "MiXeD CaSe Tokens AND lower",
    "unicode café naïve züge 北京 🙂 done",
    "numbers 123 456.789 -42 1e9",
    "tabs\tand\nnewlines mixed  double  spaces",
    "long " + " ".join(f"tok{i}" for i in range(50)),
    "trailing spaces   ",
    "   leading spaces",
]


@pytest.fixture(scope="module")
def engines(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INTEGER, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(CORPUS)))
    sdf = spark.createDataFrame(list(enumerate(CORPUS)), "id int, text string")
    sdf.createOrReplaceTempView("t_frag")
    yield spark, con
    spark.catalog.dropTempView("t_frag")


def _both(engines, frag: dict[str, str]):
    spark, con = engines
    srows = spark.sql(
        f"SELECT id, {frag['spark']} AS v FROM t_frag ORDER BY id"
    ).collect()
    drows = con.execute(
        f"SELECT id, {frag['duck']} AS v FROM t ORDER BY id"
    ).fetchall()
    return [(r["id"], r["v"]) for r in srows], [(i, v) for i, v in drows]


@pytest.mark.parametrize(
    "name,frag_fn",
    [
        ("n_tokens", lambda: P.n_tokens("text")),
        ("md5_hash_m31", lambda: P.md5_hash_m31({"spark": "text", "duck": "text"})),
        ("repetition_ratio", lambda: repetition_fragments("text")),
    ],
)
def test_fragment_identical_across_engines(engines, name, frag_fn):
    s, d = _both(engines, frag_fn())
    assert s == d, f"{name} diverges between Spark and DuckDB"


def test_shingle_hashes_set_equal(engines):
    """shingle_hashes' documented contract is SET equality: Spark's
    array_distinct keeps first-occurrence order, DuckDB's list_distinct
    does not guarantee one. Every consumer (min / intersect / size) is
    order-insensitive, so the sets — including emptiness for sub-shingle
    docs — must coincide exactly."""
    s, d = _both(engines, P.shingle_hashes("text"))
    assert [(i, sorted(v)) for i, v in s] == [(i, sorted(v)) for i, v in d]


def test_minhash_signature_identical(engines):
    """The full MinHash signature (16 permutations) over the shingle set —
    the exact values the LSH band keys are built from. NULL-signature rows
    (sub-shingle docs, empty set -> no minimum) must be NULL in BOTH."""
    sh = P.shingle_hashes("text")
    sig = P.minhash_signature({"spark": sh["spark"], "duck": sh["duck"]}, P_K := 16)
    s, d = _both(engines, sig)
    assert s == d


def test_tokens_identical(engines):
    s, d = _both(engines, P.tokens("text"))
    assert s == d


def test_pii_scrub_edge_cases(spark):
    """Pattern-order and boundary semantics of the PII scrubber: an
    address with an IP-literal host is not an email (alphabetic TLD
    required) but its host IS redacted by the IP pass, phones anchor on
    '+' so SSN-style ids survive to their own pass, and the scrub is
    idempotent (placeholders match nothing)."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators.text import with_pii_scrub

    rows = [
        (1, "mail me at a.b+c@10.0.0.1 or x@y.example today"),
        (2, "call +44 (0) 20-7946 0958 or 555-12-3456 now"),
        (3, "bare host 192.168.254.3 and nothing else"),
        (4, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in with_pii_scrub(df).collect()}
    assert out[1]["clean_text"] == "mail me at a.b+c@<IP> or <EMAIL> today"
    assert (out[1]["n_email"], out[1]["n_ip"]) == (1, 1)
    assert out[2]["clean_text"] == "call <PHONE> or <ID> now"
    assert (out[2]["n_phone"], out[2]["n_id"]) == (1, 1)
    assert out[3]["clean_text"] == "bare host <IP> and nothing else"
    assert out[4]["clean_text"] == "no pii here at all"
    # idempotent: scrubbing scrubbed text changes nothing
    again = {
        r["doc_id"]: r["clean_text"]
        for r in with_pii_scrub(
            with_pii_scrub(df).select("doc_id", F.col("clean_text").alias("text"))
        ).collect()
    }
    assert again == {k: v["clean_text"] for k, v in out.items()}


def test_remove_boilerplate_lines_semantics(spark):
    """Line-level dedup contract: a sentence shared by >= min_docs docs is
    removed from EVERY doc, unique sentences keep their original order,
    and a doc that is all boilerplate reduces to the empty string."""
    from go_pq_cdc_spark.operators.text import remove_boilerplate_lines

    rows = [
        (1, "alpha one. shared banner here. alpha two"),
        (2, "beta start. shared banner here. beta end"),
        (3, "gamma only. shared banner here"),
        (4, "shared banner here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["id"]: r
        for r in remove_boilerplate_lines(df, "doc_id", min_docs=3).collect()
    }
    assert out[1]["clean_text"] == "alpha one. alpha two"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["clean_text"] == "beta start. beta end"
    assert out[3]["clean_text"] == "gamma only"
    assert out[4]["clean_text"] == ""
    assert out[4]["n_kept"] == 0


def test_url_normalize_edge_cases(spark):
    """URL canonicalization semantics, pinned: case folding on scheme+host
    only (path stays case-sensitive), www and default-port stripping
    (non-default ports kept), tracking-param removal, param sort,
    fragment drop, trailing-slash strip, non-URL fallback to
    lower(trim()), and idempotency."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators.text import with_url_normalized

    rows = [
        (1, "HTTPS://WWW.Example.COM:443/Path/Sub/"),
        (2, "http://host.com:8080/x"),
        (3, "https://example.com/a?utm_source=f&utm_campaign=c"),
        (4, "https://example.com/a?z=1&a=2&fbclid=abc#frag"),
        (5, "  Not A URL  "),
        (6, "ftp://Files.example.com/pub/"),
        (7, "https://example.com"),
        (8, "https://[2001:db8::1]:8080/x"),
        (9, "https://[2001:db8::2]:8080/x"),
        (10, "https://[2001:db8::1]:443/x"),
        (11, "https://example.com:8o80/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    out = {r["doc_id"]: r["norm_url"] for r in with_url_normalized(df).collect()}
    assert out[1] == "https://example.com/Path/Sub"
    assert out[2] == "http://host.com:8080/x"
    assert out[3] == "https://example.com/a"
    assert out[4] == "https://example.com/a?a=2&z=1"
    assert out[5] == "not a url"
    assert out[6] == "ftp://files.example.com/pub"
    assert out[7] == "https://example.com"
    # IPv6 literals: the bracket group is one host token — distinct
    # addresses must NOT merge (r6 review), default port still drops
    assert out[8] == "https://[2001:db8::1]:8080/x"
    assert out[9] == "https://[2001:db8::2]:8080/x"
    assert out[10] == "https://[2001:db8::1]/x"
    # malformed port: preserved verbatim, never silently dropped
    assert out[11] == "https://example.com:8o80/x"
    again = {
        r["doc_id"]: r["norm_url"]
        for r in with_url_normalized(
            with_url_normalized(df).select("doc_id", F.col("norm_url").alias("url"))
        ).collect()
    }
    assert again == out


def test_text_cleanup_edge_cases(spark):
    """Cleanup semantics pinned: zero-width chars vanish, control chars
    vanish but \n and \t survive (tab then collapses to a space),
    typographic punctuation folds to ASCII, whitespace runs collapse,
    3+ newlines become 2, result is trimmed, and the pass is idempotent."""
    from pyspark.sql import functions as F

    from go_pq_cdc_spark.operators.text import with_text_cleanup

    rows = [
        (1, "a​b‌c‍d﻿e"),
        (2, "x\x01y\x1fz\x7fw"),
        (3, "keep\nnew\tline"),
        (4, "’s “q” – —"),
        (5, "  many   spaces\t\t and  tabs  "),
        (6, "a\n\n\n\n\nb"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in with_text_cleanup(df).collect()}
    assert out[1]["clean_text"] == "abcde"
    assert out[1]["n_chars_removed"] == 4
    assert out[2]["clean_text"] == "xyzw"
    assert out[3]["clean_text"] == "keep\nnew line"
    assert out[4]["clean_text"] == "'s \"q\" - -"
    assert out[5]["clean_text"] == "many spaces and tabs"
    assert out[6]["clean_text"] == "a\n\nb"
    again = {
        r["doc_id"]: r["clean_text"]
        for r in with_text_cleanup(
            with_text_cleanup(df).select("doc_id", F.col("clean_text").alias("text"))
        ).collect()
    }
    assert again == {k: v["clean_text"] for k, v in out.items()}


def test_bag_fingerprint_permutation_invariance(spark):
    """Reordered tokens share a fingerprint; different multisets (extra
    word, changed multiplicity) do not."""
    from go_pq_cdc_spark.operators.text import with_bag_fingerprint

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "delta gamma beta alpha"),
        (3, "alpha beta gamma delta extra"),
        (4, "alpha alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fp = {r["doc_id"]: r["bag_fp"] for r in with_bag_fingerprint(df).collect()}
    assert fp[1] == fp[2]
    assert len({fp[1], fp[3], fp[4]}) == 3


def test_gopher_quality_rules(spark):
    """Each Gopher rule discriminates on a hand-built doc where exactly
    that rule fails; the clean doc passes all of them."""
    from go_pq_cdc_spark.operators.text import with_gopher_quality

    good_body = ("the rain and sun be kind to all of us that have come "
                 "here with hope " * 5).strip()  # 80 words, all rules pass
    rows = [
        (1, good_body),
        (2, "the of short doc"),  # word-count floor
        (3, "aa bb cc " * 20 + "the of"),  # mean word length < 3
        (4, good_body + " " + "### ## # " * 4),  # symbol ratio
        (5, "\n".join(["- bullet line here"] * 19 + [good_body])),  # bullets
        (6, "\n".join(["ends in dots..."] * 4 + [good_body] * 6)),  # ellipsis
        (7, "zzzz qqqq rrrr wwww " * 15),  # no required stopwords at all
        (8, " ".join(["123 45"] * 40) + " the of"),  # alpha-word ratio
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in with_gopher_quality(df).collect()}
    assert out[1]["keep"] == 1
    for d in range(2, 9):
        assert out[d]["keep"] == 0, f"doc {d} should fail"
    assert out[2]["n_words"] == 4
    assert out[3]["mean_word_len"] < 3.0
    assert out[4]["symbol_ratio"] >= 0.1
    assert out[5]["bullet_ratio"] >= 0.9
    assert out[6]["ellipsis_ratio"] >= 0.3
    assert out[7]["stop_hits"] < 2
    assert out[8]["alpha_ratio"] <= 0.8


def test_bloom_positions_and_hll_fragments_identical(engines):
    """The r13 sketch fragments compute bit-identical values on both
    engines over the shared corpus: Bloom bit positions (all k
    permutations mod 1024) and the HLL (bucket, rho) register inputs.
    These are the values every Bloom/HLL gate row's exactness rests on."""
    from go_pq_cdc_spark.operators.sketch import (
        BLOOM_BITS,
        BLOOM_K,
        _bloom_pos_exprs,
        _hll_rho_fragments,
    )

    hv = P.md5_hash_m31({"spark": "text", "duck": "text"})
    for e in _bloom_pos_exprs(BLOOM_K, BLOOM_BITS):
        frag = {
            "spark": e["spark"].replace("hv", f"({hv['spark']})"),
            "duck": e["duck"].replace("hv", f"({hv['duck']})"),
        }
        s, d = _both(engines, frag)
        assert s == d, "bloom position fragment diverges"
    rho = _hll_rho_fragments({"spark": "text", "duck": "text"})
    for part in ("bucket", "rho"):
        s, d = _both(
            engines,
            {"spark": rho["spark"][part], "duck": rho["duck"][part]},
        )
        assert s == d, f"hll {part} fragment diverges"


def test_int_dot_fast_matches_scaled_dot_spellings(spark):
    """The three Spark spellings of the exact fixed-point dot must agree
    on every width class: the generic HOF (`scaled_dot`), the unrolled
    per-pair-rounding fast path (`scaled_dot_fast`), and the r13
    pre-cast factoring (`fx_vec` once per side + `int_dot_fast`). The
    pair operators swap between them purely for speed, so divergence on
    ANY input silently changes dedup results. Covers the unrolled
    64-dim path, the generic fallback (odd width), and NULL vectors."""
    from pyspark.sql import functions as F

    rows = [
        (1, [float(i % 7) / 7 - 0.5 for i in range(64)],
            [float((i * 3) % 11) / 11 - 0.5 for i in range(64)]),   # 64-dim
        (2, [0.25, -0.5, 1.0 / 3.0], [0.125, 0.75, -0.2]),          # odd width
        (3, None, [0.1, 0.2, 0.3]),                                  # NULL side
        (4, [1e-7, -1e-7, 5e-7], [1.0, -1.0, 1.0]),                  # sub-scale
    ]
    df = spark.createDataFrame(
        rows, "id long, va array<double>, vb array<double>"
    ).select(
        "id",
        F.expr("transform(va, x -> CAST(x AS FLOAT))").alias("va"),
        F.expr("transform(vb, x -> CAST(x AS FLOAT))").alias("vb"),
    )
    out = df.select(
        "id",
        F.expr(P.scaled_dot("va", "vb", "va")["spark"]).alias("gen"),
        F.expr(P.scaled_dot_fast("va", "vb")).alias("fast"),
        F.expr(
            P.int_dot_fast("vqa", "vqb")
            .replace("vqa", f"({P.fx_vec('va')})")
            .replace("vqb", f"({P.fx_vec('vb')})")
        ).alias("precast"),
    ).collect()
    for r in out:
        assert r["gen"] == r["fast"] == r["precast"], dict(r.asDict())
