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
