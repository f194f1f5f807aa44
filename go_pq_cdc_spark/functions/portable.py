"""Portable expression fragments — each primitive is emitted BOTH as Spark
SQL (for `F.expr`) and as DuckDB SQL (for the oracle), guaranteeing the two
engines compute bit-identical values.

Why a portable hash: Spark's xxhash64/murmur3 and DuckDB's hash() disagree,
so oracle-checkable fingerprinting/minhashing needs an arithmetic hash both
engines evaluate exactly — a base-31 polynomial over code points mod
2^31-1, folded left-to-right in int64 (no overflow: acc < 2^31, acc*31+255
< 2^36). All of it stays inside whole-stage codegen on the Spark side (no
Python UDFs).

Production note (100 TB): swap POLY_HASH for xxhash64(...) when oracle
parity is not required — same pipeline shape, cheaper per byte. The
operators accept a `portable=` flag for this.
"""

from __future__ import annotations

MERSENNE31 = 2_147_483_647  # 2^31 - 1
KNUTH = 2_654_435_761  # Knuth multiplicative constant (fits signed 32-bit math)


def tokens(col: str) -> dict[str, str]:
    """Whitespace tokenization."""
    return {
        "spark": f"split(trim({col}), '\\\\s+')",
        "duck": f"regexp_split_to_array(trim({col}), '\\s+')",
    }


def n_tokens(col: str) -> dict[str, str]:
    t = tokens(col)
    return {"spark": f"size({t['spark']})", "duck": f"len({t['duck']})"}


def poly_hash(s: dict[str, str] | str) -> dict[str, str]:
    """Base-31 polynomial hash of a string expression, mod 2^31-1."""
    if isinstance(s, str):
        s = {"spark": s, "duck": s}
    return {
        "spark": (
            f"aggregate(transform(split({s['spark']}, ''), chx -> ascii(chx)), 0L, "
            f"(acc, xx) -> (acc * 31 + xx) % {MERSENNE31})"
        ),
        "duck": (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(string_split({s['duck']}, ''), chx -> CAST(ascii(chx) AS BIGINT))), "
            f"(acc, xx) -> (acc * 31 + xx) % {MERSENNE31})"
        ),
    }


def md5_hash(s: dict[str, str] | str) -> dict[str, str]:
    """int64 hash from the first 15 hex chars of md5 (both engines share
    md5 and evaluate it natively — unlike xxhash64/murmur3 which disagree
    across engines). Range [0, 2^60)."""
    if isinstance(s, str):
        s = {"spark": s, "duck": s}
    return {
        "spark": f"CAST(conv(substr(md5({s['spark']}), 1, 15), 16, 10) AS BIGINT)",
        "duck": f"CAST('0x' || substr(md5({s['duck']}), 1, 15) AS BIGINT)",
    }


def md5_hash_m31(s: dict[str, str] | str) -> dict[str, str]:
    """md5-derived hash reduced mod 2^31-1 — safe as MinHash input
    (a*h + b stays inside int64)."""
    h = md5_hash(s)
    return {
        "spark": f"({h['spark']} % {MERSENNE31})",
        "duck": f"({h['duck']} % {MERSENNE31})",
    }


def minhash_coeffs(k: int) -> tuple[int, int]:
    """(a_k, b_k) for the k-th MinHash permutation — same formula the SQL
    fragments inline, for use as Python-side literals."""
    return (k * KNUTH + 1) % MERSENNE31, (k * 40503 + 7) % MERSENNE31


def token_shingles_col(tok_col: str, n: int = 3) -> dict[str, str]:
    """n-token shingles over a MATERIALIZED token-array column. Use this on
    the Spark side: inlining the tokenizer into the lambda re-evaluates
    split() for every element_at — O(tokens^2) per document. TOTAL like
    `token_shingles`: short docs yield an empty list (Spark's sequence()
    runs backwards on start>stop and ANSI element_at throws)."""
    sp_parts = ", ' ', ".join(f"element_at({tok_col}, i + {j})" for j in range(n))
    du_parts = " || ' ' || ".join(f"{tok_col}[i + {j}]" for j in range(n))
    return {
        "spark": (
            f"CASE WHEN size({tok_col}) < {n} THEN array() "
            f"ELSE transform(sequence(1, size({tok_col}) - {n - 1}), "
            f"i -> concat({sp_parts})) END"
        ),
        "duck": f"[{du_parts} FOR i IN range(1, len({tok_col}) - {n - 2})]",
    }


def token_shingles(tok: dict[str, str], n: int = 3) -> dict[str, str]:
    """n-token shingles (space-joined). TOTAL on both engines: a doc with
    fewer than n tokens yields an empty list. The Spark guard matters
    beyond semantics — `sequence(1, size-{n-1})` runs BACKWARDS on
    start>stop ([1,0] for 2 tokens), and under Spark 4's default ANSI mode
    the resulting out-of-range element_at THROWS; optimizer-inferred
    predicates (e.g. InferFiltersFromGenerate's `size(sh) > 0` below an
    explode) can evaluate this expression on rows a caller-side
    `size(tokens) >= n` filter would have dropped, so the expression itself
    must be safe. DuckDB's range() is already empty on start>stop."""
    sp_parts = ", ' ', ".join(f"element_at({tok['spark']}, i + {j})" for j in range(n))
    du_parts = " || ' ' || ".join(f"({tok['duck']})[i + {j}]" for j in range(n))
    return {
        "spark": (
            f"CASE WHEN size({tok['spark']}) < {n} THEN array() "
            f"ELSE transform(sequence(1, size({tok['spark']}) - {n - 1}), "
            f"i -> concat({sp_parts})) END"
        ),
        "duck": f"[{du_parts} FOR i IN range(1, len({tok['duck']}) - {n - 2})]",
    }


def shingle_hashes(col: str, n: int = 3) -> dict[str, str]:
    """Distinct md5-derived hashes (mod 2^31-1) of the n-token shingles of
    a text column — the MinHash input set.

    Cross-engine contract: SET equality, not list equality — Spark's
    array_distinct keeps first-occurrence order while DuckDB's
    list_distinct does not guarantee one. Every consumer is
    order-insensitive (array_min/list_min for MinHash, array_intersect/
    list_intersect + size/len for Jaccard), which
    tests/test_portable_fragments.py pins."""
    tok = tokens(col)
    sh = token_shingles(tok, n)
    h = md5_hash_m31({"spark": "sh", "duck": "sh"})
    return {
        "spark": f"array_distinct(transform({sh['spark']}, sh -> {h['spark']}))",
        "duck": f"list_distinct([{h['duck']} FOR sh IN {sh['duck']}])",
    }


def minhash_signature(hashes: dict[str, str], k: int = 16) -> dict[str, str]:
    """k-permutation MinHash over a set of int64 hashes: for each seed k,
    min over h of ((a_k*h + b_k) mod P), a_k/b_k derived from the seed with
    pure int64 arithmetic (identical across engines)."""
    a = f"((k * {KNUTH} + 1) % {MERSENNE31})"
    b = f"((k * 40503 + 7) % {MERSENNE31})"
    body = f"(({a}) * h + {b}) % {MERSENNE31}"
    return {
        "spark": (
            f"transform(sequence(0, {k - 1}), k -> "
            f"array_min(transform({hashes['spark']}, h -> {body})))"
        ),
        "duck": f"[list_min([{body} FOR h IN {hashes['duck']}]) FOR k IN range(0, {k})]",
    }


def simhash(hashes: dict[str, str], bits: int = 32) -> dict[str, str]:
    """SimHash fingerprint: for each bit position, sum +1/-1 over the token
    hashes' bits; fingerprint sets the bit where the sum is positive.
    `hashes` should reference a precomputed int64-array column (the inner
    vote re-evaluates it per bit)."""
    sp = (
        f"aggregate(sequence(0, {bits - 1}), 0L, (fac, b) -> fac + "
        f"CASE WHEN aggregate({hashes['spark']}, 0L, (vac, h) -> vac + "
        f"(CASE WHEN FLOOR(h / power(2, b)) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN CAST(power(2, b) AS BIGINT) ELSE 0L END)"
    )
    du = (
        f"CAST(list_sum([CASE WHEN list_sum([CASE WHEN CAST(FLOOR(h / (2 ** b)) AS BIGINT) % 2 = 1 "
        f"THEN 1 ELSE -1 END FOR h IN {hashes['duck']}]) > 0 "
        f"THEN CAST(2 ** b AS BIGINT) ELSE 0 END FOR b IN range(0, {bits})]) AS BIGINT)"
    )
    return {"spark": sp, "duck": du}


# Unroll width for the codegen fast path of scaled_dot_fast /
# similarity's hyperplane buckets: the engine's embedding tables are
# 64-dim (TESTDATA.md contract; a common production width). Any other
# width takes the generic HOF fallback with IDENTICAL values — the
# constant only selects which spelling evaluates.
FAST_DIMS = 64


def scaled_dot_fast(
    a: str, b: str, scale: int = 1_000_000, dims: int = FAST_DIMS
) -> str:
    """Spark-side `scaled_dot` with a WHOLE-STAGE-CODEGEN fast path
    (optimization r13, guide §1.2-2): Spark's higher-order functions
    (aggregate/transform) are CodegenFallback — every per-element
    round/cast/multiply is interpreted. For the common fixed width the
    dot is emitted as an UNROLLED flat sum of per-element products
    (pure codegen arithmetic, measured ~1.6x faster than the HOF at
    sf0.1); any other width falls back to the generic HOF fragment.
    Left-to-right + chain == the HOF's left fold, products identical —
    values are bit-identical in every case, so DuckDB oracles keep the
    generic formulation."""
    cast = f"CAST(round(CAST({{v}} AS DOUBLE) * {scale}) AS BIGINT)"
    terms = " + ".join(
        "("
        + cast.format(v=f"element_at({a}, {i})")
        + " * "
        + cast.format(v=f"element_at({b}, {i})")
        + ")"
        for i in range(1, dims + 1)
    )
    gen = scaled_dot(a, b, a, scale)["spark"]
    return (
        f"CASE WHEN size({a}) = {dims} AND size({b}) = {dims} "
        f"THEN ({terms}) ELSE ({gen}) END"
    )


def fx_vec(vec: str, scale: int = 1_000_000) -> str:
    """Spark-side fixed-point int64 array of a float vector — the SAME
    per-element `CAST(round(CAST(x AS DOUBLE) * scale) AS BIGINT)` as
    `scaled_dot`, materialized ONCE per row so that every dot/norm that
    row participates in reuses the cast integers instead of re-rounding
    per pair (optimization r13, guide §1.2-2: Spark's higher-order
    functions are interpreted, so each removed per-element round/cast
    is real CPU). NULL vectors stay NULL (transform of NULL is NULL)."""
    return (
        f"transform({vec}, x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
    )


def int_dot(a: str, b: str) -> str:
    """Spark-side exact dot of two equal-length PRE-CAST int64 arrays
    (`fx_vec` outputs): identical values and fold order as `scaled_dot`
    — products and the left-fold sum are the same int64 arithmetic, so
    every consumer stays bit-identical to the DuckDB oracles."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"


def int_dot_fast(a: str, b: str, dims: int = FAST_DIMS) -> str:
    """`int_dot` with the same whole-stage-codegen fast path as
    `scaled_dot_fast`: for the common fixed width the product sum is
    emitted as an unrolled flat chain (pure codegen int64 arithmetic —
    no HOF, no per-pair rounding), any other width falls back to the
    generic `int_dot` HOF. Left-to-right chain == the HOF's left fold,
    products identical — values are bit-identical in every case. The
    intended use is the QUADRATIC pair stage of the embedding dedup
    family: cast each row to fixed-point ONCE per join side (`fx_vec`,
    after the grid exchange so the cast integers never cross the wire)
    and pay only the multiply-adds per candidate pair, instead of
    re-rounding both 64-dim vectors on every pair (optimization r13;
    the DuckDB oracles got the same one-cast-per-row factoring in the
    r12 round — `_VQ_DUCK` in plans/mining.py)."""
    terms = " + ".join(
        f"(element_at({a}, {i}) * element_at({b}, {i}))"
        for i in range(1, dims + 1)
    )
    return (
        f"CASE WHEN size({a}) = {dims} AND size({b}) = {dims} "
        f"THEN ({terms}) ELSE ({int_dot(a, b)}) END"
    )


def scaled_dot(a: str, b: str, dim_of: str, scale: int = 1_000_000) -> dict[str, str]:
    """Exact integer dot product of two float vectors: each component is
    rounded to `scale` fixed-point (deterministic: both engines round
    half-away-from-zero on doubles), products and sums stay in int64
    (|x|<~2^17 scaled -> product < 2^34, 64-dim sum < 2^40)."""
    cast = f"CAST(round(CAST({{v}} AS DOUBLE) * {scale}) AS BIGINT)"
    ax = cast.format(v=f"element_at({a}, i)")
    bx = cast.format(v=f"element_at({b}, i)")
    axd = cast.format(v=f"({a})[i]")
    bxd = cast.format(v=f"({b})[i]")
    return {
        "spark": (
            f"aggregate(transform(sequence(1, size({dim_of})), i -> {ax} * {bx}), "
            f"0L, (acc, x) -> acc + x)"
        ),
        "duck": f"CAST(list_sum([{axd} * {bxd} FOR i IN range(1, len({dim_of}) + 1)]) AS BIGINT)",
    }
