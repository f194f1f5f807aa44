"""BPE tokenizer: the incremental trainer must match an independent
textbook implementation, rank-greedy encoding must reproduce training
segmentations, and the distributed path must stay vocab-bounded."""

from __future__ import annotations

from collections import Counter

from go_pq_cdc_spark.catalog import load_table
from go_pq_cdc_spark.operators.tokenizer import (
    EOW,
    _encode_word,
    bpe_token_counts,
    encode_words,
    train_bpe,
    train_bpe_from_corpus,
)

from .conftest import SF_DIR

WC = [
    ("low", 5),
    ("lower", 2),
    ("newest", 6),
    ("widest", 3),
    ("new", 2),
    ("a", 1),
]


def _ref_train(word_counts, num_merges):
    """Sennrich et al.'s algorithm, the slow way: full pair recount every
    round, same (count desc, lexicographic) tie-break. Written
    independently of the incremental trainer on purpose."""
    words = [[list(w) + [EOW], c] for w, c in word_counts]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for entry in words:
            syms = entry[0]
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            entry[0] = out
    return merges, [tuple(e[0]) for e in words]


def test_trainer_matches_textbook_reference():
    for k in (1, 5, 12, 50):
        ref, _ = _ref_train(WC, k)
        assert train_bpe(WC, k) == ref, f"diverged at num_merges={k}"


def test_trainer_exhausts_gracefully():
    # more merges than pairs exist: stops when everything is one symbol
    merges = train_bpe([("ab", 1)], 100)
    assert len(merges) <= 3
    assert _encode_word("ab", {p: i for i, p in enumerate(merges)}) == ["ab" + EOW]


def test_encode_reproduces_training_segmentation_and_roundtrips():
    merges = train_bpe(WC, 8)
    _, ref_segs = _ref_train(WC, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for (word, _), ref_seg in zip(WC, ref_segs):
        got = _encode_word(word, ranks)
        assert tuple(got) == ref_seg, word
        assert "".join(got) == word + EOW  # lossless
    # unseen word: falls back to known sub-pieces, still lossless
    unseen = _encode_word("lowest", ranks)
    assert "".join(unseen) == "lowest" + EOW
    assert len(unseen) > 1


def test_distributed_train_and_count(spark):
    docs = load_table(spark, SF_DIR, "documents")
    merges = train_bpe_from_corpus(docs, 64)
    assert len(merges) == 64
    # determinism across runs (shuffle partitioning must not leak in)
    assert train_bpe_from_corpus(docs, 64) == merges

    out = bpe_token_counts(docs, merges)
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == docs.count()
    # merges learned on this corpus must compress it: fewer pieces than
    # characters+EOW, at least one piece per word
    for r in rows.values():
        assert r["n_bpe_tokens"] >= r["n_words"]
    total_pieces = sum(r["n_bpe_tokens"] for r in rows.values())
    total_chars = sum(
        len(w) + 1
        for r in docs.select("text").collect()
        for w in r["text"].split()
    )
    assert total_pieces < 0.7 * total_chars

    # the corpus-sized join must broadcast the vocab side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_encode_words_schema_and_pieces(spark):
    merges = train_bpe(WC, 8)
    df = spark.createDataFrame([(w,) for w, _ in WC], "word string")
    enc = {r["word"]: r for r in encode_words(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in WC:
        assert enc[w]["pieces"] == _encode_word(w, ranks)
        assert enc[w]["n_pieces"] == len(enc[w]["pieces"])


def test_min_count_prunes_inside_the_aggregate(spark):
    """The r10 scale bug: the trainer collected the FULL distinct-word
    table. Pruning must happen IN the cluster (word_frequencies emits
    nothing below threshold), and the distributed prune must equal the
    driver-side spec exactly."""
    from go_pq_cdc_spark.operators.tokenizer import word_frequencies

    rows = [
        ("the quick brown fox the quick the",),
        ("quick brown docs keep the corpus honest zz",),
        ("the brown fox xq zz",),
    ]
    df = spark.createDataFrame(rows, "text string")
    full = {r["word"]: r["cnt"] for r in word_frequencies(df).collect()}
    pruned = {
        r["word"]: r["cnt"]
        for r in word_frequencies(df, min_count=2).collect()
    }
    assert pruned == {w: c for w, c in full.items() if c >= 2}
    assert "xq" in full and "xq" not in pruned


def test_merges_unchanged_by_subthreshold_tail(spark):
    """Verdict r10 item 2's equivalence: on a corpus whose tail words sit
    below min_count AND whose total tail mass is below every decisive
    pair-count gap, merges learned from the pruned table equal the
    unpruned result."""
    head = "low low low low low low lower lower newest newest newest newest newest newest widest widest widest"
    # tail: 4 hapax words over DISTINCT rare characters — ~1 count of
    # pair mass each, far under the head's pair-count gaps (>= 2)
    tail = "qzj vkx jqv zxk"
    df = spark.createDataFrame([(head,), (tail,)], "text string")
    unpruned = train_bpe_from_corpus(df, 10, min_count=1, max_vocab=None)
    pruned = train_bpe_from_corpus(df, 10, min_count=2, max_vocab=None)
    assert pruned == unpruned


def test_max_vocab_caps_the_collect_to_topn_by_count(spark):
    """max_vocab keeps exactly the top-N words by (cnt desc, word asc) —
    the distributed salted top-k must match the driver-side spec, and the
    merges must equal training on that spec table directly."""
    from go_pq_cdc_spark.operators.tokenizer import word_frequencies

    rows = [
        ("aa aa aa aa bb bb bb cc cc dd ee",),
        ("aa bb cc dd ff gg hh",),
    ]
    df = spark.createDataFrame(rows, "text string")
    full = sorted(
        ((r["word"], r["cnt"]) for r in word_frequencies(df).collect()),
        key=lambda wc: (-wc[1], wc[0]),
    )
    top3 = sorted(full[:3])
    got = train_bpe_from_corpus(df, 6, max_vocab=3)
    assert got == train_bpe(top3, 6)
