"""BPE merge-loop invariants: the distributed loop must reproduce the
classic single-process algorithm (Sennrich et al. 2016) exactly —
including tie-breaks, left-to-right non-overlapping merge application,
and exhaustion — and the fertility audit must agree with a hand fold."""

import random

import pytest
from pyspark.sql import functions as F

from rust_triplets_spark.operators.bpe import (
    apply_merge_col,
    bpe_fertility,
    bpe_train,
    bpe_vocab,
)


def _ref_apply(toks, left, right):
    out = []
    for t in toks:
        if out and out[-1] == left and t == right:
            out[-1] = left + right
        else:
            out.append(t)
    return out


def _ref_train(words, n_merges):
    """words: dict word -> count. Returns [(rank, l, r, merged, c)]."""
    state = {w: [c for c in w] for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for w, toks in state.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        if not counts:
            break
        # count desc, then (left, right) asc — the engines' total order
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, c))
        state = {w: _ref_apply(t, l, r) for w, t in state.items()}
    return merges, state


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def test_merge_fold_overlap_semantics(spark):
    """'aaaa' + merge(a,a) → aa,aa (left-to-right non-overlapping)."""
    df = spark.createDataFrame([("\x1f".join("aaaa"),), ("\x1f".join("aaa"),)],
                               "s string")
    out = [r["m"].split("\x1f") for r in
           df.select(apply_merge_col(F.col("s"), "a", "a").alias("m")).collect()]
    assert sorted(out) == [["aa", "a"], ["aa", "aa"]] or \
        sorted(out) == sorted([["aa", "aa"], ["aa", "a"]])


def test_train_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low newer low",
    ]
    words = {}
    for t in texts:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    ref, _ = _ref_train(words, 10)
    got = bpe_train(_docs(spark, texts), "text", 10)[0]
    assert got == ref


def test_train_matches_reference_randomized(spark):
    rng = random.Random(9)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(40)
    ]
    words = {}
    for t in texts:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    ref, ref_state = _ref_train(words, 8)
    got = bpe_train(_docs(spark, texts), "text", 8)[0]
    assert got == ref


def test_exhaustion_stops_early(spark):
    """Single-char words have no pairs: zero merges, no crash, and the
    vocab frame is empty with the right schema."""
    df = _docs(spark, ["a b c", "a c"])
    merges, _ = bpe_train(df, "text", 5)
    assert merges == []
    vdf = bpe_vocab(df, "text", 5)
    assert vdf.columns == ["merge_rank", "left", "right", "merged", "pair_count"]
    assert vdf.count() == 0


def test_fertility_matches_reference(spark):
    texts = ["aa ab aa", "ab ba aa aa"]
    df = spark.createDataFrame(
        [(0, "s1", texts[0]), (1, "s2", texts[1])],
        "doc_id long, source string, text string",
    )
    words = {}
    for t in texts:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    merges, _ = _ref_train(words, 3)
    # hand fold: per-source token counts under the trained merges
    exp = {}
    for src, t in [("s1", texts[0]), ("s2", texts[1])]:
        n_w = n_t = 0
        for w in t.split():
            toks = [c for c in w]
            for _, l, r, _, _ in merges:
                toks = _ref_apply(toks, l, r)
            n_w += 1
            n_t += len(toks)
        exp[src] = (n_w, n_t)
    got = {r["source"]: (r["n_words"], r["n_tokens"], r["fertility"])
           for r in bpe_fertility(df, "source", "text", 3).collect()}
    for src, (n_w, n_t) in exp.items():
        assert got[src][0] == n_w and got[src][1] == n_t
        assert got[src][2] == pytest.approx(n_t / n_w)


def test_vocab_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        bpe_vocab(_docs(spark, ["a b"]), "text", 0)


def test_deploy_kernel_matches_training_fold(spark):
    """bpe_encode_udf (dict-based greedy lowest-rank apply, the deploy
    kernel) must tokenize exactly like replaying the training fold chain
    — on the training corpus AND on unseen words."""
    from pyspark.sql import functions as F

    from rust_triplets_spark.operators.bpe import (
        apply_merge_col,
        bpe_encode_udf,
        bpe_train,
        bpe_apply_py,
    )

    rng = random.Random(31)
    texts = [
        " ".join("".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
                 for _ in range(rng.randint(1, 10)))
        for _ in range(30)
    ]
    docs = _docs(spark, texts)
    merges, _ = bpe_train(docs, "text", 10)
    assert merges  # fixture must actually train something
    # fold-chain encoding of every distinct word
    words = sorted({w for t in texts for w in t.split()})
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    state = F.array_join(
        F.transform(F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.substr(F.col("w"), i, F.lit(1))),
        "\x1f",
    )
    cur = wdf.select(F.col("w"), state.alias("s")).localCheckpoint(eager=True)
    for _, l, r, _, _ in merges:
        cur = cur.select("w", apply_merge_col(F.col("s"), l, r).alias("s"))
        cur = cur.localCheckpoint(eager=True)
    fold = {r["w"]: r["s"].split("\x1f") for r in cur.collect()}
    # deploy kernel on the same words + python reference directly
    ranks = {(l, r): k for k, l, r, _, _ in merges}
    enc = bpe_encode_udf(merges)
    got = {r["w"]: r["t"] for r in
           wdf.select("w", enc(F.col("w")).alias("t")).collect()}
    for w in words:
        assert got[w] == fold[w] == bpe_apply_py(w, ranks), w
    # unseen words (incl. chars never trained) still tokenize
    unseen = spark.createDataFrame([("zzzz",), ("abab",)], "w string")
    u = {r["w"]: r["t"] for r in
         unseen.select("w", enc(F.col("w")).alias("t")).collect()}
    assert u["zzzz"] == ["z", "z", "z", "z"]
    assert u["abab"] == bpe_apply_py("abab", ranks)


def test_accept_batch_prefix_gap_and_symbol_rules():
    """The frequency-gap-safe batch acceptor: prefix-only, symbol/concat
    disjointness cuts, and the strict count gap at the boundary."""
    from rust_triplets_spark.operators.bpe import _accept_batch

    def rows(*triples):
        return [{"l": l, "r": r, "c": c} for l, r, c in triples]

    # clean disjoint prefix, tie at the boundary shrinks k
    got = _accept_batch(
        rows(("a", "b", 10), ("c", "d", 8), ("e", "f", 5), ("g", "h", 5)), 3
    )
    assert got == [("a", "b", 10), ("c", "d", 8)]
    # shared symbol cuts the prefix at the first interaction
    got = _accept_batch(rows(("a", "b", 10), ("b", "c", 9), ("x", "y", 8)), 3)
    assert got == [("a", "b", 10)]
    # a symbol equal to an earlier concat cuts too
    got = _accept_batch(rows(("a", "b", 10), ("x", "ab", 9)), 2)
    assert got == [("a", "b", 10)]
    # k=1 is exempt from the gap rule (plain sequential step)
    got = _accept_batch(rows(("a", "b", 5), ("c", "d", 5)), 1)
    assert got == [("a", "b", 5)]


def test_batched_train_equals_sequential_spark(spark):
    """Batched rounds reproduce the sequential Spark merge table exactly
    at every max_batch, including max_batch=1 (degenerates to the
    sequential loop) — the 12-merge oracle fixture size."""
    from rust_triplets_spark.operators.bpe import bpe_train_batched

    rng = random.Random(9)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(40)
    ]
    df = _docs(spark, texts)
    seq = bpe_train(df, "text", 12)[0]
    for mb in (1, 4, 32):
        assert bpe_train_batched(df, "text", 12, max_batch=mb)[0] == seq, mb


def test_batched_train_256_merges_matches_reference(spark):
    """The production-scale contract: a 256-merge train via batched
    rounds equals the classic sequential algorithm bit-for-bit (counts,
    tie-breaks, merge order) on a 300-word Zipf-ish fixture corpus."""
    from rust_triplets_spark.operators.bpe import bpe_train_batched

    rng = random.Random(77)
    words = {}
    for i in range(300):
        w = "".join(rng.choice("abcdefghij") for _ in range(rng.randint(4, 10)))
        words[w] = words.get(w, 0) + 1 + (7919 * i) % 97
    texts = [" ".join([w] * c) for w, c in words.items()]
    ref, _ = _ref_train(words, 256)
    assert len(ref) == 256  # the corpus must support the full train
    got = bpe_train_batched(_docs(spark, texts), "text", 256, max_batch=32)[0]
    assert got == ref
