"""WordPiece trainer invariants: the distributed likelihood-scored merge
loop must reproduce a single-process reference exactly (score order,
double-rounding ties, ``##`` continuation stripping, exhaustion), the
fertility audit must agree with a hand fold, MaxMatch encoding must
match its pure-Python reference, and the int64 overflow guard must be
loud."""

import random

import pytest

from rust_triplets_spark.operators.wordpiece import (
    _assert_count_product_safe,
    wordpiece_encode_udf,
    wordpiece_fertility,
    wordpiece_maxmatch_py,
    wordpiece_train,
    wordpiece_vocab,
    wp_merged,
)

CONT = "##"


def _wp_init(w):
    return [w[0]] + [CONT + c for c in w[1:]]


def _ref_apply(toks, left, right):
    merged = wp_merged(left, right)
    out = []
    for t in toks:
        if out and out[-1] == left and t == right:
            out[-1] = merged
        else:
            out.append(t)
    return out


def _ref_train(words, n_merges):
    """words: dict word -> count. Returns [(rank, l, r, merged, c, lc,
    rc, score)] with the engines' total order (score double desc, then
    (l, r) asc)."""
    state = {w: _wp_init(w) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pc, sc = {}, {}
        for w, toks in state.items():
            cnt = words[w]
            for t in toks:
                sc[t] = sc.get(t, 0) + cnt
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + cnt
        if not pc:
            break
        scored = {
            (l, r): c / float(sc[l] * sc[r]) for (l, r), c in pc.items()
        }
        (l, r), s = min(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        c = pc[(l, r)]
        merges.append((rank, l, r, wp_merged(l, r), c, sc[l], sc[r], s))
        state = {w: _ref_apply(t, l, r) for w, t in state.items()}
    return merges, state


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _word_counts(texts):
    words = {}
    for t in texts:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    return words


def test_train_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low newer low",
    ]
    ref, _ = _ref_train(_word_counts(texts), 10)
    got = wordpiece_train(_docs(spark, texts), "text", 10)[0]
    assert got == ref


def test_train_matches_reference_randomized(spark):
    rng = random.Random(17)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(40)
    ]
    ref, _ = _ref_train(_word_counts(texts), 8)
    got = wordpiece_train(_docs(spark, texts), "text", 8)[0]
    assert got == ref


def test_continuation_prefix_strips_on_fusion(spark):
    """Merging (l, ##x) must mint l+x (never l+##x), and a bare-initial
    left keeps no prefix: 'aa' repeated trains the merge (a, ##a) →
    'aa'."""
    merges = wordpiece_train(_docs(spark, ["aa aa aa"]), "text", 1)[0]
    assert len(merges) == 1
    rank, l, r, merged, c, lc, rc, score = merges[0]
    assert (l, r, merged) == ("a", "##a", "aa")


def test_likelihood_order_differs_from_bpe(spark):
    """The likelihood score must be able to pick a LOWER-count pair when
    its symbols are rarer — the defining difference from BPE. 'xq'
    appears 3 times (count 3, both symbols count 3: score 1/3); 'ab'
    appears 4 times but a and b also appear apart (score 4/25 < 1/3)."""
    texts = ["xq xq xq", "ab ab ab ab a b", "a b a b a b a b"]
    merges = wordpiece_train(_docs(spark, texts), "text", 1)[0]
    assert (merges[0][1], merges[0][2]) == ("x", "##q")


def test_exhaustion_stops_early(spark):
    df = _docs(spark, ["a b c", "a c"])
    merges, _ = wordpiece_train(df, "text", 5)
    assert merges == []
    vdf = wordpiece_vocab(df, "text", 5)
    assert vdf.columns == [
        "merge_rank", "left", "right", "merged", "pair_count",
        "left_count", "right_count", "score",
    ]
    assert vdf.count() == 0


def test_fertility_matches_reference(spark):
    texts = ["aa ab aa", "ab ba aa aa"]
    df = spark.createDataFrame(
        [(0, "s1", texts[0]), (1, "s2", texts[1])],
        "doc_id long, source string, text string",
    )
    merges, _ = _ref_train(_word_counts(texts), 3)
    exp = {}
    for src, t in [("s1", texts[0]), ("s2", texts[1])]:
        n_w = n_t = 0
        for w in t.split():
            toks = _wp_init(w)
            for _, l, r, *_ in merges:
                toks = _ref_apply(toks, l, r)
            n_w += 1
            n_t += len(toks)
        exp[src] = (n_w, n_t)
    got = {
        r["source"]: (r["n_words"], r["n_tokens"], r["fertility"])
        for r in wordpiece_fertility(df, "source", "text", 3).collect()
    }
    for src, (n_w, n_t) in exp.items():
        assert got[src][0] == n_w and got[src][1] == n_t
        assert got[src][2] == pytest.approx(n_t / n_w)


def test_maxmatch_reference_semantics():
    vocab = frozenset(["un", "##able", "##ngth", "le", "a", "##b",
                       "##l", "##e", "l"])
    assert wordpiece_maxmatch_py("unable", vocab, 6) == ["un", "##able"]
    # greedy longest-first at each position, continuation-prefixed
    assert wordpiece_maxmatch_py("able", vocab, 6) == ["a", "##b", "##l", "##e"]
    # any unmatchable position collapses the whole word to [UNK]
    assert wordpiece_maxmatch_py("axe", vocab, 6) == ["[UNK]"]
    assert wordpiece_maxmatch_py("length", vocab, 6) == ["le", "##ngth"]


def test_encode_udf_matches_python(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest zz",
        None,
    ]
    train = _docs(spark, [t for t in texts if t])
    merges, _ = wordpiece_train(train, "text", 6)
    alphabet = {c for t in texts if t for w in t.split() for c in w}
    vocab = set()
    for ch in alphabet:
        vocab.add(ch)
        vocab.add(CONT + ch)
    for _, _, _, merged, *_ in merges:
        vocab.add(merged)
        vocab.add(CONT + merged)
    fv = frozenset(vocab)
    max_len = max(len(v) for v in fv)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    enc = wordpiece_encode_udf(merges, alphabet)
    got = [r["toks"] for r in df.select(enc("text").alias("toks")).collect()]
    exp = [
        None if t is None else [
            tok for w in t.split() for tok in
            wordpiece_maxmatch_py(w, fv, max_len)
        ]
        for t in texts
    ]
    assert sorted(got, key=lambda x: (x is None, x)) == sorted(
        exp, key=lambda x: (x is None, x)
    )


def test_overflow_guard_is_loud(spark):
    words = spark.createDataFrame([("a", 2**32)], "w string, cnt long")
    with pytest.raises(ValueError, match="overflow"):
        _assert_count_product_safe(words)


def test_train_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        wordpiece_vocab(_docs(spark, ["a b"]), "text", 0)
