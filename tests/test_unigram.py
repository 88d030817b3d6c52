"""Unigram-LM tokenizer (operators/unigram.py): the Viterbi kernel pinned
on hand-computed DPs (incl. the longest-piece tie-break the oracle's CASE
order encodes), quantization edge behavior, a sequential pure-Python
reference twin of the whole trainer, and segmentation invariants under
randomized vocabularies. Engine parity is the registered oracle's job
(check_correctness: unigram_vocab / unigram_fertility exact-match)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_triplets_spark.operators.lm_quality import LM_QSCALE
from rust_triplets_spark.operators.unigram import (
    _q,
    _rescore,
    train_unigram,
    viterbi_segment,
)


class TestViterbi:
    def test_prefers_higher_score(self):
        # 'ab' piece beats a+b when its score exceeds the sum
        scores = {"a": -3, "b": -3, "ab": -5}
        assert viterbi_segment("ab", scores, 5) == ["ab"]
        scores = {"a": -3, "b": -3, "ab": -7}
        assert viterbi_segment("ab", scores, 5) == ["a", "b"]

    def test_tie_prefers_longer_piece(self):
        # equal total score → the longer last piece wins (oracle CASE
        # checks longest first with IS NOT DISTINCT FROM)
        scores = {"a": -1, "b": -1, "ab": -2}
        assert viterbi_segment("ab", scores, 5) == ["ab"]

    def test_three_way_dp(self):
        scores = {"a": -2, "b": -2, "c": -2, "ab": -3, "bc": -3, "abc": -7}
        # a+bc = -5, ab+c = -5 (tie at pos 3: p=1 gives dp2(ab=-3)+c(-2)
        # = -5; p=2 gives dp1(a=-2)+bc(-3) = -5; p=3 gives -7). Longest
        # first → p=2 chosen at pos 3 → segmentation a | bc.
        assert viterbi_segment("abc", scores, 5) == ["a", "bc"]

    def test_single_chars_always_feasible(self):
        scores = {"x": -1, "y": -1, "z": -1}
        assert viterbi_segment("zyx", scores, 5) == ["z", "y", "x"]

    def test_empty_word(self):
        assert viterbi_segment("", {"a": -1}, 5) == []

    @given(st.text(alphabet="abcd", min_size=1, max_size=12))
    @settings(max_examples=200, deadline=None)
    def test_segmentation_reassembles(self, w):
        scores = {"a": -2, "b": -3, "c": -4, "d": -5,
                  "ab": -4, "bc": -5, "cd": -6, "abc": -8, "abcd": -9}
        pieces = viterbi_segment(w, scores, 4)
        assert "".join(pieces) == w
        assert all(p in scores for p in pieces)

    @given(st.text(alphabet="ab", min_size=1, max_size=10))
    @settings(max_examples=100, deadline=None)
    def test_optimality_vs_bruteforce(self, w):
        scores = {"a": -7, "b": -3, "ab": -8, "ba": -9, "aa": -13}

        def all_segs(s):
            if not s:
                yield []
                return
            for p in range(1, min(2, len(s)) + 1):
                if s[:p] in scores:
                    for rest in all_segs(s[p:]):
                        yield [s[:p]] + rest

        best = max(
            (sum(scores[p] for p in seg) for seg in all_segs(w)),
        )
        got = viterbi_segment(w, scores, 2)
        assert sum(scores[p] for p in got) == best


class TestQuantize:
    def test_grid(self):
        assert _q(1) == 0
        assert _q(7) == round(math.log(7) * LM_QSCALE)

    def test_rescore_laplace(self):
        s = _rescore({"a": 4, "b": 0})
        # totals: (4+1) + (0+1) = 6
        assert s["a"] == _q(5) - _q(6)
        assert s["b"] == _q(1) - _q(6)
        assert s["a"] > s["b"]


def _reference_train(texts, *, max_word_len=16, max_piece_len=5,
                     seed_multi=32, em_rounds=3, vocab_multi=12):
    """Sequential pure-Python twin of train_unigram (no Spark)."""
    from collections import Counter

    from rust_triplets_spark.operators.unigram import _q as q

    words = Counter()
    import re

    for t in texts:
        for w in re.split(r"[ \t\r\n\f\v]+", t):
            if w and len(w) <= max_word_len:
                words[w] += 1
    score = Counter()
    for w, cnt in words.items():
        for p in range(1, max_piece_len + 1):
            for i in range(len(w) - p + 1):
                score[w[i:i + p]] += cnt
    alpha = {k: v for k, v in score.items() if len(k) == 1}
    multi = dict(sorted(
        ((k, v) for k, v in score.items() if len(k) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_multi])
    seed = {**alpha, **multi}
    total = sum(seed.values())
    scores = {k: q(v) - q(total) for k, v in seed.items()}
    usage = {}
    for _ in range(em_rounds):
        used = Counter()
        for w, cnt in words.items():
            for piece in viterbi_segment(w, scores, max_piece_len):
                used[piece] += cnt
        usage = {k: used.get(k, 0) for k in scores}
        tot = sum(u + 1 for u in usage.values())
        scores = {k: q(u + 1) - q(tot) for k, u in usage.items()}
    alpha_rows = sorted(
        (k, u) for k, u in usage.items() if len(k) == 1
    )
    multi_rows = sorted(
        ((k, u) for k, u in usage.items() if len(k) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:vocab_multi]
    return sorted(
        (p, len(p), u, scores[p]) for p, u in alpha_rows + multi_rows
    )


class TestTrainerParity:
    def test_spark_matches_sequential_reference(self, spark):
        rng = np.random.default_rng(13)
        vocab = ["spark", "window", "merge", "table", "data", "scan",
                 "batch", "aggregate", "partition", "the", "a"]
        texts = [
            " ".join(rng.choice(vocab, rng.integers(3, 20)))
            for _ in range(300)
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        rows, _ = train_unigram(df, "text")
        assert sorted(rows) == _reference_train(texts)

    def test_fertility_consistency(self, spark):
        # fertility >= 1000 milli (every word is >= 1 piece) and exact
        # against a hand recomputation from the trained vocab
        from rust_triplets_spark.operators.unigram import unigram_fertility

        rng = np.random.default_rng(17)
        vocab = ["alpha", "beta", "gamma", "delta"]
        rows = [
            (" ".join(rng.choice(vocab, 8)), ["s1", "s2"][int(i % 2)])
            for i in range(100)
        ]
        df = spark.createDataFrame(rows, "text string, source string")
        out = {r["source"]: r.asDict()
               for r in unigram_fertility(df, "text", "source").collect()}
        assert set(out) == {"s1", "s2"}
        for r in out.values():
            assert r["n_pieces"] >= r["n_words"] > 0
            assert r["fert_milli"] == r["n_pieces"] * 1000 // r["n_words"]
