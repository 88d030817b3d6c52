"""Span-corruption invariants: exact agreement with a single-process
reference (sentinel numbering, span merging, the T5 closing sentinel),
round-trip reconstruction (input + target rebuild the document), mask
determinism, edge cases (uncorrupted doc, fully-masked doc, empty
text), and loud parameter validation."""

import pytest

from rust_triplets_spark.functions.hashing import mix31_py
from rust_triplets_spark.operators.corruption import (
    CORRUPT_BLOCK,
    CORRUPT_RATE,
    CORRUPT_SEED,
    span_corruption_samples,
)


def _ref(doc_id, text, seed=CORRUPT_SEED, block=CORRUPT_BLOCK,
         rate=CORRUPT_RATE):
    toks = [t for t in text.split() if t]
    inp, tgt, prev, k = [], [], False, 0
    n_masked = 0
    for i, tok in enumerate(toks, start=1):
        m = mix31_py([doc_id, (i - 1) // block], seed) % rate == 0
        if m:
            n_masked += 1
            if not prev:
                inp.append(f"<extra_id_{k}>")
                tgt.append(f"<extra_id_{k}>")
                k += 1
            tgt.append(tok)
        else:
            inp.append(tok)
        prev = m
    tgt.append(f"<extra_id_{k}>")
    return {
        "n_tokens": len(toks), "n_masked": n_masked, "n_spans": k,
        "input_text": " ".join(inp), "target_text": " ".join(tgt),
    }


TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, " ".join(f"w{i}" for i in range(60))),
    (2, "solo"),
    (3, ""),
]


def _df(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_matches_reference(spark):
    got = {
        r["doc_id"]: r.asDict()
        for r in span_corruption_samples(_df(spark), "doc_id", "text")
        .collect()
    }
    for did, text in TEXTS:
        exp = _ref(did, text)
        g = got[did]
        for col, v in exp.items():
            assert g[col] == v, (did, col, g[col], v)


def test_roundtrip_reconstruction(spark):
    """Replacing each input sentinel with its target span rebuilds the
    original token stream exactly — the property that makes the pair a
    valid denoising sample."""
    got = span_corruption_samples(_df(spark), "doc_id", "text").collect()
    for r in got:
        did = r["doc_id"]
        orig = " ".join(dict(TEXTS)[did].split())
        # parse target into {sentinel: span tokens}
        parts = r["target_text"].split()
        spans, cur = {}, None
        for p in parts:
            if p.startswith("<extra_id_"):
                cur = p
                spans[cur] = []
            else:
                spans[cur].append(p)
        rebuilt = []
        for p in r["input_text"].split():
            if p.startswith("<extra_id_"):
                rebuilt.extend(spans[p])
            else:
                rebuilt.append(p)
        assert " ".join(rebuilt) == orig, did


def test_deterministic_across_runs(spark):
    a = span_corruption_samples(_df(spark), "doc_id", "text").collect()
    b = span_corruption_samples(_df(spark), "doc_id", "text").collect()
    assert a == b


def test_empty_and_uncorrupted_edges(spark):
    got = {
        r["doc_id"]: r.asDict()
        for r in span_corruption_samples(_df(spark), "doc_id", "text")
        .collect()
    }
    empty = got[3]
    assert empty["n_tokens"] == 0 and empty["n_spans"] == 0
    assert empty["input_text"] == "" and empty["target_text"] == "<extra_id_0>"


def test_mask_rate_envelope(spark):
    rows = [(i, " ".join(f"t{j}" for j in range(120))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = span_corruption_samples(df, "doc_id", "text").collect()
    frac = sum(r["n_masked"] for r in got) / sum(r["n_tokens"] for r in got)
    assert abs(frac - 1 / CORRUPT_RATE) < 0.04


def test_bad_params_loud(spark):
    with pytest.raises(ValueError):
        span_corruption_samples(_df(spark), "doc_id", "text", block_len=0)
    with pytest.raises(ValueError):
        span_corruption_samples(_df(spark), "doc_id", "text", rate=1)
