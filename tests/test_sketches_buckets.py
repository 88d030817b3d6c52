"""KMV cardinality sketch (operators/sketches.py) and CCNet-style
quality buckets (operators/lm_quality.quality_buckets)."""

import random

from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    """Fewer distinct hashes than sketch slots → the estimate IS the
    exact distinct count (hash-collision granularity aside; the tiny
    vocab here has none)."""
    from rust_triplets_spark.operators.sketches import kmv_distinct_tokens

    df = spark.createDataFrame(
        [(0, "a", "x y z"), (1, "a", "x y w"), (2, "b", "p q")],
        "doc_id long, source string, text string",
    )
    got = {
        r["group"]: (r["k_used"], r["est_distinct"])
        for r in kmv_distinct_tokens(df, "source", "text", k=256).collect()
    }
    assert got["a"] == (4, 4.0)  # {x, y, z, w}
    assert got["b"] == (2, 2.0)


def test_kmv_estimate_within_tolerance(spark):
    """k=256 ⇒ ~6% standard error; assert within 20% on a 3000-distinct
    vocabulary (deterministic under the fixed seed)."""
    from rust_triplets_spark.operators.sketches import kmv_distinct_tokens

    rng = random.Random(5)
    docs = []
    vocab = [f"tok{i}" for i in range(3000)]
    for d in range(100):
        docs.append((d, "s", " ".join(rng.choice(vocab) for _ in range(300))))
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    exact = (
        df.select(F.explode(F.split("text", " ")).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )
    est = kmv_distinct_tokens(df, "source", "text", k=256).collect()[0]["est_distinct"]
    assert abs(est - exact) / exact < 0.20, (est, exact)


def test_kmv_merge_equals_whole(spark):
    """Mergeability: the k smallest of (k smallest of A) ∪ (k smallest
    of B) equals the k smallest of A ∪ B — daily sketches combine
    without the raw corpus."""
    from rust_triplets_spark.operators.sketches import kmv_merge

    rng = random.Random(7)
    a = [(("g", rng.randrange(1, 2**31 - 1))) for _ in range(5000)]
    b = [(("g", rng.randrange(1, 2**31 - 1))) for _ in range(5000)]
    k = 64

    def rows(pairs):
        return spark.createDataFrame(pairs, "group string, h long")

    def sketch_rows(pairs):
        # a stored sketch = its k smallest distinct hashes, as rows
        hs = sorted({h for _, h in pairs})[:k]
        return [("g", h) for h in hs]

    whole = kmv_merge(rows(a + b), k=k).collect()[0]
    merged = kmv_merge(rows(sketch_rows(a) + sketch_rows(b)), k=k).collect()[0]
    assert (whole["k_used"], whole["kth_hash"], whole["est_distinct"]) == (
        merged["k_used"], merged["kth_hash"], merged["est_distinct"],
    )


def test_kmv_validates_k(spark):
    import pytest

    from rust_triplets_spark.operators.sketches import (
        kmv_distinct_tokens,
        kmv_distinct_tokens_sql,
    )

    df = spark.createDataFrame([(0, "a", "x")], "doc_id long, source string, text string")
    with pytest.raises(ValueError):
        kmv_distinct_tokens(df, "source", "text", k=1)
    with pytest.raises(ValueError):
        kmv_distinct_tokens_sql("t", "source", "text", k=1)


# ---------------------------------------------------------------------------
# quality buckets
# ---------------------------------------------------------------------------


def _bucket_corpus(spark):
    rows = []
    for i in range(30):
        # source s0: 10 clean templates, 10 mixed, 10 gibberish-ish
        if i < 10:
            text = "the quick brown fox jumps over the lazy dog"
        elif i < 20:
            text = f"the quick brown fox token{i} over the lazy dog"
        else:
            text = " ".join(f"g{i}x{j}" for j in range(9))
        rows.append(Row(doc_id=i, source="s0", text=text))
    rows.append(Row(doc_id=100, source="s1", text="solo"))  # < 2 tokens
    rows.append(Row(doc_id=101, source="s1", text="two tokens here"))
    return spark.createDataFrame(rows)


def test_quality_buckets_partition_and_order(spark):
    from rust_triplets_spark.operators.lm_quality import quality_buckets

    out = quality_buckets(
        _bucket_corpus(spark), "doc_id", "text", "source"
    ).collect()
    assert len(out) == 32  # every input row appears exactly once
    s0 = [r for r in out if r["source"] == "s0"]
    by_bucket = {}
    for r in s0:
        by_bucket.setdefault(r["bucket"], []).append(r["avg_nll"])
    assert {b: len(v) for b, v in by_bucket.items()} == {
        "head": 10, "middle": 10, "tail": 10,
    }
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # the template family is the head (lowest nll)
    head_ids = {r["id"] for r in s0 if r["bucket"] == "head"}
    assert head_ids == set(range(10))
    s1 = {r["id"]: r["bucket"] for r in out if r["source"] == "s1"}
    assert s1[100] == "unscored"  # < 2 tokens → no transitions
    assert s1[101] in ("head", "middle", "tail")


def test_quality_buckets_band_sizes_differ_by_at_most_one(spark):
    from rust_triplets_spark.operators.lm_quality import quality_buckets

    rows = [Row(doc_id=i, source="s", text=f"a{i} b{i} c{i} a{i}") for i in range(10)]
    out = quality_buckets(
        spark.createDataFrame(rows), "doc_id", "text", "source", n_buckets=4
    ).collect()
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sorted(sizes) == ["b0", "b1", "b2", "b3"]
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == 10


def test_bpe_merge_candidates_counts_and_order(spark):
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.sketches import bpe_merge_candidates

    schema = T.StructType([T.StructField("text", T.StringType())])
    # "abab abab" -> within-token pairs: ab x2, ba x1 per token, two tokens
    df = spark.createDataFrame(
        [Row(text="abab abab"), Row(text="x")],  # 1-char token -> no pairs
        schema,
    )
    out = bpe_merge_candidates(df, "text", top_k=10).collect()
    got = {(r["left"], r["right"]): r.pair_count for r in out}
    assert got == {("a", "b"): 4, ("b", "a"): 2}
    # ordering: count desc, then pair asc
    assert [(r["left"], r["right"]) for r in out] == [("a", "b"), ("b", "a")]


def test_bpe_merge_candidates_plan_is_take_ordered(spark):
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.sketches import bpe_merge_candidates

    schema = T.StructType([T.StructField("text", T.StringType())])
    df = spark.createDataFrame([Row(text="abc def")], schema)
    plan = (
        bpe_merge_candidates(df, "text", top_k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no global sort


def test_vocab_coverage_exact_fractions(spark):
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from rust_triplets_spark.operators.sketches import vocab_coverage

    schema = T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    # global counts: "a" x6, "b" x4, "rare1/2" x1 each -> top-2 = {a, b}
    df = spark.createDataFrame(
        [Row(source="s1", text="a a a b b rare1"),
         Row(source="s2", text="a a a b b rare2")],
        schema,
    )
    out = {r.group: r for r in vocab_coverage(
        df, "source", "text", vocab_size=2
    ).collect()}
    for s in ("s1", "s2"):
        assert out[s].total_occurrences == 6
        assert out[s].covered_occurrences == 5
        assert out[s].coverage == 5 / 6
