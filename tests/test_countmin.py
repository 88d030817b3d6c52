"""Count-Min sketch invariants: one-sided error (est >= true, always),
no false negatives at the phi threshold (the CM guarantee), cell-wise
mergeability (the distributed-summary property), and loud parameter
validation."""

import pytest
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import hash31_str_py
from rust_triplets_spark.functions.text import tokens_col
from rust_triplets_spark.operators.sketches import (
    CM_SEED,
    countmin_heavy_hitters,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _true_counts(texts):
    c = {}
    for t in texts:
        for w in t.split():
            c[w] = c.get(w, 0) + 1
    return c


def _cm_reference(counts, depth, width, seed):
    """Single-process sketch + estimates."""
    cells = {}
    for tok, n in counts.items():
        for r in range(depth):
            b = hash31_str_py(tok, seed + r) % width
            cells[(r, b)] = cells.get((r, b), 0) + n
    est = {}
    for tok in counts:
        est[tok] = min(
            cells[(r, hash31_str_py(tok, seed + r) % width)]
            for r in range(depth)
        )
    return cells, est


TEXTS = [
    "spark spark spark shuffle join join scan agg window sort",
    "spark shuffle shuffle shuffle broadcast join scan scan",
    "spark join filter map reduce scan agg agg",
]


def test_one_sided_error_and_no_false_negatives(spark):
    counts = _true_counts(TEXTS)
    n_total = sum(counts.values())
    depth, width, phi_num, phi_den = 3, 4, 1, 10
    _, est = _cm_reference(counts, depth, width, CM_SEED)
    got = {
        r["token"]: (r["true_cnt"], r["cm_est"], r["overcount"])
        for r in countmin_heavy_hitters(
            _docs(spark, TEXTS), "text",
            depth=depth, width=width, phi_num=phi_num, phi_den=phi_den,
        ).collect()
    }
    # matches the single-process reference exactly
    for tok, (tc, ce, oc) in got.items():
        assert tc == counts[tok]
        assert ce == est[tok]
        assert oc == ce - tc >= 0  # one-sided error, measured
    # no false negatives: every truly-heavy token is reported (CM
    # estimates only overcount, so true_cnt >= threshold => est >= it)
    for tok, tc in counts.items():
        if tc * phi_den >= phi_num * n_total:
            assert tok in got, tok
    # width 4 with this vocabulary must actually collide somewhere
    assert any(oc > 0 for _, _, oc in got.values())


def test_cells_merge(spark):
    """sketch(A ∪ B) == cell-wise sum of sketch(A) and sketch(B) — the
    property that makes the summary distributable (partial aggregation
    IS the merge)."""
    depth, width = 4, 8
    a = _true_counts(TEXTS[:1])
    b = _true_counts(TEXTS[1:])
    both = _true_counts(TEXTS)
    ca, _ = _cm_reference(a, depth, width, CM_SEED)
    cb, _ = _cm_reference(b, depth, width, CM_SEED)
    cu, _ = _cm_reference(both, depth, width, CM_SEED)
    merged = dict(ca)
    for k, v in cb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cu


def test_spark_cells_match_reference(spark):
    """The distributed cell build (explode → groupBy) equals the
    reference sketch cell-for-cell."""
    from rust_triplets_spark.functions.hashing import hash31_str_col

    depth, width = 3, 4
    counts = _true_counts(TEXTS)
    exp_cells, _ = _cm_reference(counts, depth, width, CM_SEED)
    df = _docs(spark, TEXTS)
    tok = (
        df.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    buckets = F.array(*[
        (hash31_str_col(F.col("token"), CM_SEED + r) % width).cast("long")
        for r in range(depth)
    ])
    got = {
        (r["row"], r["bucket"]): r["cell"]
        for r in tok.select(
            "cnt", F.posexplode(buckets).alias("row", "bucket")
        ).groupBy("row", "bucket").agg(
            F.sum("cnt").cast("long").alias("cell")
        ).collect()
    }
    assert got == exp_cells


def test_bad_params_are_loud(spark):
    df = _docs(spark, TEXTS)
    with pytest.raises(ValueError):
        countmin_heavy_hitters(df, "text", depth=0)
    with pytest.raises(ValueError):
        countmin_heavy_hitters(df, "text", width=1)
    with pytest.raises(ValueError):
        countmin_heavy_hitters(df, "text", phi_num=0)
