"""Bottom-k quantile-sketch invariants: exact agreement with a
single-process reference, real-subsample error envelope on a known
distribution, sample mergeability (bottom-k of union == bottom-k of
concatenated sketches), small-group pass-through exactness, and loud
parameter validation."""

import pytest

from rust_triplets_spark.functions.hashing import hash31_py
from rust_triplets_spark.operators.sketches import (
    QSK_FRACTIONS,
    QSK_SEED,
    quantile_sketch_bottomk,
)


def _ref(rows_by_group, k):
    """rows: {group: [(id, v), ...]} -> {group: (n, k_used, {pct: qv},
    exact_median)}."""
    out = {}
    for grp, rows in rows_by_group.items():
        n = len(rows)
        samp = sorted(rows, key=lambda r: (hash31_py(r[0], QSK_SEED), r[0]))[:k]
        vs = sorted(v for _, v in samp)
        ku = len(vs)
        qs = {}
        for p, q in QSK_FRACTIONS:
            pct = round(100 * p / q)
            qs[pct] = vs[(ku * p + q - 1) // q - 1]
        allv = sorted(v for _, v in rows)
        out[grp] = (n, ku, qs, allv[(n + 1) // 2 - 1])
    return out


def _df(spark, rows_by_group):
    rows = [(g, i, v) for g, rs in rows_by_group.items() for i, v in rs]
    return spark.createDataFrame(rows, "src string, doc_id long, n long")


def test_matches_reference_with_real_subsample(spark):
    data = {
        "a": [(i, (i * 37) % 1000) for i in range(300)],
        "b": [(1000 + i, (i * 13) % 500) for i in range(120)],
    }
    k = 32
    got = {
        r["group"]: r.asDict()
        for r in quantile_sketch_bottomk(
            _df(spark, data), "src", "n", "doc_id", k=k
        ).collect()
    }
    exp = _ref(data, k)
    for grp, (n, ku, qs, med) in exp.items():
        g = got[grp]
        assert g["n_total"] == n and g["k_used"] == ku == k
        for pct, qv in qs.items():
            assert g[f"q_{pct}"] == qv, (grp, pct)
        assert g["q_50_exact"] == med
        assert g["err_50"] == g["q_50"] - med
    # error envelope on the uniform-ish modular distribution: the k=32
    # sample median should land within ~2/sqrt(k) of the true median
    for grp in data:
        rng = max(v for _, v in data[grp]) - min(v for _, v in data[grp])
        assert abs(got[grp]["err_50"]) < 0.4 * rng


def test_small_group_passthrough_is_exact(spark):
    """Groups smaller than k: the sample IS the group, so every quantile
    (not just the median) is exact."""
    data = {"tiny": [(i, v) for i, v in enumerate([5, 1, 9, 3, 7])]}
    g = quantile_sketch_bottomk(
        _df(spark, data), "src", "n", "doc_id", k=16
    ).collect()[0]
    assert g["k_used"] == 5 and g["err_50"] == 0
    assert (g["q_25"], g["q_50"], g["q_75"], g["q_90"]) == (3, 5, 7, 9)


def test_sample_merges():
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) + bottom-k(B)) — the
    KMV-style mergeability that makes the sketch incremental."""
    k = 8
    a = [(i, i) for i in range(0, 400, 2)]
    b = [(i, i) for i in range(1, 401, 2)]

    def bk(rows):
        return sorted(rows, key=lambda r: (hash31_py(r[0], QSK_SEED), r[0]))[:k]

    assert bk(a + b) == bk(bk(a) + bk(b))


def test_bad_k_loud(spark):
    with pytest.raises(ValueError):
        quantile_sketch_bottomk(
            _df(spark, {"a": [(1, 1)]}), "src", "n", "doc_id", k=3
        )
