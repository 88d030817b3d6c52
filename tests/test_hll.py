"""HyperLogLog invariants: exact agreement with a single-process
register reference, register mergeability (element-wise max), both
estimator regimes (linear counting small-range, raw harmonic-mean
large-range) within the theoretical error envelope, and loud parameter
validation."""

import math

import pytest

from rust_triplets_spark.functions.hashing import hash31_str_py
from rust_triplets_spark.operators.sketches import (
    HLL_ALPHA_Q,
    HLL_P,
    HLL_SEED,
    hll_distinct_tokens,
)

M = 1 << HLL_P
KMAX = 31 - HLL_P + 1


def _ref_registers(tokens):
    regs = {}
    for t in tokens:
        h = hash31_str_py(t, HLL_SEED)
        b, suf = h % M, h // M
        rho = KMAX if suf == 0 else KMAX - suf.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _ref_estimate(regs):
    s = sum(1 << (KMAX - r) for r in regs.values())
    s += (M - len(regs)) * (1 << KMAX)
    raw = (HLL_ALPHA_Q * M * M * (1 << KMAX)) // (1_000_000 * s)
    v = M - len(regs)
    if v > 0 and raw <= (5 * M) // 2:
        lnq = round(math.log(M / v) * 1_000_000)
        return (M * lnq) // 1_000_000, s
    return raw, s


def _docs(spark, rows):
    return spark.createDataFrame(rows, "src string, text string")


def test_matches_reference_small_range(spark):
    rows = [("a", "x y z x"), ("a", "w y q"), ("b", "only two two")]
    got = {
        r["group"]: (r["n_filled"], r["s_sum"], r["est_distinct"],
                     r["true_distinct"])
        for r in hll_distinct_tokens(_docs(spark, rows), "src", "text")
        .collect()
    }
    for grp, toks in [("a", "x y z x w y q".split()),
                      ("b", "only two two".split())]:
        regs = _ref_registers(toks)
        est, s = _ref_estimate(regs)
        assert got[grp][0] == len(regs)
        assert got[grp][1] == s
        assert got[grp][2] == est
        assert got[grp][3] == len(set(toks))


def test_raw_regime_and_error_envelope(spark):
    """20k distinct tokens >> 256 registers: the raw estimator fires and
    stays within ~3 sigma of the 1.04/sqrt(m) theoretical error."""
    rows = [
        ("all", " ".join(f"tok{j}" for j in range(i * 50, i * 50 + 50)))
        for i in range(400)
    ]
    r = hll_distinct_tokens(_docs(spark, rows), "src", "text").collect()[0]
    assert r["n_filled"] == M  # no empty registers: raw regime
    rel = abs(r["est_distinct"] - r["true_distinct"]) / r["true_distinct"]
    assert rel < 3 * 1.04 / math.sqrt(M)
    # reference agreement in the raw regime too
    toks = [f"tok{j}" for j in range(20000)]
    est, _ = _ref_estimate(_ref_registers(toks))
    assert r["est_distinct"] == est


def test_registers_merge_by_max():
    """registers(A ∪ B) == element-wise max — the mergeability that
    makes HLL a partial aggregate."""
    a = [f"a{i}" for i in range(500)]
    b = [f"b{i}" for i in range(700)]
    ra, rb, ru = _ref_registers(a), _ref_registers(b), _ref_registers(a + b)
    merged = dict(ra)
    for k, v in rb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == ru


def test_order_insensitive():
    toks = [f"t{i}" for i in range(1000)]
    assert _ref_registers(toks) == _ref_registers(list(reversed(toks)))


def test_bad_p_is_loud(spark):
    with pytest.raises(ValueError, match="p=8"):
        hll_distinct_tokens(
            _docs(spark, [("a", "x")]), "src", "text", p=12
        )
