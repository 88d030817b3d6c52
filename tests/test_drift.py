"""PSI drift-monitor invariants: exact agreement with a single-process
reference, near-zero PSI for an identical distribution, ordering under
a planted shift, missing-bin smoothing, and loud parameter
validation."""

import math

import pytest

from rust_triplets_spark.operators.drift import (
    PSI_Q,
    source_drift_psi,
)


def _ref_psi(values_by_slice, n_bins, bin_width):
    allv = [v for vs in values_by_slice.values() for v in vs]
    n_total = len(allv)
    bc = {b: 0 for b in range(n_bins)}
    for v in allv:
        bc[min(v // bin_width, n_bins - 1)] += 1
    out = {}
    for slc, vs in values_by_slice.items():
        n_rows = len(vs)
        c = {b: 0 for b in range(n_bins)}
        for v in vs:
            c[min(v // bin_width, n_bins - 1)] += 1
        psi = 0
        for b in range(n_bins):
            p_q = (c[b] + 1) * PSI_Q // (n_rows + n_bins)
            q_q = (bc[b] + 1) * PSI_Q // (n_total + n_bins)
            ln_q = round(
                math.log(
                    float(c[b] + 1) * float(n_total + n_bins)
                    / (float(bc[b] + 1) * float(n_rows + n_bins))
                )
                * PSI_Q
            )
            psi += (p_q - q_q) * ln_q
        out[slc] = (n_rows, psi)
    return out


DATA = {
    "baselineish": [10, 20, 30, 70, 80, 130, 140, 200, 210, 260],
    "shifted": [400, 410, 420, 430, 700, 710, 720, 900, 910, 950],
    "tiny": [15, 25],
}


def _df(spark, data):
    rows = [(s, v) for s, vs in data.items() for v in vs]
    return spark.createDataFrame(rows, "src string, n long")


def test_matches_reference(spark):
    got = {
        r["slice"]: (r["n_rows"], r["psi_pico"])
        for r in source_drift_psi(
            _df(spark, DATA), "src", "n", n_bins=8, bin_width=64
        ).collect()
    }
    exp = _ref_psi(DATA, 8, 64)
    assert got == exp


def test_identical_distribution_is_near_zero(spark):
    """A slice that IS the baseline (half the corpus, same shape) shows
    PSI ~ 0; a shifted slice shows large PSI — the ordering the monitor
    exists for."""
    same = {"a": [10, 70, 130, 200] * 5, "b": [10, 70, 130, 200] * 5}
    got = {
        r["slice"]: r["psi_pico"]
        for r in source_drift_psi(
            _df(spark, same), "src", "n", n_bins=8, bin_width=64
        ).collect()
    }
    # identical slices: only the deterministic O(n_bins/N) smoothing
    # bias remains (the +1 Laplace floor compares a 20-row slice against
    # the 40-row baseline), well under the 0.1 "investigate" threshold
    assert abs(got["a"]) < 50_000_000_000  # < 0.05 in pico units
    assert got["a"] == got["b"]
    # the majority slice defines the pooled baseline; the small shifted
    # slice is the one that must light up
    mixed = {
        "match": [10, 70, 130, 200] * 25,
        "drift": [480, 490, 500, 510] * 2,
    }
    got2 = {
        r["slice"]: r["psi_pico"]
        for r in source_drift_psi(
            _df(spark, mixed), "src", "n", n_bins=8, bin_width=64
        ).collect()
    }
    assert got2["drift"] > 250_000_000_000  # > 0.25: "act"
    assert got2["drift"] > got2["match"]


def test_overflow_bin_catches_tail(spark):
    """Values beyond the grid land in the last bin, not out of range."""
    data = {"a": [10_000, 20_000], "b": [10, 20]}
    got = source_drift_psi(
        _df(spark, data), "src", "n", n_bins=4, bin_width=64
    ).collect()
    assert {r["slice"] for r in got} == {"a", "b"}
    exp = _ref_psi(data, 4, 64)
    for r in got:
        assert (r["n_rows"], r["psi_pico"]) == exp[r["slice"]]


def test_bad_params_loud(spark):
    df = _df(spark, DATA)
    with pytest.raises(ValueError):
        source_drift_psi(df, "src", "n", n_bins=1)
    with pytest.raises(ValueError):
        source_drift_psi(df, "src", "n", bin_width=0)
