"""Property-based checks (hypothesis) for the allocation operators'
DuckDB twins against pure-integer Python references. The Spark sides are
oracle-matched against these same twins at three scale factors, so
closing the DuckDB↔Python triangle here covers the full contract without
paying a Spark job per example.
"""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rust_triplets_spark.operators.mixing import (
    temperature_source_mix_sql,
    waterfill_allocation_sql,
)

_settings = settings(
    max_examples=80, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

GROUPS = st.lists(
    st.tuples(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=10_000),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)
BUDGET = st.integers(min_value=0, max_value=30_000)


def _values_sql(pairs):
    rows = ", ".join(f"('{g}', {c})" for g, c in pairs)
    return f"(SELECT * FROM (VALUES {rows}) AS v(grp, c)) AS counts"


def waterfill_py(pairs, budget):
    """Pure-integer reference of waterfill_allocation."""
    items = sorted(pairs, key=lambda t: (t[1], t[0]))
    n = len(items)
    alloc = {}
    prefix = 0
    k = 0  # funded count
    for i, (g, c) in enumerate(items):
        share = (budget - prefix) // (n - i)
        if c <= share:
            alloc[g] = c
            prefix += c
            k += 1
        else:
            break
    rest = items[k:]
    if rest:
        level, rem = divmod(budget - prefix, len(rest))
        for j, (g, c) in enumerate(rest):
            alloc[g] = level + (1 if j < rem else 0)
    return alloc


@_settings
@given(pairs=GROUPS, budget=BUDGET)
def test_waterfill_duck_matches_python_reference(pairs, budget):
    sql = waterfill_allocation_sql(_values_sql(pairs), "grp", "c", budget)
    got = {g: (c, f, a) for g, c, f, a in duckdb.sql(sql).fetchall()}
    ref = waterfill_py(pairs, budget)
    assert {g: a for g, (c, f, a) in got.items()} == ref
    total = sum(c for _, c in pairs)
    assert sum(a for _, _, a in got.values()) == min(budget, total)
    assert all(a <= c for c, _, a in got.values())


@_settings
@given(pairs=GROUPS, budget=BUDGET, alpha=st.sampled_from([0.0, 0.3, 0.5, 1.0]))
def test_temperature_mix_duck_satisfies_largest_remainder_spec(pairs, budget, alpha):
    """Full structural spec of largest-remainder allocation, computed from
    the output's own quantized weights (no pow reimplementation, so no
    libm knife-edge flakiness)."""
    sql = temperature_source_mix_sql(
        _values_sql(pairs), "grp", "c", budget, alpha=alpha
    )
    rows = duckdb.sql(sql).fetchall()
    W = sum(w for _, _, w, _ in rows)
    assert W > 0  # c >= 1 so every weight >= 1e6 (alpha=0 -> exactly 1e6)
    assert sum(a for _, _, _, a in rows) == budget
    base = {g: budget * w // W for g, _, w, _ in rows}
    rem = {g: budget * w % W for g, _, w, _ in rows}
    spare = budget - sum(base.values())
    plus = {g for g, _, _, a in rows if a == base[g] + 1}
    assert all(a in (base[g], base[g] + 1) for g, _, _, a in rows)
    assert len(plus) == spare
    # the +1 units go to the largest remainders (group-name tiebreak)
    order = sorted((( -rem[g], g) for g, _, _, _ in rows))
    assert plus == {g for _, g in order[:spare]}
