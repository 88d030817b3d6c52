"""Property-based cross-engine parity (hypothesis): the determinism
contract says every portable function evaluates bit-identically in
Python, DuckDB SQL, and Spark SQL. The example-based tests pin known
values; these generate adversarial inputs (unicode, astral planes,
whitespace runs, huge ints) and check the engines against each other.

DuckDB runs in-process per example (cheap). Spark joins each suite once
at the end over the collected examples (one job, not one per example).
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rust_triplets_spark.functions.hashing import (
    M31,
    hash31_py,
    hash31_sql,
    mix31_py,
    mix31_sql,
    polymix31_py,
    polymix31_sql,
    strfold_py,
    strfold_sql,
)

_settings = settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# text with real-world hostility: astral emoji, CJK, combining marks,
# control whitespace — but valid codepoints only (no lone surrogates;
# parquet/UTF-8 can't carry them and neither engine needs to)
TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # surrogates
        min_codepoint=1,  # NUL terminates DuckDB varchar literals
    ),
    max_size=80,
)

INTS = st.integers(min_value=-(2**40), max_value=2**62)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@_settings
@given(x=INTS, seed=st.integers(min_value=0, max_value=10_000))
def test_hash31_py_duck_property(x, seed):
    duck_v = duckdb.sql(f"SELECT {hash31_sql(str(x), seed)}").fetchone()[0]
    py_v = hash31_py(x, seed)
    assert duck_v == py_v
    assert 0 <= py_v < M31


@_settings
@given(xs=st.lists(INTS, min_size=1, max_size=6), seed=st.integers(0, 1000))
def test_mix31_and_polymix31_py_duck_property(xs, seed):
    sqls = [str(v) for v in xs]
    assert duckdb.sql(f"SELECT {mix31_sql(sqls, seed)}").fetchone()[0] == mix31_py(
        xs, seed
    )
    assert duckdb.sql(f"SELECT {polymix31_sql(sqls, seed)}").fetchone()[0] == (
        polymix31_py(xs, seed)
    )


_STRFOLD_EXAMPLES: list[str] = []


@_settings
@given(s=TEXT)
def test_strfold_py_duck_property(s):
    duck_v = duckdb.execute(
        f"WITH t(s) AS (SELECT ?) SELECT {strfold_sql('s')} FROM t", [s]
    ).fetchone()[0]
    assert duck_v == strfold_py(s)
    _STRFOLD_EXAMPLES.append(s)


def test_strfold_spark_batch(spark):
    """Spark side over every string hypothesis generated above (plus
    fixed hostile cases), one job."""
    from pyspark.sql import functions as F

    from rust_triplets_spark.functions.hashing import strfold_col

    cases = list(dict.fromkeys(_STRFOLD_EXAMPLES))[:200] + [
        "", " ", "\t\n\r", "🚀🚀", "é" + "́", "中文 text", "a" * 300,
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = [(r["s"], r[1]) for r in df.select(F.col("s"), strfold_col("s")).collect()]
    assert len(got) == len(cases)
    for s, v in got:
        assert v == strfold_py(s), repr(s)


@_settings
@given(s=TEXT)
def test_pii_scrub_py_duck_property(s):
    from rust_triplets_spark.functions.pii import pii_scrub_py, pii_scrub_sql

    duck_v = duckdb.execute(
        f"WITH t(s) AS (SELECT ?) SELECT {pii_scrub_sql('s')} FROM t", [s]
    ).fetchone()[0]
    assert duck_v == pii_scrub_py(s)


@_settings
@given(
    toks=st.lists(
        st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=8),
        min_size=0,
        max_size=20,
    )
)
def test_normalize_whitespace_py_duck_property(toks, duck):
    """normalize_inline_whitespace over messy spacing: both engines
    collapse any whitespace run to one space and trim."""
    from rust_triplets_spark.functions.text import normalize_inline_whitespace_sql

    s = "  \t".join(toks) + ("  " if toks else "")
    duck_v = duck.execute(
        f"WITH t(s) AS (SELECT ?) SELECT {normalize_inline_whitespace_sql('s')} FROM t",
        [s],
    ).fetchone()[0]
    assert duck_v == " ".join(t for t in s.split())


@_settings
@given(
    rows=st.integers(min_value=0, max_value=10**12),
    target=st.integers(min_value=1, max_value=10**6),
    floor=st.integers(min_value=1, max_value=64),
)
def test_auto_cells_py_duck_property(rows, target, floor):
    """auto_cells must agree bit-for-bit with the oracle's scalar-subquery
    arithmetic at every (rows, target) boundary — a one-off at a ceil
    boundary would desync centroid counts and fail every downstream hash."""
    from rust_triplets_spark.operators.similarity import auto_cells

    duck_v = duckdb.sql(
        f"SELECT greatest({floor}, ({rows} + {target - 1}) // {target})"
    ).fetchone()[0]
    assert auto_cells(rows, target, floor) == duck_v
