"""Cross-engine determinism contract: the portable hash must evaluate
identically in Python, Spark SQL, and DuckDB SQL."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rust_triplets_spark.functions.hashing import (
    M31,
    hash31_col,
    hash31_py,
    hash31_sql,
    hash31_str_py,
    hash31_str_sql,
    mix31_col,
    mix31_py,
    mix31_sql,
    strfold_col,
    strfold_py,
    strfold_sql,
)

INTS = [0, 1, 2, 42, 999_999, 123_456_789_012, 2**40 + 7]
STRS = ["", "a", "hello", "BRK.B", "the quick brown fox", "Ünïcode tëst", "x" * 50]
SEEDS = [0, 1, 42, 2**31]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_hash31_py_duck_parity(duck):
    for x in INTS:
        for seed in SEEDS:
            got = duck.execute(f"SELECT {hash31_sql(str(x), seed)}").fetchone()[0]
            assert got == hash31_py(x, seed), (x, seed)


def test_hash31_spark_parity(spark):
    for seed in SEEDS:
        df = spark.createDataFrame([(x,) for x in INTS], "x long")
        got = [r[0] for r in df.select(hash31_col("x", seed)).collect()]
        assert got == [hash31_py(x, seed) for x in INTS], seed


def test_strfold_three_way(spark, duck):
    py = [strfold_py(s) for s in STRS]
    df = spark.createDataFrame([(s,) for s in STRS], "s string")
    got_spark = [r[0] for r in df.select(strfold_col("s")).collect()]
    got_duck = [
        duck.execute(f"SELECT {strfold_sql('s')} FROM (VALUES ($1)) t(s)", [s]).fetchone()[0]
        for s in STRS
    ]
    assert got_spark == py
    assert got_duck == py


def test_mix31_three_way(spark, duck):
    rows = [(1, 2, 3), (42, 0, 7), (2**40, 5, 1)]
    py = [mix31_py(list(r), 42) for r in rows]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got_spark = [
        r[0] for r in df.select(mix31_col([F.col("a"), F.col("b"), F.col("c")], 42)).collect()
    ]
    got_duck = [
        duck.execute(f"SELECT {mix31_sql([str(a), str(b), str(c)], 42)}").fetchone()[0]
        for a, b, c in rows
    ]
    assert got_spark == py
    assert got_duck == py


def test_polymix31_three_way(spark, duck):
    from rust_triplets_spark.functions.hashing import (
        polymix31_col,
        polymix31_py,
        polymix31_sql,
    )

    rows = [(1, 2, 3), (42, 0, 7), (2**40, 5, 1)]
    py = [polymix31_py(list(r), 42) for r in rows]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got_spark = [
        r[0]
        for r in df.select(
            polymix31_col([F.col("a"), F.col("b"), F.col("c")], 42)
        ).collect()
    ]
    got_duck = [
        duck.execute(f"SELECT {polymix31_sql([str(a), str(b), str(c)], 42)}").fetchone()[0]
        for a, b, c in rows
    ]
    assert got_spark == py
    assert got_duck == py
    # the reason it exists: a 13-part key stays linear-size (mix31 would
    # build a ~2^13-node tree and stall Catalyst analysis)
    wide = list(range(13))
    assert len(polymix31_sql([str(v) for v in wide], 7)) < 5000
    assert (
        duck.execute(f"SELECT {polymix31_sql([str(v) for v in wide], 7)}").fetchone()[0]
        == polymix31_py(wide, 7)
    )


def test_hash31_str_parity(duck):
    for s in STRS:
        got = duck.execute(
            f"SELECT {hash31_str_sql('s', 42)} FROM (VALUES ($1)) t(s)", [s]
        ).fetchone()[0]
        assert got == hash31_str_py(s, 42), s


def test_range_and_distribution():
    vals = [hash31_py(x, 42) for x in range(10_000)]
    assert all(0 <= v < M31 for v in vals)
    # rough uniformity: mean of u01 near 0.5
    mean = sum(v / M31 for v in vals) / len(vals)
    assert 0.48 < mean < 0.52
    # no collisions in a small domain (not guaranteed, but expected here)
    assert len(set(vals)) > 9_980
