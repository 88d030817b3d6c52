"""Folder-date parsing parity with the reference's own unit tests
(src/source/indexing/date_helpers.rs tests, rs:98-214) — every case runs
through the Spark column expressions AND the DuckDB SQL twins."""

import datetime

import duckdb
import pytest

from rust_triplets_spark.functions.dates import (
    folder_date_col,
    folder_date_sql,
    month_range_date_col,
    month_range_date_sql,
    year_folder_date_col,
    year_folder_date_sql,
)

D = datetime.date

FOLDER_CASES = [
    ("02-14-2026", D(2026, 2, 14)),
    ("2026-02-14", D(2026, 2, 14)),
    ("02_14_2026", D(2026, 2, 14)),
    (" 02-14-2026 ", None),
    ("13-01-2026", None),
    ("02-32-2026", None),
    ("2026-13-01", None),
    ("not-a-date", None),
]

YEAR_FOLDER_CASES = [
    ("2026", "02-14-2026", D(2026, 2, 14)),
    ("2026", "02-14", D(2026, 2, 14)),
    ("2026", "02_14_2026", D(2026, 2, 14)),
    ("2026", "04-14-2025--INCOMPLETE", D(2025, 4, 14)),
    ("2026", "2025-04-14", D(2025, 4, 14)),
    ("2026", " 02-14 ", D(2026, 2, 14)),
    ("2026", "13-14", None),
    ("2026", "02-32", None),
    ("20xx", "02-14", None),
    ("2026", "bad", None),
]

MONTH_RANGE_CASES = [
    ("2026", "Jan + Feb 2026", D(2026, 2, 1)),
    ("2026", "Feb 2026", D(2026, 2, 1)),
    ("2026", "March + April", D(2026, 4, 1)),
    ("2026", "SEPT 2026", D(2026, 9, 1)),
    ("2026", "(Oct) 2026", D(2026, 10, 1)),
    ("2026", "Nov. 2026", D(2026, 11, 1)),
    ("2025", "Nov. + Dec. 2025", D(2025, 12, 1)),
    ("2026", "2026 Feb", D(2026, 2, 1)),
    ("2026", "Dec 2025 + Jan 2026", D(2026, 1, 1)),
    ("20xx", "Feb 2026", None),
    ("2026", "", None),
    ("2026", "2026", None),
]


def test_folder_date_spark(spark):
    df = spark.createDataFrame(
        [(i, f) for i, (f, _) in enumerate(FOLDER_CASES)], "i long, f string"
    )
    got = {r["i"]: r["d"] for r in df.select("i", folder_date_col("f").alias("d")).collect()}
    for i, (f, want) in enumerate(FOLDER_CASES):
        assert got[i] == want, f"{f!r}: got {got[i]}, want {want}"


def test_year_folder_date_spark(spark):
    df = spark.createDataFrame(
        [(i, y, f) for i, (y, f, _) in enumerate(YEAR_FOLDER_CASES)],
        "i long, y string, f string",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select("i", year_folder_date_col("y", "f").alias("d")).collect()
    }
    for i, (y, f, want) in enumerate(YEAR_FOLDER_CASES):
        assert got[i] == want, f"({y!r}, {f!r}): got {got[i]}, want {want}"


def test_month_range_date_spark(spark):
    df = spark.createDataFrame(
        [(i, y, f) for i, (y, f, _) in enumerate(MONTH_RANGE_CASES)],
        "i long, y string, f string",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select("i", month_range_date_col("y", "f").alias("d")).collect()
    }
    for i, (y, f, want) in enumerate(MONTH_RANGE_CASES):
        assert got[i] == want, f"({y!r}, {f!r}): got {got[i]}, want {want}"


@pytest.mark.parametrize(
    "cases,sql_fn,cols",
    [
        (FOLDER_CASES, None, 1),
        (YEAR_FOLDER_CASES, None, 2),
        (MONTH_RANGE_CASES, None, 2),
    ],
    ids=["folder", "year_folder", "month_range"],
)
def test_duckdb_twins_match_reference(cases, sql_fn, cols):
    con = duckdb.connect()
    for case in cases:
        if cols == 1:
            f, want = case
            expr = folder_date_sql("?")
            sql = f"SELECT {folder_date_sql('$f')} AS d"
            got = con.execute(sql, {"f": f}).fetchone()[0]
        else:
            y, f, want = case
            fn = year_folder_date_sql if cases is YEAR_FOLDER_CASES else month_range_date_sql
            sql = f"SELECT {fn('$y', '$f')} AS d"
            got = con.execute(sql, {"y": y, "f": f}).fetchone()[0]
        assert got == want, f"{case}: duckdb got {got}"
