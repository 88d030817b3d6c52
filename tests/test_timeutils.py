"""ensure_epoch_us: resolved-dtype branching and cross-engine parity of
the parts-based timestamp extraction (the round-3 events.ts contract)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rust_triplets_spark.functions.timeutils import ensure_epoch_us, epoch_micros_col


def test_int_unit_branches(spark):
    df = spark.createDataFrame([(1, 1_700_000_000)], "id long, ts long")
    assert ensure_epoch_us(df, "ts", "s").collect()[0]["ts"] == 1_700_000_000 * 10**6
    df_ms = spark.createDataFrame([(1, 1_700_000_000_123)], "id long, ts long")
    assert ensure_epoch_us(df_ms, "ts", "ms").collect()[0]["ts"] == 1_700_000_000_123_000
    df_us = spark.createDataFrame([(1, 1_700_000_000_123_456)], "id long, ts long")
    assert ensure_epoch_us(df_us, "ts", "us").collect()[0]["ts"] == 1_700_000_000_123_456
    df_ns = spark.createDataFrame([(1, 1_700_000_000_123_456_789)], "id long, ts long")
    assert ensure_epoch_us(df_ns, "ts", "ns").collect()[0]["ts"] == 1_700_000_000_123_456

    with pytest.raises(ValueError, match="not found"):
        ensure_epoch_us(df, "nope")
    df_str = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError):
        ensure_epoch_us(df_str, "ts")


def test_timestamp_branch_matches_duckdb_epoch_us_and_is_tz_free(spark):
    cases = [
        "2024-01-01 00:09:58.778549",
        "1999-12-31 23:59:59.000001",
        "2024-06-15 12:00:00",
        "1970-01-01 00:00:00.000123",
    ]
    want = {
        c: duckdb.sql(f"SELECT epoch_us(TIMESTAMP '{c}')").fetchone()[0] for c in cases
    }
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.createDataFrame([(c,) for c in cases], "s string").select(
                "s", F.col("s").cast("timestamp_ntz").alias("ts")
            )
            got = {
                r["s"]: r["us"]
                for r in df.select("s", epoch_micros_col("ts").alias("us")).collect()
            }
            assert got == want, f"tz={tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
