"""Sink layout guarantees: bucketed tables join exchange-free (the
write-once-shuffle-never-again contract) and partitioned parquet prunes
directories at the scan."""

import os

import pytest
from pyspark.sql import functions as F


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def warehouse_spark(spark, tmp_path_factory):
    # the session fixture already has a warehouse dir; reuse it, just make
    # sure we clean our tables up
    yield spark
    for t in ("t_chunks_b", "t_splits_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(warehouse_spark):
    from rust_triplets_spark.sinks import read_bucketed, write_bucketed

    spark = warehouse_spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        chunks = spark.range(0, 2000).select(
            F.col("id").alias("record_id"),
            (F.col("id") % 7).alias("win"),
            F.concat(F.lit("chunk "), F.col("id").cast("string")).alias("text"),
        )
        splits = spark.range(0, 2000).select(
            F.col("id").alias("record_id"),
            F.when(F.col("id") % 10 < 8, "train").otherwise("test").alias("split"),
        )
        write_bucketed(chunks, "t_chunks_b", "record_id", n_buckets=8)
        write_bucketed(splits, "t_splits_b", "record_id", n_buckets=8)

        joined = read_bucketed(spark, "t_chunks_b").join(
            read_bucketed(spark, "t_splits_b"), "record_id"
        )
        plan = _physical(joined)
        # the whole point: bucket-aligned join, shuffle paid at write time
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000
        # and the same join WITHOUT bucketing does exchange (sanity that
        # the assertion above is meaningful under these settings)
        plain = chunks.join(splits, "record_id")
        assert "Exchange" in _physical(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partitioned_parquet_prunes(warehouse_spark, tmp_path):
    from rust_triplets_spark.sinks import write_partitioned_parquet

    spark = warehouse_spark
    df = spark.range(0, 300).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 8, "train").otherwise("test").alias("split"),
    )
    path = str(tmp_path / "by_split")
    write_partitioned_parquet(df, path, ["split"])
    assert sorted(
        d for d in os.listdir(path) if d.startswith("split=")
    ) == ["split=test", "split=train"]
    back = spark.read.parquet(path).where(F.col("split") == "train")
    plan = _physical(back)
    assert "PartitionFilters: [isnotnull(split" in plan or "split=train" in plan
    assert back.count() == 240
