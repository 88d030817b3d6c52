"""Sinks — partitioned and bucketed persistent layouts (SURVEY §2.1
"Sinks": the reference has none beyond in-memory batches; a 100 TB Spark
deployment lives or dies by its table layout).

Two write shapes:

- ``write_partitioned_parquet`` — directory-partitioned parquet (e.g. by
  ``split`` or ingest date): partition pruning turns split-scoped reads
  (the sampler's dominant access pattern — every negative pick and epoch
  order is per-split) into directory listings instead of full scans.
- ``write_bucketed`` — a Spark-managed bucketed table
  (``bucketBy(n, key).sortBy(key)``): two tables bucketed on the same key
  with the same bucket count join with ZERO exchange — the shuffle is
  paid once at write time and amortized over every later join. This is
  how the chunk pool joins the split store, the BM25 postings join their
  doc-stats, and triplets join back to records at corpus scale without
  re-shuffling per query. ``tests/test_sinks.py`` asserts the
  exchange-free plan.

Bucketed tables require the session catalog (``saveAsTable``) — a plain
``parquet(path)`` write cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet; low-cardinality ``partition_cols``
    only (split, date, source-group) — one directory per value."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    Joins/aggregations on ``bucket_col`` between tables sharing the layout
    run exchange-free; the in-bucket sort additionally enables sort-merge
    joins with no sort node."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata rides the catalog)."""
    return spark.table(table)
