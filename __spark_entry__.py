"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`rust_triplets_spark`; the query/oracle
registry is :mod:`rust_triplets_spark.plans.driver_queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rust_triplets_spark.plans import driver_queries as DQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full triplet assembly
    (records → chunks → split → anchor/positive pair → wrong-article
    negative → swap → weights → dedup)."""
    return DQ.QUERIES["triplet_assembly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(DQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect twins for every query above."""
    return dict(DQ.ORACLES)
