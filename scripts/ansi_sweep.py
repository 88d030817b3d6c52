"""ANSI-mode sweep: run every registered query under a stock ANSI
SparkSession (``spark.sql.ansi.enabled=true``, the Spark 4 default) at a
small scale factor and report failures. Catches out-of-bounds
``element_at``/array indexing, overflowing casts, and bad implicit casts
that the engine-default session would silently null out.

Usage: python scripts/ansi_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    from rust_triplets_spark.functions import caching
    from rust_triplets_spark.plans import driver_queries as DQ

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ansi_sweep")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[2:] or list(DQ.QUERIES)
    ok, bad = 0, []
    for name in names:
        try:
            DQ.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ok += 1
        except Exception as exc:  # noqa: BLE001 — sweep reports, not raises
            bad.append((name, f"{type(exc).__name__}: {exc}"[:300]))
            print(f"ANSI FAIL {name}: {bad[-1][1]}", flush=True)
    caching.release_all()
    print(f"\n{ok} passed, {len(bad)} failed (ANSI mode, {sf_dir})")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
