"""Dump ``explain("formatted")`` for named queries to files — the plan
evidence the optimization rounds commit under ``plans/r<N>/``.

Usage: python scripts/dump_plans.py <sf_dir> <out_dir> <suffix> <query> [...]
Writes <out_dir>/<query>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from rust_triplets_spark.functions import caching
    from rust_triplets_spark.plans import driver_queries as DQ
    from rust_triplets_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.rust_triplets.scanPartitions", str(cpus))

    for name in names:
        df = DQ.QUERIES[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        caching.release_all()


if __name__ == "__main__":
    main()
