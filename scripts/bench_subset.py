"""Time a subset of registered queries at one scale dir — the scale
campaign's per-family probe (SCALE.md): min of N noop-sink passes, same
session/parallelism knobs as bench.py, JSON line out.

Usage: python scripts/bench_subset.py <sf_dir> <passes> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, passes = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]

    from rust_triplets_spark.functions import caching
    from rust_triplets_spark.plans import driver_queries as DQ
    from rust_triplets_spark.session import get_spark

    spark = get_spark("bench_subset")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark.conf.set("spark.rust_triplets.scanPartitions", str(cpus))

    times: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            t0 = time.time()
            DQ.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
        caching.release_all()
    print(json.dumps({"sf_dir": sf_dir, "passes": passes, "queries": times}))


if __name__ == "__main__":
    main()
