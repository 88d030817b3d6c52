"""Phase profiler: split a registered query's wall time into
(a) Python DataFrame construction, (b) Catalyst analysis+optimization+
physical planning (via queryExecution.executedPlan), and (c) execution
(noop sink). Each phase is timed on a FRESH build per pass; min across
passes reported. Scoped caches released between passes (fair re-pass).

Usage: python scripts/profile_phases.py <sf_dir> <passes> <query> [...]
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

    spark = get_spark("profile_phases")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark.conf.set("spark.rust_triplets.scanPartitions", str(cpus))

    out: dict[str, dict[str, float]] = {}
    for _ in range(passes):
        for name in names:
            t0 = time.time()
            df = DQ.QUERIES[name](spark, sf_dir)
            t1 = time.time()
            # force analysis+optimization+physical planning (no execution)
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            rec = out.setdefault(name, {"build": 1e9, "plan": 1e9, "exec": 1e9, "total": 1e9})
            rec["build"] = round(min(rec["build"], t1 - t0), 3)
            rec["plan"] = round(min(rec["plan"], t2 - t1), 3)
            rec["exec"] = round(min(rec["exec"], t3 - t2), 3)
            rec["total"] = round(min(rec["total"], t3 - t0), 3)
        caching.release_all()
    print(json.dumps({"sf_dir": sf_dir, "passes": passes, "phases": out}))


if __name__ == "__main__":
    main()
