"""Plan-shape sweep: for each named query, print counts of Exchange /
SortMergeJoin / BroadcastHashJoin / ShuffledHashJoin / BatchEvalPython /
ArrowEvalPython / Generate nodes and the formatted-plan length — the
guide-§7.2 checklist as one table, no execution.

Usage: python scripts/plan_sweep.py <sf_dir> <query> [...]   (no args = all)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from rust_triplets_spark.plans import driver_queries as DQ
    from rust_triplets_spark.session import get_spark

    spark = get_spark("plan_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.rust_triplets.scanPartitions", str(cpus))

    if not names:
        names = list(DQ.QUERIES)

    pats = {
        "exchange": r"\bExchange\b",
        "smj": r"\bSortMergeJoin\b",
        "bhj": r"\bBroadcastHashJoin\b",
        "shj": r"\bShuffledHashJoin\b",
        "bnlj": r"\bBroadcastNestedLoopJoin\b",
        "cart": r"\bCartesianProduct\b",
        "pyeval": r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas",
        "window": r"\bWindow\b",
        "sort": r"\bSort\b",
        "gen": r"\bGenerate\b",
    }
    for name in names:
        try:
            df = DQ.QUERIES[name](spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"query": name, "err": str(exc)[:120]}))
            continue
        row = {"query": name, "plan_kb": round(len(plan) / 1024.0, 1)}
        for k, p in pats.items():
            c = len(re.findall(p, plan))
            if c:
                row[k] = c
        print(json.dumps(row))
        from rust_triplets_spark.functions import caching

        caching.release_all()


if __name__ == "__main__":
    main()
